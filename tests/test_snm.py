"""Sorted-neighborhood: distributed rank == single-window row_number,
ties broken deterministically, pair set matches the textbook sliding
window, invariant across parallelism/bucketing."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.snm import distributed_rank, sorted_neighborhood_pairs


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, key long")


def _expected_pairs(rows, window):
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    out = set()
    for i, (id1, _) in enumerate(order):
        for d in range(1, window):
            if i + d < len(order):
                out.add((id1, order[i + d][0], d))
    return out


def test_rank_matches_sequential_oracle_with_ties_and_negatives(spark):
    rng = random.Random(7)
    rows = [(i, rng.randint(-50, 50)) for i in range(500)]  # heavy ties
    ranked = distributed_rank(_df(spark, rows), "key", "doc_id", n_buckets=8)
    got = {r["doc_id"]: r["rank"] for r in ranked.collect()}
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    assert got == {doc: i + 1 for i, (doc, _) in enumerate(order)}


def test_rank_invariant_across_bucket_counts(spark):
    rng = random.Random(11)
    rows = [(rng.getrandbits(63) - 2**62, rng.getrandbits(63) - 2**62) for _ in range(300)]
    base = None
    for nb in (1, 7, 256):
        ranked = distributed_rank(_df(spark, rows), "key", "doc_id", n_buckets=nb)
        got = sorted((r["doc_id"], r["rank"]) for r in ranked.collect())
        if base is None:
            base = got
        assert got == base


def test_pairs_match_textbook_window(spark):
    rows = [(10, 5), (20, 5), (30, 1), (40, 9), (50, 5), (60, 2)]
    pairs = sorted_neighborhood_pairs(_df(spark, rows), "key", "doc_id", window=3)
    got = {(r["id1"], r["id2"], r["gap"]) for r in pairs.collect()}
    assert got == _expected_pairs(rows, 3)
    # orientation follows the sort: (30,1) ranks before (60,2), so id1=30
    assert (30, 60, 1) in got


def test_pairs_invariant_across_parallelism(spark):
    rng = random.Random(3)
    rows = [(i, rng.randint(0, 30)) for i in range(200)]
    df = _df(spark, rows)
    a = sorted(
        (r["id1"], r["id2"], r["gap"])
        for r in sorted_neighborhood_pairs(df.repartition(1), "key", "doc_id", 4).collect()
    )
    b = sorted(
        (r["id1"], r["id2"], r["gap"])
        for r in sorted_neighborhood_pairs(df.repartition(16), "key", "doc_id", 4).collect()
    )
    assert a == b == sorted(_expected_pairs(rows, 4))


def test_window_must_be_at_least_two(spark):
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(_df(spark, [(1, 1)]), "key", "doc_id", window=1)


def test_empty_input(spark):
    df = _df(spark, []).where(F.lit(False))
    assert sorted_neighborhood_pairs(df, "key", "doc_id", window=4).count() == 0
