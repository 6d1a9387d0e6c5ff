"""pack_shards: exactness vs a naive cumsum oracle, parallelism
invariance, sparse/skewed key spaces, oversized rows, validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.packing import pack_shards


def naive_shards(rows: list[tuple[int, int]], budget: int) -> dict[int, int]:
    out, cume = {}, 0
    for oid, w in sorted(rows):
        out[oid] = cume // budget
        cume += w
    return out


def collect_shards(df) -> dict[int, int]:
    return {r["oid"]: r["shard_id"] for r in df.collect()}


@pytest.fixture(scope="module")
def rows():
    # weights vary 1..97, ids dense
    return [(i, 1 + (i * 37) % 97) for i in range(3000)]


def test_matches_naive_cumsum(spark, rows):
    df = spark.createDataFrame(rows, "oid long, w long")
    got = collect_shards(pack_shards(df, "oid", "w", budget=500, n_buckets=16))
    assert got == naive_shards(rows, 500)


def test_invariant_across_partitioning_and_bucket_count(spark, rows):
    df = spark.createDataFrame(rows, "oid long, w long")
    a = collect_shards(pack_shards(df, "oid", "w", budget=500, n_buckets=7))
    b = collect_shards(
        pack_shards(df.repartition(23).orderBy(F.desc("oid")), "oid", "w",
                    budget=500, n_buckets=256)
    )
    assert a == b


def test_sparse_and_negative_order_keys(spark):
    # ids clumped at the extremes of a huge range, including negatives:
    # range-bucketing must not overflow or collapse ordering
    rows = [(-(10**12) + i, 10) for i in range(50)] + [(10**12 + i, 10) for i in range(50)]
    df = spark.createDataFrame(rows, "oid long, w long")
    got = collect_shards(pack_shards(df, "oid", "w", budget=100, n_buckets=8))
    assert got == naive_shards(rows, 100)


def test_full_int64_range_ids(spark):
    # xxhash64-style ids spanning nearly the whole int64 range: the
    # shift-based bucketing must stay exact where subtraction would
    # overflow and float division would lose bits
    big = 2**63
    ids = [-big, -big + 3, -12345, 0, 7, big - 9, big - 1]
    rows = [(i, 25) for i in ids]
    df = spark.createDataFrame(rows, "oid long, w long")
    for nb in (1, 8, 1024):
        got = collect_shards(pack_shards(df, "oid", "w", budget=60, n_buckets=nb))
        assert got == naive_shards(rows, 60)


def test_row_heavier_than_budget_spans_shards(spark):
    rows = [(1, 10), (2, 5000), (3, 10), (4, 10)]
    df = spark.createDataFrame(rows, "oid long, w long")
    got = collect_shards(pack_shards(df, "oid", "w", budget=100))
    assert got == naive_shards(rows, 100) == {1: 0, 2: 0, 3: 50, 4: 50}


def test_empty_input(spark):
    df = spark.createDataFrame([], "oid long, w long")
    out = pack_shards(df, "oid", "w", budget=100)
    assert out.count() == 0 and "shard_id" in out.columns


def test_fuzz_against_naive(spark):
    """Seeded fuzz: arbitrary unique int64 ids (clustered, sparse, and
    sign-mixed), zero-inclusive weights, varied budgets and bucket
    counts — every case must match the naive cumsum exactly."""
    import random

    rnd = random.Random(42)
    for _ in range(25):
        n = rnd.randint(1, 60)
        # 2**61 keeps len(range(-span, span)) under the C ssize_t cap
        span = rnd.choice([100, 10**6, 2**61])
        oids = rnd.sample(range(-span, span), n)
        rows = [(o, rnd.randint(0, 10_000)) for o in oids]
        budget = rnd.randint(1, 5_000)
        nb = rnd.choice([1, 3, 16, 1024])
        df = spark.createDataFrame(rows, "oid long, w long")
        got = collect_shards(pack_shards(df, "oid", "w", budget=budget, n_buckets=nb))
        assert got == naive_shards(rows, budget), (budget, nb, rows)


def test_validation(spark):
    df = spark.createDataFrame([(1, 1)], "oid long, w long")
    with pytest.raises(ValueError, match="budget"):
        pack_shards(df, "oid", "w", budget=0)
    with pytest.raises(ValueError, match="n_buckets"):
        pack_shards(df, "oid", "w", budget=10, n_buckets=0)
