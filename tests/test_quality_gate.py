"""quantile_gate: approx path tracks the exact window within the
sketch's rank-error band; validation; determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.quality import quantile_gate


@pytest.fixture(scope="module")
def scored(spark):
    # two strata of different sizes with distinct, shuffled scores
    rows = [(i, "big", float((i * 7919) % 4000)) for i in range(4000)]
    rows += [(10_000 + i, "small", float((i * 271) % 400)) for i in range(400)]
    return spark.createDataFrame(rows, "id long, lang string, score double").cache()


def test_exact_keeps_requested_fraction(spark, scored):
    out = quantile_gate(scored, "score", "lang", keep_top=0.25, exact=True)
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert abs(counts["big"] - 1000) <= 1
    assert abs(counts["small"] - 100) <= 1


def test_approx_tracks_exact_within_rank_error(spark, scored):
    exact_ids = {
        r["id"]
        for r in quantile_gate(scored, "score", "lang", 0.25, exact=True).collect()
    }
    approx_ids = {
        r["id"] for r in quantile_gate(scored, "score", "lang", 0.25).collect()
    }
    # allowed disagreement: sketch rank error ~n/accuracy per stratum,
    # plus the boundary row percent_rank and >=threshold treat differently
    diff = exact_ids ^ approx_ids
    assert len(diff) <= 4400 // 1000 + 2, sorted(diff)[:10]


def test_approx_is_deterministic_across_partitioning(spark, scored):
    a = {r["id"] for r in quantile_gate(scored, "score", "lang", 0.4).collect()}
    b = {
        r["id"]
        for r in quantile_gate(
            scored.repartition(17).orderBy(F.desc("id")), "score", "lang", 0.4
        ).collect()
    }
    assert a == b


def test_validation(spark, scored):
    with pytest.raises(ValueError, match="keep_top"):
        quantile_gate(scored, "score", "lang", 0.0)
    with pytest.raises(ValueError, match="keep_top"):
        quantile_gate(scored, "score", "lang", 1.5)


def test_keep_all(spark, scored):
    assert quantile_gate(scored, "score", "lang", 1.0).count() == scored.count()
