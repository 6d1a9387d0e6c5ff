"""Survivorship: survivor precedence, mode consolidation (NULLs
ignored, deterministic ties), aggregates, all-NULL clusters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.survivorship import golden_records

ROWS = [
    # cluster A: survivor = longest text (id 2); lang mode en (2 vs 1);
    # source mode ties s1/s2 1:1 → smaller value s1 after NULL dropped
    (1, "A", "short", "en", "s2", 5),
    (2, "A", "the longest text", "en", None, 16),
    (3, "A", "mid text", "de", "s1", 8),
    # cluster B: singleton
    (4, "B", "solo", "fr", "s3", 4),
    # cluster C: equal text lengths → doc_id tiebreak picks 5; lang all NULL
    (5, "C", "aaaa", None, "s4", 4),
    (6, "C", "bbbb", None, "s4", 4),
]
SCHEMA = "doc_id long, cl string, text string, lang string, source string, n_chars long"


@pytest.fixture()
def golden(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    g = golden_records(
        df,
        "cl",
        order_by=[F.desc(F.length("text")), F.asc("doc_id")],
        mode_cols=["lang", "source"],
        agg_exprs={"max_n_chars": F.max("n_chars")},
    )
    return {r["cl"]: r for r in g.collect()}


def test_one_row_per_cluster_and_survivor_pick(golden):
    assert set(golden) == {"A", "B", "C"}
    assert golden["A"]["doc_id"] == 2      # longest text wins
    assert golden["A"]["text"] == "the longest text"
    assert golden["B"]["doc_id"] == 4
    assert golden["C"]["doc_id"] == 5      # length tie → smaller id


def test_mode_ignores_nulls_and_breaks_ties_low(golden):
    assert golden["A"]["lang_mode"] == "en"       # 2 en vs 1 de
    assert golden["A"]["source_mode"] == "s1"     # NULL dropped; s1 < s2
    assert golden["C"]["lang_mode"] is None       # all-NULL column


def test_aggregates(golden):
    assert golden["A"]["n_members"] == 3
    assert golden["A"]["max_n_chars"] == 16
    assert golden["B"]["n_members"] == 1


def test_requires_order(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError):
        golden_records(df, "cl", order_by=[])


def test_parallelism_invariance(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)

    def run(d):
        g = golden_records(
            d, "cl", order_by=[F.desc(F.length("text")), F.asc("doc_id")],
            mode_cols=["lang"],
        )
        return sorted((r["cl"], r["doc_id"], r["lang_mode"]) for r in g.collect())

    assert run(df.repartition(1)) == run(df.repartition(16))
