"""Bucketed co-located joins: equi-join on the bucket key must plan
without any shuffle Exchange (SURVEY.md §4.3.4 partitioning layout)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.sources.bucketed import plan_has_exchange, read_table, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # warehouse dir is a static conf — set in conftest's session
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v")
    )
    texts = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), F.col("id")).alias("text")
    )
    write_bucketed(docs, "b_docs", "doc_id", 8, sorted_by="doc_id")
    write_bucketed(texts, "b_texts", "doc_id", 8, sorted_by="doc_id")
    yield "b_docs", "b_texts"
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_texts")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    a, b = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, a).join(read_table(spark, b), "doc_id")
        assert not plan_has_exchange(joined), "bucketed join should not shuffle"
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join from plain parquet shuffles — proving the
    bucketed layout (not AQE magic) removed the Exchange."""
    a, _ = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = spark.range(0, 2000).select(
            F.col("id").alias("doc_id"), F.lit("x").alias("text")
        )
        joined = read_table(spark, a).join(plain, "doc_id")
        assert plan_has_exchange(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
