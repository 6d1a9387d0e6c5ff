"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the docs table is joined on ``doc_id`` repeatedly (pair text
attachment joins twice per run, label joins, incremental refreshes).
Writing it bucketed by ``doc_id`` once makes every subsequent equi-join
on that key exchange-free: Spark's bucketed scan exposes the hash
partitioning to Catalyst, which then plans SortMergeJoin with NO
Exchange on either side (verified in tests by asserting the physical
plan contains no Exchange operator).

Iceberg equivalent: ``PARTITIONED BY (bucket(N, doc_id))`` + storage-
partitioned joins; this module is the vanilla-Spark (Hive-layout) form
— the same design decision, sandbox-runnable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sorted_by: str | None = None,
) -> None:
    """Persist df as a bucketed (+optionally sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sorted_by:
        writer = writer.sortBy(sorted_by)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains any shuffle Exchange."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
