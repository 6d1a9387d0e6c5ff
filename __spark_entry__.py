"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship ER query on /root/testdata/sf0.001.
queries()      — every implemented operator from SURVEY.md §2 plus the
                 training-data ops (dedupe, ANN, text analysis).
oracle_sql()   — DuckDB-equivalent ANSI SQL per query (same column
                 names; sketch/pipeline ops are rows-only checked).
Implementations live in dedupe_spark/queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dedupe_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full ER chain (exact collapse → MinHash-LSH/SimHash
    blocking → skew-split pairs → features → logistic scoring →
    large-star/small-star CC) over the sf0.001 documents table."""
    from dedupe_spark.queries import q_er_pipeline_clusters

    return q_er_pipeline_clusters(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
