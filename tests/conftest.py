"""Shared pytest fixtures: one SparkSession per test session.

Small parallelism (local[4], 4 shuffle partitions) keeps test wall
time low; determinism tests explicitly re-run work at a second
parallelism level via repartition, not a second JVM.
"""

from __future__ import annotations

import pytest

from dedupe_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="dedupe_spark_tests",
        cores=4,
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.memory": "4g",
            "spark.sql.warehouse.dir": "/tmp/dedupe_spark_test_warehouse",
        },
    )
    yield s


@pytest.fixture(scope="session")
def corpus(spark):
    """Deterministic 600-page corpus with planted dup structure."""
    from dedupe_spark.corpus import generate_pages

    df = generate_pages(spark, 600, seed=42).cache()
    df.count()
    return df
