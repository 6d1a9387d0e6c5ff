"""StageIO: upsert (MERGE semantics), lineage counters, markers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.sources.checkpoints import StageIO


@pytest.fixture()
def io(spark, tmp_path):
    return StageIO(spark, str(tmp_path / "stages"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def test_upsert_inserts_then_updates(spark, io):
    io.upsert(_df(spark, [(1, "a"), (2, "b")]), "t", "id")
    got = {(r["id"], r["v"]) for r in io.read("t").collect()}
    assert got == {(1, "a"), (2, "b")}
    # update id=2, insert id=3
    io.upsert(_df(spark, [(2, "B"), (3, "c")]), "t", "id")
    got = {(r["id"], r["v"]) for r in io.read("t").collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_upsert_idempotent(spark, io):
    io.upsert(_df(spark, [(1, "a")]), "t", "id")
    io.upsert(_df(spark, [(1, "a")]), "t", "id")
    assert io.read("t").count() == 1


def test_rows_in_recorded(spark, io):
    io.run_stage("parent", lambda: _df(spark, [(i, "x") for i in range(10)]), lineage="")
    io.run_stage(
        "child",
        lambda: io.read("parent").where(F.col("id") < 5),
        lineage="parent",
    )
    ck = io.checkpoints()
    child_rows = ck.where(F.col("stage") == "child").collect()
    assert all(r["rows_in"] == 10 for r in child_rows)
    assert sum(r["rows_out"] for r in child_rows) == 5
