"""Driver-contract guard: every queries() entry runs and every
oracle_sql() entry matches it in DuckDB at sf0.001 (the driver runs
the same comparison at sf0.01 — scripts/check_oracles.py)."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from dedupe_spark.sources.testdata import TABLES

SF_DIR = "/root/testdata/sf0.001"


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    return str(v)


def _hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_canon(r[i]) for i in order) for r in rows)
    return len(rows), hashlib.sha256("\n".join(lines).encode()).hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


ALL_QUERIES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    sdf = qs[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in oracles:
        # rows-only contract: runs, stable schema
        assert sdf.columns
        return
    rel = duck.sql(oracles[name])
    sn, sh = _hash(sdf.columns, srows)
    dn, dh = _hash(rel.columns, rel.fetchall())
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert (sn, sh) == (dn, dh)


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["doc_id", "cluster_id"]
