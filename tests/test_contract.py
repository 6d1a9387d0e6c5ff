"""Driver-contract shape guards (no Spark needed)."""

from __future__ import annotations

import __spark_entry__ as e
import bench
from dedupe_spark.queries import ORACLES, QUERIES


def test_bench_headline_names_exist():
    assert set(bench.HEADLINE) <= set(QUERIES)


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_module_exports():
    qs, os_ = e.queries(), e.oracle_sql()
    assert qs.keys() == QUERIES.keys()
    assert os_.keys() == ORACLES.keys()
    assert callable(e.entry)


def test_oracles_reference_known_tables_only():
    """Oracle SQL may only use the driver-registered views."""
    import re

    from dedupe_spark.sources.testdata import TABLES

    for name, sql in ORACLES.items():
        froms = re.findall(r"(?:FROM|JOIN)\s+([a-z_]+)\b", sql, re.IGNORECASE)
        for t in froms:
            assert t in TABLES or t in (
                "e", "q", "s", "t", "g", "a", "b", "d", "r",
                "reach", "edges", "toks", "idx", "sh",
                "bg", "cnt", "top", "split", "tr", "te",
                "tr_idx", "tr_sh", "te_idx", "te_sh", "hits",
            ), (
                name,
                t,
            )
