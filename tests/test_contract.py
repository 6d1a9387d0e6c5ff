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
    """Oracle SQL may only use the driver-registered views or names the
    query itself defines (CTEs / derived-table aliases)."""
    import re

    from dedupe_spark.sources.testdata import TABLES

    for name, sql in ORACLES.items():
        ctes = {
            c.lower()
            for c in re.findall(r"([a-z_][a-z0-9_]*)\s+AS\s*\(", sql, re.IGNORECASE)
        }
        known = {t.lower() for t in TABLES} | ctes
        # aliases: a token following a derived table ")" or a known name
        # ("FROM sh a JOIN sh b", "FROM (...) e") — never a token right
        # after FROM/JOIN itself, so unknown tables cannot self-whitelist
        aliases = {a.lower() for a in re.findall(r"\)\s+([a-z_][a-z0-9_]*)", sql, re.IGNORECASE)}
        for m in re.finditer(r"([a-z_][a-z0-9_]*)\s+([a-z_][a-z0-9_]*)", sql, re.IGNORECASE):
            if m.group(1).lower() in known:
                aliases.add(m.group(2).lower())
        froms = re.findall(r"(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)\b", sql, re.IGNORECASE)
        for t in froms:
            assert t.lower() in known or t.lower() in aliases, (name, t)
