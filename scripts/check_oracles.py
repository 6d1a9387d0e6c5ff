"""Mimic the round driver: run each queries()[name] on Spark and the
matching oracle_sql()[name] in DuckDB at sf0.01; compare row count,
column names, and an order-insensitive value hash (columns sorted by
name, rows sorted, floats canonicalized).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys

sys.path.insert(0, ".")

import duckdb


def canon_cell(v) -> str:
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


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if "/" not in a)

    import __spark_entry__ as e
    from dedupe_spark.session import get_spark
    from dedupe_spark.sources.testdata import TABLES

    spark = get_spark("check_oracles", extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        sn, sh = table_hash(scols, srows)
        if name not in oracles:
            print(f"  {name:28s} rows-only: {sn} rows, cols={scols}")
            continue
        rel = con.sql(oracles[name])
        dcols = rel.columns
        drows = rel.fetchall()
        dn, dh = table_hash(dcols, drows)
        ok = sorted(scols) == sorted(dcols) and sn == dn and sh == dh
        status = "OK " if ok else "FAIL"
        print(f"  {name:28s} {status} spark={sn}/{sh} duck={dn}/{dh}")
        if not ok:
            failures.append(name)
            if sorted(scols) != sorted(dcols):
                print(f"    cols: spark={sorted(scols)} duck={sorted(dcols)}")
            else:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                a = sorted("\x01".join(canon_cell(r[i]) for i in order) for r in srows)
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                b = sorted("\x01".join(canon_cell(r[i]) for i in dorder) for r in drows)
                sa, sb = set(a), set(b)
                for x in list(sa - sb)[:3]:
                    print(f"    spark-only: {x[:200]}")
                for x in list(sb - sa)[:3]:
                    print(f"    duck-only:  {x[:200]}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
