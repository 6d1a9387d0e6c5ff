"""Report file sink (SURVEY.md §2.1 S9).

Reference analog: the duplication report artifact the test harness
renders from an xlsx template (DedupeJarTest.java:47-103 — jar list,
duplicate clusters, sizes). The Spark-first spelling is
``coalesce(1).write.csv`` — the report is by definition a small,
human-consumed rollup (clusters with ≥2 members), so a single file is
correct; the heavy lifting happened upstream in distributed stages.

At 100 TB the report input is the s8 rollup (|clusters| rows, already
aggregated), never raw data — callers must not point this at a large
table, and ``max_rows`` guards against that by counting first.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_csv_report(
    df: DataFrame,
    path: str,
    order_by: list[str] | None = None,
    max_rows: int | None = 10_000_000,
) -> str:
    """Write ``df`` as ONE csv file (with header) at ``path``.

    Spark writes a directory; the single part file is moved to ``path``
    and the scratch directory removed, so downstream consumers get a
    plain file like the reference's report artifact. Returns ``path``.
    """
    if max_rows is not None:
        n = df.count()
        if n > max_rows:
            raise ValueError(
                f"report sink got {n} rows (> max_rows={max_rows}); "
                "reports are small rollups — aggregate upstream first"
            )
    if order_by:
        df = df.orderBy(*order_by)
    tmp = path + "__csv_tmp"
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
    parts = glob.glob(os.path.join(tmp, "part-*.csv"))
    if len(parts) != 1:  # pragma: no cover - coalesce(1) guarantees one
        raise RuntimeError(f"expected exactly one part file, got {parts}")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    shutil.move(parts[0], path)
    shutil.rmtree(tmp, ignore_errors=True)
    return path
