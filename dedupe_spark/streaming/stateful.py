"""Custom stateful streaming operator: first-seen dedup with explicit
per-key state via ``applyInPandasWithState``.

``dropDuplicatesWithinWatermark`` (streaming/incremental.py) covers the
built-in path; this is the CUSTOM-state path the engine uses when the
logic outgrows the built-ins (e.g. keep-best-representative instead of
keep-first, per-key counters, decayed scores). State is one row per
content key, partitioned by the key — at 10^12 pages the state store
shards across executors with the shuffle, exactly like the blocking
shuffle, and a TTL (GroupStateTimeout) bounds it in production.

The operator emits the FIRST page seen for each content_md5 and a
running duplicate count update; duplicates after the first emit
nothing (count is tracked in state)."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "content_md5 string, url string, n_dups_so_far long"
STATE_SCHEMA = "seen long"


def _first_seen(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (content_md5,) = key
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values("url", kind="mergesort")  # deterministic pick
    (seen,) = state.get if state.exists else (0,)
    out = []
    if seen == 0 and len(rows):
        out.append(
            {
                "content_md5": content_md5,
                "url": rows.iloc[0]["url"],
                "n_dups_so_far": len(rows) - 1,
            }
        )
    state.update((seen + len(rows),))
    if out:
        yield pd.DataFrame(out, columns=["content_md5", "url", "n_dups_so_far"])


def first_seen_pages(pages_with_key: DataFrame) -> DataFrame:
    """streaming pages(content_md5, url, ...) → first page per key.

    Input must already carry content_md5 (see
    streaming.incremental.with_content_key)."""
    return (
        pages_with_key.select("content_md5", "url")
        .groupBy("content_md5")
        .applyInPandasWithState(
            _first_seen,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
