"""Token-budget shard packing via a distributed prefix sum.

Writing a training corpus means cutting an ordered document stream
into shards of ~``budget`` tokens each (so every training file feeds
the data loader the same amount of work). The assignment for a doc is
``floor(exclusive_cumulative_tokens / budget)`` over a deterministic
document order — a global running sum.

A naive ``Window.orderBy(order_col)`` with no ``partitionBy`` computes
that cumsum on a SINGLE task — the classic scale-killer (100 TB of
rows through one core). This implements the textbook two-phase
distributed prefix sum instead:

1. range-bucket rows by ``order_col`` (``n_buckets`` contiguous
   ranges; bounds from one O(1)-row min/max aggregate),
2. per-bucket partial sums (tiny table, ``n_buckets`` rows) get an
   exclusive running offset via a window over the SMALL table only,
3. broadcast the offsets back and finish with a per-bucket window —
   parallel across buckets, each task sorts only its own range.

The only global sort touches ``n_buckets`` rows; everything else is
hash/range-parallel. Output is identical to the single-window
formulation (the DuckDB oracle uses exactly that), at any
parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_shards(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    budget: int,
    n_buckets: int = 1024,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Add ``shard_col`` = floor(exclusive-cumsum(weight) / budget)
    over rows ordered by ``order_col``.

    ``order_col`` must be a unique integral key (ties would make the
    within-bucket sort nondeterministic); ``weight_col`` must be
    non-negative integers (token counts). A single row heavier than
    ``budget`` simply spans shards — its shard is still well defined.
    """
    if budget <= 0:
        raise ValueError(f"pack_shards: budget must be positive, got {budget}")
    if n_buckets <= 0:
        raise ValueError(f"pack_shards: n_buckets must be positive, got {n_buckets}")

    # O(1)-row aggregate to the driver — same cost class as the CC
    # convergence fingerprint, not a data collect.
    lo_hi = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).first()
    if lo_hi is None or lo_hi["lo"] is None:
        return df.withColumn(shard_col, F.lit(None).cast("long"))
    lo, hi = int(lo_hi["lo"]), int(lo_hi["hi"])

    # Bucket by arithmetic shift right (exact floor-division by 2^k):
    # ids may legitimately span the full int64 range (xxhash64 doc
    # ids), where (col - lo) overflows under ANSI mode and float
    # division loses bits past 2^53. The shift is overflow-free,
    # exact, and monotone — contiguous ranges, as range-bucketing
    # requires. Python ints compute k without overflow.
    # clamp to 63: JVM shifts are mod-64, so k=64 would be a no-op
    k = min(63, max(0, ((hi - lo) // n_buckets).bit_length()))
    bucketed = df.withColumn("_pk_bucket", F.shiftright(F.col(order_col), k))

    # Phase 1+2: per-bucket totals, then an exclusive running offset.
    # The orderBy window here is the ONLY global sort and it runs over
    # at most n_buckets rows.
    partials = bucketed.groupBy("_pk_bucket").agg(
        F.sum(weight_col).alias("_pk_total")
    )
    w_off = Window.orderBy("_pk_bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = partials.select(
        "_pk_bucket",
        (F.sum("_pk_total").over(w_off) - F.col("_pk_total")).alias("_pk_offset"),
    )

    # Phase 3: broadcast offsets back; per-bucket windows run in
    # parallel, each sorting only its own contiguous range.
    w_in = Window.partitionBy("_pk_bucket").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    exclusive = (
        F.col("_pk_offset")
        + F.sum(weight_col).over(w_in)
        - F.col(weight_col)
    )
    return (
        bucketed.join(F.broadcast(offsets), "_pk_bucket")
        # integer `div`, not float `/`: exact past 2^53 tokens
        .withColumn("_pk_cume", exclusive)
        .withColumn(shard_col, F.expr(f"_pk_cume div {int(budget)}"))
        .drop("_pk_bucket", "_pk_offset", "_pk_cume")
    )
