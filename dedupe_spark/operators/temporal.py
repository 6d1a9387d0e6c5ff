"""Temporal join operators Spark lacks natively: backward as-of join
and bounded range join, built as shuffle-lean DataFrame compositions.

The reference corpus is a static file walk (Dedupe.java:158-177), but
a 10^12-page Common-Crawl-style store is revisioned: the same url is
fetched repeatedly and downstream consumers constantly need "the most
recent crawl/label/policy row at or before this event" (as-of) and
"what happened around this event" (bounded range). Open-source Spark
has neither operator; the naive encodings are scale-killers:

- as-of as ``l JOIN r ON key = key AND r.ts <= l.ts`` + max() is a
  per-key cartesian — a key with 10^5 revisions yields 10^10 join rows
  before the aggregate.
- range join on an inequality falls back to BroadcastNestedLoopJoin
  (or a cartesian) in Catalyst: O(|L|·|R|).

Both operators below are linear: one shuffle on the equi-key, no
inequality join in the plan (``scripts/audit_plans.py`` asserts no
CartesianProduct/BNLJ on the catalog queries built from them).

``asof_join`` uses the union+window encoding: tag both sides, union,
and take ``last(right_payload, ignorenulls=True)`` over a
(key)-partitioned window ordered by (ts, side). Each key is sorted
once inside its shuffle partition — the same work a merge-based as-of
join does natively (pandas.merge_asof, DuckDB ASOF JOIN), expressed in
pure Catalyst operators so AQE/codegen apply. Right payloads ride in a
single STRUCT so genuinely-NULL right fields are never skipped over.

``range_join`` uses bucketed banding: bucket width = window width, the
left side explodes to the (at most 2) buckets covering its window, an
equi-join on (key, bucket) finds candidates, and an exact residual
filter keeps true matches. A right row's single bucket matches exactly
one exploded left bucket, so no dedup pass is needed.

Skew note: both shuffles key on the join key (+bucket); a pathological
hot key behaves like any hot groupBy key. For range_join the bucket
term already splits a hot key by time; for asof_join, pre-split
monster keys by coarse time range and stitch (same playbook as
operators/pairs.py grid splitting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def _micros(c: Column) -> Column:
    """Epoch micros for TIMESTAMP or TIMESTAMP_NTZ input. NTZ is
    interpreted in the session timezone — a fixed offset, so the time
    DIFFERENCES and window arithmetic below are tz-invariant (bucket
    boundaries shift with tz, but the residual filter makes bucket
    placement correctness-neutral)."""
    return F.unix_micros(c.cast("timestamp"))


_SIDE = "__asof_side"
_TS = "__asof_ts"
_PAYLOAD = "__asof_payload"
_BUCKET = "__range_bucket"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: float | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the right row
    with the greatest ``right_ts <= left_ts`` for the same ``keys``
    (NULL-padded when no such row exists — LEFT ASOF semantics).

    Non-key, non-ts right columns are appended to the left schema, so
    they must not collide with left column names (rename first).

    ``tolerance_seconds`` drops matches staler than the given horizon
    (the match becomes NULL, the left row survives).  ``tiebreak``
    names a right column used to break exact right-ts ties
    deterministically (largest wins); without it, equal-ts right rows
    tie-break arbitrarily (Spark window order is non-deterministic on
    duplicate sort keys).
    """
    payload_cols = [c for c in right.columns if c not in keys and c != right_ts]
    l = left.withColumn(_SIDE, F.lit(1)).withColumn(_TS, F.col(left_ts))
    r = (
        right.withColumn(_SIDE, F.lit(0))
        .withColumn(_TS, F.col(right_ts))
        .withColumn(
            _PAYLOAD,
            F.struct(
                F.col(right_ts).alias("__matched_ts"),
                *[F.col(c) for c in payload_cols],
            ),
        )
        .select(*keys, _SIDE, _TS, _PAYLOAD)
    )
    # allowMissingColumns NULL-fills: left rows get a NULL payload
    # struct (skipped by ignorenulls), right rows get NULL left cols.
    u = l.unionByName(r, allowMissingColumns=True)

    order: list[Column] = [F.col(_TS).asc(), F.col(_SIDE).asc()]
    if tiebreak is not None:
        order.append(F.col(_PAYLOAD).getField(tiebreak).asc_nulls_first())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # right rows sort before left at equal ts (side 0 < 1), so a
    # same-instant right row is visible to the left row (>= semantics).
    matched = u.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)).where(
        F.col(_SIDE) == 1
    )
    if tolerance_seconds is not None:
        horizon = int(tolerance_seconds * 1_000_000)
        fresh = (
            _micros(F.col(_TS))
            - _micros(F.col(_PAYLOAD).getField("__matched_ts"))
        ) <= F.lit(horizon)
        matched = matched.withColumn(_PAYLOAD, F.when(fresh, F.col(_PAYLOAD)))
    out_payload = [
        F.col(_PAYLOAD).getField("__matched_ts").alias(f"{right_ts}_matched"),
        *[F.col(_PAYLOAD).getField(c).alias(c) for c in payload_cols],
    ]
    return matched.select(*left.columns, *out_payload)


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float = -300.0,
    upper_seconds: float = 0.0,
    how: str = "inner",
) -> DataFrame:
    """Bounded range join: pair every left row with the right rows
    whose ``right_ts`` lies in ``[left_ts + lower, left_ts + upper]``
    for the same ``keys``, via bucketed banding (equi-join only).

    ``how='left'`` keeps unmatched left rows with NULL right columns
    (right payload arrives as one struct, so a NULL struct means "no
    match" unambiguously). Right payload columns are suffixed ``_r``.
    """
    if upper_seconds <= lower_seconds:
        raise ValueError("range_join: upper_seconds must exceed lower_seconds")
    if how not in ("inner", "left"):
        raise ValueError(f"range_join: how must be inner|left, got {how!r}")
    width = int((upper_seconds - lower_seconds) * 1_000_000)
    lo = int(lower_seconds * 1_000_000)
    hi = int(upper_seconds * 1_000_000)

    payload_cols = [c for c in right.columns if c not in keys]
    l = left.withColumn(_TS, _micros(F.col(left_ts)))
    # the window [lt+lo, lt+hi] spans exactly `width` micros = one
    # bucket width, so it intersects at most 2 buckets
    b_lo = F.floor((F.col(_TS) + F.lit(lo)) / F.lit(width))
    b_hi = F.floor((F.col(_TS) + F.lit(hi)) / F.lit(width))
    l = l.withColumn(_BUCKET, F.explode(F.array_distinct(F.array(b_lo, b_hi))))

    r = (
        right.withColumn(
            _PAYLOAD, F.struct(*[F.col(c).alias(f"{c}_r") for c in payload_cols])
        )
        .withColumn(f"{_TS}_r", _micros(F.col(right_ts)))
        .select(*keys, f"{_TS}_r", _PAYLOAD)
        .withColumn(_BUCKET, F.floor(F.col(f"{_TS}_r") / F.lit(width)))
    )

    in_window = (F.col(f"{_TS}_r") >= F.col(_TS) + F.lit(lo)) & (
        F.col(f"{_TS}_r") <= F.col(_TS) + F.lit(hi)
    )
    matched = l.join(r, [*keys, _BUCKET], "inner").where(in_window)
    out = matched.select(
        *left.columns,
        *[F.col(_PAYLOAD).getField(f"{c}_r").alias(f"{c}_r") for c in payload_cols],
    )
    if how == "left":
        # unmatched left rows re-enter with a NULL right payload.
        # Left rows are identified by their full column tuple here
        # (exact duplicate left rows count as one identity — pass a
        # unique id column in `left` if that matters).
        unmatched = left.join(
            matched.select(*left.columns), left.columns, "left_anti"
        ).select(
            *left.columns,
            *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}_r") for c in payload_cols],
        )
        out = out.unionByName(unmatched)
    return out
