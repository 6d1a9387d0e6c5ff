"""Deterministic content-hash dataset splitting.

A training-data pipeline must split a corpus into train/val/test such
that (a) the assignment is a pure function of the record key — stable
across reruns, cluster sizes, and row order (``df.randomSplit`` is
none of these: it is seed+partitioning dependent), and (b) near-equal
fractions hold at any scale without a shuffle or a count.

``hash_split`` assigns each row a bucket in [0, granularity) from the
first 8 hex digits of md5(salt || key) and maps cumulative-fraction
boundaries onto buckets. Everything is a scalar JVM expression — no
shuffle, no UDF, survives predicate pushdown on top — and the same
formula is expressible in ANSI SQL for the DuckDB oracle
(``CAST('0x'||substr(md5(k),1,8) AS BIGINT)``).

The salt rotates assignments (e.g. per-epoch holdouts) without
touching the data; leaving it empty keeps the canonical split. Keying
on content (text/url) rather than a surrogate id also makes the split
leak-resistant: exact duplicate documents land in the same side by
construction, so dedup-before-split mistakes cannot bleed train into
test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRANULARITY = 10_000


def split_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, GRANULARITY): top 32 bits of
    md5(salt || key), mod granularity. NULL keys yield NULL buckets."""
    h = F.md5(F.concat(F.lit(salt), key))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % GRANULARITY


def hash_split(
    df: DataFrame,
    key: str,
    fractions: dict[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Add ``split_col`` assigning each row to a named split with the
    given fractions (must sum to 1 within 1/GRANULARITY). Dict order
    defines boundary order, so the same dict always yields the same
    assignment. NULL keys get a NULL split (matching split_bucket's
    NULL-in-NULL-out contract) — they must never silently land in the
    last-named split and contaminate the eval side (ADVICE r3)."""
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    if len(fractions) < 2:
        raise ValueError("hash_split: need at least 2 splits")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1.0 / GRANULARITY:
        raise ValueError(f"hash_split: fractions sum to {total}, expected 1.0")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("hash_split: negative fraction")

    bucket = split_bucket(F.col(key), salt=salt)
    names = list(fractions)
    bounds: list[int] = []
    acc = 0.0
    for name in names[:-1]:
        acc += fractions[name]
        bounds.append(round(acc * GRANULARITY))
    # chained WHENs evaluate in order, so `bucket < bound_i` picks the
    # first interval containing the bucket
    expr = None
    for name, b in zip(names[:-1], bounds):
        cond = bucket < F.lit(b)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = expr.otherwise(F.lit(names[-1]))
    expr = F.when(bucket.isNotNull(), expr)  # NULL key -> NULL split
    return df.withColumn(split_col, expr)


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its
    content-hash bucket falls below ``rate[stratum] * GRANULARITY``
    (``default_rate`` for strata not in the dict).

    This is the training-mix rebalancing move (downweight the dominant
    language / source) done as a pure filter: no shuffle, no count, no
    RNG state — ``df.sample`` is seed+partitioning dependent and
    non-reproducible across cluster sizes, this is a scalar JVM
    expression that yields the identical sample at any parallelism.
    Keying on content means exact duplicates are kept or dropped
    together, and a row's fate never changes when the corpus grows —
    so incremental reruns only ever add rows, never flip old ones.
    """
    for name, r in list(rates.items()) + [("_default", default_rate)]:
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"stratified_hash_sample: rate {name}={r} outside [0, 1]")
    bucket = split_bucket(F.col(key), salt=salt)
    thr: Column | None = None
    for name, r in rates.items():
        cond = F.col(strata_col) == F.lit(name)
        t = F.lit(round(r * GRANULARITY))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    default_t = F.lit(round(default_rate * GRANULARITY))
    thr = default_t if thr is None else thr.otherwise(default_t)
    return df.where(bucket < thr)
