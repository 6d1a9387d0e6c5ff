"""Survivorship: consolidate each resolved cluster into one golden record.

Reference semantics: after clustering, the reference only *tags* the
members (DedupeJar.tag, DedupeJar.java:321-366) — it never merges
them. Production entity resolution needs the merge step (survivorship
/ "golden record" in the MDM literature, e.g. Talburt, "Entity
Resolution and Information Quality", 2011 §6): per cluster, pick the
surviving record by a deterministic precedence order and consolidate
conflicting attributes by rule (most-frequent value, max, count, …).

Scale notes (north_rule):
  * the survivor pick is ONE cluster-partitioned window (row_number
    over the caller's precedence order) — parallel across clusters,
    never a global sort; resolved clusters are bounded-size in
    practice (the pipeline's max_block_size caps the pathological
    case), so no per-cluster skew handling is needed;
  * each mode column is a (cluster, value) groupBy (map-side combined)
    plus a cluster-partitioned top-1 window — state bounded by
    distinct values per cluster;
  * all recombination joins are equi-joins on the cluster key.

Determinism contract: the caller's ``order_by`` must end in a unique
tiebreak (the id); mode ties break on the smaller value, NULLs are
ignored (a NULL attribute never outvotes data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def golden_records(
    df: DataFrame,
    cluster_col: str,
    order_by: list[Column],
    mode_cols: list[str] | None = None,
    agg_exprs: dict[str, Column] | None = None,
) -> DataFrame:
    """df + cluster assignment → one consolidated row per cluster.

    ``order_by``: survivor precedence (e.g. ``[F.desc(F.length("text")),
    F.asc("doc_id")]``) — the rank-1 record contributes every base
    column. ``mode_cols``: columns consolidated to their most frequent
    non-NULL value (ties → smaller value), appended as ``<col>_mode``.
    ``agg_exprs``: extra per-cluster aggregates (name → Column).
    ``n_members`` is always appended.
    """
    if not order_by:
        raise ValueError("golden_records: order_by must name a precedence order")
    w = Window.partitionBy(cluster_col).orderBy(*order_by)
    survivor = (
        df.withColumn("_gr_rn", F.row_number().over(w))
        .where(F.col("_gr_rn") == 1)
        .drop("_gr_rn")
    )

    aggs = [F.count(F.lit(1)).alias("n_members")]
    for name, expr in (agg_exprs or {}).items():
        aggs.append(expr.alias(name))
    out = survivor.join(df.groupBy(cluster_col).agg(*aggs), cluster_col)

    for c in mode_cols or []:
        counts = (
            df.where(F.col(c).isNotNull())
            .groupBy(cluster_col, c)
            .agg(F.count(F.lit(1)).alias("_gr_cnt"))
        )
        wm = Window.partitionBy(cluster_col).orderBy(
            F.desc("_gr_cnt"), F.asc(c)
        )
        mode = (
            counts.withColumn("_gr_rn", F.row_number().over(wm))
            .where(F.col("_gr_rn") == 1)
            .select(cluster_col, F.col(c).alias(f"{c}_mode"))
        )
        # left join: a cluster whose column is all-NULL keeps NULL mode
        out = out.join(mode, cluster_col, "left")
    return out
