"""Scalable per-stratum quantile gating.

`percent_rank() OVER (PARTITION BY stratum ORDER BY score)` is exact
but sorts every stratum — at 10^12 docs a popular language is a
multi-TB sort per query. The scale path computes one approximate
threshold per stratum (`approx_percentile`, a t-digest-style sketch:
single pass, map-side mergeable, no sort) and applies it as a plain
broadcast-join filter: O(strata) driver state, zero row sorts.

`quantile_gate(exact=True)` runs the window formulation instead —
same output contract — so tests can hold the two within the sketch's
documented error band on one corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_gate(
    df: DataFrame,
    score_col: str,
    strata_col: str,
    keep_top: float,
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Keep the top ``keep_top`` fraction of each stratum by
    ``score_col`` (higher = better).

    exact=False (the 100-TB path): per-stratum
    ``approx_percentile(score, 1 - keep_top, accuracy)`` thresholds,
    broadcast back, ``score >= threshold`` filter. Rank error is
    bounded by ~1/accuracy of the stratum size.

    exact=True (the oracle twin): ``percent_rank`` window, identical
    to the `quality_percentile_filter` catalog query.
    """
    if not (0.0 < keep_top <= 1.0):
        raise ValueError(f"quantile_gate: keep_top must be in (0, 1], got {keep_top}")
    if exact:
        w = Window.partitionBy(strata_col).orderBy(F.col(score_col).desc())
        return (
            df.withColumn("_qg_pr", F.percent_rank().over(w))
            .where(F.col("_qg_pr") <= keep_top)
            .drop("_qg_pr")
        )
    thresholds = df.groupBy(strata_col).agg(
        F.expr(
            f"approx_percentile({score_col}, {1.0 - keep_top}, {int(accuracy)})"
        ).alias("_qg_thr")
    )
    return (
        df.join(F.broadcast(thresholds), strata_col)
        .where(F.col(score_col) >= F.col("_qg_thr"))
        .drop("_qg_thr")
    )
