"""Fellegi–Sunter probabilistic record linkage scoring.

Reference semantics: the reference scores candidates with a single
similarity cut-off per block (Dedupe.java's length-block + content
equality). Fellegi & Sunter ("A Theory for Record Linkage", JASA 1969)
is the standard probabilistic generalization: each cheap comparison
k contributes log2(m_k/u_k) when it agrees and log2((1-m_k)/(1-u_k))
when it disagrees, where m_k = P(agree | match) and u_k =
P(agree | non-match); the summed match weight plus a prior gives a
posterior match probability. This is the model behind Splink and most
production linkage engines.

Parameter estimation, both standard practice:
  * ``estimate_u`` — u-probabilities from deterministic pseudo-random
    pairs (hash-rank adjacent pairing): at web scale a random pair is
    almost surely a non-match, so agreement rates on random pairs
    estimate u directly.
  * ``estimate_m_u_em`` — unsupervised EM over binary agreement
    vectors (the classic two-class latent mixture): the E-step's
    per-pair match responsibility and the M-step's weighted agreement
    rates are ONE Spark aggregate per iteration.

Scale notes (north_rule):
  * scoring is a pure JVM projection over the candidate-pair table —
    all weights are precomputed Python floats embedded as literals, so
    whole-stage codegen keeps the hot path shuffle-free;
  * EM never collects pair data: each iteration reduces to 2K+2
    scalars (K = number of comparisons); the agreement table is
    lineage-truncated once (localCheckpoint, the cc.py idiom) so
    iteration i doesn't replay i-1 plans;
  * ``random_pairs`` reuses ``snm.distributed_rank`` — no global
    single-task sort, no RNG (xxhash64 of the id ⇒ identical pairing
    at any parallelism);
  * the weight/prob expressions have SQL twins generated from the SAME
    feature table (the pii.py single-source design) so engine dialects
    cannot drift.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dedupe_spark.operators.snm import distributed_rank


@dataclass(frozen=True)
class FSFeature:
    """One comparison: ``name`` must match a boolean agreement column
    ``agree_<name>`` on the pair table; m = P(agree | match),
    u = P(agree | non-match)."""

    name: str
    m: float
    u: float

    def __post_init__(self) -> None:
        for label, v in (("m", self.m), ("u", self.u)):
            if not 0.0 < v < 1.0:
                raise ValueError(f"FSFeature {self.name}: {label} must be in (0,1), got {v}")
        if self.m <= self.u:
            raise ValueError(
                f"FSFeature {self.name}: m ({self.m}) must exceed u ({self.u}) — "
                "agreement must be more likely among matches"
            )

    @property
    def agree_weight(self) -> float:
        return math.log2(self.m / self.u)

    @property
    def disagree_weight(self) -> float:
        return math.log2((1.0 - self.m) / (1.0 - self.u))


def _check_prior(prior: float) -> None:
    if not 0.0 < prior < 1.0:
        raise ValueError(f"prior must be in (0,1), got {prior}")


def _agree_col(f: FSFeature) -> str:
    return f"agree_{f.name}"


def match_weight_expr(features: list[FSFeature]) -> Column:
    """Σ_k CASE agree_k THEN log2(m/u) ELSE log2((1-m)/(1-u)) — all
    literals, fixed summation order (feature-list order), so the double
    result is bit-identical to the generated SQL twin."""
    out = F.lit(0.0)
    for f in features:
        out = out + F.when(F.col(_agree_col(f)), F.lit(f.agree_weight)).otherwise(
            F.lit(f.disagree_weight)
        )
    return out


def match_prob_expr(features: list[FSFeature], prior: float) -> Column:
    """Posterior P(match): prior odds × Π likelihood ratios, then
    o/(1+o). Products of literals (no pow/exp2) keep the arithmetic
    bit-identical across engines."""
    _check_prior(prior)
    odds = F.lit(prior / (1.0 - prior))
    for f in features:
        odds = odds * F.when(F.col(_agree_col(f)), F.lit(f.m / f.u)).otherwise(
            F.lit((1.0 - f.m) / (1.0 - f.u))
        )
    return odds / (odds + F.lit(1.0))


def fs_score(pairs: DataFrame, features: list[FSFeature], prior: float) -> DataFrame:
    """pairs(…, agree_<k> boolean …) → + match_weight, match_prob."""
    return pairs.withColumn("match_weight", match_weight_expr(features)).withColumn(
        "match_prob", match_prob_expr(features, prior)
    )


def _lit(x: float) -> str:
    # repr round-trips the exact double; the CAST keeps DuckDB from
    # parsing the literal as DECIMAL (whose scale overflows under the
    # chained multiplications) — double arithmetic, same as Spark.
    return f"CAST({x!r} AS DOUBLE)"


def match_weight_sql(features: list[FSFeature], agree_sql: dict[str, str]) -> str:
    """ANSI-SQL twin of ``match_weight_expr`` — same literals (repr
    round-trips the exact double), same order."""
    terms = [
        f"(CASE WHEN {agree_sql[f.name]} THEN {_lit(f.agree_weight)} ELSE {_lit(f.disagree_weight)} END)"
        for f in features
    ]
    return "(CAST(0.0 AS DOUBLE) + " + " + ".join(terms) + ")"


def match_prob_sql(features: list[FSFeature], agree_sql: dict[str, str], prior: float) -> str:
    _check_prior(prior)
    odds = _lit(prior / (1.0 - prior))
    for f in features:
        odds = (
            f"({odds} * (CASE WHEN {agree_sql[f.name]} "
            f"THEN {_lit(f.m / f.u)} ELSE {_lit((1.0 - f.m) / (1.0 - f.u))} END))"
        )
    return f"({odds} / ({odds} + CAST(1.0 AS DOUBLE)))"


def fs_decisions(
    scored: DataFrame,
    lower: float,
    upper: float,
    prob_col: str = "match_prob",
    decision_col: str = "decision",
) -> DataFrame:
    """The Fellegi–Sunter THREE-way decision rule (JASA 1969 §3 — the
    defining result of the theory): posteriors above ``upper`` are
    links, below ``lower`` non-links, and the band between goes to
    clerical review; the two thresholds are chosen to bound the two
    error rates, with the review band absorbing the ambiguity. Pure
    literal projection — rides whatever plan produced the scores."""
    if not 0.0 <= lower <= upper <= 1.0:
        raise ValueError(
            f"fs_decisions: need 0 <= lower <= upper <= 1, got ({lower}, {upper})"
        )
    return scored.withColumn(
        decision_col,
        F.when(F.col(prob_col) >= upper, F.lit("link"))
        .when(F.col(prob_col) < lower, F.lit("nonlink"))
        .otherwise(F.lit("review")),
    )


def decision_sql(lower: float, upper: float, prob_expr: str) -> str:
    """ANSI twin of ``fs_decisions``' CASE (same literals, same order)."""
    if not 0.0 <= lower <= upper <= 1.0:
        raise ValueError(
            f"decision_sql: need 0 <= lower <= upper <= 1, got ({lower}, {upper})"
        )
    return (
        f"(CASE WHEN {prob_expr} >= {_lit(upper)} THEN 'link' "
        f"WHEN {prob_expr} < {_lit(lower)} THEN 'nonlink' "
        f"ELSE 'review' END)"
    )


def random_pairs(
    df: DataFrame, id_col: str, seed: int = 0, n_buckets: int = 1024
) -> DataFrame:
    """Deterministic pseudo-random disjoint pairing: rank rows by
    xxhash64(id, seed) (ties impossible — the rank tiebreak is the
    unique id) and pair rank 2i-1 with rank 2i. Columns come back
    suffixed _1/_2; an odd trailing row is dropped. No RNG state —
    identical pairing at any parallelism, any partitioning."""
    ranked = distributed_rank(
        df.withColumn("_fs_h", F.xxhash64(F.col(id_col), F.lit(seed))),
        "_fs_h",
        id_col,
        rank_col="_fs_rank",
        n_buckets=n_buckets,
    ).drop("_fs_h")
    pid = F.expr("(_fs_rank - 1) div 2")
    side = F.pmod(F.col("_fs_rank") - 1, F.lit(2))
    tagged = ranked.withColumn("_fs_pid", pid).withColumn("_fs_side", side)
    cols = [c for c in df.columns if c != "_fs_h"]
    a = tagged.where(F.col("_fs_side") == 0).select(
        "_fs_pid", *[F.col(c).alias(f"{c}_1") for c in cols]
    )
    b = tagged.where(F.col("_fs_side") == 1).select(
        "_fs_pid", *[F.col(c).alias(f"{c}_2") for c in cols]
    )
    return a.join(b, "_fs_pid").drop("_fs_pid")


def estimate_u(pairs: DataFrame, agree_cols: list[str]) -> dict[str, float]:
    """u_k = mean agreement over (pseudo-random, almost-surely
    non-matching) pairs — one aggregate, K scalars to the driver."""
    row = pairs.agg(
        *[F.avg(F.col(c).cast("double")).alias(c) for c in agree_cols]
    ).first()
    if row is None or any(row[c] is None for c in agree_cols):
        raise ValueError("estimate_u: empty pair table")
    return {c: float(row[c]) for c in agree_cols}


def estimate_m_u_em(
    pairs: DataFrame,
    agree_cols: list[str],
    n_iter: int = 20,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_lambda: float = 0.1,
    eps: float = 1e-6,
) -> tuple[dict[str, float], dict[str, float], float]:
    """Unsupervised EM for (m, u, λ) over binary agreement vectors.

    E-step: r = λ·Π m^γ(1-m)^(1-γ) / (that + (1-λ)·Π u^γ(1-u)^(1-γ)).
    M-step: m_k = Σ r·γ_k / Σ r, u_k = Σ (1-r)·γ_k / Σ (1-r),
    λ = Σ r / n. Each iteration is ONE aggregate producing 2K+2
    scalars; pair rows never reach the driver. Parameters are clamped
    to [eps, 1-eps] so a degenerate corpus can't zero a likelihood.

    Identifiability caveat (standard for this model): with fewer than
    3 comparisons the binary mixture has more parameters than
    observable cell frequencies and EM converges to A valid optimum
    but not necessarily the generating parameters — use k >= 3
    comparisons (as Splink's docs also require) when estimating.
    """
    if n_iter <= 0:
        raise ValueError(f"estimate_m_u_em: n_iter must be positive, got {n_iter}")
    g = pairs.select(
        *[F.col(c).cast("double").alias(c) for c in agree_cols]
    ).localCheckpoint(eager=True)
    n = g.count()
    if n == 0:
        raise ValueError("estimate_m_u_em: empty pair table")

    def clamp(x: float) -> float:
        return min(1.0 - eps, max(eps, x))

    m = {c: init_m for c in agree_cols}
    u = {c: init_u for c in agree_cols}
    lam = init_lambda
    for _ in range(n_iter):
        num = F.lit(lam)
        den = F.lit(1.0 - lam)
        for c in agree_cols:
            num = num * F.when(F.col(c) > 0.5, F.lit(m[c])).otherwise(F.lit(1.0 - m[c]))
            den = den * F.when(F.col(c) > 0.5, F.lit(u[c])).otherwise(F.lit(1.0 - u[c]))
        # double underflow guard: with many features the two literal
        # products can BOTH underflow to 0.0 (num+den == 0 → 0/0 → NaN
        # poisons every sum); an uninformative 0.5 keeps EM moving
        r = (
            F.when(num + den == 0.0, F.lit(0.5)).otherwise(num / (num + den))
        ).alias("_r")
        agged = g.select(r, *agree_cols).agg(
            F.sum("_r").alias("_sr"),
            *[F.sum(F.col(c) * F.col("_r")).alias(f"_m_{c}") for c in agree_cols],
            *[F.sum(F.col(c) * (1.0 - F.col("_r"))).alias(f"_u_{c}") for c in agree_cols],
        ).first()
        sr = float(agged["_sr"])
        snr = n - sr
        if sr <= 0.0 or snr <= 0.0:
            break  # all mass on one class — nothing left to estimate
        m = {c: clamp(float(agged[f"_m_{c}"]) / sr) for c in agree_cols}
        u = {c: clamp(float(agged[f"_u_{c}"]) / snr) for c in agree_cols}
        lam = clamp(sr / n)
    return m, u, lam
