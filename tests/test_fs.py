"""Fellegi–Sunter: weights/probabilities against a pure-Python oracle,
parameter validation, deterministic random pairing, u-estimation
against the analytic value, and EM recovery of planted parameters."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.fs import (
    FSFeature,
    estimate_m_u_em,
    estimate_u,
    fs_score,
    random_pairs,
)

FEATS = [FSFeature("a", m=0.9, u=0.2), FSFeature("b", m=0.8, u=0.05)]
PRIOR = 0.1


def _py_score(ga: bool, gb: bool) -> tuple[float, float]:
    w = 0.0
    odds = PRIOR / (1 - PRIOR)
    for f, g in zip(FEATS, (ga, gb)):
        w += math.log2(f.m / f.u) if g else math.log2((1 - f.m) / (1 - f.u))
        odds *= (f.m / f.u) if g else ((1 - f.m) / (1 - f.u))
    return w, odds / (odds + 1)


def test_scores_match_python_oracle(spark):
    rows = [(1, 2, True, True), (3, 4, True, False), (5, 6, False, True), (7, 8, False, False)]
    df = spark.createDataFrame(rows, "id1 long, id2 long, agree_a boolean, agree_b boolean")
    got = {
        (r["id1"], r["id2"]): (r["match_weight"], r["match_prob"])
        for r in fs_score(df, FEATS, PRIOR).collect()
    }
    for id1, id2, ga, gb in rows:
        ew, ep = _py_score(ga, gb)
        assert got[(id1, id2)][0] == pytest.approx(ew, abs=1e-12)
        assert got[(id1, id2)][1] == pytest.approx(ep, abs=1e-12)
    # full agreement must outscore full disagreement
    assert got[(1, 2)][0] > got[(7, 8)][0]


def test_feature_validation():
    with pytest.raises(ValueError):
        FSFeature("x", m=0.2, u=0.5)  # m <= u
    with pytest.raises(ValueError):
        FSFeature("x", m=1.0, u=0.5)  # m out of (0,1)
    with pytest.raises(ValueError):
        FSFeature("x", m=0.9, u=0.0)  # u out of (0,1)


def test_prior_validation(spark):
    df = spark.createDataFrame([(1, 2, True, True)], "id1 long, id2 long, agree_a boolean, agree_b boolean")
    with pytest.raises(ValueError):
        fs_score(df, FEATS, prior=0.0)


def test_random_pairs_disjoint_and_deterministic(spark):
    docs = spark.createDataFrame([(i, f"s{i % 3}") for i in range(101)], "doc_id long, source string")
    p1 = random_pairs(docs, "doc_id", seed=5)
    rows = p1.collect()
    assert len(rows) == 50  # odd trailing row dropped
    used = [r["doc_id_1"] for r in rows] + [r["doc_id_2"] for r in rows]
    assert len(used) == len(set(used))  # disjoint pairing
    p2 = sorted(
        (r["doc_id_1"], r["doc_id_2"])
        for r in random_pairs(docs.repartition(16), "doc_id", seed=5).collect()
    )
    assert p2 == sorted((r["doc_id_1"], r["doc_id_2"]) for r in rows)
    # a different seed pairs differently
    p3 = sorted(
        (r["doc_id_1"], r["doc_id_2"])
        for r in random_pairs(docs, "doc_id", seed=6).collect()
    )
    assert p3 != p2


def test_estimate_u_matches_analytic(spark):
    # langs drawn 50/30/20: P(random agree) = .5^2+.3^2+.2^2 = 0.38
    rng = random.Random(13)
    langs = ["en"] * 50 + ["de"] * 30 + ["fr"] * 20
    docs = spark.createDataFrame(
        [(i, rng.choice(langs)) for i in range(4000)], "doc_id long, lang string"
    )
    pairs = random_pairs(docs, "doc_id", seed=1).select(
        (F.col("lang_1") == F.col("lang_2")).alias("agree_lang")
    )
    u = estimate_u(pairs, ["agree_lang"])
    assert u["agree_lang"] == pytest.approx(0.38, abs=0.04)


def test_estimate_u_empty_raises(spark):
    df = spark.createDataFrame([], "agree_a boolean")
    with pytest.raises(ValueError):
        estimate_u(df, ["agree_a"])


def _planted_pairs(spark, n=6000, lam=0.2, seed=29):
    """Binary agreement vectors from a two-class mixture with known
    (m*, u*). THREE features: a two-feature binary mixture is not
    identifiable (5 parameters vs 3 observable cell frequencies), so
    EM can only be expected to recover planted values from k >= 3."""
    m_true = {"a": 0.95, "b": 0.75, "c": 0.85}
    u_true = {"a": 0.15, "b": 0.05, "c": 0.10}
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        match = rng.random() < lam
        p = m_true if match else u_true
        rows.append(
            (
                rng.random() < p["a"],
                rng.random() < p["b"],
                rng.random() < p["c"],
                match,
            )
        )
    df = spark.createDataFrame(
        rows, "agree_a boolean, agree_b boolean, agree_c boolean, is_match boolean"
    )
    return df, m_true, u_true


def test_em_recovers_planted_parameters(spark):
    df, m_true, u_true = _planted_pairs(spark)
    cols = ["agree_a", "agree_b", "agree_c"]
    m, u, lam = estimate_m_u_em(df.select(*cols), cols, n_iter=40)
    for c, key in (("agree_a", "a"), ("agree_b", "b"), ("agree_c", "c")):
        assert m[c] == pytest.approx(m_true[key], abs=0.08)
        assert u[c] == pytest.approx(u_true[key], abs=0.05)
    assert lam == pytest.approx(0.2, abs=0.05)
    # and the resulting scores separate the planted classes
    feats = [
        FSFeature("a", m=m["agree_a"], u=u["agree_a"]),
        FSFeature("b", m=m["agree_b"], u=u["agree_b"]),
        FSFeature("c", m=m["agree_c"], u=u["agree_c"]),
    ]
    scored = fs_score(df, feats, prior=lam)
    means = (
        scored.groupBy("is_match").agg(F.avg("match_prob").alias("p")).collect()
    )
    by_class = {r["is_match"]: r["p"] for r in means}
    assert by_class[True] > 0.5 > by_class[False]


def test_em_validation(spark):
    df = spark.createDataFrame([(True,)], "agree_a boolean")
    with pytest.raises(ValueError):
        estimate_m_u_em(df, ["agree_a"], n_iter=0)
    empty = df.where(F.lit(False))
    with pytest.raises(ValueError):
        estimate_m_u_em(empty, ["agree_a"])


def test_fs_decisions_three_way(spark):
    from dedupe_spark.operators.fs import fs_decisions

    df = spark.createDataFrame(
        [(1, 0.95), (2, 0.5), (3, 0.05), (4, 0.85), (5, 0.1)],
        "id long, match_prob double",
    )
    got = {r["id"]: r["decision"] for r in fs_decisions(df, 0.1, 0.85).collect()}
    # boundary semantics: >= upper links, < lower non-links
    assert got == {1: "link", 2: "review", 3: "nonlink", 4: "link", 5: "review"}


def test_fs_decisions_validation(spark):
    from dedupe_spark.operators.fs import decision_sql, fs_decisions

    df = spark.createDataFrame([(1, 0.5)], "id long, match_prob double")
    with pytest.raises(ValueError):
        fs_decisions(df, 0.9, 0.1)
    with pytest.raises(ValueError):
        decision_sql(0.9, 0.1, "p")
