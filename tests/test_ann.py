"""ANN: brute-force exactness vs numpy; LSH recall vs brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.ann import brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    # 20 clusters of 10 similar vectors: cluster center + small noise
    rows = []
    vid = 0
    for c in range(20):
        center = rng.normal(size=16)
        for _ in range(10):
            v = center + rng.normal(scale=0.1, size=16)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int").cache()
    df.count()
    return df, rows


def test_brute_force_matches_numpy(vectors):
    df, rows = vectors
    queries = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = brute_force_topk(df, queries, k=5)
    res = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in got.collect()}
    X = np.array([r[1] for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    for q in range(3):
        sims = Xn @ Xn[q]
        sims[q] = -np.inf
        order = sorted(range(len(sims)), key=lambda i: (-sims[i], i))[:5]
        for rank, nid in enumerate(order, 1):
            assert res[(q, rank)] == nid


def test_lsh_recall_vs_brute_force(vectors):
    df, _ = vectors
    queries = df.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(df, queries, k=5)
    approx = lsh_topk(df, queries, k=5, dim=16, n_tables=12, n_bits=8)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # clustered data + 12 tables of 8 bits: near-neighbors collide
    assert recall >= 0.8, f"LSH recall {recall:.2f}"


def test_ivf_recall_vs_brute_force(vectors):
    from dedupe_spark.operators.ann import ivf_build, ivf_topk

    df, _ = vectors
    assigned, centroids = ivf_build(df, n_cells=10)
    assigned = assigned.cache()
    queries = df.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(df, queries, k=5)
    approx = ivf_topk(assigned, centroids, queries, k=5, n_probe=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assigned.unpersist()
    # clustered data: a query's true neighbors share its k-means cell
    assert recall >= 0.9, f"IVF recall {recall:.2f}"


def test_lsh_candidates_scored_exactly(vectors):
    """Every (query, neighbor) the LSH path returns must carry the
    exact cosine (same value as brute force computes)."""
    df, _ = vectors
    queries = df.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        r["neighbor_id"]: r["cos_sim"]
        for r in brute_force_topk(df, queries, k=199).collect()
    }
    for r in lsh_topk(df, queries, k=5, dim=16).collect():
        assert r["cos_sim"] == pytest.approx(exact[r["neighbor_id"]], rel=1e-12)


def test_lsh_near_dup_pairs_recall(vectors):
    """The LSH-bucketed all-pairs near-dup path must recover ≥0.9 of
    the brute-force pairs at the same threshold, with exact cosines."""
    from dedupe_spark.operators.ann import lsh_near_dup_pairs

    df, rows = vectors
    X = np.array([r[1] for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    want = {
        (i, j): S[i, j]
        for i in range(len(rows))
        for j in range(i + 1, len(rows))
        if S[i, j] >= 0.9
    }
    got = {
        (r["id1"], r["id2"]): r["cos_sim"]
        for r in lsh_near_dup_pairs(
            df, threshold=0.9, dim=16, n_tables=12, n_bits=8
        ).collect()
    }
    assert want, "fixture must plant near-dup pairs"
    recall = len(set(want) & set(got)) / len(want)
    assert recall >= 0.9, f"near-dup recall {recall:.2f}"
    # no false positives below threshold, and cosines are exact
    for k, v in got.items():
        assert v >= 0.9
        assert v == pytest.approx(S[k[0], k[1]], rel=1e-12)


def test_lsh_near_dup_no_cartesian(vectors):
    from dedupe_spark.operators.ann import lsh_near_dup_pairs

    df, _ = vectors
    plan = (
        lsh_near_dup_pairs(df, threshold=0.9, dim=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
