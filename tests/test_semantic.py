"""SemDeDup-style semantic dedup: planted paraphrase groups vs a
global-threshold union-find oracle (numpy, no Spark)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.semantic import semantic_dedup

DIM = 16
EPS = 0.9


def _planted(seed: int = 3, n_groups: int = 4, group_size: int = 3, n_loners: int = 8):
    """Well-separated unit-norm group centers; members are tiny
    perturbations (cos >> EPS within a group, << EPS across)."""
    rng = np.random.RandomState(seed)
    vecs: list[tuple[int, list[float]]] = []
    truth: dict[int, int] = {}
    vid = 0
    for g in range(n_groups):
        base = rng.normal(size=DIM)
        base /= np.linalg.norm(base)
        for _ in range(group_size):
            v = base + rng.normal(scale=0.01, size=DIM)
            vecs.append((vid, [float(x) for x in v]))
            truth[vid] = g
            vid += 1
    for _ in range(n_loners):
        v = rng.normal(size=DIM)
        vecs.append((vid, [float(x) for x in v]))
        truth[vid] = -vid  # unique
        vid += 1
    return vecs, truth


def _oracle_components(vecs) -> dict[int, int]:
    """Union-find over GLOBAL pairwise cosine >= EPS (no clustering) —
    equals the cluster-scoped result when groups are well-separated."""
    ids = [i for i, _ in vecs]
    X = np.array([v for _, v in vecs])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sim = Xn @ Xn.T
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            if sim[a, b] >= EPS:
                ra, rb = find(ids[a]), find(ids[b])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


@pytest.fixture(scope="module")
def planted(spark):
    vecs, truth = _planted()
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, eps=EPS, n_cells=4, seed=7).collect()
    return vecs, truth, out


def test_groups_match_global_oracle(planted):
    vecs, _truth, out = planted
    oracle = _oracle_components(vecs)
    got = {r["vec_id"]: r["group_id"] for r in out}
    assert len(got) == len(vecs)
    # same partition (group ids are min-member on both sides)
    assert got == oracle


def test_exactly_one_kept_per_group_and_loners_kept(planted):
    vecs, truth, out = planted
    by_group: dict[int, list] = {}
    for r in out:
        by_group.setdefault(r["group_id"], []).append(r)
    for members in by_group.values():
        assert sum(1 for m in members if m["kept"]) == 1
    # every loner is its own kept singleton
    loners = {i for i, g in truth.items() if g < 0}
    for r in out:
        if r["vec_id"] in loners:
            assert r["kept"] and r["group_id"] == r["vec_id"]


def test_keep_rule_is_min_centroid_cos(planted):
    _vecs, _truth, out = planted
    by_group: dict[int, list] = {}
    for r in out:
        by_group.setdefault(r["group_id"], []).append(r)
    for members in by_group.values():
        expected = min(members, key=lambda m: (m["centroid_cos"], m["vec_id"]))
        kept = next(m for m in members if m["kept"])
        assert kept["vec_id"] == expected["vec_id"]


def test_partitioning_invariance(spark, planted):
    vecs, _truth, out = planted
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>").repartition(7)
    out2 = semantic_dedup(df, eps=EPS, n_cells=4, seed=7).collect()
    key = lambda r: (r["vec_id"], r["group_id"], r["centroid_cos"], r["kept"])  # noqa: E731
    assert sorted(map(key, out)) == sorted(map(key, out2))


def test_sample_fit_quantizer_same_groups(spark, planted):
    """fit_fraction < 1 (the 10^12-row practice: fit the quantizer on
    a hash sample, assign everything) must not change the duplicate
    groups — members of a tight paraphrase ball land in one cell under
    any reasonable centroid set."""
    vecs, _truth, out = planted
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out2 = semantic_dedup(df, eps=EPS, n_cells=4, seed=7, fit_fraction=0.6).collect()
    groups1 = {r["vec_id"]: r["group_id"] for r in out}
    groups2 = {r["vec_id"]: r["group_id"] for r in out2}
    assert groups1 == groups2


def test_scratch_dir_routes_materialized_cells(spark, planted, tmp_path):
    """scratch_dir= must route the checkpointed cell-assignment table to
    the given (shared-storage) path — the multi-node contract — and the
    output must be unchanged."""
    vecs, _truth, out = planted
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    scratch = str(tmp_path / "sem_scratch")
    out2 = semantic_dedup(df, eps=EPS, n_cells=4, seed=7, scratch_dir=scratch).collect()
    key = lambda r: (r["vec_id"], r["group_id"], r["centroid_cos"], r["kept"])  # noqa: E731
    assert sorted(map(key, out)) == sorted(map(key, out2))
    import os

    # name carries a per-call sequence suffix (concurrent runs sharing a
    # scratch_dir must not overwrite each other's parquet mid-plan)
    assert any(n.startswith("semdedup_assigned_") for n in os.listdir(scratch))


def test_auto_n_cells_heuristic():
    """n_cells=None sizes at ~10k vectors/cell (SemDeDup/faiss
    practice), clamped to a driver-broadcastable centroid table."""
    from dedupe_spark.operators.semantic import MAX_CELLS, auto_n_cells

    assert auto_n_cells(1) == 1
    assert auto_n_cells(10_000) == 1
    assert auto_n_cells(10_001) == 2
    assert auto_n_cells(1_000_000) == 100
    assert auto_n_cells(10**12) == MAX_CELLS  # clamp: 10^8 would exceed


def test_auto_cells_output_matches_explicit(spark, planted):
    """The auto default must produce the same GROUPS as explicit cell
    counts on the planted corpus (well-separated groups land intact in
    any cell layout; CC closes them identically). The kept
    representative is cell-layout-dependent BY DESIGN (most atypical
    vs the cell centroid) — assert exactly one per group instead."""
    vecs, _truth, out = planted  # explicit n_cells=4
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    key = lambda r: (r["vec_id"], r["group_id"])  # noqa: E731
    for run in (
        semantic_dedup(df, eps=EPS, seed=7).collect(),  # auto → 1 cell here
        semantic_dedup(df, eps=EPS, n_cells=2, seed=7).collect(),
    ):
        assert sorted(map(key, run)) == sorted(map(key, out))
        kept_per_group: dict[int, int] = {}
        for r in run:
            kept_per_group[r["group_id"]] = kept_per_group.get(r["group_id"], 0) + (
                1 if r["kept"] else 0
            )
        assert all(v == 1 for v in kept_per_group.values())


def test_pair_budget_refusal(spark, planted):
    """A quantizer too coarse for the corpus must RAISE after the linear
    assignment pass — before any quadratic pair planning (mirrors
    pairwise_f1_scalable's refusal design)."""
    vecs, _truth, _ = planted
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="candidate pairs"):
        semantic_dedup(df, eps=EPS, n_cells=1, seed=7, max_pair_budget=10)
