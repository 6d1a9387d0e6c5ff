"""Semantic deduplication over an embedding column (SemDeDup shape).

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540): k-means the
embeddings, look for high-cosine pairs ONLY within a cluster, and keep
one representative per duplicate group — the member with the LOWEST
cosine to its cluster centroid (the most atypical copy carries the
most marginal information). This removes paraphrases / templated
rewrites that survive lexical dedup (MinHash/simhash see different
tokens, the embedding space sees the same meaning).

Scale shape (the reason this is cluster-scoped at all):

* the O(n²) cosine search is confined to k-means cells — total work
  Σ|cell|² instead of n², exactly the paper's trick;
* within a cell, candidate pairs route through
  ``operators.pairs.generate_pairs`` — a monster cell (the all-alike
  region every web corpus has) is grid-decomposed across the shuffle
  instead of landing quadratic work on one task;
* duplicate groups are closed transitively with the SAME
  large-star/small-star connected components the ER pipeline uses
  (near-duplicate-ness is not transitive; a greedy pairwise drop is
  order-dependent — see streaming/incremental.py's r4 fix);
* centroids are a driver-side k×dim literal (tiny) broadcast for the
  representative election; no per-row Python anywhere outside the
  seeded k-means fit (pyspark.ml, itself distributed);
* at 10^12 vectors pass ``fit_fraction`` < 1: the quantizer is fit on
  a deterministic hash sample (the faiss/SemDeDup practice — centroid
  quality converges long before a full pass) while assignment still
  covers every vector.

The keep rule is deterministic: min (centroid_cos, vec_id) per
component — ties on the cosine fall back to the smaller id.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dedupe_spark.functions.similarity import cosine_expr
from dedupe_spark.operators.ann import ivf_build
from dedupe_spark.operators.cc import assign_all
from dedupe_spark.operators.pairs import generate_pairs
from dedupe_spark.sources.checkpoints import materialize

# Per-call suffix for the materialized cell-assignment table: two
# concurrent runs sharing a scratch_dir (or overlapping calls in one
# process — the default path is only pid-keyed) must not overwrite each
# other's parquet mid-plan. Same design as curation._SCRATCH_SEQ.
_MAT_SEQ = itertools.count()

# Auto cell sizing: ~10k vectors per cell is the SemDeDup/faiss
# operating point — cells small enough that Σ|cell|² stays tractable,
# few enough that the k×dim centroid table remains a driver-sized
# broadcast literal.
CELL_TARGET = 10_000
MAX_CELLS = 65_536


def auto_n_cells(n_vectors: int) -> int:
    """n_cells ≈ ceil(n / 10k), clamped to [1, 65,536]."""
    return max(1, min(MAX_CELLS, -(-n_vectors // CELL_TARGET)))


def semantic_dedup(
    vectors: DataFrame,
    eps: float = 0.95,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    hot_threshold: int = 1000,
    salt_buckets: int = 16,
    fit_fraction: float = 1.0,
    scratch_dir: str | None = None,
    max_pair_budget: float = 2e11,
) -> DataFrame:
    """(vec_id, group_id, centroid_cos, kept) — semantic-duplicate
    groups (transitive closure of within-cell cosine >= eps) with one
    kept representative per group.

    Rows with ``kept = false`` are the semantic duplicates a curation
    job drops; singleton groups are their own representative.

    ``scratch_dir`` routes the materialized cell-assignment table to
    shared storage — required on a multi-node cluster, where the
    default pid-keyed local tempdir is visible to one machine only
    (same contract as curation.curate_corpus / checkpoints.materialize).

    ``n_cells=None`` (default) sizes the quantizer automatically at
    ~10k vectors/cell (:func:`auto_n_cells`) — a fixed cell count is a
    footgun at 10^12 vectors, where 16 cells would mean 10^22-pair
    cells. ``max_pair_budget`` is the refusal guard behind it: after
    the (linear) assignment pass, if Σ C(|cell|, 2) exceeds the budget
    the call RAISES instead of planning quadratic work that can never
    finish — same design as ``evaluate.pairwise_f1_scalable``'s
    mixed-group refusal. The default budget (2×10^11 candidate pairs)
    is a day-scale cosine workload for a big cluster; raise it
    deliberately, or pass more cells / a finer quantizer.
    """
    if n_cells is None:
        n_cells = auto_n_cells(vectors.count())
    assigned, centroids = ivf_build(
        vectors,
        n_cells=n_cells,
        id_col=id_col,
        vec_col=vec_col,
        seed=seed,
        fit_fraction=fit_fraction,
    )
    # assigned(neighbor_id, v, cell) feeds three plan branches (pair
    # generation twice via generate_pairs' size split + the election);
    # checkpoint-to-scratch so the k-means transform runs once.
    assigned = materialize(
        assigned, f"semdedup_assigned_{next(_MAT_SEQ)}", scratch_dir=scratch_dir
    )

    # Quadratic-work refusal BEFORE any pair planning: one linear
    # groupBy over the materialized assignment (ids only). Double
    # arithmetic on purpose — cell counts at 10^12 vectors overflow
    # bigint when squared, and a guard needs magnitude, not exactness.
    budget = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    ).agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs")
    ).collect()[0]["pairs"] or 0.0
    if budget > max_pair_budget:
        raise ValueError(
            f"semantic_dedup cell layout implies ~{budget:.3g} candidate pairs "
            f"(> max_pair_budget={max_pair_budget:.3g}): the quantizer is too "
            f"coarse for this corpus — increase n_cells (auto target is "
            f"~{CELL_TARGET} vectors/cell), use a finer fit, or raise the "
            "budget deliberately"
        )

    spark = vectors.sparkSession
    cent = F.broadcast(
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "cell int, cv array<double>",
        )
    )
    members = assigned.join(cent, "cell").select(
        F.col("neighbor_id").alias("vec_id"),
        "v",
        cosine_expr(F.col("v"), F.col("cv")).alias("centroid_cos"),
    )

    keys = assigned.select(
        F.col("neighbor_id").alias("doc_id"), F.col("cell").cast("string").alias("block_key")
    )
    pairs, _capped = generate_pairs(keys, hot_threshold=hot_threshold, salt_buckets=salt_buckets)
    v1 = assigned.select(F.col("neighbor_id").alias("id1"), F.col("v").alias("v1"))
    v2 = assigned.select(F.col("neighbor_id").alias("id2"), F.col("v").alias("v2"))
    edges = (
        pairs.join(v1, "id1")
        .join(v2, "id2")
        .where(cosine_expr(F.col("v1"), F.col("v2")) >= eps)
        .select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    )

    nodes = members.select(F.col("vec_id").alias("node"))
    comp = assign_all(nodes, edges).select(
        F.col("node").alias("vec_id"), F.col("cluster_id").alias("group_id")
    )
    w = Window.partitionBy("group_id").orderBy(F.asc("centroid_cos"), F.asc("vec_id"))
    return (
        members.join(comp, "vec_id")
        .withColumn("kept", F.row_number().over(w) == 1)
        .select("vec_id", "group_id", F.round("centroid_cos", 6).alias("centroid_cos"), "kept")
    )
