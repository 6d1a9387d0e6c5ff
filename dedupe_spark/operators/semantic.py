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


def semantic_dedup(
    vectors: DataFrame,
    eps: float = 0.95,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    hot_threshold: int = 1000,
    salt_buckets: int = 16,
    fit_fraction: float = 1.0,
    scratch_dir: str | None = None,
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
    """
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
