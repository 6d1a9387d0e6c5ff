"""Pairwise F1 evaluation on labeled pairs sharing a blocking key.

BASELINE.json metric: "pairwise-match F1 ≥ 0.99 on labeled same-block
pairs". A labeled pair = two docs sharing ≥1 blocking key (content-md5
key or an LSH/simhash key of their representatives); label = planted
truth (same truth_key); prediction = same final cluster_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_level_keys(exact: DataFrame, rep_keys: DataFrame) -> DataFrame:
    """Doc-level blocking keys: the content-md5 key plus the doc's
    representative's sketch keys. exact = s2 stage output."""
    md5_keys = exact.select(
        "doc_id", F.concat(F.lit("md5:"), F.col("content_md5")).alias("block_key")
    )
    sketch = (
        exact.select("doc_id", "rep_id")
        .join(rep_keys.withColumnRenamed("doc_id", "rep_id"), "rep_id")
        .select("doc_id", "block_key")
    )
    return md5_keys.unionByName(sketch).distinct()


def labeled_same_block_pairs(doc_keys: DataFrame, truth: DataFrame) -> DataFrame:
    """Pairs sharing ≥1 key, labeled by planted truth.

    truth = (doc_id, truth_key); singletons never match.
    """
    a = doc_keys.alias("a")
    b = doc_keys.alias("b")
    pairs = (
        a.join(b, "block_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .distinct()
    )
    t1 = truth.select(F.col("doc_id").alias("id1"), F.col("truth_key").alias("tk1"))
    t2 = truth.select(F.col("doc_id").alias("id2"), F.col("truth_key").alias("tk2"))
    return (
        pairs.join(t1, "id1")
        .join(t2, "id2")
        .withColumn(
            "is_match",
            (F.col("tk1") == F.col("tk2")) & ~F.col("tk1").startswith("single:"),
        )
        .select("id1", "id2", "is_match")
    )


def pairwise_f1(labeled: DataFrame, clusters: DataFrame) -> dict[str, float]:
    """Precision/recall/F1 of 'same final cluster' vs labels."""
    c1 = clusters.select(F.col("doc_id").alias("id1"), F.col("cluster_id").alias("c1"))
    c2 = clusters.select(F.col("doc_id").alias("id2"), F.col("cluster_id").alias("c2"))
    scored = (
        labeled.join(c1, "id1")
        .join(c2, "id2")
        .withColumn("pred", F.col("c1") == F.col("c2"))
    )
    agg = scored.agg(
        F.sum(F.when(F.col("pred") & F.col("is_match"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("is_match"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("is_match"), 1).otherwise(0)).alias("fn"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    tp, fp, fn = int(agg["tp"]), int(agg["fp"]), int(agg["fn"])
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "n_labeled_pairs": int(agg["n"]),
    }
