"""Blocking: the ≥2 gate ≡ GROUP BY ... HAVING count>=2 (reference
facet.mincount=2, Dedupe.java:67-72), and recall of planted near-dups."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_spark.operators.blocking import block_keys, block_sizes, surviving_blocks
from dedupe_spark.operators.extract import extract_docs


def test_surviving_blocks_is_group_having(spark):
    keys = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c"), (5, "c"), (6, "c")],
        "doc_id long, block_key string",
    )
    got = {(r["block_key"], r["copies"]) for r in surviving_blocks(keys).collect()}
    assert got == {("a", 2), ("c", 3)}
    assert block_sizes(keys).count() == 3


def test_block_keys_families(spark):
    docs = spark.createDataFrame(
        [(1, "https://x.com/a", "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, url string, text string",
    )
    keys = block_keys(docs, use_minhash=True, use_simhash=True, use_ngrams=True, use_domain=True)
    fams = {
        r["block_key"].split(":")[0][:2]
        for r in keys.select("block_key").collect()
    }
    assert "mh" in fams and "sh" in fams and "do" in fams


def test_near_duplicates_share_a_block(spark, corpus):
    """Every planted near-dup cluster's members must collide in ≥1
    LSH/simhash block — blocking recall on the synthetic corpus."""
    docs = extract_docs(corpus).join(
        corpus.select("url", "truth_key"), "url"
    )
    near = docs.where(F.col("truth_key").startswith("near:"))
    keys = block_keys(near.select("doc_id", "text"))
    with_truth = keys.join(near.select("doc_id", "truth_key"), "doc_id")
    # for each truth cluster: at least one key shared by >= cluster size docs?
    cluster_sizes = near.groupBy("truth_key").count().withColumnRenamed("count", "size")
    per_key = (
        with_truth.groupBy("truth_key", "block_key")
        .agg(F.countDistinct("doc_id").alias("n"))
        .groupBy("truth_key")
        .agg(F.max("n").alias("best"))
        .join(cluster_sizes, "truth_key")
    )
    # all members of ≥90% of clusters share one block; every cluster has ≥2 colliding
    bad = per_key.where(F.col("best") < 2).count()
    assert bad == 0
    full = per_key.where(F.col("best") == F.col("size")).count()
    total = per_key.count()
    assert full / total >= 0.9


def test_approx_count_distinct_cluster_cardinality(spark, corpus):
    """SURVEY §2.4 target add: approx_count_distinct as the cheap
    cluster-cardinality sanity probe — must land within 5% of exact."""
    from pyspark.sql import functions as F

    from dedupe_spark.functions.text import content_hash
    from dedupe_spark.operators.extract import extract_docs

    docs = extract_docs(corpus).select(content_hash(F.col("text")).alias("h"))
    exact = docs.select(F.countDistinct("h")).collect()[0][0]
    approx = docs.select(F.approx_count_distinct("h", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.05, (approx, exact)
