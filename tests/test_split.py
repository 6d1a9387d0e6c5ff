"""hash_split: determinism, fraction accuracy, duplicate co-placement,
salt rotation, validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.split import GRANULARITY, hash_split, stratified_hash_sample


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"document body number {i} with some words") for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_split_deterministic_across_parallelism_and_order(spark, docs):
    a = hash_split(docs, "text")
    b = hash_split(docs.repartition(17).orderBy(F.desc("doc_id")), "text")
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_split_fractions_approximately_hold(spark, docs):
    out = hash_split(docs, "text", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    n = sum(counts.values())
    assert n == 2000
    assert abs(counts["train"] / n - 0.8) < 0.05
    assert abs(counts["val"] / n - 0.1) < 0.03
    assert abs(counts["test"] / n - 0.1) < 0.03


def test_exact_duplicates_land_in_same_split(spark):
    rows = [(i, f"body {i % 50}") for i in range(500)]  # 10 copies each
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n_violations = (
        hash_split(df, "text")
        .groupBy("text")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert n_violations == 0


def test_salt_rotates_assignment(spark, docs):
    # 50/50 so a salt change has maximal visible effect (~half move);
    # under 98/1/1 most rows stay 'train' under any salt by mass
    halves = {"a": 0.5, "b": 0.5}
    a = hash_split(docs, "text", halves, salt="")
    b = hash_split(docs, "text", halves, salt="epoch-2")
    moved = (
        a.select("doc_id", F.col("split").alias("s1"))
        .join(b.select("doc_id", F.col("split").alias("s2")), "doc_id")
        .where(F.col("s1") != F.col("s2"))
        .count()
    )
    assert moved > 100  # a different salt reshuffles a large share


def test_split_boundaries_are_exact_buckets(spark):
    # a 2-way 50/50 split must cut exactly at GRANULARITY/2
    from dedupe_spark.operators.split import split_bucket

    df = spark.createDataFrame([(f"k{i}",) for i in range(3000)], "k string")
    out = hash_split(df, "k", {"a": 0.5, "b": 0.5}).withColumn(
        "bucket", split_bucket(F.col("k"))
    )
    bad = out.where(
        ((F.col("bucket") < GRANULARITY // 2) & (F.col("split") != "a"))
        | ((F.col("bucket") >= GRANULARITY // 2) & (F.col("split") != "b"))
    ).count()
    assert bad == 0


@pytest.fixture(scope="module")
def strat_docs(spark):
    rows = [
        (i, "en" if i % 4 else "fr", f"stratified sample body {i} words") for i in range(4000)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string").cache()


def test_stratified_sample_rates_hold_per_stratum(spark, strat_docs):
    out = stratified_hash_sample(strat_docs, "text", "lang", {"en": 0.25})
    kept = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert kept["fr"] == 1000  # default_rate=1.0 keeps every fr row
    assert abs(kept["en"] / 3000 - 0.25) < 0.05


def test_stratified_sample_deterministic_across_parallelism(spark, strat_docs):
    a = stratified_hash_sample(strat_docs, "text", "lang", {"en": 0.3, "fr": 0.6})
    b = stratified_hash_sample(
        strat_docs.repartition(13).orderBy(F.desc("doc_id")), "text", "lang",
        {"en": 0.3, "fr": 0.6},
    )
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_stratified_sample_is_subset_monotone_in_rate(spark, strat_docs):
    # raising a stratum's rate only ever ADDS rows (same bucket, higher
    # threshold) — the property incremental reruns rely on
    lo = stratified_hash_sample(strat_docs, "text", "lang", {"en": 0.2})
    hi = stratified_hash_sample(strat_docs, "text", "lang", {"en": 0.5})
    assert lo.subtract(hi).count() == 0
    assert hi.count() > lo.count()


def test_stratified_sample_duplicates_decided_together(spark):
    rows = [(i, "en", f"dup body {i % 40}") for i in range(400)]  # 10 copies each
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = stratified_hash_sample(df, "text", "lang", {"en": 0.5})
    # every surviving text retains all 10 of its copies
    bad = out.groupBy("text").count().where(F.col("count") != 10).count()
    assert bad == 0


def test_stratified_sample_validation(spark, strat_docs):
    with pytest.raises(ValueError):
        stratified_hash_sample(strat_docs, "text", "lang", {"en": 1.5})
    with pytest.raises(ValueError):
        stratified_hash_sample(strat_docs, "text", "lang", {}, default_rate=-0.1)


def test_split_validation(spark, docs):
    with pytest.raises(ValueError):
        hash_split(docs, "text", {"train": 1.0})
    with pytest.raises(ValueError):
        hash_split(docs, "text", {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError):
        hash_split(docs, "text", {"a": 1.5, "b": -0.5})


def test_null_key_gets_null_split(spark):
    """ADVICE r3: a NULL-key row must get a NULL split, never silently
    land in the last-named split and contaminate the eval side."""
    df = spark.createDataFrame(
        [(1, "body one"), (2, None), (3, "body three")],
        "doc_id long, text string",
    )
    out = hash_split(df, "text", {"train": 0.8, "val": 0.1, "test": 0.1})
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert got[2] is None
    assert got[1] is not None and got[3] is not None
