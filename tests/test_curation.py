"""curate_corpus: planted exact dups, near dups, junk docs, and shard
budgets — plus determinism across partitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.curation import CurationConfig, curate_corpus

WORDS = (
    "the quick brown fox jumps over a lazy dog and then runs far away "
    "to find some good food in the old forest near a small river bank"
).split()


def long_text(seed: int) -> str:
    # 40 tokens, stopword-bearing, deterministic per seed; random word
    # order per seed so distinct seeds share almost no 3-shingles (a
    # cyclic rotation would make every doc a Jaccard-1.0 near-dup)
    import random

    rnd = random.Random(seed)
    return " ".join(rnd.choice(WORDS) for _ in range(40))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # 30 distinct base docs (en/de alternating)
    for i in range(30):
        rows.append((i, long_text(i), "en" if i % 2 else "de"))
    # exact duplicates of doc 0 (higher doc ids → doc 0 survives)
    rows += [(100 + k, long_text(0), "en") for k in range(3)]
    # near duplicates of doc 1: one appended token (token-3-shingle
    # Jaccard ≈ 0.93 ≥ 0.8)
    rows += [(200 + k, long_text(1) + f" extra{k}", "en") for k in range(2)]
    # junk: distinct 5-token fragments (quality well below the base docs)
    rows += [(300 + k, " ".join(WORDS[k : k + 5]), "en") for k in range(4)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string").cache()


@pytest.fixture(scope="module")
def curated(spark, corpus):
    cfg = CurationConfig(keep_top=0.7, shard_tokens=300, hot_threshold=8)
    return curate_corpus(spark, corpus, cfg)


def test_exact_dups_collapse_to_best_copy(curated):
    ids = {r["doc_id"] for r in curated["exact"].collect()}
    assert 0 in ids and not ids & {100, 101, 102}


def test_near_dups_suppressed(curated):
    ids = {r["doc_id"] for r in curated["deduped"].collect()}
    # doc 1 and its two appended-token variants form one cluster; the
    # highest-quality (tie → lowest id) survives
    assert 1 in ids and not ids & {200, 201}
    # unrelated base docs all survive
    assert set(range(2, 30)) <= ids


def test_quality_gate_drops_junk_first(curated):
    ids = {r["doc_id"] for r in curated["gated"].collect()}
    assert not ids & {300, 301, 302, 303}
    assert set(range(30)) <= ids  # every base doc outranks the junk


def test_shard_budgets_and_exactness(curated):
    rows = curated["shards"].select("doc_id", "n_tokens", "shard_id").collect()
    naive, cume = {}, 0
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        naive[r["doc_id"]] = cume // 300
        cume += r["n_tokens"]
    assert {r["doc_id"]: r["shard_id"] for r in rows} == naive
    report = {r["shard_id"]: r["total_tokens"] for r in curated["shard_report"].collect()}
    assert len(report) >= 2  # the budget actually splits the corpus


def test_deterministic_across_partitioning(spark, corpus, curated):
    cfg = CurationConfig(keep_top=0.7, shard_tokens=300, hot_threshold=8)
    again = curate_corpus(
        spark, corpus.repartition(13).orderBy(F.desc("doc_id")), cfg
    )
    a = sorted(map(tuple, curated["shards"].select("doc_id", "shard_id").collect()))
    b = sorted(map(tuple, again["shards"].select("doc_id", "shard_id").collect()))
    assert a == b


def test_scratch_dir_routing(spark, corpus, tmp_path):
    """scratch_dir must route the materialized intermediates to the
    given (shared-storage) path — the multi-node contract (ADVICE r3);
    result identical to the default local-tempdir path."""
    import os

    sd = str(tmp_path / "shared_scratch")
    out = curate_corpus(spark, corpus, scratch_dir=sd)
    got = sorted(map(tuple, out["shards"].select("doc_id", "shard_id").collect()))
    names = os.listdir(sd)
    assert any(n.startswith("curation_exact_") for n in names)
    assert any(n.startswith("curation_counted_") for n in names)
    base = curate_corpus(spark, corpus)
    want = sorted(map(tuple, base["shards"].select("doc_id", "shard_id").collect()))
    assert got == want
