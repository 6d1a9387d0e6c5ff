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


def test_hygiene_stage_cleans_before_dedup(spark):
    """C0: boilerplate strip + intra-doc dedup + PII scrub run before
    hashing, so two docs that differ only in boilerplate/PII/repeats
    collapse as exact duplicates downstream."""
    boiler = "copyright footer nav"
    rows = [
        # docs 0/1: same body, different repeated tail + different PII
        (0, f"{boiler} alpha beta gamma delta alpha beta mail a@x.com", "en"),
        (1, f"{boiler} alpha beta gamma delta gamma delta mail b@y.org", "en"),
        # doc 2: distinct body, shares the boilerplate
        (2, f"{boiler} epsilon zeta eta theta", "en"),
        # doc 3: no boilerplate (keeps boiler words under the 0.9 frac? no —
        # boiler appears in 3/4 = 0.75 >= 0.7 threshold below)
        (3, "iota kappa lambda mu", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    from dedupe_spark.curation import CurationConfig, curate_corpus

    cfg = CurationConfig(
        scrub_pii=True,
        dedup_within_doc=True,
        boilerplate_doc_frac=0.7,
        # newline-free fixture → whitespace-token units (the production
        # default is line units; see test_hygiene_line_units)
        hygiene_unit_sep=r"\s+",
        hygiene_join_sep=" ",
        hot_threshold=8,
        shard_tokens=50,
    )
    out = curate_corpus(spark, docs, cfg)
    hyg = {r["doc_id"]: r["text"] for r in out["hygiene"].collect()}
    # boilerplate gone, repeats collapsed, PII redacted
    assert hyg[0] == "alpha beta gamma delta mail <EMAIL>"
    assert hyg[1] == "alpha beta gamma delta mail <EMAIL>"
    assert hyg[2] == "epsilon zeta eta theta"
    assert hyg[3] == "iota kappa lambda mu"
    # 0 and 1 are now EXACT duplicates: one survives exact dedup
    ids = {r["doc_id"] for r in out["exact"].collect()}
    assert (ids & {0, 1}) == {0} and {2, 3} <= ids
    # shards carry the cleaned text
    shard_text = {r["doc_id"]: r["text"] for r in out["shards"].collect()}
    for d, t in shard_text.items():
        assert "copyright" not in t and "@" not in t.replace("<EMAIL>", "")


def test_semantic_stage_catches_paraphrases(spark, tmp_path):
    """C3.5 (SemDeDup over the embedding column) removes a PARAPHRASE —
    zero token overlap, so C3's Jaccard refine can never see it — while
    the same corpus without semantic_eps keeps both copies. The kept
    representative and all other docs survive unchanged."""
    import numpy as np

    from dedupe_spark.curation import CurationConfig, curate_corpus

    rng = np.random.RandomState(11)
    base = rng.normal(size=8)
    base /= np.linalg.norm(base)
    near = base + rng.normal(scale=0.005, size=8)
    far = rng.normal(size=8)
    rows = [
        # docs 0/1: lexically disjoint paraphrases, same meaning vector
        (0, "the quick brown fox jumps over the lazy dog", "en",
         [float(x) for x in base]),
        (1, "a speedy umber vulpine leaps above an idle canine", "en",
         [float(x) for x in near]),
        # doc 2: unrelated
        (2, "stock markets closed mixed on tuesday afternoon", "en",
         [float(x) for x in far]),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, embedding array<double>"
    )
    base_out = curate_corpus(spark, docs, CurationConfig(shard_tokens=50))
    assert {r["doc_id"] for r in base_out["deduped"].collect()} == {0, 1, 2}

    cfg = CurationConfig(shard_tokens=50, semantic_eps=0.95, semantic_cells=1)
    out = curate_corpus(spark, docs, cfg, scratch_dir=str(tmp_path / "sc"))
    groups = {r["vec_id"]: r for r in out["semantic_groups"].collect()}
    assert groups[0]["group_id"] == groups[1]["group_id"] != groups[2]["group_id"]
    kept = {r["doc_id"] for r in out["semantic"].collect()}
    assert len(kept & {0, 1}) == 1 and 2 in kept
    assert {r["doc_id"] for r in out["shards"].collect()} == kept


def test_semantic_stage_requires_embedding(spark):
    from dedupe_spark.curation import CurationConfig, curate_corpus

    docs = spark.createDataFrame(
        [(0, "text only", "en")], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError, match="embedding"):
        curate_corpus(spark, docs, CurationConfig(semantic_eps=0.9))


def test_hygiene_line_units_default(spark):
    """The DEFAULT hygiene unit is the line (ADVICE r4): a cookie-banner
    line shared across docs is stripped and a repeated line is deduped,
    while repeated WORDS inside a line and stopwords survive untouched —
    token granularity would have corrupted both."""
    banner = "Accept all cookies to continue"
    rows = [
        (0, f"{banner}\nthe cat and the dog and the bird\nrepeat line\nrepeat line", "en"),
        (1, f"{banner}\na totally different body of text", "en"),
        (2, f"{banner}\nthe third document also mentions the cat", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    from dedupe_spark.curation import CurationConfig, curate_corpus

    cfg = CurationConfig(
        dedup_within_doc=True,
        boilerplate_doc_frac=0.9,
        hot_threshold=8,
        shard_tokens=50,
    )
    out = curate_corpus(spark, docs, cfg)
    hyg = {r["doc_id"]: r["text"] for r in out["hygiene"].collect()}
    # banner line (3/3 docs) stripped; repeated line deduped to one copy;
    # intra-line repeated words ("the", "and") and stopwords intact
    assert hyg[0] == "the cat and the dog and the bird\nrepeat line"
    assert hyg[1] == "a totally different body of text"
    assert hyg[2] == "the third document also mentions the cat"
