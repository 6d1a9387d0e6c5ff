"""Similarity feature oracles: Jaro-Winkler vs DuckDB, Jaccard by
hand, JVM-side cosine vs numpy (SURVEY.md §5.2.2)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from dedupe_spark.functions.similarity import (
    cosine_expr,
    jaro_winkler,
    token_jaccard,
    tfidf_cosine,
)

JW_CASES = [
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("jellyfish", "smellyfish"),
    ("", ""),
    ("abc", ""),
    ("exact", "exact"),
    ("a", "b"),
    ("the quick brown fox", "the quick brown dog"),
]


@pytest.mark.parametrize("s1,s2", JW_CASES)
def test_jaro_winkler_matches_duckdb(s1, s2):
    want = duckdb.sql(
        "select jaro_winkler_similarity(?, ?)", params=[s1, s2]
    ).fetchone()[0]
    assert jaro_winkler(s1, s2) == pytest.approx(want, abs=1e-9)


def test_token_jaccard_hand_cases():
    assert token_jaccard("a b c d", "a b c d") == 1.0
    assert token_jaccard("", "") == 1.0
    assert token_jaccard("a b c", "x y z") == 0.0
    # shingles of width 3: {a b c, b c d} vs {a b c, b c x} → 1/3
    assert token_jaccard("a b c d", "a b c x") == pytest.approx(1 / 3)


def test_tfidf_cosine_bounds():
    assert tfidf_cosine("same text here okay", "same text here okay") == pytest.approx(1.0)
    assert tfidf_cosine("aaa bbb ccc", "xxx yyy zzz") == pytest.approx(0.0)
    assert tfidf_cosine("", "") == 1.0
    assert tfidf_cosine("a", "") == 0.0


def test_cosine_expr_matches_numpy(spark):
    rng = np.random.default_rng(0)
    rows = []
    for _ in range(5):
        v1 = rng.normal(size=8).tolist()
        v2 = rng.normal(size=8).tolist()
        rows.append((v1, v2))
    df = spark.createDataFrame(rows, "v1 array<double>, v2 array<double>")
    got = [r["c"] for r in df.select(cosine_expr(F.col("v1"), F.col("v2")).alias("c")).collect()]
    for (v1, v2), g in zip(rows, got):
        a, b = np.array(v1), np.array(v2)
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert g == pytest.approx(want, rel=1e-9)


# ---------------------------------------------------------------------------
# Global-IDF TF-IDF (SURVEY §2.8 HashingTF+IDF target; VERDICT r2 #6)
# ---------------------------------------------------------------------------

def _hand_idf(texts):
    """Independent IDF oracle: zlib-crc32 hashing + ml.feature.IDF's
    smoothed formula, computed with plain dicts."""
    import zlib

    import numpy as np

    from dedupe_spark.functions.similarity import TF_DIM

    m = len(texts)
    df: dict[int, int] = {}
    for t in texts:
        for b in {zlib.crc32(tok.encode()) % TF_DIM for tok in t.split()}:
            df[b] = df.get(b, 0) + 1
    idf = np.full(TF_DIM, np.log(m + 1.0))
    for b, d in df.items():
        idf[b] = np.log((m + 1.0) / (d + 1.0))
    return idf


def test_compute_idf_matches_hand_oracle(spark):
    import numpy as np

    from dedupe_spark.functions.similarity import compute_idf

    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a completely different document entirely",
        "the cat and the dog",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = compute_idf(docs)
    want = _hand_idf(texts)
    assert np.allclose(got, want), np.abs(got - want).max()


def test_global_tfidf_cosine_matches_hand_oracle(spark):
    import zlib

    import numpy as np

    from dedupe_spark.functions.similarity import (
        TF_DIM,
        compute_idf,
        tfidf_cosine_global_udf,
    )

    texts = [
        "the cat sat on the mat",
        "the cat sat on the hat",
        "unrelated text about spark shuffles",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    idf = compute_idf(docs)

    def hand_vec(t):
        counts: dict[int, int] = {}
        for tok in t.split():
            b = zlib.crc32(tok.encode()) % TF_DIM
            counts[b] = counts.get(b, 0) + 1
        return {b: (1.0 + np.log(c)) * idf[b] for b, c in counts.items()}

    def hand_cos(t1, t2):
        v1, v2 = hand_vec(t1), hand_vec(t2)
        dot = sum(w * v2[k] for k, w in v1.items() if k in v2)
        n1 = np.sqrt(sum(w * w for w in v1.values()))
        n2 = np.sqrt(sum(w * w for w in v2.values()))
        return dot / (n1 * n2)

    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(
        [(texts[0], texts[1]), (texts[0], texts[2]), (texts[0], texts[0])],
        "text1 string, text2 string",
    )
    udf = tfidf_cosine_global_udf(idf, spark.sparkContext)
    got = [r["c"] for r in pairs.select(udf(F.col("text1"), F.col("text2")).alias("c")).collect()]
    want = [hand_cos(texts[0], texts[1]), hand_cos(texts[0], texts[2]), 1.0]
    assert np.allclose(got, want, atol=1e-12), (got, want)
    # IDF must actually matter: shared-stopword pair scores lower under
    # global weighting than under the pair-local log-TF cosine
    from dedupe_spark.functions.similarity import tfidf_cosine

    assert got[0] < tfidf_cosine(texts[0], texts[1])


def test_pipeline_global_idf_flag(spark, corpus, tmp_path):
    """use_global_idf=True runs end-to-end and reproduces the planted
    clusters (the comparator stays robust under corpus weighting)."""
    from dedupe_spark.pipeline import PipelineConfig, run_pipeline

    sub = corpus.limit(200).cache()
    out_g = run_pipeline(
        spark, sub, str(tmp_path / "wd_idf"), config=PipelineConfig(use_global_idf=True)
    )
    out_d = run_pipeline(spark, sub, str(tmp_path / "wd_def"))
    a = {(r["doc_id"], r["cluster_id"]) for r in out_g["s7_clusters"].collect()}
    b = {(r["doc_id"], r["cluster_id"]) for r in out_d["s7_clusters"].collect()}
    assert a == b
    # the feature itself must differ from the pair-local one somewhere
    ga = {(r["id1"], r["id2"]): r["tf_cosine"] for r in out_g["s5_scored"].collect()}
    gb = {(r["id1"], r["id2"]): r["tf_cosine"] for r in out_d["s5_scored"].collect()}
    assert ga.keys() == gb.keys() and any(abs(ga[k] - gb[k]) > 1e-9 for k in ga)
