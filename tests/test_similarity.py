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
