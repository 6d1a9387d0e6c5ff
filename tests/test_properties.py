"""Hypothesis property tests for the pure scalar functions (SURVEY.md
§5.2.6 randomized invariants). Pure-Python only — no SparkSession —
so hundreds of examples stay fast."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dedupe_spark.functions.hashing import (
    _shingle_hashes,
    content_sketches,
    minhash_signature,
    simhash64,
)
from dedupe_spark.functions.similarity import jaro_winkler, tfidf_cosine, token_jaccard
from dedupe_spark.operators.extract import extract_text

words = st.text(alphabet="abcdef", min_size=1, max_size=6)
texts = st.lists(words, min_size=0, max_size=40).map(" ".join)
short = st.text(alphabet="abcde ", max_size=20)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(short, short)
def test_jaro_winkler_matches_duckdb_property(s1, s2):
    want = duckdb.sql(
        "select jaro_winkler_similarity(?, ?)", params=[s1, s2]
    ).fetchone()[0]
    assert jaro_winkler(s1, s2) == pytest.approx(want, abs=1e-9)


@settings(max_examples=100, deadline=None, derandomize=True)
@given(texts, texts)
def test_jaccard_symmetric_bounded(t1, t2):
    j = token_jaccard(t1, t2)
    assert 0.0 <= j <= 1.0
    assert j == token_jaccard(t2, t1)
    assert token_jaccard(t1, t1) == 1.0


@settings(max_examples=100, deadline=None, derandomize=True)
@given(texts, texts)
def test_shingle_hash_jaccard_equals_string_jaccard(t1, t2):
    """The vectorized 64-bit shingle hashing must preserve shingle-set
    identity: hash-set Jaccard == string-shingle Jaccard."""
    a, b = set(_shingle_hashes(t1).tolist()), set(_shingle_hashes(t2).tolist())
    if not a and not b:
        hash_j = 1.0
    else:
        u = len(a | b)
        hash_j = len(a & b) / u if u else 0.0
    assert hash_j == pytest.approx(token_jaccard(t1, t2))


@settings(max_examples=100, deadline=None, derandomize=True)
@given(texts)
def test_sketches_deterministic_and_consistent(t):
    sig, sh = content_sketches(t)
    sig2, sh2 = content_sketches(t)
    assert sig == sig2 and sh == sh2
    assert sig == minhash_signature(t).tolist()
    assert sh == simhash64(t)


@settings(max_examples=100, deadline=None, derandomize=True)
@given(texts, texts)
def test_tf_cosine_bounds_symmetry(t1, t2):
    c = tfidf_cosine(t1, t2)
    assert -1e-9 <= c <= 1.0 + 1e-9
    assert c == pytest.approx(tfidf_cosine(t2, t1))
    assert tfidf_cosine(t1, t1) == pytest.approx(1.0)


html_bytes = st.binary(max_size=300)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(html_bytes)
def test_extract_total_and_deterministic(b):
    """Extraction never raises on arbitrary bytes and is a pure function."""
    out = extract_text(b)
    assert out == extract_text(b)
    assert "\n" not in out and "  " not in out  # whitespace collapsed
