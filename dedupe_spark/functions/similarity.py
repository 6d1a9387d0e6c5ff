"""Pairwise similarity features (SURVEY.md §2.8 target additions).

Levenshtein stays JVM-side (built-in ``F.levenshtein`` — codegen'd).
Jaro-Winkler, token-Jaccard, and hashed-TF cosine run as Arrow-batched
pandas UDFs over (text1, text2) pairs — the reference's analog is the
in-block MD5 computation (Dedupe.java:104-113): the expensive feature
evaluated only on block-surviving candidates.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Standard Jaro-Winkler similarity (Winkler '90).

    Matches DuckDB's ``jaro_winkler_similarity`` (verified in tests) so
    the oracle can cross-check feature values exactly.
    """
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0  # DuckDB convention: empty vs anything (incl. empty) = 0
    if s1 == s2:
        return 1.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    flags2 = [False] * l2
    matches1 = []
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags2[j] = True
                matches1.append((i, j))
                break
    m = len(matches1)
    if m == 0:
        return 0.0
    # transpositions: matched chars of s2 in order of their s1 match
    s2_matched = [s2[j] for _, j in sorted(matches1, key=lambda t: t[0])]
    s2_in_order = [s2[j] for j in sorted(j for _, j in matches1)]
    # RapidFuzz/DuckDB convention: t = floor(differing positions / 2)
    t = sum(a != b for a, b in zip(s2_matched, s2_in_order)) // 2
    jaro = (m / l1 + m / l2 + (m - t) / m) / 3
    if jaro <= 0.7:  # Winkler boost threshold (DuckDB-compatible)
        return jaro
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return jaro + prefix * prefix_weight * (1 - jaro)


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    return pd.Series(
        [jaro_winkler(a or "", b or "") for a, b in zip(s1, s2)], dtype="float64"
    )


def token_jaccard(t1: str, t2: str, width: int = 3) -> float:
    """Jaccard over distinct word w-shingles."""

    def sh(t: str) -> set:
        toks = t.split()
        if len(toks) < width:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i : i + width]) for i in range(len(toks) - width + 1)}

    a, b = sh(t1), sh(t2)
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


@F.pandas_udf(T.DoubleType())
def token_jaccard_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    return pd.Series(
        [token_jaccard(a or "", b or "") for a, b in zip(s1, s2)], dtype="float64"
    )


TF_DIM = 1 << 16


def _tf_vector(text: str) -> dict[int, float]:
    """Hashed log-scaled term-frequency vector (HashingTF-style)."""
    counts: dict[int, int] = {}
    for tok in text.split():
        h = zlib.crc32(tok.encode("utf-8")) % TF_DIM
        counts[h] = counts.get(h, 0) + 1
    return {k: 1.0 + np.log(v) for k, v in counts.items()}


def tfidf_cosine(t1: str, t2: str) -> float:
    """Cosine over hashed log-TF vectors (pair-local; IDF-free by design:
    at 10^12 docs a global IDF table is a separate broadcast join — the
    comparator works on log-TF and the logistic weights absorb scale)."""
    return _weighted_cosine(_tf_vector(t1), _tf_vector(t2))


@F.pandas_udf(T.DoubleType())
def tfidf_cosine_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    return pd.Series(
        [tfidf_cosine(a or "", b or "") for a, b in zip(s1, s2)], dtype="float64"
    )


def compute_idf(docs, text_col: str = "text") -> np.ndarray:
    """Corpus-level smoothed IDF over the hashed term space (SURVEY.md
    §2.8's ``HashingTF+IDF`` target, built directly on DataFrame ops so
    the hash matches :func:`_tf_vector` — ``crc32(token) % TF_DIM`` —
    and the oracle can recompute it by hand).

    Formula matches ``pyspark.ml.feature.IDF``'s smoothed variant:
    ``idf(t) = ln((m + 1) / (df(t) + 1))`` with m = corpus size; a
    bucket no document contains gets ``ln(m + 1)`` (df = 0).

    Scale: per-document DISTINCT bucket explode → groupBy(bucket) —
    cardinality is capped at ``TF_DIM`` (65,536) regardless of corpus
    size, so the aggregation is map-side-combinable with a bounded
    reduce, and the resulting table is a ~512 KB dense vector —
    broadcastable to every executor. One pass over the corpus, run once
    per pipeline (not per pair).
    """
    n_docs = docs.count()
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    buckets = docs.select(
        F.explode(
            F.array_distinct(
                F.transform(
                    toks,
                    lambda t: F.pmod(F.crc32(F.encode(t, "utf-8")), F.lit(TF_DIM)),
                )
            )
        ).alias("bucket")
    )
    counts = buckets.groupBy("bucket").agg(F.count(F.lit(1)).alias("df")).collect()
    idf = np.full(TF_DIM, np.log(n_docs + 1.0), dtype="float64")
    for r in counts:
        idf[int(r["bucket"])] = np.log((n_docs + 1.0) / (r["df"] + 1.0))
    return idf


def _weighted_cosine(v1: dict[int, float], v2: dict[int, float]) -> float:
    if not v1 or not v2:
        return 1.0 if (not v1 and not v2) else 0.0
    dot = sum(w * v2[k] for k, w in v1.items() if k in v2)
    n1 = np.sqrt(sum(w * w for w in v1.values()))
    n2 = np.sqrt(sum(w * w for w in v2.values()))
    return float(dot / (n1 * n2)) if n1 and n2 else 0.0


def tfidf_cosine_global_udf(idf: np.ndarray, sc=None):
    """Pandas-UDF factory: cosine over ``(1 + ln tf) * idf[bucket]``
    vectors — the corpus-weighted alternative to the pair-local
    :func:`tfidf_cosine` (config flag ``use_global_idf`` in the
    pipeline). Pass the SparkContext so the 512 KB IDF vector ships as
    a proper broadcast (torrent, once per executor) instead of riding
    every serialized task."""
    bcast = sc.broadcast(idf) if sc is not None else None

    @F.pandas_udf(T.DoubleType())
    def udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
        w = bcast.value if bcast is not None else idf

        def vec(t: str) -> dict[int, float]:
            return {k: v * w[k] for k, v in _tf_vector(t).items()}

        return pd.Series(
            [_weighted_cosine(vec(a or ""), vec(b or "")) for a, b in zip(s1, s2)],
            dtype="float64",
        )

    return udf


def cosine_expr(v1, v2):
    """JVM-side cosine between two array<float/double> columns — built-in
    higher-order functions only (zip_with + aggregate), no Python hop.
    Used for embedding similarity search."""
    dot = F.aggregate(
        F.zip_with(v1, v2, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n1 = F.sqrt(F.aggregate(v1, F.lit(0.0), lambda acc, x: acc + x * x))
    n2 = F.sqrt(F.aggregate(v2, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (n1 * n2)
