"""Text-analysis column functions for training-data pipelines.

All built from JVM-side ``pyspark.sql.functions`` (whole-stage codegen,
no Python hop) and chosen to have exact ANSI-SQL equivalents so the
DuckDB oracle can verify them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "fr": ("le", "la", "et"),
    "es": ("el", "que", "de"),
    "de": ("der", "und", "die"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (empty string → empty array)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# BPE-ish pre-tokenizer pattern (GPT-2-style, simplified): contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs.
# Alternation + character classes only — identical semantics in Java
# regex (Spark) and RE2 (DuckDB), so the oracle matches exactly.
# Whitespace is an EXPLICIT ASCII class, not \s: Java's \s includes
# \x0B (vertical tab) while RE2's does not, so \s would let the two
# engines disagree on text containing \x0B.
SUBWORD_RE = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\f\x0B']+"


def subword_token_count(text: Column) -> Column:
    """Approximate LLM token count: number of BPE-ish pre-tokens (the
    merge step only splits these further, so this lower-bounds and
    tracks real BPE counts; whitespace itself is never a token).
    JVM-side regexp_count — no Python, codegen-friendly."""
    return F.regexp_count(text, F.lit(SUBWORD_RE))


def word_shingles(text: Column, width: int = 3) -> Column:
    """Array of word w-shingles (strings), JVM-side via transform/slice."""
    toks = tokens(text)
    n = F.size(toks)
    return F.when(n < width, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - width + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, width)),
        )
    )


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    stops = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    return F.when(F.size(toks) > 0, stops / F.size(toks)).otherwise(F.lit(0.0))


def mean_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality score: length band + stopword presence +
    sane mean token length. Deliberately simple & SQL-expressible."""
    n_tok = token_count(text)
    len_ok = F.when((n_tok >= 20) & (n_tok <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(text) >= 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
    mtl = mean_token_len(text)
    mtl_ok = F.when((mtl >= 2.0) & (mtl <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
    return len_ok + stop_ok + mtl_ok


def lang_id(text: Column) -> Column:
    """Marker-word language heuristic: argmax of per-language marker hits
    (ties → earlier language in the fixed order, 'und' when all zero)."""
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*marks)))
        for lang, marks in LANG_MARKERS.items()
    }
    best = None
    best_score = None
    for lang in LANG_MARKERS:  # fixed iteration order = spec
        s = scores[lang]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set (classic 'fingerprint clustering' key)."""
    toks = F.array_sort(F.array_distinct(F.transform(tokens(text), lambda t: F.lower(t))))
    return F.md5(F.concat_ws(" ", toks))


def content_hash(text: Column) -> Column:
    """Exact-duplicate key: md5 of raw text (reference md5_s analog,
    Dedupe.java:104-113 — built-in, no UDF, per SURVEY.md §2.8 X1)."""
    return F.md5(text)
