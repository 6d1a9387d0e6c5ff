"""HTML → text extraction: deterministic, byte-identical per url.

The per-row invariant (BASELINE.json input_hint): extracted text must
be a pure function of the ``html`` bytes — no environment, locale,
dict-ordering, or library-version sensitivity. We therefore use a
small hand-written tag stripper (stdlib ``re`` only) instead of
bs4/lxml, and verify byte-identity across runs and parallelism levels
in tests (SURVEY.md §7.4).

Reference analog: the reference has no HTML stage; its "expensive
per-candidate feature" is MD5 of the file stream (Dedupe.java:104-113).
Extraction plays the same pipeline role here: the first enrichment
computed from raw bytes.

Execution: Arrow-batched pandas UDF (no per-row Python at the Spark
API layer); the regex work is applied per batch via pandas ``map``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Pre-compiled, version-independent patterns (stdlib re semantics).
_SCRIPT_RE = re.compile(rb"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(rb"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"\s+")

# Fixed, ordered entity table — a dict literal's insertion order is part
# of the spec here, so the replacement order is pinned.
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # must be last so &amp;lt; → &lt; (literal), not <
)


def extract_text(html: bytes | None) -> str:
    """Canonical extraction: strip script/style/comments/tags, unescape
    basic entities, collapse whitespace to single spaces, strip ends.

    This exact function defines the byte-identity invariant; the corpus
    generator uses it to produce the ground-truth ``text`` column.
    """
    if html is None:
        return ""
    raw = _SCRIPT_RE.sub(b" ", html)
    raw = _STYLE_RE.sub(b" ", raw)
    raw = _COMMENT_RE.sub(b" ", raw)
    raw = _TAG_RE.sub(b" ", raw)
    text = raw.decode("utf-8", errors="replace")
    for ent, ch in _ENTITIES:
        text = text.replace(ent, ch)
    return _WS_RE.sub(" ", text).strip()


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


def extract_docs(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, ...) → docs with extracted text + doc_id.

    doc_id = xxhash64(url): deterministic under any partitioning
    (never monotonically_increasing_id — SURVEY.md §7.4).
    """
    return pages.select(
        F.xxhash64(F.col("url")).alias("doc_id"),
        "url",
        "warc_ts",
        F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
        extract_text_udf(F.col("html")).alias("text"),
    ).withColumn("n_chars", F.length("text"))
