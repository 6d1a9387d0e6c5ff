"""Deterministic synthetic Common-Crawl-style ``pages`` corpus (FIXTURES.md §1).

Schema (BASELINE.json input_hint):
    url string, warc_ts timestamp, html binary, text string, lang string
plus a ``truth_key`` column (ground-truth cluster key) used only by
tests/evaluation — a real corpus wouldn't have it.

Planted structure, all proportions keyed off ``idx % 100``:
  * 5%  hot-boilerplate members (one giant exact-dup cluster → the skew
        case, analog of the reference's length==0 file block)
  * 25% exact-duplicate clusters of 2-4 members (same html bytes,
        different urls/domains)
  * 15% near-duplicate clusters of 2-4 members (1-5 token edits)
  * 55% singletons

Generation is **distributed and partitioning-independent**: rows are
derived from ``spark.range(n)`` via a counter-based hash of
(seed, idx) — no driver-side data, no RNG state shared across rows, so
the same (seed, n) yields byte-identical rows at any parallelism.
At 100 TB the same generator shape (range → mapInPandas) scales
linearly; nothing is collected to the driver.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from dedupe_spark.operators.extract import extract_text

WORD_POOL = (
    "the fast key order sort table scan merge join hash row column value "
    "query data stream filter window batch spark agg small big slow part "
    "index shuffle block pair score cluster match crawl page text token "
    "near exact salt skew plan"
).split()

DOMAINS = tuple(f"site{i:02d}.example.{'com' if i % 3 else 'org'}" for i in range(50))

LANGS = ("en", "fr", "es", "zh", "de")
_LANG_CUM = (39, 55, 71, 86, 100)  # cumulative weights out of 100

# Fixed cluster layouts within each century of indices (idx % 100):
# slot ranges for exact-dup clusters (25 slots) and near-dup clusters (15).
_EXACT_CLUSTERS = ((5, 6), (7, 8), (9, 11), (12, 14), (15, 18), (19, 22), (23, 26), (27, 29))
_NEAR_CLUSTERS = ((30, 31), (32, 34), (35, 37), (38, 41), (42, 44))


def _h(*parts: object) -> int:
    """Counter-based deterministic 64-bit hash of the parts."""
    m = hashlib.blake2b(digest_size=8)
    for p in parts:
        m.update(repr(p).encode())
        m.update(b"\x00")
    return struct.unpack("<Q", m.digest())[0]


def _words(key: int, n: int) -> list[str]:
    return [WORD_POOL[_h(key, "w", i) % len(WORD_POOL)] for i in range(n)]


def _make_html(content_key: int) -> bytes:
    """Deterministic html document for a content key."""
    title = " ".join(_words(_h(content_key, "title"), 4 + _h(content_key, "tl") % 4))
    n_paras = 2 + _h(content_key, "np") % 5
    paras = []
    for p in range(n_paras):
        n = 20 + _h(content_key, "pl", p) % 41
        paras.append(" ".join(_words(_h(content_key, "para", p), n)))
    body = "".join(f"<p>{p}</p>" for p in paras)
    html = (
        f"<html><head><title>{title}</title>"
        f"<script>var x_{content_key % 997} = 1;</script>"
        f"<style>p {{ margin: 0 }}</style></head>"
        f"<body><h1>{title}</h1>{body}<!-- k{content_key % 97} --></body></html>"
    )
    return html.encode("utf-8")


def _edit_tokens(html: bytes, edit_key: int) -> bytes:
    """Apply 1-5 deterministic single-token substitutions inside <p> text."""
    text = html.decode("utf-8")
    # operate on the whole doc but only substitute bare words (template
    # tags contain no pool words except inside title/h1/p, which is fine)
    tokens = text.split(" ")
    n_edits = 1 + _h(edit_key, "ne") % 5
    positions = [i for i, t in enumerate(tokens) if t in WORD_POOL]
    if not positions:
        return html
    for e in range(n_edits):
        pos = positions[_h(edit_key, "pos", e) % len(positions)]
        tokens[pos] = WORD_POOL[_h(edit_key, "sub", e) % len(WORD_POOL)]
    return " ".join(tokens).encode("utf-8")


def _row(idx: int, seed: int) -> dict:
    century, r = divmod(idx, 100)
    if r < 5:
        truth_key = "hot"
        content_key = _h(seed, "hot")
        html = _make_html(content_key)
    else:
        truth_key = f"single:{idx}"
        html = None
        for lo, hi in _EXACT_CLUSTERS:
            if lo <= r <= hi:
                truth_key = f"exact:{century}:{lo}"
                html = _make_html(_h(seed, "exact", century, lo))
                break
        if html is None:
            for lo, hi in _NEAR_CLUSTERS:
                if lo <= r <= hi:
                    truth_key = f"near:{century}:{lo}"
                    base = _make_html(_h(seed, "near", century, lo))
                    # first member keeps the base text; others get edits
                    html = base if r == lo else _edit_tokens(base, _h(seed, "edit", idx))
                    break
        if html is None:
            html = _make_html(_h(seed, "single", idx))
    domain = DOMAINS[_h(seed, "dom", _h(seed, "domz", idx) % 2500) % len(DOMAINS)]
    url = f"https://{domain}/p/{idx:09d}"
    lr = _h(seed, "lang", idx) % 100
    lang = next(lang for lang, cum in zip(LANGS, _LANG_CUM) if lr < cum)
    return {
        "url": url,
        "warc_ts": pd.Timestamp("2026-01-01") + pd.Timedelta(minutes=idx),
        "html": html,
        "text": extract_text(html),
        "lang": lang,
        "truth_key": truth_key,
    }


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, truth_key string"
)


def generate_pages(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus: same rows at any parallelism."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang", "truth_key"])

    return spark.range(0, n, 1, parts).mapInPandas(gen, schema=PAGES_SCHEMA)


def true_pairs(pages_with_ids: DataFrame) -> DataFrame:
    """All intra-cluster (doc_id1 < doc_id2) ground-truth match pairs.

    Input must carry (doc_id, truth_key); singletons produce no pairs.
    """
    a = pages_with_ids.select("doc_id", "truth_key").alias("a")
    b = pages_with_ids.select("doc_id", "truth_key").alias("b")
    from pyspark.sql import functions as F

    return (
        a.join(b, on="truth_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .where(~F.col("truth_key").startswith("single:"))
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .distinct()
    )
