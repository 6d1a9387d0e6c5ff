"""canonical_url: rule-by-rule expectations and collapse behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.functions.urls import canonical_url, url_host

CASES = [
    # (input, canonical)
    ("https://example.com/a", "https://example.com/a"),
    ("HTTPS://Example.COM/a", "https://example.com/a"),
    ("https://www.example.com/a", "https://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    # cross-scheme ports are NOT default — distinct resources (ADVICE r3)
    ("http://example.com:443/a", "http://example.com:443/a"),
    ("https://example.com:80/a", "https://example.com:80/a"),
    ("ftp://example.com:80/a", "ftp://example.com:80/a"),
    ("https://example.com/a/", "https://example.com/a"),
    ("https://example.com/a///", "https://example.com/a"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a?b=2&a=1", "https://example.com/a?a=1&b=2"),
    ("https://example.com/a?utm_source=x&a=1", "https://example.com/a?a=1"),
    ("https://example.com/a?fbclid=99", "https://example.com/a"),
    ("https://example.com/a?gclid=1&ref=tw&utm_campaign=c", "https://example.com/a"),
    ("https://example.com/a?ref=1&refresh=2", "https://example.com/a?refresh=2"),
    # path case is preserved (paths are case-sensitive per RFC 3986)
    ("https://example.com/A/B", "https://example.com/A/B"),
    # root: trailing slash dropped, empty path stays empty
    ("https://example.com/", "https://example.com"),
    ("https://example.com", "https://example.com"),
]


def test_rule_table(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    for (u, want), g in zip(CASES, got):
        assert g == want, f"{u!r}: got {g!r}, want {want!r}"


def test_malformed_urls_never_collapse_together(spark):
    """Distinct malformed urls must each survive dedup_fetches —
    canonical_url degenerates to '://' on them, so the gate on
    is_absolute_url is what prevents silent data loss."""
    from datetime import datetime

    from dedupe_spark.functions.urls import dedup_fetches

    rows = [
        ("", datetime(2024, 1, 1), "empty"),
        ("not a url", datetime(2024, 1, 1), "junk1"),
        ("example.com/a", datetime(2024, 1, 1), "schemeless"),
        ("//proto-relative.com/x", datetime(2024, 1, 1), "protorel"),
        ("https://ok.com/a", datetime(2024, 1, 1), "good"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, body string")
    got = {r["body"] for r in dedup_fetches(df).collect()}
    assert got == {"empty", "junk1", "schemeless", "protorel", "good"}


def test_canonicalization_is_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) over generated urls —
    the property that makes re-running the crawl dedup stage safe."""
    import itertools

    schemes = ["http://", "HTTPS://"]
    hosts = ["example.com", "WWW.Example.com:443", "a.b.co:8080"]
    paths = ["", "/", "/x/y/", "/A"]
    queries = ["", "?b=2&a=1", "?utm_source=x", "?gclid=1&z=9#f", "#only"]
    urls = ["".join(p) for p in itertools.product(schemes, hosts, paths, queries)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonical_url(F.col("url")).alias("c"))
    twice = once.select(canonical_url(F.col("c")).alias("c2"), "c")
    assert twice.where(F.col("c") != F.col("c2")).count() == 0


def test_host_extraction(spark):
    df = spark.createDataFrame(
        [("HTTP://WWW.Foo.Example.com:80/x?y#z",)], "url string"
    )
    assert df.select(url_host(F.col("url")).alias("h")).first()["h"] == "foo.example.com"


def test_dedup_fetches_keeps_newest_per_canonical(spark):
    from datetime import datetime

    from dedupe_spark.functions.urls import dedup_fetches

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # three fetches of one canonical page: newest wins
        ("https://example.com/a?utm_source=x", t(10), "old"),
        ("https://WWW.example.com/a", t(30), "newest"),
        ("https://example.com/a/", t(20), "mid"),
        # tie on ts: raw-url ascending breaks it deterministically
        ("https://example.com/b", t(5), "tie-b1"),
        ("https://example.com/b#frag", t(5), "tie-b2"),
        # unrelated page passes through
        ("https://example.com/c", t(1), "only"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, body string")
    got = {r["body"] for r in dedup_fetches(df).collect()}
    assert got == {"newest", "tie-b1", "only"}


def test_pipeline_crawl_url_dedup_suppresses_refetch_variants(spark, tmp_path):
    import pyspark.sql.functions as SF

    from dedupe_spark.corpus import generate_pages
    from dedupe_spark.pipeline import PipelineConfig, run_pipeline

    pages = generate_pages(spark, 200, seed=42).cache()
    # refetch noise: 20 pages refetched with tracking-param urls, 1s
    # OLDER timestamps (so the original fetch is the survivor), same html
    noise = (
        pages.limit(20)
        .withColumn("url", SF.concat("url", SF.lit("?utm_source=feed&fbclid=z")))
        .withColumn("warc_ts", SF.col("warc_ts") - SF.expr("INTERVAL 1 SECOND"))
    )
    noisy = pages.unionByName(noise)

    base = run_pipeline(spark, pages, str(tmp_path / "base"))
    on = run_pipeline(
        spark, noisy, str(tmp_path / "on"), PipelineConfig(crawl_url_dedup=True)
    )
    off = run_pipeline(spark, noisy, str(tmp_path / "off"))

    base_c = sorted(map(tuple, base["s7_clusters"].collect()))
    on_c = sorted(map(tuple, on["s7_clusters"].collect()))
    assert on_c == base_c  # variants never reach extraction
    # without the flag the refetches become extra (exact-dup) docs
    assert off["s7_clusters"].count() == len(base_c) + 20


def test_variants_collapse_to_one(spark):
    variants = [
        "https://EXAMPLE.com/page/9/?a=1&b=2",
        "HTTPS://www.example.com:443/page/9?b=2&utm_source=feed&a=1",
        "https://example.com/page/9?a=1&b=2#sec",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    out = df.select(canonical_url(F.col("url")).alias("c")).distinct().collect()
    assert len(out) == 1 and out[0]["c"] == "https://example.com/page/9?a=1&b=2"
