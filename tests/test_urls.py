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


def test_host_extraction(spark):
    df = spark.createDataFrame(
        [("HTTP://WWW.Foo.Example.com:80/x?y#z",)], "url string"
    )
    assert df.select(url_host(F.col("url")).alias("h")).first()["h"] == "foo.example.com"


def test_variants_collapse_to_one(spark):
    variants = [
        "https://EXAMPLE.com/page/9/?a=1&b=2",
        "HTTPS://www.example.com:443/page/9?b=2&utm_source=feed&a=1",
        "https://example.com/page/9?a=1&b=2#sec",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    out = df.select(canonical_url(F.col("url")).alias("c")).distinct().collect()
    assert len(out) == 1 and out[0]["c"] == "https://example.com/page/9?a=1&b=2"
