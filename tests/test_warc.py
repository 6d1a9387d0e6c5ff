"""WARC source (ISO 28500): shards → pages → full pipeline parity with
the parquet-input path (SURVEY.md §2.1 S1/S2; VERDICT r2 next-round #3).
Same strategy as test_binaryfiles.py, plus parser-level unit checks on
hand-built byte streams."""

from __future__ import annotations

import gzip

from dedupe_spark.pipeline import run_pipeline
from dedupe_spark.sources.warc import (
    parse_warc_records,
    read_warc_pages,
    write_warc,
)


def _record(rtype: str, url: str | None, date: str, payload: bytes,
            ctype: str = "application/http; msgtype=response") -> bytes:
    head = f"WARC/1.0\r\nWARC-Type: {rtype}\r\nWARC-Date: {date}\r\n"
    if url is not None:
        head += f"WARC-Target-URI: {url}\r\n"
    head += f"Content-Type: {ctype}\r\nContent-Length: {len(payload)}\r\n\r\n"
    return head.encode() + payload + b"\r\n\r\n"


HTTP_BODY = b"<html><body>hello</body></html>"
HTTP_PAYLOAD = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + HTTP_BODY


def test_parser_response_resource_and_skips():
    """warcinfo/request records skipped; response payload HTTP headers
    stripped; resource payload passed through verbatim; both date
    precisions accepted."""
    buf = (
        _record("warcinfo", None, "2026-01-01T00:00:00Z",
                b"software: x\r\n", ctype="application/warc-fields")
        + _record("request", "http://a/", "2026-01-01T00:00:00Z", b"GET / HTTP/1.1\r\n\r\n")
        + _record("response", "http://a/", "2026-01-01T00:00:01.500000Z", HTTP_PAYLOAD)
        + _record("resource", "<http://b/>", "2026-01-01T00:00:02Z",
                  b"raw bytes", ctype="text/html")
    )
    got = list(parse_warc_records(buf))
    assert got == [
        ("http://a/", 1767225601500000, HTTP_BODY),
        ("http://b/", 1767225602000000, b"raw bytes"),
    ]


def test_parser_gzip_members_and_truncation():
    """Per-record gzip members decompress; a truncated tail record is
    dropped without looping or raising."""
    r1 = _record("response", "http://a/", "2026-01-01T00:00:00Z", HTTP_PAYLOAD)
    r2 = _record("response", "http://b/", "2026-01-01T00:00:01Z", HTTP_PAYLOAD)
    gz = gzip.compress(r1, mtime=0) + gzip.compress(r2, mtime=0)
    assert [u for u, _, _ in parse_warc_records(gz)] == ["http://a/", "http://b/"]
    # truncated plain stream: second record's payload cut mid-way
    assert [u for u, _, _ in parse_warc_records(r1 + r2[: len(r2) // 2])] == [
        "http://a/"
    ]
    # binary body containing CRLFCRLF must not confuse record framing
    tricky = b"A\r\n\r\nB" * 3
    r3 = _record("resource", "http://c/", "2026-01-01T00:00:00Z", tricky,
                 ctype="application/octet-stream")
    assert list(parse_warc_records(r3 + r1)) == [
        ("http://c/", 1767225600000000, tricky),
        ("http://a/", 1767225600000000, HTTP_BODY),
    ]


def test_corrupt_gzip_member_warns(caplog):
    """Mid-stream gzip CORRUPTION (not truncation) stops the member walk
    at the records already decoded — but loudly: a warning with the
    shard offset must reach the log, so a silently-shortened shard is
    diagnosable (ADVICE r4). Plain truncation stays quiet."""
    import logging

    r1 = _record("response", "http://a/", "2026-01-01T00:00:00Z", HTTP_PAYLOAD)
    r2 = _record("response", "http://b/", "2026-01-01T00:00:01Z", HTTP_PAYLOAD)
    g1, g2 = gzip.compress(r1, mtime=0), gzip.compress(r2, mtime=0)
    # flip bytes inside g2's deflate stream (past the 10-byte header)
    bad = bytearray(g1 + g2)
    for off in range(len(g1) + 12, len(g1) + 18):
        bad[off] ^= 0xFF
    with caplog.at_level(logging.WARNING, logger="dedupe_spark.sources.warc"):
        assert [u for u, _, _ in parse_warc_records(bytes(bad))] == ["http://a/"]
    assert any("corrupt gzip member" in m for m in caplog.messages)
    # truncation (clean cut, no bad bytes) must NOT warn
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="dedupe_spark.sources.warc"):
        assert [u for u, _, _ in parse_warc_records((g1 + g2)[: len(g1) + 8])] == [
            "http://a/"
        ]
    assert not any("corrupt gzip member" in m for m in caplog.messages)


def test_round_trip_url_ts_html(spark, corpus, tmp_path):
    sample = corpus.limit(50).repartition(4)
    d = str(tmp_path / "warc")
    write_warc(sample, d)
    back = read_warc_pages(spark, d)
    want = {
        (r["url"], r["warc_ts"], bytes(r["html"]))
        for r in sample.select("url", "warc_ts", "html").collect()
    }
    got = {(r["url"], r["warc_ts"], bytes(r["html"])) for r in back.collect()}
    assert got == want


def test_round_trip_gzip(spark, corpus, tmp_path):
    sample = corpus.limit(30).repartition(3)
    d = str(tmp_path / "warcgz")
    write_warc(sample, d, gzip_records=True)
    back = read_warc_pages(spark, d)
    want = {
        (r["url"], r["warc_ts"], bytes(r["html"]))
        for r in sample.select("url", "warc_ts", "html").collect()
    }
    got = {(r["url"], r["warc_ts"], bytes(r["html"])) for r in back.collect()}
    assert got == want


def test_pipeline_from_warc_matches_parquet_input(spark, corpus, tmp_path):
    """End-to-end: identical clusters whether pages arrive as parquet
    or as WARC shards (the real 100-TB crawl input shape)."""
    sub = corpus.limit(200).cache()
    d = str(tmp_path / "warc")
    write_warc(sub.repartition(4), d, gzip_records=True)
    from_warc = read_warc_pages(spark, d)
    out_w = run_pipeline(spark, from_warc, str(tmp_path / "wd_warc"))
    out_p = run_pipeline(spark, sub, str(tmp_path / "wd_parquet"))
    a = {(r["doc_id"], r["cluster_id"]) for r in out_w["s7_clusters"].collect()}
    b = {(r["doc_id"], r["cluster_id"]) for r in out_p["s7_clusters"].collect()}
    assert a == b
    # byte-identity invariant holds across input paths
    ta = {(r["doc_id"], r["text"]) for r in out_w["s1_docs"].select("doc_id", "text").collect()}
    tb = {(r["doc_id"], r["text"]) for r in out_p["s1_docs"].select("doc_id", "text").collect()}
    assert ta == tb


def test_gzip_members_stream_bounded_memory():
    """A multi-GB-inflating .warc.gz must never materialize decompressed
    (VERDICT r3 #1): peak Python allocation while draining the parser
    stays within a few records, not the ~0.5 GB total inflation. Also
    covers a record spanning two gzip members (carry path)."""
    import tracemalloc

    body = b"a" * (4 << 20)  # 4 MiB, compresses to ~4 KB
    rec = _record("resource", "http://big/", "2026-01-01T00:00:00Z", body,
                  ctype="application/octet-stream")
    member = gzip.compress(rec, mtime=0)
    n_members = 128  # 512 MiB decompressed total
    shard = member * n_members
    tracemalloc.start()
    count = 0
    for url, _, html in parse_warc_records(shard):
        assert url == "http://big/" and len(html) == len(body)
        count += 1
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert count == n_members
    assert peak < 64 << 20, f"peak {peak>>20} MiB — decompressed shard materialized"

    # record split across two gzip members (non-standard; carry must stitch)
    r1 = _record("resource", "http://s/", "2026-01-01T00:00:00Z", b"xy" * 50,
                 ctype="application/octet-stream")
    cut = len(r1) // 2
    gz = gzip.compress(r1[:cut], mtime=0) + gzip.compress(r1[cut:], mtime=0)
    assert list(parse_warc_records(gz)) == [("http://s/", 1767225600000000, b"xy" * 50)]


# Property fuzz (pure Python — no Spark): arbitrary payload bytes,
# including CRLFCRLF sequences and gzip mode, must round-trip through
# record framing exactly.
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        payloads=st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=8),
        gz=st.booleans(),
    )
    @settings(max_examples=60, deadline=None)
    def test_warc_framing_round_trip_fuzz(payloads, gz):
        recs = b""
        want = []
        for i, body in enumerate(payloads):
            url = f"http://fuzz/{i}"
            date = "2026-01-01T00:00:00Z"
            recs += _record("resource", url, date, body, ctype="application/octet-stream")
            want.append((url, 1767225600000000, body))
        if gz:
            recs = b"".join(
                gzip.compress(_record("resource", f"http://fuzz/{i}", "2026-01-01T00:00:00Z",
                                      b, ctype="application/octet-stream"), mtime=0)
                for i, b in enumerate(payloads)
            )
        assert list(parse_warc_records(recs)) == want
except ImportError:  # hypothesis not installed — deterministic tests above still cover framing
    pass
