"""binaryFile source: html file tree → pages → full pipeline parity
with the parquet-input path (SURVEY.md §2.1 S1/S2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_spark.pipeline import run_pipeline
from dedupe_spark.sources.binaryfiles import read_html_pages, write_html_tree


def test_round_trip_url_ts_html(spark, corpus, tmp_path):
    sample = corpus.limit(50)
    tree = str(tmp_path / "tree")
    write_html_tree(sample, tree, shards=8)
    back = read_html_pages(spark, tree)
    want = {
        (r["url"], r["warc_ts"], bytes(r["html"]))
        for r in sample.select("url", "warc_ts", "html").collect()
    }
    got = {
        (r["url"], r["warc_ts"], bytes(r["html"]))
        for r in back.collect()
    }
    assert got == want


def test_reads_are_distributed_and_recursive(spark, corpus, tmp_path):
    """Files land in shard subdirectories; the recursive scan must see
    all of them and nothing else."""
    tree = str(tmp_path / "tree")
    write_html_tree(corpus.limit(120), tree, shards=16)
    # a decoy non-html file must be ignored by the glob
    (tmp_path / "tree" / "shard=000").mkdir(parents=True, exist_ok=True)
    (tmp_path / "tree" / "shard=000" / "README.txt").write_text("ignore me")
    back = read_html_pages(spark, tree)
    assert back.count() == 120


def test_pipeline_from_files_matches_parquet_input(spark, corpus, tmp_path):
    """End-to-end: identical clusters whether pages arrive as parquet
    or as a raw html file tree (the 100-TB input shape)."""
    sub = corpus.limit(200).cache()
    tree = str(tmp_path / "tree")
    write_html_tree(sub, tree)
    from_files = read_html_pages(spark, tree)
    out_f = run_pipeline(spark, from_files, str(tmp_path / "wd_files"))
    out_p = run_pipeline(spark, sub, str(tmp_path / "wd_parquet"))
    a = {(r["doc_id"], r["cluster_id"]) for r in out_f["s7_clusters"].collect()}
    b = {(r["doc_id"], r["cluster_id"]) for r in out_p["s7_clusters"].collect()}
    assert a == b
    # byte-identity invariant holds across input paths
    ta = {(r["doc_id"], r["text"]) for r in out_f["s1_docs"].select("doc_id", "text").collect()}
    tb = {(r["doc_id"], r["text"]) for r in out_p["s1_docs"].select("doc_id", "text").collect()}
    assert ta == tb


def test_round_trip_under_non_utc_session_tz(spark, corpus, tmp_path):
    """warc_ts must round-trip exactly when the session timezone is not
    UTC (the file-name epoch is computed against the session zone)."""
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        sample = corpus.limit(20)
        tree = str(tmp_path / "tree_tz")
        write_html_tree(sample, tree, shards=4)
        back = read_html_pages(spark, tree)
        want = {(r["url"], r["warc_ts"]) for r in sample.select("url", "warc_ts").collect()}
        got = {(r["url"], r["warc_ts"]) for r in back.select("url", "warc_ts").collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
