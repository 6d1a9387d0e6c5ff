"""Streaming near-dup suppression: simhash watermark dedup + banded
stateful Hamming filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.corpus import generate_pages
from dedupe_spark.functions.hashing import simhash64
from dedupe_spark.streaming.incremental import stream_pages
from dedupe_spark.streaming.neardup import (
    banded_near_dup_filter,
    simhash_dedup_within_watermark,
)


@pytest.fixture(scope="module")
def stream_input(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("neardup_in")
    pages = generate_pages(spark, 300, seed=23).cache()
    d = str(base / "pages")
    pages.write.mode("overwrite").parquet(d)
    return d, pages


def test_simhash_watermark_dedup(spark, stream_input, tmp_path):
    input_dir, pages = stream_input
    q = (
        simhash_dedup_within_watermark(stream_pages(spark, input_dir))
        .writeStream.format("memory")
        .queryName("simdedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select simhash from simdedup_test").collect()
    hashes = [r["simhash"] for r in got]
    assert len(hashes) == len(set(hashes))  # one survivor per simhash
    # every distinct batch-side simhash is represented
    want = {simhash64(r["text"]) for r in pages.select("text").collect()}
    assert set(hashes) == want


def test_banded_filter_suppresses_planted_near_dups(spark, stream_input, tmp_path):
    """Exact duplicates (hamming 0) must collapse to one survivor per
    band bucket; survivors' pairwise hamming within a bucket > k."""
    input_dir, pages = stream_input
    q = (
        banded_near_dup_filter(stream_pages(spark, input_dir), band=0, max_hamming=3)
        .writeStream.format("memory")
        .queryName("banded_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    survivors = spark.sql("select url, simhash from banded_test").collect()
    n_pages = pages.count()
    assert 0 < len(survivors) < n_pages  # something suppressed, not all
    # no two survivors in the same band-0 bucket within hamming<=3
    by_bucket: dict[int, list[int]] = {}
    for r in survivors:
        by_bucket.setdefault(r["simhash"] & 0xFFFF, []).append(r["simhash"])
    for hashes in by_bucket.values():
        for i in range(len(hashes)):
            for j in range(i + 1, len(hashes)):
                ham = bin((hashes[i] ^ hashes[j]) & (2**64 - 1)).count("1")
                assert ham > 3, (hashes[i], hashes[j], ham)
    # exact-dup clusters (same html → same simhash) collapse to one
    urls = {r["url"] for r in survivors}
    assert len(urls) == len(survivors)
