"""Raw crawl-file source: directory trees of html files → pages table.

SURVEY.md §2.1 S1/S2 mapping: the reference walks a filesystem tree
recursively and feeds every file into the index (Dedupe.java:117-133
queue-expand loop). The Spark-first spelling is the ``binaryFile``
datasource with ``recursiveFileLookup`` — a distributed scan whose
listing, reading, and decoding all happen on executors. At 100 TB the
input is exactly this shape (WARC/html shards on object storage), so
the pipeline entry accepts a file tree, not just pre-extracted parquet.

File naming contract (written by :func:`write_html_tree`):
``shard=NNN/<epoch_micros>__<percent-encoded-url>.html`` — url and
crawl timestamp are recovered from the file name JVM-side
(regexp_extract + url_decode + timestamp_micros, no Python), so the
parquet-input and file-input paths produce identical pages rows.
"""

from __future__ import annotations

import os
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_html_tree(pages: DataFrame, out_dir: str, shards: int = 64) -> None:
    """Materialize pages(url, warc_ts, html) as a sharded html file tree.

    Distributed (foreachPartition — each executor writes its own rows);
    shard = crc32(url) % shards bounds directory fan-out. The file-name
    epoch is computed JVM-side with ``unix_micros`` (an instant, no
    timezone involved) BEFORE the rows cross into Python — Python-side
    datetime arithmetic would be wrong on non-UTC sessions because the
    executor pickle path renders timestamps in the JVM default zone,
    not ``spark.sql.session.timeZone``. ``read_html_pages`` inverts it
    with ``timestamp_micros`` — exact round trip in any zone.
    """

    def _write(rows: Iterator) -> None:
        from urllib.parse import quote

        for r in rows:
            shard = zlib.crc32(r.url.encode("utf-8")) % shards
            d = os.path.join(out_dir, f"shard={shard:03d}")
            os.makedirs(d, exist_ok=True)
            fn = f"{r.epoch_us}__{quote(r.url, safe='')}.html"
            with open(os.path.join(d, fn), "wb") as f:
                f.write(bytes(r.html))

    pages.select(
        "url", F.unix_micros(F.col("warc_ts")).alias("epoch_us"), "html"
    ).foreachPartition(_write)


def read_html_pages(spark, input_dir: str, glob: str = "*.html") -> DataFrame:
    """Recursive binaryFile scan of an html tree → (url, warc_ts, html).

    Everything after the scan is JVM-side column surgery on the file
    path; the payload bytes pass straight through as the ``html``
    binary column. ``lang`` is absent at this layer (extraction
    defaults it), matching a raw crawl where language is not yet known.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(input_dir)
    )
    name = F.regexp_extract(F.col("path"), r"([^/]+)$", 1)
    epoch = F.regexp_extract(name, r"^(\d+)__", 1).cast("long")
    enc_url = F.regexp_extract(name, r"^\d+__(.+)\.html$", 1)
    return raw.select(
        F.url_decode(enc_url).alias("url"),
        F.timestamp_micros(epoch).alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("lang"),
    )
