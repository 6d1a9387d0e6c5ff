"""JSONL training-shard sink.

Training data loaders (Megatron/GPT-NeoX/HF datasets streaming) consume
line-delimited JSON, optionally gzipped, one directory per shard — not
parquet. This sink turns a packed-shards DataFrame (the output of
``operators.packing.pack_shards`` / ``curation.curate_corpus``) into
that layout with Spark's native distributed JSON writer:

    <path>/shard_id=0/part-*.json[.gz]
    <path>/shard_id=1/part-*.json[.gz]
    ...

Scale notes:

* ``partitionBy("shard_id")`` is a pure write-side split — no extra
  shuffle beyond what the caller's plan already has; each task streams
  its rows into per-shard files. With ``one_file_per_shard=True`` the
  frame is repartitioned BY the shard column first so each shard is
  exactly one file (what most loaders want) — that IS one shuffle,
  keyed and skew-bounded by the shard token budget itself (a shard
  holds ≤ budget tokens by construction, so no reducer can be handed
  more than one shard's bytes... per shard; multiple small shards per
  reducer are fine).
* compression is codec-pluggable (``gzip`` default for loaders,
  ``none`` for debugging); JSON escaping, unicode and None handling
  are Spark's battle-tested writer, not hand-rolled string concat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_jsonl_shards(
    shards: DataFrame,
    path: str,
    shard_col: str = "shard_id",
    compression: str = "gzip",
    one_file_per_shard: bool = True,
) -> str:
    """Write ``shards`` as JSONL partitioned by ``shard_col``.

    Returns ``path``. Every column except ``shard_col`` lands in the
    JSON objects (``shard_col`` becomes the directory name, the usual
    hive-partition convention).
    """
    if shard_col not in shards.columns:
        raise ValueError(f"missing shard column {shard_col!r} in {shards.columns}")
    df = shards
    if one_file_per_shard:
        df = df.repartition(shard_col)
    writer = df.write.mode("overwrite").partitionBy(shard_col)
    if compression and compression != "none":
        writer = writer.option("compression", compression)
    writer.json(path)
    return path
