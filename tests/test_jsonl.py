"""JSONL shard sink: layout, round-trip fidelity, one-file-per-shard."""

from __future__ import annotations

import glob
import os

from dedupe_spark.sources.jsonl import write_jsonl_shards


def _shards_df(spark):
    rows = [
        (0, 10, "alpha beta", "en"),
        (0, 11, "gamma \"quoted\" élève", "fr"),
        (1, 12, "newline\nand\ttab", "en"),
        (2, 13, None, "de"),  # NULL text must survive
    ]
    return spark.createDataFrame(rows, "shard_id int, doc_id long, text string, lang string")


def test_roundtrip_and_layout(spark, tmp_path):
    out = str(tmp_path / "shards")
    write_jsonl_shards(_shards_df(spark), out, compression="gzip")
    # hive layout, one gz file per shard
    for sid in (0, 1, 2):
        parts = glob.glob(os.path.join(out, f"shard_id={sid}", "part-*.json.gz"))
        assert len(parts) == 1, parts
    back = spark.read.json(out)
    got = {
        (int(r["shard_id"]), int(r["doc_id"]), r["text"], r["lang"])
        for r in back.collect()
    }
    want = {
        (0, 10, "alpha beta", "en"),
        (0, 11, 'gamma "quoted" élève', "fr"),
        (1, 12, "newline\nand\ttab", "en"),
        (2, 13, None, "de"),
    }
    assert got == want


def test_uncompressed_is_plain_jsonl(spark, tmp_path):
    out = str(tmp_path / "plain")
    write_jsonl_shards(_shards_df(spark), out, compression="none")
    part = glob.glob(os.path.join(out, "shard_id=1", "part-*.json"))[0]
    with open(part, encoding="utf-8") as f:
        lines = [l for l in f.read().splitlines() if l]
    assert len(lines) == 1 and lines[0].startswith("{") and '"doc_id":12' in lines[0]


def test_missing_shard_col_raises(spark, tmp_path):
    import pytest

    df = _shards_df(spark).drop("shard_id")
    with pytest.raises(ValueError, match="shard column"):
        write_jsonl_shards(df, str(tmp_path / "x"))
