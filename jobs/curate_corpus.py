"""spark-submit entry: curate a documents table into training shards.

  spark-submit --py-files dist/dedupe_spark.zip jobs/curate_corpus.py \
      --input /data/documents.parquet --output /data/shards \
      --keep-top 0.9 --shard-tokens 100000000

Input schema: (doc_id long, text string, lang string) — extra columns
are ignored, except `embedding array<float/double>`, read when
--semantic-eps enables the C3.5 SemDeDup stage. Output: parquet partitioned by shard_id (each partition
≈ --shard-tokens tokens of deduped, quality-gated text) and one JSON
stats line on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", required=True, help="shard output dir")
    p.add_argument("--keep-top", type=float, default=1.0,
                   help="per-language kept fraction by quality (1.0 = no gate)")
    p.add_argument("--shard-tokens", type=int, default=100_000,
                   help="token budget per training shard")
    p.add_argument("--jaccard-threshold", type=float, default=0.8)
    p.add_argument("--hot-threshold", type=int, default=1000)
    p.add_argument("--scrub-pii", action="store_true",
                   help="redact emails/phones/SSNs/IPs before scoring")
    p.add_argument("--dedup-within-doc", action="store_true",
                   help="drop repeated units within each doc "
                        "(unit per --hygiene-unit)")
    p.add_argument("--boilerplate-doc-frac", type=float, default=None,
                   help="strip units present in >= this fraction of docs")
    p.add_argument("--semantic-eps", type=float, default=None,
                   help="enable C3.5 semantic dedup (SemDeDup) at this "
                        "cosine threshold; requires an `embedding` column "
                        "on the input parquet")
    p.add_argument("--semantic-cells", type=int, default=None,
                   help="quantizer cells for --semantic-eps "
                        "(default: auto, ~10k vectors/cell)")
    p.add_argument("--hygiene-unit", choices=("line", "token"), default="line",
                   help="unit granularity for --dedup-within-doc / "
                        "--boilerplate-doc-frac: 'line' (production — "
                        "banners, repeated spans) or 'token' (whitespace "
                        "words; only sensible for newline-free corpora — "
                        "at token level boilerplate removal strips common "
                        "stopwords and intra-doc dedup deletes every "
                        "repeated word)")
    p.add_argument("--format", choices=("parquet", "jsonl"), default="parquet",
                   help="shard output format (jsonl = gzipped line-JSON, "
                        "one file per shard — the training-loader layout)")
    p.add_argument("--scratch-dir", default=None,
                   help="shared-storage dir for materialized intermediates; "
                        "defaults to the sibling <output>_scratch (must be "
                        "reachable by every executor — never a node-local "
                        "/tmp, and never inside --output, whose overwrite "
                        "would delete it mid-plan)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from dedupe_spark.curation import CurationConfig, curate_corpus

    spark = SparkSession.builder.appName("dedupe_spark_curate").getOrCreate()
    cols = ["doc_id", "text", "lang"]
    if args.semantic_eps is not None:
        cols.append("embedding")  # C3.5 joins it back by doc_id
    docs = spark.read.parquet(args.input).select(*cols)
    cfg = CurationConfig(
        keep_top=args.keep_top,
        shard_tokens=args.shard_tokens,
        jaccard_threshold=args.jaccard_threshold,
        hot_threshold=args.hot_threshold,
        scrub_pii=args.scrub_pii,
        dedup_within_doc=args.dedup_within_doc,
        boilerplate_doc_frac=args.boilerplate_doc_frac,
        hygiene_unit_sep="\n" if args.hygiene_unit == "line" else r"\s+",
        hygiene_join_sep="\n" if args.hygiene_unit == "line" else " ",
        semantic_eps=args.semantic_eps,
        semantic_cells=args.semantic_cells,
    )
    # intermediates must live on storage every executor can reach — the
    # output dir's filesystem qualifies by construction; a SIBLING path,
    # because the final overwrite of --output must not delete scratch
    # the shards plan is still reading
    scratch = args.scratch_dir or f"{args.output.rstrip('/')}_scratch"
    t0 = time.time()
    out = curate_corpus(spark, docs, cfg, scratch_dir=scratch)
    if args.format == "jsonl":
        from dedupe_spark.sources.jsonl import write_jsonl_shards

        write_jsonl_shards(out["shards"], args.output)
    else:
        out["shards"].write.mode("overwrite").partitionBy("shard_id").parquet(args.output)
    report = {
        int(r["shard_id"]): (int(r["n_docs"]), int(r["total_tokens"]))
        for r in out["shard_report"].collect()
    }
    stats = {
        "wall_sec": round(time.time() - t0, 1),
        "n_input_docs": docs.count(),
        "n_output_docs": sum(n for n, _ in report.values()),
        "n_shards": len(report),
        "total_tokens": sum(t for _, t in report.values()),
    }
    print(json.dumps(stats))


if __name__ == "__main__":
    main(sys.argv[1:])
