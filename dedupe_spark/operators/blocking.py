"""Blocking: cheap candidate keys before the expensive pairwise features.

Reference semantics (SURVEY.md §2.4 A1, Dedupe.java:67-72): group
candidates by a cheap key, keep only groups with ≥2 members
(facet ``mincount=2``), and compute the expensive feature only inside
surviving groups. Here the keys are web-scale (BASELINE.json
north_star): MinHash-LSH bands, url-domain, token n-grams, SimHash
bands — each emitted as (doc_id, block_key) rows and unioned.

Scale notes:
  * key generation is a single narrow pass (pandas UDF for sketches,
    JVM exprs for the rest) followed by one explode — no shuffle;
  * the ≥2 gate is a partial-agg groupBy on block_key — one shuffle,
    map-side combined;
  * hot keys (boilerplate) are *measured* here (block sizes) so the
    pair stage can skew-split or cap them explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedupe_spark.functions import hashing
from dedupe_spark.functions import text as TX


def domain_key(url) -> F.Column:
    return F.concat(F.lit("dom:"), F.parse_url(url, F.lit("HOST")))


def block_keys(
    docs: DataFrame,
    use_minhash: bool = True,
    use_simhash: bool = True,
    use_ngrams: bool = False,
    use_domain: bool = False,
    ngram_width: int = 5,
    ngram_mod: int = 8,
    n_bands: int = 32,
    rows_per_band: int = 4,
) -> DataFrame:
    """docs(doc_id, url?, text) → keys(doc_id, block_key).

    MinHash-LSH and SimHash bands are content keys (catch cross-domain
    duplicates); domain and sampled n-grams are predicate keys. n-gram
    keys are sampled (crc-mod) so each doc emits O(len/mod) keys, not
    O(len).
    """
    parts: list[DataFrame] = []
    if use_minhash and use_simhash:
        # one Arrow pass computes both sketches (shared shingle hashing),
        # one explode emits all band keys — no second Python hop
        sk = docs.select("doc_id", hashing.content_sketches_udf(F.col("text")).alias("sk"))
        all_keys = F.concat(
            hashing.lsh_band_keys(F.col("sk.sig"), n_bands, rows_per_band),
            hashing.simhash_band_keys(F.col("sk.sh")),
        )
        parts.append(sk.select("doc_id", F.explode(all_keys).alias("block_key")))
    elif use_minhash:
        sig = docs.select(
            "doc_id", hashing.minhash_udf(F.col("text")).alias("sig")
        )
        parts.append(
            sig.select(
                "doc_id",
                F.explode(
                    hashing.lsh_band_keys(F.col("sig"), n_bands, rows_per_band)
                ).alias("block_key"),
            )
        )
    elif use_simhash:
        sh = docs.select("doc_id", hashing.simhash_udf(F.col("text")).alias("sh"))
        parts.append(
            sh.select(
                "doc_id",
                F.explode(hashing.simhash_band_keys(F.col("sh"))).alias("block_key"),
            )
        )
    if use_ngrams:
        shingles = docs.select(
            "doc_id",
            F.explode(TX.word_shingles(F.col("text"), ngram_width)).alias("g"),
        )
        parts.append(
            shingles.where(F.abs(F.xxhash64("g")) % ngram_mod == 0)
            .select("doc_id", F.concat(F.lit("ng:"), F.xxhash64("g").cast("string")).alias("block_key"))
            .distinct()
        )
    if use_domain and "url" in docs.columns:
        parts.append(docs.select("doc_id", domain_key(F.col("url")).alias("block_key")))
    if not parts:
        raise ValueError("at least one key family must be enabled")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def block_sizes(keys: DataFrame) -> DataFrame:
    """block_key → member count (the reference's facet over length_l)."""
    return keys.groupBy("block_key").agg(F.count(F.lit(1)).alias("copies"))


def surviving_blocks(keys: DataFrame, min_count: int = 2) -> DataFrame:
    """HAVING count >= 2 — only these blocks generate candidate pairs
    (Dedupe.java facet.mincount=2)."""
    return block_sizes(keys).where(F.col("copies") >= min_count)
