"""Within-document and cross-document repetition removal.

Two classic web-corpus curation operators the reference lacks (it
dedups whole files by hash — Dedupe.java:104-113; these dedup *inside*
and *across* documents at the unit level, where a unit is a line in
production and any regex-split token for fixtures without newlines):

* ``dedup_units`` — keep the FIRST occurrence of each repeated unit
  within one document (C4 drops repeated 3-sentence spans; RefinedWeb
  dedups lines). Pure JVM: ``split`` → ``array_distinct`` (Spark's
  array_distinct preserves first-occurrence order) → ``array_join``.
  Zero shuffles — this is a projection that rides whatever scan or
  exchange is already happening.

* ``remove_boilerplate_units`` — drop every unit that appears in at
  least ``min_doc_frac`` of documents (navigation chrome, cookie
  banners, boilerplate headers). Two phases:

  1. doc-frequency: explode DISTINCT (doc, unit) pairs and count —
     the standard wordcount shuffle, map-side partials, output
     bounded by vocabulary;
  2. the blocklist (units above the threshold) is **provably tiny**:
     a unit in ≥ f·N docs contributes ≥ f·N of the Σ|doc| total unit
     occurrences, so |blocklist| ≤ avg_units_per_doc / f (f=0.5 →
     ≤ 2·avg-doc-length entries regardless of corpus size). It is
     collected to the driver (size-asserted) and applied as a literal
     ``array_contains`` filter inside a codegen'd projection — the
     corpus-side pass adds NO shuffle and NO join, which is the whole
     point at 100 TB. (A low-threshold variant — f small enough that
     the blocklist stops being driver-sized — would switch to a
     broadcast anti-join on the exploded units and a positional
     re-assembly groupBy; not implemented because curation thresholds
     live at 0.05+ where the bound above holds.)

  Unlike ``dedup_units`` this keeps duplicate NON-boilerplate units:
  ``filter`` preserves order and multiplicity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Hard ceiling on the driver-collected blocklist. The doc-frequency
# bound (see module docstring) keeps real blocklists in the hundreds;
# hitting this means min_doc_frac was set far below the operator's
# design range and the caller should use an anti-join formulation.
MAX_BLOCKLIST = 65_536


def split_units(col: Column, sep: str = r"\s+") -> Column:
    """Split into non-empty units (default: whitespace tokens; pass
    ``\\n`` for line-level semantics)."""
    return F.filter(F.split(col, sep), lambda x: x != "")


def dedup_units(col: Column, sep: str = r"\s+", join_sep: str = " ") -> Column:
    """First-occurrence unit dedup within one value (intra-doc)."""
    return F.array_join(F.array_distinct(split_units(col, sep)), join_sep)


def boilerplate_units(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = r"\s+",
    min_doc_frac: float = 0.5,
    n_docs: int | None = None,
) -> list[str]:
    """Units present in >= min_doc_frac of documents, as a driver list.

    ``n_docs`` may be supplied from parquet footers to avoid the extra
    count job; otherwise one count() runs.
    """
    if n_docs is None:
        n_docs = df.count()
    freq = (
        df.select(F.col(id_col), F.explode(F.array_distinct(split_units(F.col(text_col), sep))).alias("unit"))
        .groupBy("unit")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .where(F.col("ndocs") >= min_doc_frac * n_docs)
    )
    # limit() BEFORE collect(): a min_doc_frac far below the design range
    # must fail the size assertion without first pulling an unbounded list
    # onto the driver.
    rows = freq.select("unit").limit(MAX_BLOCKLIST + 1).collect()
    if len(rows) > MAX_BLOCKLIST:
        raise ValueError(
            f"boilerplate blocklist exceeds {MAX_BLOCKLIST} units; "
            f"min_doc_frac={min_doc_frac} is below this operator's design range — "
            "use an anti-join formulation for rare-unit removal"
        )
    return sorted(r["unit"] for r in rows)


def remove_boilerplate_units(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = r"\s+",
    join_sep: str = " ",
    min_doc_frac: float = 0.5,
    n_docs: int | None = None,
) -> DataFrame:
    """Strip corpus-wide boilerplate units from every document.

    Adds ``clean_<text_col>`` (units above the doc-frequency threshold
    removed, order and duplicate multiplicity of survivors preserved)
    and ``n_removed``. The corpus pass is a pure projection.
    """
    block = boilerplate_units(df, text_col, id_col, sep, min_doc_frac, n_docs)
    units = split_units(F.col(text_col), sep)
    blocklit = F.lit(block) if block else F.array().cast("array<string>")
    kept = F.filter(units, lambda x: ~F.array_contains(blocklit, x))
    return df.withColumn("n_removed", F.size(units) - F.size(kept)).withColumn(
        f"clean_{text_col}", F.array_join(kept, join_sep)
    )
