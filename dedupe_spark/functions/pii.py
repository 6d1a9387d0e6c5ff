"""PII detection and redaction for training-corpus curation.

Standard practice for web-scale LLM corpora (C4, RefinedWeb, Dolma all
ship a regex scrubber of this shape): emails, phone numbers, SSNs and
IP addresses are replaced with typed placeholder tokens before the
text reaches training shards. The reference has no text hygiene at all
(it hashes bytes — Dedupe.java:104-113); this is a target addition per
the task brief's training-data-pipeline surface.

Design constraints:

* **All JVM-side** — `regexp_replace` / `regexp_count` column
  expressions, no Python in the hot path. At 100 TB this runs inside
  whole-stage codegen next to the extraction projection; it adds zero
  shuffles.
* **Dialect-portable patterns** — the same pattern strings are used by
  the Spark (java.util.regex) query and the DuckDB (RE2) oracle, so
  they stick to the common subset: no backreferences, no lookaround,
  `\\b` / `\\d` / bounded quantifiers only (both engines support
  ASCII word boundaries).
* **Recall over precision** — a scrubber must over-match (a false
  redaction costs a token; a miss leaks PII), so the IP pattern
  accepts any dotted quad without range-checking octets, matching
  what production pipelines do.

Counts are taken per-pattern on the ORIGINAL text (patterns are
counted independently; an email whose host part is a dotted quad
counts once as email and once as ip). Redaction applies the patterns
in PII_PATTERNS order, so the email rule consumes a full address
before the ip rule sees the remainder.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement) — order matters for scrubbing: the
# earlier pattern consumes its whole match before later ones run.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # NANP-ish 3-3-4 with -, . or space separators (555-867-5309)
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    # US SSN 3-2-4 (dashes mandatory — the 3-3-4 phone rule wins dots)
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # dotted quad, deliberately not octet-range-checked (recall bias)
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def scrub_pii(col: Column) -> Column:
    """Redact every PII_PATTERNS match with its typed placeholder.

    Chained ``regexp_replace`` — one codegen'd projection, applied in
    declaration order (email before ip, phone before ssn).
    """
    out = col
    for _name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column) -> list[Column]:
    """Per-pattern match counts on the original text, aliased
    ``n_<name>`` — independent counts, see module docstring."""
    return [F.regexp_count(col, F.lit(pat)).alias(f"n_{name}") for name, pat, _ in PII_PATTERNS]
