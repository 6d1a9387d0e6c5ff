"""PII detection and redaction for training-corpus curation.

Standard practice for web-scale LLM corpora (C4, RefinedWeb, Dolma all
ship a regex scrubber of this shape): emails, phone numbers (NANP and
E.164 international), SSNs, IBANs, credit-card numbers and IP
addresses are replaced with typed placeholder tokens before the text
reaches training shards. The reference has no text hygiene at all
(it hashes bytes — Dedupe.java:104-113); this is a target addition per
the task brief's training-data-pipeline surface.

Design constraints:

* **All JVM-side** — `regexp_replace` / `regexp_count` /
  `regexp_extract_all` + higher-order-function column expressions, no
  Python in the hot path. At 100 TB this runs inside whole-stage
  codegen next to the extraction projection; it adds zero shuffles.
* **Dialect-portable patterns** — the same pattern strings are used by
  the Spark (java.util.regex) query and the DuckDB (RE2) oracle, so
  they stick to the common subset: no backreferences, no lookaround,
  `\\b` / `\\d` / bounded quantifiers / non-capturing groups only
  (both engines support ASCII word boundaries).
* **Recall over precision** — a scrubber must over-match (a false
  redaction costs a token; a miss leaks PII), so the IP pattern
  accepts any dotted quad without range-checking octets and the IBAN
  pattern does not verify the mod-97 checksum, matching what
  production pipelines do. The ONE precision check is the Luhn
  checksum on credit-card candidates: 13-19-digit runs are so common
  in web text (ids, timestamps, hashes) that an unvalidated rule
  would shred non-PII numbers wholesale — Luhn rejects 90% of random
  digit runs for one integer expression per candidate.

Counts are taken per-pattern on the ORIGINAL text (patterns are
counted independently; an email whose host part is a dotted quad
counts once as email and once as ip). Redaction applies email first,
then the Luhn-validated credit-card pass, then the remaining patterns
in PII_PATTERNS order, so the email rule consumes a full address
before the ip rule sees the remainder.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement) — order matters for scrubbing: the
# earlier pattern consumes its whole match before later ones run.
# (The Luhn-validated credit-card rule lives in CC_PATTERN below — it
# needs arithmetic a regex can't express; scrub_pii interleaves it
# right after email.)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # E.164 international: +country-code then 7-14 digits (+447911123456)
    ("e164", r"\+[1-9][0-9]{7,14}\b", "<PHONE>"),
    # NANP-ish 3-3-4 with -, . or space separators (555-867-5309)
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    # US SSN 3-2-4 (dashes mandatory — the 3-3-4 phone rule wins dots)
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # IBAN (ISO 13616 shape): 2 letters, 2 check digits, 11-30 BBAN
    # chars; checksum deliberately not verified (recall bias)
    ("iban", r"\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\b", "<IBAN>"),
    # dotted quad, deliberately not octet-range-checked (recall bias)
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]

# Credit-card candidates: 13-19 digits with optional single space/dash
# separators. Candidates must ALSO pass the Luhn checksum (ISO/IEC
# 7812) before they count or scrub — see luhn_ok().
CC_PATTERN = r"\b(?:\d[ -]?){12,18}\d\b"
CC_REPLACEMENT = "<CC>"


def luhn_ok(cand: Column) -> Column:
    """Luhn (mod-10) checksum over a candidate's digits — pure JVM
    integer arithmetic via ``aggregate`` over the reversed digit
    string; one expression per candidate, no Python."""
    rev = F.reverse(F.regexp_replace(cand, "[^0-9]", ""))

    def term(acc: Column, i: Column) -> Column:
        d = F.substr(rev, i, F.lit(1)).cast("int")
        return acc + (
            F.when(i % 2 == 0, F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2))
            .otherwise(d)
        )

    total = F.aggregate(F.sequence(F.lit(1), F.length(rev)), F.lit(0), term)
    return (F.length(rev) >= 13) & (total % 10 == 0)


def _cc_candidates(col: Column) -> Column:
    """Luhn-valid credit-card matches in ``col`` (array<string>)."""
    return F.filter(
        F.regexp_extract_all(col, F.lit(CC_PATTERN), F.lit(0)), luhn_ok
    )


def scrub_cc(col: Column) -> Column:
    """Replace every Luhn-VALID credit-card match with ``<CC>``;
    Luhn-failing digit runs are left untouched (precision guard). A
    fold over the validated candidate list: extract → filter(luhn) →
    literal replace — all codegen-side collection functions."""
    return F.aggregate(
        _cc_candidates(col), col, lambda acc, c: F.replace(acc, c, F.lit(CC_REPLACEMENT))
    )


def scrub_pii(col: Column) -> Column:
    """Redact every PII match with its typed placeholder.

    Chained ``regexp_replace`` — one codegen'd projection, applied in
    declaration order (email first, then the Luhn-validated cc pass,
    then e164/phone/ssn/iban/ip).
    """
    out = col
    for name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
        if name == "email":
            out = scrub_cc(out)
    return out


def pii_counts(col: Column) -> list[Column]:
    """Per-pattern match counts on the original text, aliased
    ``n_<name>`` (``n_cc`` counts Luhn-VALID candidates only) —
    independent counts, see module docstring."""
    cols = [
        F.regexp_count(col, F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    cols.insert(1, F.size(_cc_candidates(col)).alias("n_cc"))
    return cols
