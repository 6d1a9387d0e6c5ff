"""PII scrubbing + within/cross-document repetition removal.

Planted adversarial cases — the fixture-table oracle (check_oracles /
driver) verifies Spark↔DuckDB regex-dialect parity; these tests verify
the SEMANTICS on inputs the fixtures don't contain (real PII shapes,
newline units, empty docs, all-boilerplate docs).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.functions.pii import PII_PATTERNS, pii_counts, scrub_pii
from dedupe_spark.operators.repetition import (
    MAX_BLOCKLIST,
    boilerplate_units,
    dedup_units,
    remove_boilerplate_units,
)


def _scrub_one(spark, text: str) -> tuple[str, dict[str, int]]:
    row = (
        spark.createDataFrame([(text,)], "s string")
        .select(scrub_pii(F.col("s")).alias("out"), *pii_counts(F.col("s")))
        .first()
    )
    names = [name for name, _, _ in PII_PATTERNS] + ["cc"]
    return row["out"], {name: row[f"n_{name}"] for name in names}


class TestPiiScrub:
    def test_email(self, spark):
        out, n = _scrub_one(spark, "mail a.b+c_d%e@sub.example.co.uk now")
        assert out == "mail <EMAIL> now"
        assert n["email"] == 1

    def test_phone_separators(self, spark):
        out, n = _scrub_one(spark, "call 555-867-5309 or 555.867.5309 or 555 867 5309")
        assert out == "call <PHONE> or <PHONE> or <PHONE>"
        assert n["phone"] == 3

    def test_ssn_not_eaten_by_phone(self, spark):
        out, n = _scrub_one(spark, "ssn 123-45-6789 end")
        assert out == "ssn <SSN> end"
        assert n["ssn"] == 1 and n["phone"] == 0

    def test_ip(self, spark):
        out, n = _scrub_one(spark, "from 192.168.1.255 and 10.0.0.1")
        assert out == "from <IP> and <IP>"
        assert n["ip"] == 2

    def test_embedded_digits_not_matched(self, spark):
        # word boundaries: longer digit runs must not half-match
        out, n = _scrub_one(spark, "id 1234-567-89012 9999.1.1.1 x25555-123-4567")
        assert n["phone"] == 0 and n["ssn"] == 0 and n["ip"] == 0
        assert out == "id 1234-567-89012 9999.1.1.1 x25555-123-4567"

    def test_ip_boundary_and_recall_bias(self, spark):
        out, n = _scrub_one(spark, "u@1.2.3.4ab and v1.2.3.4.5")
        # '1.2.3.4ab' has no trailing word boundary -> untouched; the
        # semver-ish 'v1.2.3.4.5' over-matches its tail '2.3.4.5'
        # (documented recall bias); neither is an email (digit TLD)
        assert n["email"] == 0 and n["ip"] == 1
        assert out == "u@1.2.3.4ab and v1.<IP>"
        out2, _ = _scrub_one(spark, "u@example.com 1.2.3.4")
        assert out2 == "<EMAIL> <IP>"

    def test_clean_text_unchanged(self, spark):
        s = "no personal data here just words"
        out, n = _scrub_one(spark, s)
        assert out == s and not any(n.values())

    def test_credit_card_luhn_valid_scrubbed(self, spark):
        # standard test PANs: Visa 16 (spaced / dashed / solid), Amex 15
        out, n = _scrub_one(
            spark,
            "v 4111 1111 1111 1111 d 4111-1111-1111-1111 "
            "s 4111111111111111 a 378282246310005",
        )
        assert out == "v <CC> d <CC> s <CC> a <CC>"
        assert n["cc"] == 4

    def test_credit_card_luhn_failing_not_scrubbed(self, spark):
        # 16-digit runs that FAIL Luhn must survive verbatim — ids,
        # timestamps and hashes are full of digit runs; the checksum is
        # the precision guard (VERDICT r4 #4)
        s = "order 4111 1111 1111 1112 ref 1234567890123456 t 9999 9999 9999 9999"
        out, n = _scrub_one(spark, s)
        assert out == s
        assert n["cc"] == 0

    def test_e164_international_phone(self, spark):
        out, n = _scrub_one(spark, "call +447911123456 or +14155552671 now")
        assert out == "call <PHONE> or <PHONE> now"
        assert n["e164"] == 2 and n["phone"] == 0
        # bare '+' or too-short tails stay (E.164 minimum significant digits)
        out2, n2 = _scrub_one(spark, "sum +4 and +123456 stay")
        assert out2 == "sum +4 and +123456 stay" and n2["e164"] == 0

    def test_iban_scrubbed(self, spark):
        out, n = _scrub_one(spark, "pay DE89370400440532013000 or GB29NWBK60161331926819")
        assert out == "pay <IBAN> or <IBAN>"
        assert n["iban"] == 2
        # lowercase or embedded-in-word forms stay (word boundary + case)
        out2, n2 = _scrub_one(spark, "xDE89370400440532013000 de89370400440532013000")
        assert n2["iban"] == 0 and out2 == "xDE89370400440532013000 de89370400440532013000"


class TestDedupUnits:
    def test_keeps_first_occurrence_order(self, spark):
        row = (
            spark.createDataFrame([("b a b c a d",)], "s string")
            .select(dedup_units(F.col("s")).alias("out"))
            .first()
        )
        assert row["out"] == "b a c d"

    def test_line_units(self, spark):
        text = "cookie banner\nreal content\ncookie banner\nmore content"
        row = (
            spark.createDataFrame([(text,)], "s string")
            .select(dedup_units(F.col("s"), sep="\n", join_sep="\n").alias("out"))
            .first()
        )
        assert row["out"] == "cookie banner\nreal content\nmore content"

    def test_empty(self, spark):
        row = (
            spark.createDataFrame([("",), ("   ",)], "s string")
            .select(dedup_units(F.col("s")).alias("out"))
            .collect()
        )
        assert [r["out"] for r in row] == ["", ""]


class TestBoilerplateRemoval:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        # 'nav' + 'menu' in 3/4 docs (>=50%); 'rare'/'body' below
        rows = [
            (0, "nav menu body text nav"),
            (1, "nav menu other words"),
            (2, "nav menu menu again"),
            (3, "rare lonely single stuff"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_blocklist(self, spark, docs):
        assert boilerplate_units(docs, min_doc_frac=0.5) == ["menu", "nav"]

    def test_survivors_keep_order_and_multiplicity(self, spark, docs):
        out = {
            r["doc_id"]: (r["clean_text"], r["n_removed"])
            for r in remove_boilerplate_units(docs, min_doc_frac=0.5).collect()
        }
        assert out[0] == ("body text", 3)  # both 'nav's removed
        assert out[2] == ("again", 3)  # duplicate 'menu' removed twice
        assert out[3] == ("rare lonely single stuff", 0)

    def test_all_boilerplate_doc_becomes_empty(self, spark):
        rows = [(i, "same words") for i in range(3)] + [(3, "same words")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = remove_boilerplate_units(df, min_doc_frac=0.5).collect()
        assert all(r["clean_text"] == "" and r["n_removed"] == 2 for r in out)

    def test_no_boilerplate_is_identity(self, spark):
        rows = [(0, "alpha beta"), (1, "gamma delta"), (2, "eps zeta")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = remove_boilerplate_units(df, min_doc_frac=0.5).collect()
        assert all(r["clean_text"] == r["text"] and r["n_removed"] == 0 for r in out)

    def test_blocklist_bound_enforced(self, spark, monkeypatch):
        import dedupe_spark.operators.repetition as rep

        monkeypatch.setattr(rep, "MAX_BLOCKLIST", 1)
        rows = [(i, "nav menu") for i in range(4)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        with pytest.raises(ValueError, match="blocklist"):
            rep.boilerplate_units(df, min_doc_frac=0.5)
        assert MAX_BLOCKLIST > 1  # module constant untouched
