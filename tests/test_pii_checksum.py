"""X153 checksum-validated PII: Luhn/mod-97 validator correctness
(pure-Python and Spark-expression parity), scrub semantics (invalid
candidates preserved), fixture-class coverage, and the narrow-plan law."""

from pyspark.sql import functions as F

from ocr_automation_system_spark.functions.pii import (
    IBAN_LETTER_MAP,
    POW10_MOD97,
    iban_valid,
    iban_valid_py,
    luhn_valid,
    luhn_valid_py,
    pii_checksum_scrub,
)
from ocr_automation_system_spark.queries import _PAY_CARDS, _PAY_IBANS

# ---------------------------------------------------------------------------
# Pure-Python validator semantics (published test numbers)
# ---------------------------------------------------------------------------

VALID_CARDS = ["4111111111111111", "4111 1111 1111 1111",
               "4012-8888-8888-1881", "5555555555554444",
               "378282246310005", "6011111111111117"]
INVALID_CARDS = ["4111111111111112", "1234567890123", "4012888888881882"]

VALID_IBANS = ["GB82WEST12345698765432", "DE89370400440532013000",
               "FR1420041010050500013M02606", "NL91ABNA0417164300",
               "ES9121000418450200051332"]
INVALID_IBANS = ["DE89370400440532013001", "GB82WEST12345698765431",
                 "XX00THISISNOTANIBAN00"]


def test_luhn_py():
    assert all(luhn_valid_py(c) for c in VALID_CARDS)
    assert not any(luhn_valid_py(c) for c in INVALID_CARDS)


def test_iban_py():
    assert all(iban_valid_py(c) for c in VALID_IBANS)
    assert not any(iban_valid_py(c) for c in INVALID_IBANS)


def test_pow_table_and_letter_map():
    assert len(POW10_MOD97) == 96 and POW10_MOD97[0] == 1
    # period exactly 96: the next power cycles back to 1
    assert (POW10_MOD97[-1] * 10) % 97 == 1
    assert dict(IBAN_LETTER_MAP)["A"] == "10"
    assert dict(IBAN_LETTER_MAP)["Z"] == "35"


def test_fixture_lists_cover_both_classes():
    # the injected contract mixes: exactly 4 valid / 2 invalid cards,
    # 3 valid / 2 invalid IBANs (pattern-matching either way)
    assert [luhn_valid_py(c) for c in _PAY_CARDS] == [
        True, True, True, True, False, False]
    assert [iban_valid_py(c) for c in _PAY_IBANS] == [
        True, True, True, False, False]


# ---------------------------------------------------------------------------
# Spark-expression parity with the Python twins
# ---------------------------------------------------------------------------

def test_spark_validators_match_python(spark):
    cands = VALID_CARDS + INVALID_CARDS + VALID_IBANS + INVALID_IBANS
    df = spark.createDataFrame([(c,) for c in cands], ["cand"])
    rows = df.select(
        "cand",
        luhn_valid(F.col("cand")).alias("luhn"),
        iban_valid(F.col("cand")).alias("iban"),
    ).collect()
    for r in rows:
        if not any(ch.isalpha() for ch in r["cand"]):
            assert r["luhn"] == luhn_valid_py(r["cand"]), r["cand"]
        if r["cand"][:2].isalpha():
            assert r["iban"] == iban_valid_py(r["cand"]), r["cand"]


# ---------------------------------------------------------------------------
# Scrub semantics
# ---------------------------------------------------------------------------

def test_scrub_redacts_valid_preserves_invalid(spark):
    text = ("order 4111111111111112 paid with 4111 1111 1111 1111 "
            "into GB82WEST12345698765432 not DE89370400440532013001 end")
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    row = pii_checksum_scrub(df).collect()[0]
    assert row["n_iban_candidates"] == 2 and row["n_ibans_valid"] == 1
    assert row["n_cards_valid"] == 1
    s = row["scrubbed"]
    assert "<CARD>" in s and "<IBAN>" in s
    # the Luhn-invalid run and the mod-97-invalid IBAN survive verbatim
    assert "4111111111111112" in s
    assert "DE89370400440532013001" in s
    assert "4111 1111 1111 1111" not in s
    assert "GB82WEST12345698765432" not in s


def test_scrub_iban_before_cards(spark):
    # an IBAN's digit tail is itself a card-pattern candidate; scrubbing
    # IBANs first keeps the card pass from seeing (or double-counting) it
    df = spark.createDataFrame(
        [(1, "send to GB82WEST12345698765432 only")], ["doc_id", "text"])
    row = pii_checksum_scrub(df).collect()[0]
    assert row["n_ibans_valid"] == 1
    assert row["n_card_candidates"] == 0
    assert row["scrubbed"] == "send to <IBAN> only"


def test_scrub_clean_text_unchanged(spark):
    df = spark.createDataFrame(
        [(1, "no numbers here"), (2, "short digits 123456 only")],
        ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in pii_checksum_scrub(df).collect()}
    assert rows[1]["scrubbed"] == "no numbers here"
    assert rows[2]["scrubbed"] == "short digits 123456 only"
    assert rows[2]["n_card_candidates"] == 0


def test_adjacent_numeric_tokens_are_not_candidates(spark):
    # the false-positive machine the group-anchored CARD_RE kills: an
    # IFSC-code digit tail beside a bank-account number totals 19
    # digits with one interior space — under a per-digit-separator
    # pattern that was a candidate (and Luhn-valid 10% of the time)
    texts = [
        (1, "IFS CODE BANK ACCOUNT NUMBER NEXUS BANK "
            "EXYZ0012361 209965308330"),
        (2, "EMPLOYMENT DETAILS MALE FEMALE OTHER TOTAL 29 13 0 24"),
        (3, "order 12345 total 123456789 ref 1234"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in pii_checksum_scrub(df).collect()}
    for i, t in texts:
        assert rows[i]["n_card_candidates"] == 0, i
        assert rows[i]["scrubbed"] == t, i
    # real groupings still detected
    df2 = spark.createDataFrame(
        [(1, "pay 4111 1111 1111 1111 or 3782 822463 10005 now")],
        ["doc_id", "text"])
    r = pii_checksum_scrub(df2).collect()[0]
    assert r["n_card_candidates"] == 2 and r["n_cards_valid"] == 2


# ---------------------------------------------------------------------------
# Plan law: one narrow projection, zero shuffle
# ---------------------------------------------------------------------------

def test_plan_is_narrow(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.lit("pay 4111 1111 1111 1111 now").alias("text"))
    plan = (pii_checksum_scrub(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Window" not in plan
