"""Tests for skew-salting utilities (north rule: salted keys for skewed
hosts), the optional P32 text normalizer, the P17 constitution whitelist,
and the S6 console-report formatter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_automation_system_spark.functions.util import (
    salted_agg, salted_join, with_salt,
)
from ocr_automation_system_spark.oracle.gst import validate_constitution
from ocr_automation_system_spark.oracle.textnorm import normalize_text
from ocr_automation_system_spark.operators.report import format_report


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share one hot key."""
    rows = [(("hot" if i % 10 else f"cold{i}"), i) for i in range(1000)]
    return spark.createDataFrame(rows, ["k", "v"])


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold10", "C"), ("missing", "M")], ["k", "label"])
    plain = skewed.join(dim, "k").select("k", "v", "label")
    salted = salted_join(skewed, dim, "k").select("k", "v", "label")
    key = lambda r: (r["k"], r["v"], r["label"])
    assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))
    # the hot key really is spread: phase-1 key is (k, _salt)
    salts = with_salt(skewed, 8).filter(F.col("k") == "hot") \
        .select("_salt").distinct().count()
    assert salts > 1


def test_salted_agg_matches_plain_groupby(spark, skewed):
    plain = {r["k"]: r["n"] for r in
             skewed.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["k"]: r["n_docs"] for r in
              salted_agg(skewed, "k", {"n_docs": F.count(F.lit(1))}).collect()}
    assert salted == plain and salted["hot"] == 900


def test_normalize_text_merges_headings_and_sentences():
    raw = ("UDYAM REGISTRATION\nCERTIFICATE\n"
           "the enterprise was registered\nunder the act.\n"
           "Details follow:\nname and address\n")
    out = normalize_text(raw).split("\n")
    assert out[0] == "UDYAM REGISTRATION CERTIFICATE"        # heading merge
    assert out[1] == "the enterprise was registered under the act."
    assert out[2] == "Details follow:"                       # terminator splits
    assert out[3] == "name and address"
    assert normalize_text("") == "" and normalize_text(None) == ""


def test_validate_constitution_whitelist():
    assert validate_constitution("Private Limited Company") == "Private Limited Company"
    assert validate_constitution("HUF") == "HUF"
    assert validate_constitution("Gibberish Entity") == ""


def test_format_report_renders(spark):
    from ocr_automation_system_spark.corpus import generate_corpus
    from ocr_automation_system_spark.operators.adapters import build_entities
    from ocr_automation_system_spark.operators.extract import extract_documents
    from ocr_automation_system_spark.operators.report import entity_report
    from ocr_automation_system_spark.operators.rules import run_rules

    pdf = generate_corpus(60, seed=3)
    docs = spark.createDataFrame(pdf)
    rep = entity_report(run_rules(build_entities(extract_documents(docs))),
                        generated_at="2026-01-01")
    row = rep.limit(1).collect()[0]
    text = format_report(row)
    assert "CROSS-DOCUMENT VERIFICATION REPORT" in text
    assert "Overall:" in text and "Pass rate:" in text
