"""Per-block Readability scoring surface (operators.extract.block_scores
+ oracle.html_extract.block_records)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ocr_automation_system_spark.oracle.html_extract import (
    MAX_LINK_DENSITY, MIN_BLOCK_CHARS, block_records,
)
from ocr_automation_system_spark.operators.extract import (
    block_scores, extract_documents,
)

HTML = (
    b"<html><body>"
    b"<nav><p>Home About Contact and plenty of characters here</p></nav>"
    b'<p>This is the real article content, long enough to clear the '
    b'minimum block size threshold easily.</p>'
    b'<p><a href="/1">one link</a> <a href="/2">two link</a> '
    b'<a href="/3">three link</a> <a href="/4">four links all the way</a></p>'
    b"<p>tiny</p>"
    b"</body></html>"
)


def test_block_records_hand_case():
    recs = block_records("u", HTML)
    by_hash = {r["text_md5"]: r for r in recs}
    nav = by_hash[hashlib.md5(
        b"Home About Contact and plenty of characters here").hexdigest()]
    assert nav["boilerplate"] and not nav["kept"]
    art = by_hash[hashlib.md5(
        b"This is the real article content, long enough to clear the "
        b"minimum block size threshold easily.").hexdigest()]
    assert art["kept"] and not art["boilerplate"]
    assert art["link_density"] == 0.0 and art["n_chars"] >= MIN_BLOCK_CHARS
    tiny = by_hash[hashlib.md5(b"tiny").hexdigest()]
    assert not tiny["kept"]  # below MIN_BLOCK_CHARS
    linky = [r for r in recs
             if r["link_chars"] > 0 and not r["boilerplate"]]
    assert linky and all(not r["kept"] for r in linky
                         if r["link_density"] > MAX_LINK_DENSITY)


def test_block_records_total_on_junk():
    assert block_records("u", None) == []
    assert block_records("u", b"") == []
    assert block_records("u", b"\x00\xff\xfeinvalid utf8 bytes") is not None


@pytest.fixture(scope="module")
def corpus_df(spark, corpus_path):
    return spark.read.parquet(corpus_path)


def test_block_scores_matches_serial_oracle(spark, corpus_df):
    got = sorted(tuple(r) for r in block_scores(corpus_df).collect())
    want = []
    from ocr_automation_system_spark.oracle.pdf_stub import PDF_MAGIC
    for row in corpus_df.select("url", "html").collect():
        payload = bytes(row["html"]) if row["html"] is not None else b""
        if not payload or payload.startswith(PDF_MAGIC):
            continue
        for r in block_records(row["url"], payload):
            want.append((r["url"], r["block_idx"], r["n_lines"],
                         r["n_chars"], r["link_chars"], r["link_density"],
                         r["boilerplate"], r["kept"], r["text_md5"]))
    assert got == sorted(want) and got


def test_block_scores_agrees_with_extraction_counters(spark, corpus_df):
    """sum(kept)/sum(!kept) per url must equal the blocks_kept/
    blocks_dropped counters the extraction pipeline reports for the
    html leg — two independent paths over the same parser."""
    per_url = (block_scores(corpus_df).groupBy("url")
               .agg(F.sum(F.col("kept").cast("int")).alias("k"),
                    F.sum((~F.col("kept")).cast("int")).alias("d")))
    ext = (extract_documents(corpus_df)
           .filter(F.col("source_leg") == "html")
           .select("url", "blocks_kept", "blocks_dropped"))
    j = ext.join(per_url, "url", "left").fillna(0, ["k", "d"]).collect()
    assert j
    bad = [r for r in j
           if (r["blocks_kept"], r["blocks_dropped"]) != (r["k"], r["d"])]
    assert not bad, bad[:3]


def test_block_scores_no_shuffle(spark, corpus_df):
    plan = (block_scores(corpus_df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange hashpartitioning" not in plan
