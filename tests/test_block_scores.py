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


def test_shadow_audit_reconstruction_law(spark, corpus_df):
    """The shadow audit's central claim: keep@B == kept AND
    link_density <= B for any tightened B — verified by BRUTE FORCE
    against a real second extraction pass with the constant swapped,
    then the Spark host rollup pinned against the serial fold."""
    import re
    import unittest.mock as mock

    from pyspark.sql import functions as SF

    from ocr_automation_system_spark.oracle import html_extract as hx
    from ocr_automation_system_spark.queries import SHADOW_LINK_DENSITY

    assert SHADOW_LINK_DENSITY < MAX_LINK_DENSITY
    # the synthetic corpus has no block in the (B, A] band — plant one
    # (link density ~0.30: kept at 0.33, dropped at 0.25) plus a clean
    # control page, so the audit has a real delta to measure
    anchor = "thirty chars of anchor text xx"
    planted = ("<html><body><p>" + "filler words here " * 4
               + '<a href="/x">' + anchor + "</a></p>"
               + "<p>a long clean paragraph of ordinary prose content "
               + "well past the minimum</p></body></html>").encode()
    clean = (b"<html><body><p>another long clean paragraph of prose "
             b"content well past the minimum size</p></body></html>")
    extra = spark.createDataFrame(
        [("https://planted.example/a/1", bytearray(planted)),
         ("https://planted.example/a/2", bytearray(clean))],
        "url string, html binary")
    audit_df = corpus_df.select("url", "html").unionByName(extra)
    ld = [r["link_density"] for r in hx.block_records("u", planted)
          if SHADOW_LINK_DENSITY < r["link_density"] <= MAX_LINK_DENSITY]
    assert ld, "planted block must land in the shadow band"
    rows = audit_df.collect()
    brute_a, brute_b = {}, {}
    for r in rows:
        payload = r["html"]
        if payload is None or bytes(payload)[:5] == b"%PDF-":
            continue
        for rec in hx.block_records(r["url"], payload):
            brute_a[r["url"]] = brute_a.get(r["url"], 0) + int(rec["kept"])
            brute_b[r["url"]] = brute_b.get(r["url"], 0) + int(
                rec["kept"] and rec["link_density"] <= SHADOW_LINK_DENSITY)
    assert sum(brute_a.values()) > sum(brute_b.values()) > 0

    # reconstruction == the REAL rule with the constant swapped
    with mock.patch.object(hx, "MAX_LINK_DENSITY", SHADOW_LINK_DENSITY):
        for r in rows:
            payload = r["html"]
            if payload is None or bytes(payload)[:5] == b"%PDF-":
                continue
            html = bytes(payload).decode("utf-8", errors="replace")
            real_b = sum(int(hx.block_is_content(b))
                         for b in hx.segment_blocks(html))
            assert real_b == brute_b.get(r["url"], 0), r["url"]

    # the Spark audit folds exactly those counts per host
    per_host = {}
    for u in brute_a:
        h = re.match(r"https?://([^/]+)", u).group(1)
        d = per_host.setdefault(h, [0, 0, 0])
        d[0] += 1
        d[1] += int(brute_a[u] != brute_b[u])
        d[2] += brute_a[u] - brute_b[u]
    pu = (block_scores(audit_df).groupBy("url")
          .agg(SF.sum(SF.col("kept").cast("int")).alias("kept_a"),
               SF.sum((SF.col("kept")
                       & (SF.col("link_density") <= SHADOW_LINK_DENSITY))
                      .cast("int")).alias("kept_b")))
    changed = (SF.col("kept_a") != SF.col("kept_b")).cast("int")
    got = {r["host"]: (r["n"], r["c"], r["d"]) for r in
           pu.groupBy(SF.regexp_extract(
               "url", r"https?://([^/]+)", 1).alias("host"))
           .agg(SF.count(SF.lit(1)).alias("n"),
                SF.sum(changed).alias("c"),
                SF.sum(SF.col("kept_a") - SF.col("kept_b")).alias("d"))
           .collect()}
    assert got == {h: tuple(v) for h, v in per_host.items()}
