"""Structured-markup extraction: <table> parsing, hreflang clusters,
sitemap coverage (functions/structured.py).

Planted-fixture laws (exact expected rows on hand-built pages incl.
poison), corpus-shape laws (v7 embeds tables / hreflang sets / sitemap
captures at known rates), and plan laws (the parses are zero-shuffle;
the censuses aggregate without windows)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ocr_automation_system_spark.functions import structured as ST

PAGE_TABLES = (
    "<html><body>"
    "<table><tr><th>A</th><th>B</th></tr>"
    "<tr><td>1</td><td><b>x</b> y</td></tr>"
    "<tr><td>2</td></tr>"                      # ragged: fewer cells
    "<tr><td>3</td><td>z</td><td>extra</td></tr></table>"  # ragged: more
    "<p>between</p>"
    "<TABLE class=\"x\"><TR><TD>only</TD></TR></TABLE>"    # case, no header
    "</body></html>"
).encode()

PAGE_ALT_A = (
    '<html><head>'
    '<link rel="alternate" hreflang="en" href="https://x.com/e1?hl=en">'
    '<link rel="alternate" hreflang="de" href="https://x.com/e1?hl=de">'
    '</head><body>t</body></html>').encode()
# same SET, listed in the other order -> same cluster
PAGE_ALT_B = (
    '<html><head>'
    '<link rel="alternate" hreflang="de" href="https://x.com/e1?hl=de">'
    '<link rel="alternate" hreflang="en" href="https://x.com/e1?hl=en">'
    '</head><body>t</body></html>').encode()
PAGE_ALT_C = (
    '<html><head>'
    '<link rel="alternate" hreflang="fr" href="https://x.com/e2?hl=fr">'
    '</head><body>t</body></html>').encode()

SITEMAP = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    '<url><loc>https://s.com/a</loc><lastmod>2025-01-02</lastmod></url>'
    '<url><loc>https://s.com/b</loc><lastmod>2025-03-04</lastmod></url>'
    '<url><loc>https://s.com/phantom</loc><lastmod>2025-05-06</lastmod>'
    '</url></urlset>').encode()

POISON = b"\x00\xff\xfe<not html"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "url string, html binary")


def test_html_tables_planted(spark):
    rows = [("https://t.com/p", PAGE_TABLES),
            ("https://t.com/q", b"<html><body>no tables</body></html>"),
            ("https://t.com/x", POISON)]
    out = ST.html_tables(_docs(spark, rows)).collect()
    assert {r["url"] for r in out} == {"https://t.com/p"}
    by_key = {(r["table_idx"], r["row_idx"]): r for r in out}
    assert len(by_key) == 5
    hdr = by_key[(0, 0)]
    assert hdr["is_header"] and hdr["cells"] == ["A", "B"]
    assert by_key[(0, 1)]["cells"] == ["1", "x y"]  # tags stripped
    assert by_key[(0, 2)]["cells"] == ["2"] and by_key[(0, 2)]["n_cells"] == 1
    assert by_key[(0, 3)]["n_cells"] == 3
    assert by_key[(1, 0)]["cells"] == ["only"]      # case-insensitive
    assert not by_key[(1, 0)]["is_header"]


def test_table_records_header_zip(spark):
    out = ST.table_records(
        _docs(spark, [("https://t.com/p", PAGE_TABLES)])).collect()
    recs = {(r["table_idx"], r["row_idx"], r["field"]): r["value"]
            for r in out}
    assert recs[(0, 1, "A")] == "1" and recs[(0, 1, "B")] == "x y"
    # ragged short row: value NULL under the missing header
    assert recs[(0, 2, "A")] == "2" and recs[(0, 2, "B")] is None
    # ragged long row: extra cell zips under a NULL field
    assert recs[(0, 3, None)] == "extra"
    # headerless table (first row has cells -> treated as header even
    # when td): its single row IS the header, so no data records
    assert not any(k[0] == 1 for k in recs)


def test_table_pivot_typed_contract(spark):
    """Pivot under an explicit field list: requested-but-absent fields
    surface as NULL columns; unrequested fields are dropped; ragged
    rows keep their NULLs. Schema is the contract list, not the data."""
    out = ST.table_pivot(
        _docs(spark, [("https://t.com/p", PAGE_TABLES)]),
        ["A", "B", "Zzz"]).collect()
    rows = {(r["table_idx"], r["row_idx"]): r for r in out}
    assert rows[(0, 1)]["a"] == "1" and rows[(0, 1)]["b"] == "x y"
    assert rows[(0, 2)]["b"] is None          # ragged short row
    assert all(r["zzz"] is None for r in out)  # absent everywhere
    assert set(out[0].asDict()) == {
        "url", "table_idx", "row_idx", "a", "b", "zzz"}


def test_filing_records_typed_on_corpus(spark):
    """Corpus law: every filing-history data row types cleanly (the
    try_cast NULL leg is for malformed markup, which v7 never emits) and
    lands in the documented domains."""
    from ocr_automation_system_spark.corpus import _FILING_STATUSES
    from ocr_automation_system_spark.queries import q_filing_records

    df = q_filing_records(spark, "/root/testdata/sf0.001")
    bad = df.where(F.col("sr").isNull() | F.col("filed").isNull()
                   | F.col("fee").isNull()
                   | ~F.col("status").isin(*_FILING_STATUSES))
    assert df.count() > 0 and bad.count() == 0
    assert df.where((F.col("fee") < 100) | (F.col("fee") >= 9900)) \
        .count() == 0


def test_hreflang_clusters_set_identity(spark):
    rows = [("https://x.com/p1", PAGE_ALT_A), ("https://x.com/p2", PAGE_ALT_B),
            ("https://x.com/p3", PAGE_ALT_C), ("https://x.com/p4", POISON),
            ("https://x.com/p5", b"<html><body>no alts</body></html>")]
    out = ST.hreflang_clusters(_docs(spark, rows)).collect()
    by_pages = sorted((r["n_pages"], r["langs_key"], r["first_url"])
                      for r in out)
    assert by_pages == [(1, "fr", "https://x.com/p3"),
                        (2, "de|en", "https://x.com/p1")]


def test_sitemap_coverage_reconciles(spark):
    rows = [("https://s.com/sitemap.xml", SITEMAP),
            ("https://s.com/a", b"<html><body>a</body></html>"),
            ("https://s.com/b", b"<html><body>b</body></html>"),
            ("https://s.com/orphan", b"<html><body>o</body></html>"),
            # host without a sitemap: excluded from the report
            ("https://n.com/z", b"<html><body>z</body></html>")]
    ent = ST.sitemap_entries(_docs(spark, rows)).collect()
    assert {(e["loc"], e["lastmod"]) for e in ent} == {
        ("https://s.com/a", "2025-01-02"),
        ("https://s.com/b", "2025-03-04"),
        ("https://s.com/phantom", "2025-05-06")}
    cov = ST.sitemap_coverage(_docs(spark, rows)).collect()
    assert len(cov) == 1
    c = cov[0]
    assert (c["host"], c["n_listed"], c["n_crawled"], c["n_both"]) == \
        ("s.com", 3, 3, 2)
    assert c["coverage_rate"] == pytest.approx(2 / 3)
    assert c["orphan_rate"] == pytest.approx(1 / 3)


SITEMAP_INDEX = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    '<sitemap><loc>https://i.com/sitemap-0.xml</loc></sitemap>'
    '<sitemap><loc>https://i.com/sitemap-1.xml</loc></sitemap>'
    '<sitemap><loc>https://i.com/sitemap-2.xml</loc></sitemap>'
    '</sitemapindex>').encode()
SITEMAP_CHILD_0 = (
    '<?xml version="1.0" encoding="UTF-8"?><urlset>'
    '<url><loc>https://i.com/a</loc><lastmod>2025-01-02</lastmod></url>'
    '</urlset>').encode()
SITEMAP_CHILD_1 = (
    '<?xml version="1.0" encoding="UTF-8"?><urlset>'
    '<url><loc>https://i.com/b</loc><lastmod>2025-03-04</lastmod></url>'
    '</urlset>').encode()


def test_sitemap_index_recursion(spark):
    """A sitemap-of-sitemaps at /sitemap.xml contributes no page
    entries itself; its CAPTURED children parse transitively into
    page-level (host, loc) rows; the never-fetched child surfaces as
    captured=false; coverage counts neither the index nor the children
    as crawled pages."""
    rows = [("https://i.com/sitemap.xml", SITEMAP_INDEX),
            ("https://i.com/sitemap-0.xml", SITEMAP_CHILD_0),
            ("https://i.com/sitemap-1.xml", SITEMAP_CHILD_1),
            ("https://i.com/a", b"<html><body>a</body></html>")]
    df = _docs(spark, rows)
    ent = {(e["loc"], e["lastmod"])
           for e in ST.sitemap_entries(df).collect()}
    assert ent == {("https://i.com/a", "2025-01-02"),
                   ("https://i.com/b", "2025-03-04")}
    idx = {(r["child_loc"], r["captured"])
           for r in ST.sitemap_index_entries(df).collect()}
    assert idx == {("https://i.com/sitemap-0.xml", True),
                   ("https://i.com/sitemap-1.xml", True),
                   ("https://i.com/sitemap-2.xml", False)}
    cov = ST.sitemap_coverage(df).collect()
    assert len(cov) == 1
    c = cov[0]
    assert (c["n_listed"], c["n_crawled"], c["n_both"]) == (2, 1, 1)
    # the never-crawled listed loc lands in the frontier; sitemap
    # files themselves never do
    pri = df.sparkSession.createDataFrame(
        [("i.com", 1.0)], "host string, priority double")
    fr = {r["loc"] for r in ST.frontier_candidates(df, pri).collect()}
    assert fr == {"https://i.com/b"}


def test_table_markdown_render(spark):
    """Exact markdown: header line, --- separator sized by the header,
    data lines in row order; a header-only table renders without a
    trailing newline."""
    page = ("<html><body><table>"
            "<tr><th>A</th><th>B</th></tr>"
            "<tr><td>1</td><td>2</td></tr>"
            "<tr><td>3</td><td>a|b</td></tr></table>"
            "<table><tr><th>only</th></tr></table>"
            "</body></html>").encode()
    out = {r["table_idx"]: r["markdown"] for r in ST.table_markdown(
        _docs(spark, [("https://t.com/p", page)])).collect()}
    assert out[0] == ("| A | B |\n"
                      "| --- | --- |\n"
                      "| 1 | 2 |\n"
                      "| 3 | a\\|b |")  # literal '|' escapes
    assert out[1] == "| only |\n| --- |"


def test_frontier_candidates_ranked_gap(spark):
    """Only never-crawled locs survive the anti-join; hosts absent from
    the priority dimension fall back to 0.0."""
    rows = [("https://s.com/sitemap.xml", SITEMAP),
            ("https://s.com/a", b"<html><body>a</body></html>")]
    pri = _docs(spark, []).sparkSession.createDataFrame(
        [("s.com", 0.25)], "host string, priority double")
    out = ST.frontier_candidates(_docs(spark, rows), pri).collect()
    assert {(r["loc"], r["priority"]) for r in out} == {
        ("https://s.com/b", 0.25), ("https://s.com/phantom", 0.25)}
    none = ST.frontier_candidates(
        _docs(spark, rows),
        pri.where(F.lit(False))).collect()
    assert {(r["loc"], r["priority"]) for r in none} == {
        ("https://s.com/b", 0.0), ("https://s.com/phantom", 0.0)}


def test_table_column_profile_type_census(spark):
    """Per (host, field): integer-looking and ISO-date-looking value
    counts with exact-division rates; empty cells count in n_values
    but not in the rate denominators."""
    page = ("<html><body><table>"
            "<tr><th>N</th><th>D</th><th>S</th></tr>"
            "<tr><td>12</td><td>2025-01-02</td><td>abc</td></tr>"
            "<tr><td>7</td><td>not-a-date</td><td></td></tr>"
            "</table></body></html>").encode()
    out = {r["field"]: r for r in ST.table_column_profile(
        _docs(spark, [("https://t.com/p", page)])).collect()}
    assert out["N"]["n_int"] == 2 and out["N"]["int_rate"] == 1.0
    assert out["D"]["n_date"] == 1 and out["D"]["date_rate"] == 0.5
    assert (out["S"]["n_values"], out["S"]["n_nonempty"]) == (2, 1)
    assert out["S"]["int_rate"] == 0.0 and out["S"]["date_rate"] == 0.0


def test_hreflang_bitext_pairs_capped_cross_lang(spark):
    """Pairs need same cluster + different own-language labels; the
    occupancy cap drops a mega-cluster BEFORE the self-join (and the
    drop is visible: remove the cap and the count changes)."""
    alt = (lambda e: ('<html><head><link rel="alternate" hreflang="en" '
                      f'href="https://x.com/{e}"></head>'
                      '<body>t</body></html>').encode())
    rows = ([("https://x.com/p1", "en", alt("e1")),
             ("https://x.com/p2", "de", alt("e1")),
             ("https://x.com/p3", "en", alt("e1"))]  # same lang as p1
            + [(f"https://big.com/p{i}", ("en", "de")[i % 2], alt("big"))
               for i in range(40)])
    df = spark.createDataFrame(
        rows, "url string, lang string, html binary")
    out = ST.hreflang_bitext_pairs(df).collect()
    # big.com's 40-member cluster is over the cap -> only e1 pairs
    assert {(r["url_a"], r["url_b"]) for r in out} == {
        ("https://x.com/p1", "https://x.com/p2"),
        ("https://x.com/p2", "https://x.com/p3")}
    uncapped = ST.hreflang_bitext_pairs(df, max_cluster=1000).count()
    assert uncapped > 2
    plan = (ST.hreflang_bitext_pairs(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan and "Python" not in plan


def test_corpus_carries_structured_shapes(spark, tmp_path):
    """The corpus embeds the structured shapes: filing tables (~20%),
    pipe-carrying remarks tables (v9, ~5%), hreflang sets (~15% of
    entity pages, md5-keyed so same-entity pages share the set -> at
    least one multi-page cluster), sitemap captures (~half the hosts,
    always with >= 2 phantom locs), and sitemap INDEX hosts (v9) whose
    children are parsed transitively."""
    from ocr_automation_system_spark.corpus import write_corpus

    p = write_corpus(str(tmp_path / "c.parquet"), n_rows=300, seed=11)
    docs = spark.read.parquet(p)
    cen = ST.table_census(docs).agg(
        F.sum("n_tables").alias("t"), F.sum("n_data_rows").alias("d"),
        F.max("max_cells").alias("m")).collect()[0]
    assert cen["t"] > 10 and cen["d"] >= 2 * cen["t"] and cen["m"] == 4
    cl = ST.hreflang_clusters(docs)
    assert cl.count() > 5
    # every cluster lists >= 2 language variants + x-default
    assert cl.where(F.col("n_langs") < 3).count() == 0
    assert cl.where(F.col("n_pages") >= 2).count() >= 1
    cov = ST.sitemap_coverage(docs)
    assert cov.count() >= 3
    # phantom locs guarantee coverage strictly < 1 on every host
    assert cov.where(F.col("coverage_rate") >= 1.0).count() == 0
    # header rows never count as data rows
    t = ST.html_tables(docs)
    assert t.where(F.col("is_header") & (F.col("row_idx") != 0)) \
        .count() == 0
    # v9: index hosts list their children; captured children parse as
    # urlsets, so the index host still surfaces page-level entries
    idx = ST.sitemap_index_entries(docs)
    assert idx.count() >= 4
    assert idx.where(F.col("captured")).count() >= 4
    assert idx.where(~F.col("captured")).count() >= 1  # phantom child
    ent = ST.sitemap_entries(docs)
    idx_hosts = [r["host"] for r in idx.select("host").distinct()
                 .collect()]
    assert ent.where(F.col("host").isin(idx_hosts)).count() > 0
    # v9: remarks tables carry a literal '|' cell -> escaped markdown
    md = ST.table_markdown(docs)
    assert md.where(F.col("markdown").contains("\\|")).count() > 0


def test_parse_plans_are_narrow(spark):
    """The three parses are zero-shuffle scan projections (no Exchange,
    no Python); the censuses aggregate without a Window."""
    df = _docs(spark, [("https://t.com/p", PAGE_TABLES)])
    for fn in (ST.html_tables, ST.table_records, ST.sitemap_entries):
        plan = (fn(df)._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan and "Python" not in plan, fn.__name__
    for fn in (ST.table_census, ST.hreflang_clusters, ST.sitemap_coverage):
        plan = (fn(df)._jdf.queryExecution().executedPlan().toString())
        assert "Window" not in plan and "Python" not in plan, fn.__name__


def test_job_frontier_export(spark, tmp_path):
    """--frontier-export publishes <output>/frontier: sitemap-listed
    never-crawled locs, none of them an input url, ranked by the link
    graph's host PageRank, and lineage-accounted as frontier_rows."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import spark_submit_job

    out = str(tmp_path / "job")
    rc = spark_submit_job.main(
        ["--synthetic", "400", "--output", out, "--frontier-export"],
        stop_session=False)
    assert rc == 0
    fr = spark.read.parquet(os.path.join(out, "frontier"))
    n = fr.count()
    assert n > 0
    docs = spark.read.parquet(
        os.path.join(out, "synthetic_documents.parquet"))
    # frontier locs are never already-crawled urls
    assert fr.join(docs.select(F.col("url").alias("loc")), "loc",
                   "inner").count() == 0
    # linked hosts carry positive PageRank priority
    assert fr.where(F.col("priority") > 0).count() > 0
    with open(os.path.join(out, "curation_lineage.json")) as fh:
        counts = json.load(fh)
    assert counts["frontier_rows"] == n


def test_job_recrawl_plan(spark, tmp_path):
    """--recrawl-plan publishes <output>/recrawl: discovery (frontier)
    + stale (lastmod) + sitemap-index (unfetched child) fetches, no
    already-satisfied rows, lineage-accounted as recrawl_rows."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import spark_submit_job

    out = str(tmp_path / "job")
    rc = spark_submit_job.main(
        ["--synthetic", "400", "--output", out, "--recrawl-plan"],
        stop_session=False)
    assert rc == 0
    plan = spark.read.parquet(os.path.join(out, "recrawl"))
    n = plan.count()
    assert n > 0
    reasons = {r["reason"] for r in plan.select("reason")
               .distinct().collect()}
    assert reasons <= {"discovery", "stale", "sitemap-index"}
    assert "discovery" in reasons and "stale" in reasons
    docs = spark.read.parquet(
        os.path.join(out, "synthetic_documents.parquet"))
    # discovery / sitemap-index locs are never already-crawled urls
    fetched = docs.select(F.col("url").alias("loc"))
    assert plan.where(F.col("reason") != "stale").join(
        fetched, "loc", "inner").count() == 0
    # stale locs ARE crawled urls (refetches)
    stale = plan.where(F.col("reason") == "stale")
    assert stale.count() == stale.join(fetched, "loc", "inner").count()
    with open(os.path.join(out, "curation_lineage.json")) as fh:
        counts = json.load(fh)
    assert counts["recrawl_rows"] == n


def test_structured_ops_on_empty_input(spark):
    """Every structured op yields an empty, correctly-typed result on an
    empty capture table — never an error (the resume path replays
    empty buckets)."""
    empty = spark.createDataFrame([], "url string, html binary")
    pri = spark.createDataFrame([], "host string, priority double")
    assert ST.html_tables(empty).count() == 0
    assert ST.table_records(empty).count() == 0
    assert ST.table_pivot(empty, ["A"]).count() == 0
    assert ST.table_census(empty).count() == 0
    assert ST.table_markdown(empty).count() == 0
    assert ST.table_column_profile(empty).count() == 0
    assert ST.hreflang_edges(empty).count() == 0
    assert ST.hreflang_clusters(empty).count() == 0
    assert ST.sitemap_entries(empty).count() == 0
    assert ST.sitemap_index_entries(empty).count() == 0
    assert ST.sitemap_coverage(empty).count() == 0
    assert ST.frontier_candidates(empty, pri).count() == 0
    e2 = spark.createDataFrame([], "url string, html binary, lang string")
    assert ST.hreflang_bitext_pairs(e2).count() == 0
    assert ST.robots_parse(empty).count() == 0
    assert ST.robots_effective_rules(empty).count() == 0


def test_aggregating_ops_have_partial_agg_no_window(spark):
    """filing_records' pivot, table_column_profile and table_markdown
    aggregate with map-side partial aggregation (partial + final
    aggregate nodes around one exchange — Hash, ObjectHash or Sort
    flavor depending on buffer types: max(string) buffers fall back to
    SortAggregate, collect_list to ObjectHashAggregate; all three do
    partial combine) and never a Window."""
    df = _docs(spark, [("https://t.com/p", PAGE_TABLES)])
    for fn in (lambda d: ST.table_pivot(d, ["A", "B"]),
               ST.table_column_profile, ST.table_markdown):
        plan = fn(df)._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan and "Python" not in plan
        assert plan.count("Aggregate") >= 2  # partial + final


def test_pipeline_markdown_docs_inlines_tables(spark):
    """Docs with tables hash differently from their bare extracted
    text; docs without tables hash exactly as md5(extracted_text)."""
    from pyspark.sql import functions as FF

    from ocr_automation_system_spark.queries import (
        extractions_for, q_pipeline_markdown_docs,
    )

    sf = "/root/testdata/sf0.001"
    out = q_pipeline_markdown_docs(spark, sf)
    ext = extractions_for(spark, sf).select(
        "url", FF.md5(FF.coalesce("extracted_text", FF.lit("")))
        .alias("bare_hash"))
    j = out.join(ext, "url")
    with_t = j.where(FF.col("n_tables") > 0)
    assert with_t.count() > 0
    assert with_t.where(
        FF.col("doc_markdown_hash") == FF.col("bare_hash")).count() == 0
    assert j.where((FF.col("n_tables") == 0)
                   & (FF.col("doc_markdown_hash")
                      != FF.col("bare_hash"))).count() == 0


ROBOTS = (b"# crawler rules\n"
          b"User-Agent: *\n"
          b"Disallow: /private/\n"
          b"allow: /private/open\n"
          b"Crawl-delay: 3\n"
          b"\n"
          b"user-agent: FetchBot\n"
          b"Disallow: /\n"
          b"Allow: /pub/\n"
          b"\n"
          b"Sitemap: https://r.com/sitemap.xml\n")


def test_robots_parse_groups_and_attribution(spark):
    """Directive lines attribute to the most recent User-agent line;
    names match case-insensitively; comments/blank/unknown lines drop;
    Sitemap is group-independent (agent '')."""
    rows = [("https://r.com/robots.txt", ROBOTS),
            ("https://r.com/page", b"<html><body>x</body></html>"),
            ("https://x.com/robots.txt", b"Disallow: /early\n")]
    out = ST.robots_parse(_docs(spark, rows)).collect()
    got = {(r["host"], r["agent"], r["directive"], r["value"])
           for r in out}
    assert got == {
        ("r.com", "*", "disallow", "/private/"),
        ("r.com", "*", "allow", "/private/open"),
        ("r.com", "*", "crawl-delay", "3"),
        ("r.com", "fetchbot", "disallow", "/"),
        ("r.com", "fetchbot", "allow", "/pub/"),
        ("r.com", "", "sitemap", "https://r.com/sitemap.xml"),
        # rule before any User-agent line: agent '' (kept, unattributed)
        ("x.com", "", "disallow", "/early"),
    }
    plan = (ST.robots_parse(_docs(spark, rows))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Python" not in plan


def test_robots_parse_stacked_multi_agent_groups(spark):
    """RFC 9309 stacked User-agent groups: a run of consecutive
    User-agent lines (comments/blanks allowed between) opens ONE group
    and every rule attributes to ALL stacked agents; a rule line closes
    the stack, so a later lone User-agent starts a fresh group; Sitemap
    lines neither join nor split a stack."""
    robots = (b"User-agent: newsbot\n"
              b"# stacked pair\n"
              b"User-agent: fetchbot\n"
              b"Disallow: /gst/\n"
              b"Allow: /gst/open\n"
              b"\n"
              b"User-agent: imagebot\n"
              b"Disallow: /img/\n"
              b"Sitemap: https://r.com/sitemap.xml\n"
              b"Disallow: /img2/\n")
    out = ST.robots_parse(
        _docs(spark, [("https://r.com/robots.txt", robots)])).collect()
    got = {(r["agent"], r["directive"], r["value"]) for r in out}
    assert got == {
        ("newsbot", "disallow", "/gst/"),
        ("fetchbot", "disallow", "/gst/"),
        ("newsbot", "allow", "/gst/open"),
        ("fetchbot", "allow", "/gst/open"),
        ("imagebot", "disallow", "/img/"),
        ("", "sitemap", "https://r.com/sitemap.xml"),
        # the sitemap line does not close imagebot's group
        ("imagebot", "disallow", "/img2/"),
    }
    # fetchbot's effective rules union its stacked-group rules
    eff = {(r["prefix"], r["allow"])
           for r in ST.robots_effective_rules(
               _docs(spark, [("https://r.com/robots.txt", robots)]),
               agent="fetchbot").collect()}
    assert eff == {("/gst/", False), ("/gst/open", True)}


def test_robots_effective_rules_group_selection(spark):
    """fetchbot's own group wins where defined; wildcard elsewhere."""
    rows = [("https://r.com/robots.txt", ROBOTS),
            ("https://w.com/robots.txt",
             b"User-agent: *\nDisallow: /all/\n")]
    eff = {(r["host"], r["prefix"], r["allow"])
           for r in ST.robots_effective_rules(
               _docs(spark, rows), agent="fetchbot").collect()}
    assert eff == {("r.com", "/", False), ("r.com", "/pub/", True),
                   ("w.com", "/all/", False)}


def test_robots_corpus_loop_denies_planted_kinds(spark):
    """Corpus law (v9): the parse -> select -> match loop denies
    exactly the urls the parsed rules say — including the planted
    RFC 9309 wildcard rules (end-anchored Disallow + longer Allow
    carve-backs) — reconciled against a plain-Python recompute of the
    same RFC semantics from the parsed rules."""
    import re

    from ocr_automation_system_spark.functions import links as L
    from ocr_automation_system_spark.queries import corpus_for

    def matches(path: str, rule: str) -> bool:
        if "*" in rule or rule.endswith("$"):
            anchored = rule.endswith("$")
            body = rule[:-1] if anchored else rule
            pat = ("^" + re.escape(body).replace(r"\*", ".*")
                   + ("$" if anchored else ""))
            return re.search(pat, path) is not None
        return path.startswith(rule)

    c = corpus_for(spark, "/root/testdata/sf0.001")
    eff = ST.robots_effective_rules(c)
    rules = [(r["host"], r["prefix"], r["allow"]) for r in eff.collect()]
    assert any(a for _, _, a in rules)        # >= 1 Allow carve-back
    assert any(p == "/" for _, p, a in rules if not a)  # fetchbot host
    assert any("*" in p for _, p, _ in rules)  # v9 wildcard rules
    v = {r["url"]: r["allow"] for r in L.robots_verdicts(
        c.select("url"), eff).collect()}
    by_host: dict = {}
    for h, p, a in rules:
        by_host.setdefault(h, []).append((p, a))
    denied = wild_hits = 0
    for url, allow in v.items():
        host = url.split("/")[2]
        path = "/" + url.split("/", 3)[3]
        best = None
        for p, a in by_host.get(host, []):
            if matches(path, p):
                k = (len(p), a)
                if best is None or k > best:
                    best = k
                if "*" in p or p.endswith("$"):
                    wild_hits += 1
        want = best[1] if best is not None else True
        assert allow == want, url
        denied += (not want)
    assert denied > 0
    assert wild_hits > 0  # the wildcard rules actually fire on urls


def test_job_robots_from_corpus(spark, tmp_path):
    """--robots-from-corpus closes the compliance loop inside the job:
    after_robots reconciles with an independent recount of usable docs
    that survive the parsed-rules match."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import spark_submit_job

    from ocr_automation_system_spark.functions import links as L

    out = str(tmp_path / "job")
    rc = spark_submit_job.main(
        ["--synthetic", "400", "--output", out, "--curate",
         "--robots-from-corpus", "fetchbot"], stop_session=False)
    assert rc == 0
    with open(os.path.join(out, "curation_lineage.json")) as fh:
        counts = json.load(fh)
    assert 0 < counts["after_robots"] < counts["usable"]
    docs = spark.read.parquet(
        os.path.join(out, "synthetic_documents.parquet"))
    denied = set(r["url"] for r in L.robots_verdicts(
        docs.select("url"), ST.robots_effective_rules(docs))
        .filter("NOT allow").select("url").collect())
    cur = spark.read.parquet(os.path.join(out, "curated"))
    assert cur.join(
        spark.createDataFrame([(u,) for u in denied], "doc_id string"),
        "doc_id", "inner").count() == 0


def test_robots_crawl_delays_group_selection(spark):
    """The delay comes from the SELECTED group: a host defining a
    fetchbot group without a Crawl-delay gets the default (declared
    false) even when its wildcard group declares one; wildcard-only
    hosts read their declared value."""
    rows = [("https://r.com/robots.txt", ROBOTS),  # fetchbot grp, no CD
            ("https://w.com/robots.txt",
             b"User-agent: *\nCrawl-delay: 7\nDisallow: /x/\n"),
            ("https://n.com/robots.txt",
             b"User-agent: *\nDisallow: /y/\n")]   # no CD anywhere
    out = {r["host"]: (r["crawl_delay"], r["declared"])
           for r in ST.robots_crawl_delays(
               _docs(spark, rows), agent="fetchbot").collect()}
    assert out == {"r.com": (1, False), "w.com": (7, True),
                   "n.com": (1, False)}


def test_sitemap_discovery_declared_vs_captured(spark):
    """Declared sitemaps resolve against actual sitemap captures:
    captured, declared-but-missing (the one-fetch unlock), and
    undeclared captures (no row — the report keys on declarations)."""
    rows = [("https://a.com/robots.txt",
             b"User-agent: *\nDisallow: /x/\n"
             b"Sitemap: https://a.com/sitemap.xml\n"
             b"Sitemap: https://a.com/sitemap-news.xml\n"),
            ("https://a.com/sitemap.xml", SITEMAP),
            ("https://b.com/sitemap.xml", SITEMAP)]  # undeclared capture
    out = {(r["host"], r["declared_loc"], r["captured"])
           for r in ST.sitemap_discovery(_docs(spark, rows)).collect()}
    assert out == {
        ("a.com", "https://a.com/sitemap.xml", True),
        ("a.com", "https://a.com/sitemap-news.xml", False),
    }


def test_stale_captures_lastmod_vs_capture_date(spark):
    """Only listed pages whose lastmod strictly postdates the newest
    capture's calendar date surface; unparsable lastmod drops; never-
    crawled locs (no capture) drop; multiple captures use the newest."""
    import datetime as dt

    smap = (
        '<urlset>'
        '<url><loc>https://s.com/a</loc><lastmod>2025-06-01</lastmod></url>'
        '<url><loc>https://s.com/b</loc><lastmod>2025-01-01</lastmod></url>'
        '<url><loc>https://s.com/c</loc><lastmod>junk</lastmod></url>'
        '<url><loc>https://s.com/ghost</loc><lastmod>2025-06-01</lastmod>'
        '</url></urlset>').encode()
    ts = (lambda m, d: dt.datetime(2025, m, d, 12, 0, 0))
    rows = [("https://s.com/sitemap.xml", smap, ts(1, 1)),
            ("https://s.com/a", b"<html><body>a</body></html>", ts(2, 1)),
            # /a recrawled later but still before its lastmod
            ("https://s.com/a", b"<html><body>a2</body></html>", ts(3, 1)),
            ("https://s.com/b", b"<html><body>b</body></html>", ts(2, 1)),
            ("https://s.com/c", b"<html><body>c</body></html>", ts(2, 1))]
    df = spark.createDataFrame(
        rows, "url string, html binary, warc_ts timestamp")
    out = {(r["url"], r["lastmod"], r["captured_at"])
           for r in ST.stale_captures(df).collect()}
    assert out == {("https://s.com/a", "2025-06-01", ts(3, 1))}


def test_robots_blocked_rate_corpus_law(spark):
    """Per robots-publishing host: n_blocked/n_urls reconciles with the
    corpus-verdicts loop; hosts without robots captures never appear;
    at least one host has a nonzero rate (the fetchbot Disallow-/
    hosts)."""
    from ocr_automation_system_spark.queries import corpus_for

    c = corpus_for(spark, "/root/testdata/sf0.001")
    out = ST.robots_blocked_rate(c).collect()
    assert len(out) > 0
    hosts = {r["host"] for r in ST.robots_parse(c).select("host")
             .distinct().collect()}
    for r in out:
        assert r["host"] in hosts
        assert 0 <= r["n_blocked"] <= r["n_urls"]
        assert r["blocked_rate"] == pytest.approx(
            r["n_blocked"] / r["n_urls"])
    assert any(r["n_blocked"] > 0 for r in out)
    assert any(r["n_blocked"] < r["n_urls"] for r in out)


def test_poison_bytes_at_protocol_urls_degrade(spark):
    """Invalid UTF-8 parked at /sitemap.xml or /robots.txt yields no
    rows — never a decode raise (Spark 4 UTF-8 decode throws on
    malformed bytes; the validity gate keeps poison out of it)."""
    rows = [("https://p.com/sitemap.xml", POISON),
            ("https://p.com/robots.txt", b"\xff\xfeUser-agent: *\n"),
            ("https://q.com/robots.txt", b"User-agent: *\nDisallow: /a\n")]
    df = _docs(spark, rows)
    assert ST.sitemap_entries(df).count() == 0
    parsed = ST.robots_parse(df).collect()
    assert {(r["host"], r["value"]) for r in parsed} == {("q.com", "/a")}
    assert ST.sitemap_coverage(df).count() == 0
