"""Structured-markup extraction: HTML tables, hreflang alternates,
sitemaps.

Three extraction surfaces real crawl pipelines read off raw captures
*besides* the main-content text (reference analogue: the tabular
annexure / NIC-table parse legs, ``/root/reference/project/core/
gst_certi.py`` annexure walk and the Udyam NIC table UDTFs — here the
tables arrive as genuine ``<table>`` markup instead of pre-segmented
OCR lines):

* **html_tables / table_records / table_census** — parse ``<table>``
  markup into (row, cells) long form, then header-aware (field, value)
  records: the "table -> structured records" step every
  invoice/registry/statistics extraction ladder needs. Pure JVM regex
  over the sniff-gated page decode — one narrow projection plus
  exploding generators, ZERO shuffle until a census aggregates.
* **hreflang_edges / hreflang_clusters** — ``<link rel="alternate"
  hreflang=..>`` annotation groups. Real multilingual portals annotate
  every language variant with the IDENTICAL full alternate set, so the
  md5 of the sorted href set is a cluster key that needs no graph
  machinery: one map-side-combinable groupBy, no join, no window —
  this is how bitext-candidate seed lists (ParaCrawl-style) are mined
  from a crawl.
* **sitemap_entries / sitemap_coverage** — parse ``/sitemap.xml``
  captures (``<loc>``/``<lastmod>``) and reconcile the host's LISTED
  url set against its CRAWLED set: coverage rate (listed pages actually
  fetched) and orphan rate (fetched pages the sitemap never lists) are
  the crawl-completeness gauges a recrawl scheduler reads next to
  ``crawl_activity``.

Scale shape at 10^12 docs:

* every parse is a narrow per-row projection (regexp_extract_all +
  explode) — embarrassingly parallel, no Python, no shuffle;
* hreflang clustering is ONE aggregation on a derived row-local key
  (partial combine absorbs the hot big-portal clusters map-side);
* sitemap coverage is ONE url-keyed full-outer join between two
  projections of the same scan (uniform md5-distributed key — skew-free
  by construction) followed by a host census; at Iceberg scale both
  sides read from the url-bucketed table so the join co-locates.

All regexes are RE2-compatible (non-greedy + ``(?is)``, no lookaround)
so the DuckDB twins run them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .links import page_html

#: one <table>...</table> region, inner html captured (group 1).
TABLE_RE = r"(?is)<table[^>]*>(.*?)</table>"
#: one <tr>...</tr> region inside a table (group 1).
TR_RE = r"(?is)<tr[^>]*>(.*?)</tr>"
#: one <td>/<th> cell, inner html captured (group 1).
CELL_RE = r"(?is)<t[dh][^>]*>(.*?)</t[dh]>"
#: any tag — stripped from cell innards before trimming.
TAG_RE = r"(?s)<[^>]*>"
#: one hreflang alternate link tag (whole tag, attrs parsed per-tag).
ALT_TAG_RE = r'(?is)<link[^>]*rel="alternate"[^>]*>'
HREFLANG_ATTR_RE = r'(?is)hreflang="([^"]*)"'
HREF_ATTR_RE = r'(?is)href="([^"]*)"'
#: one <url>...</url> entry of a sitemap urlset (group 1).
SITEMAP_ENTRY_RE = r"(?is)<url>(.*?)</url>"
#: one <sitemap>...</sitemap> entry of a sitemap INDEX file (group 1).
SITEMAP_INDEX_ENTRY_RE = r"(?is)<sitemap>(.*?)</sitemap>"
LOC_RE = r"(?is)<loc>(.*?)</loc>"
LASTMOD_RE = r"(?is)<lastmod>(.*?)</lastmod>"
#: any sitemap-file capture url: the root /sitemap.xml OR an index
#: child like /sitemap-0.xml (never a page url).
SITEMAP_URL_RE = r"/sitemap[^/]*\.xml$"

#: host from a crawl url.
HOST_RE = r"https?://([^/]+)"


def _clean_cell(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, TAG_RE, ""))


def html_tables(df: DataFrame, url_col: str = "url",
                html_col: str = "html") -> DataFrame:
    """(url, table_idx, row_idx, is_header, cells, n_cells) — one row
    per ``<tr>`` of every ``<table>`` on every HTML page.

    Cell text is tag-stripped and trimmed; indexes are 0-based. Pages
    without tables (and non-HTML payloads — poison, PDF, XML) simply
    contribute no rows. Narrow generators only: no shuffle, no Python.
    """
    page = page_html(F.col(html_col))
    tables = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.regexp_extract_all(page, F.lit(TABLE_RE), 1))
        .alias("table_idx", "_t"))
    rows = tables.select(
        "url", "table_idx",
        F.posexplode(F.regexp_extract_all("_t", F.lit(TR_RE), 1))
        .alias("row_idx", "_r"))
    cells = F.transform(
        F.regexp_extract_all("_r", F.lit(CELL_RE), 1), _clean_cell)
    return rows.select(
        "url", "table_idx", "row_idx",
        F.col("_r").rlike("(?is)<th").alias("is_header"),
        cells.alias("cells"),
        F.size(cells).alias("n_cells"))


def table_records(df: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """Header-aware long form: (url, table_idx, row_idx, field, value)
    — each data row's cells zipped positionally against the table's
    first (header) row.

    Entirely row-local: the header array and the data-row slice are
    array expressions over the SAME extracted row list, so no
    self-join and no shuffle — ragged rows pad with NULL on the short
    side (``arrays_zip`` semantics), which is the honest answer for
    malformed markup. Tables whose first row has no cells (headerless)
    contribute no records.
    """
    page = page_html(F.col(html_col))
    tables = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.regexp_extract_all(page, F.lit(TABLE_RE), 1))
        .alias("table_idx", "_t"))
    rows_arr = F.regexp_extract_all("_t", F.lit(TR_RE), 1)
    hdr = F.transform(
        F.regexp_extract_all(F.element_at(rows_arr, 1), F.lit(CELL_RE), 1),
        _clean_cell)
    with_hdr = tables.select(
        "url", "table_idx", F.col("_t").alias("_t"), hdr.alias("_hdr"),
        F.slice(rows_arr, 2, F.greatest(F.size(rows_arr) - 1, F.lit(0)))
        .alias("_data"))
    data_rows = with_hdr.where(F.size("_hdr") > 0).select(
        "url", "table_idx", "_hdr",
        F.posexplode("_data").alias("_pos", "_r"))
    cells = F.transform(
        F.regexp_extract_all("_r", F.lit(CELL_RE), 1), _clean_cell)
    pairs = data_rows.select(
        "url", "table_idx",
        (F.col("_pos") + 1).alias("row_idx"),
        F.explode(F.arrays_zip(F.col("_hdr").alias("field"),
                               cells.alias("value"))).alias("_p"))
    return pairs.select(
        "url", "table_idx", "row_idx",
        F.col("_p.field").alias("field"), F.col("_p.value").alias("value"))


def table_census(df: DataFrame, url_col: str = "url",
                 html_col: str = "html") -> DataFrame:
    """Per-host table-markup census: pages carrying >= 1 table, table
    and data-row totals, widest row. Per-page stats are row-local array
    folds (interpreted HOF lambdas, still narrow — no explode, no
    intermediate blowup), then ONE map-side-combinable groupBy(host) —
    Zipf host skew is absorbed in the partial combine, exactly like
    ``crawl_activity``."""
    page = page_html(F.col(html_col))
    tables_arr = F.regexp_extract_all(page, F.lit(TABLE_RE), 1)
    rows_of = (lambda t:
               F.regexp_extract_all(t, F.lit(TR_RE), 1))
    n_data_rows = F.aggregate(
        tables_arr, F.lit(0).cast("long"),
        lambda acc, t: acc + F.size(F.filter(
            rows_of(t), lambda r: ~r.rlike("(?is)<th"))))
    max_cells = F.aggregate(
        tables_arr, F.lit(0),
        lambda acc, t: F.greatest(acc, F.aggregate(
            rows_of(t), F.lit(0),
            lambda a, r: F.greatest(a, F.size(
                F.regexp_extract_all(r, F.lit(CELL_RE), 1))))))
    per_page = (df.select(
        F.regexp_extract(F.col(url_col), HOST_RE, 1).alias("host"),
        F.size(tables_arr).alias("_n_tables"),
        n_data_rows.alias("_n_data_rows"),
        max_cells.alias("_max_cells"))
        .where(F.col("_n_tables") > 0))
    return per_page.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages_with_tables"),
        F.sum("_n_tables").cast("long").alias("n_tables"),
        F.sum("_n_data_rows").cast("long").alias("n_data_rows"),
        F.max("_max_cells").alias("max_cells"))


def table_pivot(df: DataFrame, fields: list, url_col: str = "url",
                html_col: str = "html") -> DataFrame:
    """Typed wide form: the (field, value) records of every data row
    pivoted back to one row per (url, table_idx, row_idx) with one
    column per requested header field — the last step of the
    "markup -> records -> typed columns" extraction ladder.

    ``fields`` is the explicit schema contract (never inferred from the
    data, so the output schema is stable across corpora — the property
    a downstream table sink needs). The pivot is ONE max(when) rollup
    on the (url, table_idx, row_idx) key — uniform, never skewed — not
    Spark's ``pivot()`` (which needs a distinct-values pass or an
    eager list; the contract list makes both unnecessary)."""
    recs = table_records(df, url_col, html_col)
    aggs = [F.max(F.when(F.col("field") == f, F.col("value")))
            .alias(f.lower()) for f in fields]
    return (recs.where(F.col("field").isin(list(fields)))
            .groupBy("url", "table_idx", "row_idx").agg(*aggs))


def table_markdown(df: DataFrame, url_col: str = "url",
                   html_col: str = "html") -> DataFrame:
    """(url, table_idx, markdown) — each parsed table rendered as a
    GitHub-style markdown block (header row, ``---`` separator, data
    rows), the text form LLM training exporters inline tables as.

    First row is the header by position (matching ``table_records``).
    ONE uniform-key aggregation (url, table_idx): rows fold into a
    row_idx-sorted struct list, the line render is a per-row array
    transform. A literal ``|`` inside a cell escapes to ``\\|`` so the
    rendered row keeps its column count for any markdown reader."""
    t = html_tables(df, url_col, html_col)
    rowlist = F.array_sort(F.collect_list(F.struct("row_idx", "cells")))
    per_table = t.groupBy("url", "table_idx").agg(
        rowlist.alias("_rows"))
    lines = F.transform(
        F.col("_rows"),
        lambda r: F.concat(
            F.lit("| "),
            F.concat_ws(" | ", F.transform(
                r["cells"],
                lambda c: F.replace(c, F.lit("|"), F.lit("\\|")))),
            F.lit(" |")))
    n_hdr = F.size(F.element_at(F.col("_rows"), 1)["cells"])
    sep = F.concat(F.lit("|"), F.expr("repeat(' --- |', _n_hdr)"))
    with_lines = per_table.select(
        "url", "table_idx", lines.alias("_lines"), n_hdr.alias("_n_hdr"))
    body = F.array_join(F.slice(
        F.col("_lines"), 2,
        F.greatest(F.size("_lines") - 1, F.lit(0))), "\n")
    md = F.concat(
        F.element_at(F.col("_lines"), 1), F.lit("\n"), sep,
        F.when(F.size("_lines") > 1, F.concat(F.lit("\n"), body))
        .otherwise(F.lit("")))
    return with_lines.select("url", "table_idx", md.alias("markdown"))


def hreflang_edges(df: DataFrame, url_col: str = "url",
                   html_col: str = "html") -> DataFrame:
    """(url, hreflang, href) — one row per alternate-language link tag.

    Tag-level explode first, then per-tag attribute extracts (the
    ``extract_links`` pattern: one regex can't bind two attributes in
    either attr order). Narrow, zero shuffle."""
    page = page_html(F.col(html_col))
    tags = df.select(
        F.col(url_col).alias("url"),
        F.explode(F.regexp_extract_all(page, F.lit(ALT_TAG_RE), 0))
        .alias("_tag"))
    return (tags.select(
        "url",
        F.regexp_extract("_tag", HREFLANG_ATTR_RE, 1).alias("hreflang"),
        F.regexp_extract("_tag", HREF_ATTR_RE, 1).alias("href"))
        .where((F.col("hreflang") != "") & (F.col("href") != "")))


def hreflang_clusters(df: DataFrame, url_col: str = "url",
                      html_col: str = "html") -> DataFrame:
    """Alternate-set clusters: pages listing the IDENTICAL sorted href
    set group under cluster_id = md5 of that set.

    The cluster key is row-local (the page's own tag array, sorted) —
    no graph propagation needed because the hreflang contract is that
    every variant carries the full set. ONE aggregation; langs arrive
    as a sorted '|'-joined key so the fold is a plain min/max over
    strings (identical across members by construction)."""
    page = page_html(F.col(html_col))
    tags = F.regexp_extract_all(page, F.lit(ALT_TAG_RE), 0)
    hrefs = F.array_sort(F.transform(
        tags, lambda t: F.regexp_extract(t, HREF_ATTR_RE, 1)))
    langs = F.array_sort(F.transform(
        tags, lambda t: F.regexp_extract(t, HREFLANG_ATTR_RE, 1)))
    per_page = (df.select(
        F.col(url_col).alias("url"),
        F.md5(F.concat_ws("|", hrefs)).alias("cluster_id"),
        F.concat_ws("|", langs).alias("_langs_key"),
        F.size(hrefs).alias("_n_alts"))
        .where(F.col("_n_alts") > 0))
    return per_page.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.min("url").alias("first_url"),
        F.min("_langs_key").alias("langs_key"),
        F.max("_n_alts").alias("n_langs"))


def table_column_profile(df: DataFrame, url_col: str = "url",
                         html_col: str = "html") -> DataFrame:
    """Schema-inference census over the extracted records: per
    (host, field) how many values look integer / ISO-date / empty —
    the profile that decides each column's target type before a typed
    sink (the corpus-scale version of ``filing_records``'s hand-picked
    casts). ONE map-side-combinable groupBy over the narrow record
    parse; rates are exact-integer divisions, correctly rounded once."""
    recs = table_records(df, url_col, html_col)
    v = F.col("value")
    nn = v.isNotNull() & (v != "")
    prof = (recs.where(F.col("field").isNotNull())
            .groupBy(F.regexp_extract("url", HOST_RE, 1).alias("host"),
                     F.col("field"))
            .agg(F.count(F.lit(1)).alias("n_values"),
                 F.sum(F.when(nn, 1).otherwise(0)).cast("long")
                 .alias("n_nonempty"),
                 F.sum(F.when(nn & v.rlike(r"^[0-9]+$"), 1).otherwise(0))
                 .cast("long").alias("n_int"),
                 F.sum(F.when(
                     nn & v.rlike(r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"),
                     1).otherwise(0)).cast("long").alias("n_date")))
    rate = (lambda c: F.when(F.col("n_nonempty") > 0,
                             F.col(c).cast("double")
                             / F.col("n_nonempty").cast("double"))
            .otherwise(F.lit(0.0)))
    return prof.select(
        "host", "field", "n_values", "n_nonempty", "n_int", "n_date",
        rate("n_int").alias("int_rate"), rate("n_date").alias("date_rate"))


def hreflang_bitext_pairs(df: DataFrame, url_col: str = "url",
                          html_col: str = "html",
                          lang_col: str = "lang",
                          max_cluster: int = 32) -> DataFrame:
    """Cross-language document pairs mined from hreflang clusters — the
    ParaCrawl seeding step: two pages in the same alternate-set cluster
    whose OWN language labels differ are bitext candidates.

    The self-join is bounded: clusters are variant sets of one logical
    page (size ~ n_langs), and a pathological mega-cluster is dropped
    FIRST via the house occupancy-cap pattern — groupBy(cluster).count
    (map-side combinable, absorbs the hot key) -> over-cap key set ->
    broadcast anti-join — so the hot cluster is never materialized in
    one task, then the equi-self-join on cluster_id runs on surviving
    (bounded) groups only. Pairs are canonical (url_a < url_b)."""
    page = page_html(F.col(html_col))
    tags = F.regexp_extract_all(page, F.lit(ALT_TAG_RE), 0)
    hrefs = F.array_sort(F.transform(
        tags, lambda t: F.regexp_extract(t, HREF_ATTR_RE, 1)))
    members = (df.select(
        F.col(url_col).alias("url"), F.col(lang_col).alias("lang"),
        F.md5(F.concat_ws("|", hrefs)).alias("cluster_id"),
        F.size(hrefs).alias("_n"))
        .where(F.col("_n") > 0).drop("_n"))
    over = (members.groupBy("cluster_id").count()
            .where(F.col("count") > max_cluster).select("cluster_id"))
    kept = members.join(F.broadcast(over), "cluster_id", "left_anti")
    a = kept.select("cluster_id", F.col("url").alias("url_a"),
                    F.col("lang").alias("lang_a"))
    b = kept.select("cluster_id", F.col("url").alias("url_b"),
                    F.col("lang").alias("lang_b"))
    return (a.join(b, "cluster_id")
            .where((F.col("url_a") < F.col("url_b"))
                   & (F.col("lang_a") != F.col("lang_b"))))


def _sitemap_xml(url_col: str, html_col: str) -> Column:
    """Gated decode of any sitemap-file capture (root or index child).

    Gated on BOTH the url shape and byte validity: a poison capture
    parked at a sitemap url must degrade to no rows, never throw
    (Spark 4's UTF-8 decode raises on malformed bytes). The corpus
    never emits invalid bytes, so the twin (plain decode) stays
    hash-identical; the guard is pinned by a Spark-side poison
    fixture."""
    is_map = F.col(url_col).rlike(SITEMAP_URL_RE)
    return F.when(is_map & F.is_valid_utf8(F.col(html_col)),
                  F.decode(F.col(html_col), "UTF-8")).otherwise(F.lit(""))


def sitemap_entries(df: DataFrame, url_col: str = "url",
                    html_col: str = "html") -> DataFrame:
    """(host, loc, lastmod) — one row per ``<url>`` entry of every
    sitemap capture, including INDEX children: a ``sitemap-of-sitemaps``
    at ``/sitemap.xml`` lists child files (``/sitemap-0.xml``, ...)
    whose urlsets are themselves corpus captures, so the "recursion" is
    simply parsing every url matching `SITEMAP_URL_RE` — index files
    carry ``<sitemap>`` (not ``<url>``) entries and therefore
    contribute no page rows themselves (`sitemap_index_entries` reads
    those). Malformed entries yield '' fields rather than raising.
    Narrow, zero shuffle."""
    xml = _sitemap_xml(url_col, html_col)
    entries = df.select(
        F.regexp_extract(F.col(url_col), HOST_RE, 1).alias("host"),
        F.explode(F.regexp_extract_all(xml, F.lit(SITEMAP_ENTRY_RE), 1))
        .alias("_e"))
    return entries.select(
        "host",
        F.regexp_extract("_e", LOC_RE, 1).alias("loc"),
        F.regexp_extract("_e", LASTMOD_RE, 1).alias("lastmod"))


def sitemap_index_entries(df: DataFrame, url_col: str = "url",
                          html_col: str = "html") -> DataFrame:
    """(host, child_loc, captured) — one row per ``<sitemap>`` entry of
    every sitemap INDEX capture, with ``captured`` marking whether the
    listed child sitemap file is itself a corpus capture. A false row
    is a crawl gap at the INDEX level (a whole child sitemap — and
    every page it lists — is invisible until that file is fetched), the
    sitemap-tier analogue of `frontier_candidates`' page-level gap.

    The capture check is one equi-join between two TINY projections
    (index entries x sitemap-url captures — both a handful of rows per
    publishing host), broadcast-sized at any corpus scale."""
    xml = _sitemap_xml(url_col, html_col)
    idx = (df.select(
        F.regexp_extract(F.col(url_col), HOST_RE, 1).alias("host"),
        F.explode(F.regexp_extract_all(
            xml, F.lit(SITEMAP_INDEX_ENTRY_RE), 1)).alias("_e"))
        .select("host",
                F.regexp_extract("_e", LOC_RE, 1).alias("child_loc")))
    maps = (df.select(F.col(url_col).alias("child_loc"))
            .where(F.col("child_loc").rlike(SITEMAP_URL_RE))
            .withColumn("_c", F.lit(1)))
    return (idx.join(F.broadcast(maps), "child_loc", "left")
            .select("host", "child_loc",
                    F.col("_c").isNotNull().alias("captured")))


def frontier_candidates(df: DataFrame, priorities: DataFrame,
                        url_col: str = "url",
                        html_col: str = "html") -> DataFrame:
    """(host, loc, priority) — sitemap-listed locs the crawler has NOT
    fetched, ranked by the host's recrawl priority: the concrete fetch
    list a frontier scheduler emits (sitemap gap x host importance).

    One url-keyed LEFT ANTI join (phantom locs = listed minus crawled;
    uniform key) + one LEFT join against the broadcast-size host
    priority dimension; hosts missing from the priority table keep 0.0
    (never-linked hosts still deserve a first fetch)."""
    listed = sitemap_entries(df, url_col, html_col).select("host", "loc")
    crawled = (df.select(F.col(url_col).alias("loc"))
               .where(~F.col("loc").rlike(SITEMAP_URL_RE)))
    phantom = listed.join(crawled, "loc", "left_anti")
    pri = priorities.select("host", "priority")
    return (phantom.join(pri, "host", "left")
            .select("host", "loc",
                    F.coalesce(F.col("priority"), F.lit(0.0))
                    .alias("priority")))


#: one robots.txt directive line: name, ':', value (names are matched
#: case-insensitively; unknown names and comments yield no row).
ROBOTS_LINE_RE = (r"(?i)^[ \t]*"
                  r"(user-agent|allow|disallow|sitemap|crawl-delay)"
                  r"[ \t]*:[ \t]*(.*?)[ \t\r]*$")
ROBOTS_UA_RE = r"(?i)^[ \t]*user-agent[ \t]*:"
#: a group-RULE line (splits stacked User-agent blocks; Sitemap is
#: group-independent per the RFC so it does NOT split a stack, and
#: comments/blank/unknown lines never do).
ROBOTS_RULE_RE = r"(?i)^[ \t]*(allow|disallow|crawl-delay)[ \t]*:"


def robots_parse(df: DataFrame, url_col: str = "url",
                 html_col: str = "html") -> DataFrame:
    """(host, line_no, agent, directive, value) — one row per
    (directive line, group agent) of every ``/robots.txt`` capture.
    Groups follow RFC 9309 including STACKED ``User-agent`` lines: a
    run of consecutive User-agent lines (comments/blank lines allowed
    between, rule lines not) opens ONE group, and every rule in that
    group emits one row per stacked agent. ``Sitemap`` lines are
    group-independent per the RFC and carry agent '' (they neither
    join nor split a stack).

    Entirely row-local: the line array, the agent/rule position arrays
    and the per-line agent-block attribution are array expressions over
    ONE split (the block for rule i = the UA positions p <= last-UA(i)
    with no rule line strictly between p and last-UA(i) — no fold, no
    state machine), then two explodes. Zero shuffle, zero Python;
    comments, blank lines, mixed-case names and unknown directives
    drop out at the line regex."""
    is_robots = F.col(url_col).endswith("/robots.txt")
    # url-shape AND byte-validity gated, like sitemap_entries: poison
    # bytes at /robots.txt degrade to no rows instead of raising.
    txt = F.when(is_robots & F.is_valid_utf8(F.col(html_col)),
                 F.decode(F.col(html_col), "UTF-8")).otherwise(F.lit(""))
    base = df.select(
        F.regexp_extract(F.col(url_col), HOST_RE, 1).alias("host"),
        F.split(txt, "\n").alias("_ls"))
    idx = F.sequence(F.lit(0), F.size("_ls") - 1)
    line_at = (lambda i: F.element_at(F.col("_ls"), i + 1))
    ua_pos = F.filter(idx, lambda i: line_at(i).rlike(ROBOTS_UA_RE))
    rule_pos = F.filter(idx, lambda i: line_at(i).rlike(ROBOTS_RULE_RE))
    with_pos = base.select(
        "host", "_ls", idx.alias("_idx"), ua_pos.alias("_ua"),
        rule_pos.alias("_rl"))
    exploded = with_pos.select(
        "host", "_ls", "_ua", "_rl",
        F.explode("_idx").alias("line_no"))
    line = F.element_at(F.col("_ls"), F.col("line_no") + 1)
    directive = F.lower(F.regexp_extract(line, ROBOTS_LINE_RE, 1))
    value = F.regexp_extract(line, ROBOTS_LINE_RE, 2)
    # the stacked UA block for this rule: every UA position p up to the
    # last UA before the rule with no RULE line strictly between p and
    # that last UA (rule lines close a stack; Sitemap/comments don't).
    last_ua = F.array_max(F.filter(
        F.col("_ua"), lambda p: p < F.col("line_no")))
    block = F.filter(
        F.col("_ua"),
        lambda p: (p <= last_ua) & (F.size(F.filter(
            F.col("_rl"), lambda r: (r > p) & (r < last_ua))) == 0))
    agent_names = F.transform(
        block, lambda p: F.lower(F.regexp_extract(
            F.element_at(F.col("_ls"), p + 1), ROBOTS_LINE_RE, 2)))
    has_agent = F.size(F.filter(
        F.col("_ua"), lambda p: p < F.col("line_no"))) > 0
    agents = (F.when(directive == "sitemap", F.array(F.lit("")))
              .when(has_agent, agent_names)
              .otherwise(F.array(F.lit(""))))
    kept = (exploded
            .select("host", "line_no", agents.alias("_agents"),
                    directive.alias("directive"), value.alias("value"))
            .where(F.col("directive").isin("allow", "disallow", "sitemap",
                                           "crawl-delay")))
    return kept.select(
        "host", "line_no", F.explode("_agents").alias("agent"),
        "directive", "value")


def robots_effective_rules(df: DataFrame, agent: str = "fetchbot",
                           url_col: str = "url",
                           html_col: str = "html") -> DataFrame:
    """(host, prefix, allow) — the Allow/Disallow rules the named
    crawler must obey per host: its OWN group when the host defines
    one, else the wildcard group (RFC 9309 group selection). The output
    is exactly the rules-table schema ``links.robots_verdicts``
    matches against, closing the parse -> select -> match compliance
    ladder over the corpus's own captures.

    One groupBy(host) census of the (tiny) parsed-rules table to find
    hosts with a specific group, joined back broadcast-size."""
    rules = (robots_parse(df, url_col, html_col)
             .where(F.col("directive").isin("allow", "disallow")
                    & F.col("agent").isin("*", agent.lower())))
    has_specific = (rules.groupBy("host")
                    .agg(F.max((F.col("agent") == agent.lower())
                               .cast("int")).alias("_spec")))
    return (rules.join(F.broadcast(has_specific), "host")
            .where((F.col("_spec") == 1)
                   == (F.col("agent") == agent.lower()))
            .select("host", F.col("value").alias("prefix"),
                    (F.col("directive") == "allow").alias("allow")))


def robots_crawl_delays(df: DataFrame, agent: str = "fetchbot",
                        default_delay: int = 1,
                        url_col: str = "url",
                        html_col: str = "html") -> DataFrame:
    """(host, crawl_delay, declared) — the politeness interval the
    named crawler must honor per robots-publishing host: the
    Crawl-delay of its SELECTED group (same RFC 9309 group selection as
    ``robots_effective_rules`` — own group where defined, else
    wildcard; a selected group without a Crawl-delay falls back to
    ``default_delay``, declared=false). Feeds the X84 scheduler's
    per-host delay. Two censuses of the tiny parsed table, broadcast
    joins only."""
    a = agent.lower()
    parsed = robots_parse(df, url_col, html_col)
    grp = parsed.where(
        F.col("directive").isin("allow", "disallow", "crawl-delay")
        & F.col("agent").isin("*", a))
    spec = grp.groupBy("host").agg(
        F.max((F.col("agent") == a).cast("int")).alias("_spec"))
    sel = (grp.join(F.broadcast(spec), "host")
           .where((F.col("_spec") == 1) == (F.col("agent") == a)))
    declared = (sel.where(F.col("directive") == "crawl-delay")
                .groupBy("host")
                .agg(F.min(F.expr("try_cast(value AS BIGINT)"))
                     .alias("_d")))
    hosts = parsed.select("host").distinct()
    return (hosts.join(F.broadcast(declared), "host", "left")
            .select("host",
                    F.coalesce(F.col("_d"),
                               F.lit(default_delay).cast("long"))
                    .alias("crawl_delay"),
                    F.col("_d").isNotNull().alias("declared")))


def sitemap_coverage(df: DataFrame, url_col: str = "url",
                     html_col: str = "html") -> DataFrame:
    """Per-host listed-vs-crawled reconciliation for hosts that publish
    a sitemap: n_listed, n_crawled, n_both, plus coverage rate
    (listed locs actually fetched) and orphan rate (fetched pages the
    sitemap omits).

    One url-keyed full-outer join between the sitemap-entry projection
    and the crawled-page projection of the SAME scan, then one host
    census. Rates are exact-integer divisions, correctly rounded once
    — bit-identical in the DuckDB twin."""
    listed = sitemap_entries(df, url_col, html_col) \
        .select("host", F.col("loc").alias("u"), F.lit(1).alias("_l"))
    crawled = (df.select(F.col(url_col).alias("u"))
               .where(~F.col("u").rlike(SITEMAP_URL_RE))
               .select(F.regexp_extract("u", HOST_RE, 1).alias("host"),
                       "u", F.lit(1).alias("_c")))
    # restrict to hosts that published a sitemap (the report's subject)
    map_hosts = listed.select("host").distinct()
    joined = (listed.join(crawled, ["host", "u"], "full_outer")
              .join(map_hosts, ["host"], "left_semi"))
    agg = joined.groupBy("host").agg(
        F.sum(F.coalesce(F.col("_l"), F.lit(0))).cast("long")
        .alias("n_listed"),
        F.sum(F.coalesce(F.col("_c"), F.lit(0))).cast("long")
        .alias("n_crawled"),
        F.sum(F.when(F.col("_l").isNotNull() & F.col("_c").isNotNull(),
                     1).otherwise(0)).cast("long").alias("n_both"))
    cov = F.when(F.col("n_listed") > 0,
                 F.col("n_both").cast("double")
                 / F.col("n_listed").cast("double")).otherwise(F.lit(0.0))
    orphan = F.when(
        F.col("n_crawled") > 0,
        (F.col("n_crawled") - F.col("n_both")).cast("double")
        / F.col("n_crawled").cast("double")).otherwise(F.lit(0.0))
    return agg.select(
        "host", "n_listed", "n_crawled", "n_both",
        cov.alias("coverage_rate"), orphan.alias("orphan_rate"))


def sitemap_discovery(df: DataFrame, url_col: str = "url",
                      html_col: str = "html") -> DataFrame:
    """(host, declared_loc, captured) — every ``Sitemap:`` line a
    robots.txt capture declares, with ``captured`` marking whether the
    declared sitemap file is itself a corpus capture. The discovery
    loop's missing edge: a declared-but-never-fetched sitemap is a
    one-fetch unlock for the host's whole listed url set (it belongs at
    the top of a frontier), and a fetched sitemap nobody declares is
    fine (discovery has other channels) — the asymmetry is why the
    report keys on declarations.

    One equi-join between two TINY projections (robots Sitemap lines x
    sitemap-url captures), broadcast at any corpus scale."""
    declared = (robots_parse(df, url_col, html_col)
                .where(F.col("directive") == "sitemap")
                .select("host", F.col("value").alias("declared_loc")))
    maps = (df.select(F.col(url_col).alias("declared_loc"))
            .where(F.col("declared_loc").rlike(SITEMAP_URL_RE))
            .distinct().withColumn("_c", F.lit(1)))
    return (declared.join(F.broadcast(maps), "declared_loc", "left")
            .select("host", "declared_loc",
                    F.col("_c").isNotNull().alias("captured")))


def stale_captures(df: DataFrame, url_col: str = "url",
                   html_col: str = "html",
                   ts_col: str = "warc_ts") -> DataFrame:
    """(host, url, lastmod, captured_at) — crawled pages whose
    publisher-declared sitemap ``<lastmod>`` postdates the NEWEST
    stored capture: the lastmod-driven refetch list (the other half of
    the recrawl scheduler next to `frontier_candidates`, which covers
    never-fetched locs; this covers fetched-but-stale ones).

    One url-keyed equi-join between the sitemap-entry projection and a
    per-url max-timestamp census of the same scan (both uniform keys),
    then a date comparison: stale = lastmod (a DATE) strictly after the
    capture's UTC calendar date. Unparsable/absent lastmod values drop
    at the try_cast."""
    listed = (sitemap_entries(df, url_col, html_col)
              .select("host", F.col("loc").alias("url"),
                      F.expr("try_cast(lastmod AS DATE)").alias("_lm"))
              .where(F.col("_lm").isNotNull()))
    newest = (df.select(F.col(url_col).alias("url"), F.col(ts_col))
              .where(~F.col("url").rlike(SITEMAP_URL_RE))
              .groupBy("url")
              .agg(F.max(ts_col).alias("captured_at")))
    # session tz is pinned UTC (session.py), so to_date(timestamp) is
    # the naive calendar date — the same thing DuckDB's CAST(ts AS
    # DATE) reads off the parquet microseconds.
    return (listed.join(newest, "url")
            .where(F.col("_lm") > F.to_date(F.col("captured_at")))
            .select("host", "url",
                    F.col("_lm").cast("string").alias("lastmod"),
                    "captured_at"))


def robots_blocked_rate(df: DataFrame, agent: str = "fetchbot",
                        url_col: str = "url",
                        html_col: str = "html") -> DataFrame:
    """(host, n_urls, n_blocked, blocked_rate) — per robots-publishing
    host, how much of the stored crawl the named agent may NOT keep
    under the host's own parsed rules: the compliance-exposure census a
    curation run reads before deciding whether ``--robots-from-corpus``
    will gut a source (a high rate usually means the crawler that built
    the archive ignored robots, or the rules changed since).

    Composes the closed loop (parse -> select -> match) and adds ONE
    map-side-combinable host census over the verdicts; the
    robots-publishing-host restriction is a broadcast semi-join against
    the tiny parsed-rules host set."""
    from . import links as L

    c = df.select(F.col(url_col).alias("url"), F.col(html_col)
                  .alias("html"))
    eff = robots_effective_rules(c, agent=agent)
    v = L.robots_verdicts(c.select("url"), eff)
    hosts = (robots_parse(c).select("host").distinct())
    per_url = v.select(
        F.regexp_extract("url", HOST_RE, 1).alias("host"),
        (~F.col("allow")).cast("int").alias("_b"))
    agg = (per_url.join(F.broadcast(hosts), "host", "left_semi")
           .groupBy("host")
           .agg(F.count(F.lit(1)).alias("n_urls"),
                F.sum("_b").cast("long").alias("n_blocked")))
    return agg.select(
        "host", "n_urls", "n_blocked",
        (F.col("n_blocked").cast("double")
         / F.col("n_urls").cast("double")).alias("blocked_rate"))
