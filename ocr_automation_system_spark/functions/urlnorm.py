"""URL canonicalization + canonical-URL dedup for web corpora.

A Common-Crawl-scale pipeline sees the same page under many raw URL
spellings (case-variant hosts, default ports, fragments, tracking
parameters, path junk like ``//`` and ``/./`` and trailing
``index.html``).  Canonicalizing BEFORE exact/near dedup collapses those
spellings so the cheap exact-dedup tier catches them instead of the
expensive LSH tiers.

Design constraints (same discipline as ``curation.pii_scrub``):

* Pure JVM column expressions — regexp chains + array ops, zero Python,
  zero shuffle: canonicalization is a narrow projection that fuses with
  the scan at any corpus size.
* Every regex is RE2-compatible (no lookaround, no backrefs in the
  PATTERN) and the pattern strings are shared verbatim with the DuckDB
  oracle twin (``queries.py``); only the replacement backref spelling
  differs per engine (Java ``$1`` vs RE2 ``\\1``).
* Deterministic: string ops only, so reruns/resumes/partitionings agree.

Canonicalization steps, in order (each step's engine parity is pinned by
``tests/test_urlnorm.py`` fixtures and the hash-checked contract queries
``url_canonicalize`` / ``url_dup_groups``):

1. strip the fragment (``#...``);
2. lowercase the ``scheme://host[:port]`` prefix (path/query case is
   significant and preserved);
3. drop default ports (``https…:443``, ``http…:80``);
4. path: collapse ``//`` runs, drop ``/./`` segments, drop a trailing
   ``index.html``/``index.htm``, drop the trailing slash (root ``/`` and
   empty path both canonicalize to ``/``);
5. query: split on ``&``, drop tracking params (``utm_*``, ``fbclid``,
   ``gclid``, ``ref``), sort the survivors bytewise, rejoin (an empty
   survivor set drops the ``?`` entirely).
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ``scheme://authority`` prefix (authority = everything up to the first
#: ``/``, ``?`` or ``#``). Group 1 is the whole prefix.
URL_PREFIX_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
#: default-port suffixes, anchored to the (already lowercased) prefix.
URL_HTTPS_443_RE = r"^(https://[^/?#:]*):443$"
URL_HTTP_80_RE = r"^(http://[^/?#:]*):80$"
#: tracking query params dropped during canonicalization.
URL_TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="
#: path-junk patterns (applied in this order; the ``/./`` strip runs
#: twice because non-overlapping replacement resolves ``/././`` only
#: half-way per pass — both engines apply the same two passes).
URL_SLASH_RUN_RE = r"/{2,}"
URL_DOT_SEG_RE = r"/\./"
URL_INDEX_RE = r"/index\.html?$"
URL_TRAILING_SLASH_RE = r"(.)/$"


def _prefix(u: Column) -> Column:
    return F.regexp_extract(u, URL_PREFIX_RE, 1)


def _rest(u: Column, prefix: Column) -> Column:
    return u.substr(F.length(prefix) + 1, F.length(u))


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (steps in module doc).

    One expression tree, evaluated JVM-side; a URL that does not match
    the scheme prefix (relative/garbage) passes through steps 4-5 with an
    empty prefix, which leaves it essentially untouched — callers gate on
    scheme upstream if they need strictness.
    """
    nf = F.regexp_replace(url, r"#.*$", "")
    pre = F.lower(_prefix(nf))
    pre = F.regexp_replace(pre, URL_HTTPS_443_RE, "$1")
    pre = F.regexp_replace(pre, URL_HTTP_80_RE, "$1")
    rest = _rest(nf, _prefix(nf))
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"[?](.*)$", 1)
    path = F.regexp_replace(path, URL_SLASH_RUN_RE, "/")
    path = F.regexp_replace(path, URL_DOT_SEG_RE, "/")
    path = F.regexp_replace(path, URL_DOT_SEG_RE, "/")
    path = F.regexp_replace(path, URL_INDEX_RE, "/")
    path = F.regexp_replace(path, URL_TRAILING_SLASH_RE, "$1")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda x: (F.length(x) > 0) & ~x.rlike(URL_TRACKING_PARAM_RE)))
    qq = F.array_join(params, "&")
    return F.concat(
        pre, path,
        F.when(qq == "", F.lit("")).otherwise(F.concat(F.lit("?"), qq)))


def messy_variant(url: Column) -> Column:
    """Deterministic messy spelling of a clean URL, keyed on the first
    md5 hex digit — the corpus-side generator for the contract queries.

    Classes (4 hex digits each) exercise every canonicalization path:

    * ``0-3``: uppercased scheme+host, fragment appended — canonical
      round-trips to the input;
    * ``4-7``: explicit ``:443`` default port + tracking-only query —
      round-trips;
    * ``8-b``: path junk ``/.//index.html`` appended — round-trips;
    * ``c-f``: unsorted mixed query ``?z=9&a=1&utm_medium=email&m=5`` —
      canonicalizes to the input plus the sorted non-tracking params
      ``?a=1&m=5&z=9`` (round-trip false BY DESIGN: this class is what
      exercises the param filter+sort in the hash-checked contract).
    """
    d = F.substring(F.md5(url), 1, 1)
    pre = _prefix(url)
    rest = _rest(url, pre)
    return (
        F.when(d.isin("0", "1", "2", "3"),
               F.concat(F.upper(pre), rest, F.lit("#frag-2")))
        .when(d.isin("4", "5", "6", "7"),
              F.concat(pre, F.lit(":443"), rest,
                       F.lit("?utm_source=feed&utm_campaign=x&gclid=z")))
        .when(d.isin("8", "9", "a", "b"),
              F.concat(url, F.lit("/.//index.html")))
        .otherwise(F.concat(url, F.lit("?z=9&a=1&utm_medium=email&m=5")))
    )


def url_duplicates(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Group raw URL spellings by canonical form: (canon_url, n_forms,
    n_distinct_raw, keep_url = min raw spelling).

    Same single-shuffle shape as ``dedup.exact_duplicates`` — one groupBy
    on the canonical string (uniform after md5-free hashing of distinct
    canon keys; a mega-duplicated canonical URL is the AQE skew case).
    """
    c = df.select(F.col(url_col).alias("raw_url"),
                  canonicalize_url(F.col(url_col)).alias("canon_url"))
    return (
        c.groupBy("canon_url")
        .agg(F.count(F.lit(1)).alias("n_forms"),
             F.countDistinct("raw_url").alias("n_distinct_raw"),
             F.min("raw_url").alias("keep_url"))
    )


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-shape filter features (FineWeb/RefinedWeb-style URL
    filtering runs BEFORE fetching or parsing a byte of html): host,
    TLD, path depth, query-param count, digit-in-path flag, length.
    One narrow codegen projection — RE2-compatible patterns shared
    verbatim with the twin; zero shuffle."""
    u = F.col(url_col)
    host = F.regexp_extract(u, r"^[a-z]+://([^/?#]+)", 1)
    path = F.regexp_extract(u, r"^[a-z]+://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    return df.select(
        u.alias("url"),
        host.alias("host"),
        F.regexp_extract(host, r"\.([a-z0-9-]+)$", 1).alias("tld"),
        F.size(F.filter(F.split(path, "/"),
                        lambda x: x != "")).cast("long").alias("path_depth"),
        F.when(query == "", F.lit(0))
        .otherwise(F.size(F.split(query, "&"))).cast("long")
        .alias("n_query_params"),
        path.rlike("[0-9]").alias("digit_in_path"),
        F.length(u).cast("long").alias("url_len"),
    )


def url_path_skeleton(url: Column) -> Column:
    """Path template of a URL: the path with long hex runs folded to
    ``H`` (content hashes, session ids) and digit runs to ``N``
    (pagination, date parts, numeric ids) — the skeleton under which a
    host's calendar pages, paginated listings and id-addressed
    documents all collapse to ONE pattern. Query/fragment excluded
    (they're the canonicalizer's jurisdiction); empty path reads as
    '/'. Pure zero-shuffle regex projection, identical RE2/Java
    classes."""
    path = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(/[^?#]*)?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    sk = F.regexp_replace(path, r"[0-9a-f]{8,}", "H")
    return F.regexp_replace(sk, r"[0-9]+", "N")


def url_pattern_census(df: DataFrame, url_col: str = "url",
                       trap_threshold: int = 20) -> DataFrame:
    """Per-host URL template census: (host, skeleton, n_urls,
    example_url, trap) — the frontier-side structure miner crawl
    schedulers run before wasting fetches: a skeleton holding
    thousands of URLs on one host is a pagination surface or crawler
    trap (infinite calendars, faceted search) to throttle or cap,
    independent of any content-side dedup.

    Scale shape: one zero-shuffle skeleton projection + ONE
    map-side-combined groupBy over (host, skeleton) — template
    cardinality is tiny next to URL cardinality, so partials collapse
    map-side; example_url is a min() fold, never a collect."""
    u = F.coalesce(F.col(url_col), F.lit(""))
    host = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    return (df.select(host.alias("host"),
                      url_path_skeleton(u).alias("skeleton"),
                      F.col(url_col).alias("_u"))
            .groupBy("host", "skeleton")
            .agg(F.count(F.lit(1)).alias("n_urls"),
                 F.min("_u").alias("example_url"))
            .withColumn("trap", F.col("n_urls") >= trap_threshold))


# ---------------------------------------------------------------------------
# Registrable domain (eTLD+1) via public-suffix longest match (X154)
# ---------------------------------------------------------------------------

#: Demo subset of the Mozilla Public Suffix List. The real list ships
#: ~9,000 rules and arrives as a parquet/broadcast dimension through the
#: SAME join shape below — nothing here assumes the table is small
#: enough to inline, and wildcard (`*.ck`) / exception (`!www.ck`)
#: rules are the documented out-of-scope extension (they add one more
#: candidate-length join, not a new shape).
PSL_TWO_LEVEL = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "org.br", "co.in", "gov.in",
    "com.cn", "com.mx", "co.nz", "co.za", "com.sg", "com.tr",
    "github.io", "blogspot.com",
)
PSL_ONE_LEVEL = (
    "com", "org", "net", "io", "gov", "edu", "mil", "int", "info",
    "biz", "dev", "app", "uk", "de", "fr", "it", "nl", "se", "no",
    "fi", "es", "pt", "pl", "jp", "cn", "au", "br", "in", "ca", "us",
    "ch", "at", "be", "dk", "cz", "ie", "kr", "mx", "nz", "za", "sg",
    "tr",
)


def registrable_domain(df: DataFrame, spark, host_col: str = "host",
                       two_level=None, one_level=None):
    """Attach (public_suffix, reg_domain) to every row by PSL longest
    match: the last TWO labels win if they are a listed two-level
    suffix (``foo.co.uk`` -> ``foo.co.uk`` is wrong — the registrable
    domain is the label BEFORE the suffix plus the suffix), else the
    last label (listed or not: the PSL's implicit ``*`` default makes
    an unknown TLD its own suffix). Quotas, blocklists and politeness
    budgets operate at this granularity, not the hostname's — one
    registrant's ``a.example.co.uk`` and ``b.example.co.uk`` must land
    in one bucket, while ``x.github.io`` and ``y.github.io`` (a
    PRIVATE-section suffix) must not.

    The default dimension is the REAL bundled Mozilla list's normal
    rules at depths 1 and 2 (:func:`psl_full_levels` — ~7k of the
    9.5k rules); this fast path by construction cannot express the
    residue (3-to-5-label rules, wildcards, exceptions) — quota
    rollup that needs those uses :func:`registrable_domain_psl` with
    :func:`psl_full_rules`. Pass ``two_level``/``one_level`` to pin a
    smaller dimension (the demo tuples above) in tests.

    Scale shape: two broadcast LEFT joins (candidate suffix lengths 2
    and 1) against the suffix dimension — map-side, zero shuffle, zero
    Python; longest match is a coalesce, never a groupBy; the full
    list's slices stay trivially broadcastable (~7k rows)."""
    if two_level is None or one_level is None:
        full_two, full_one = psl_full_levels()
        two_level = full_two if two_level is None else two_level
        one_level = full_one if one_level is None else one_level
    two = spark.createDataFrame([(s,) for s in two_level],
                                "suffix2 string")
    one = spark.createDataFrame([(s,) for s in one_level],
                                "suffix1 string")
    # DNS names are case-insensitive; fold before matching the
    # (lowercase) suffix table and return the canonical lowercase form
    h = F.lower(F.col(host_col))
    d = (df.withColumn("_l1", F.substring_index(h, ".", -1))
           .withColumn("_l2", F.substring_index(h, ".", -2)))
    d = d.join(F.broadcast(two), d["_l2"] == F.col("suffix2"), "left")
    d = d.join(F.broadcast(one), d["_l1"] == F.col("suffix1"), "left")
    suffix = F.coalesce(F.col("suffix2"), F.col("suffix1"), F.col("_l1"))
    reg = (F.when(F.col("suffix2").isNotNull(),
                  F.substring_index(h, ".", -3))
            .otherwise(F.substring_index(h, ".", -2)))
    return d.select(*df.columns, suffix.alias("public_suffix"),
                    reg.alias("reg_domain"))


# ---------------------------------------------------------------------------
# Full PSL semantics: wildcard (`*.ck`) + exception (`!www.ck`) rules
# ---------------------------------------------------------------------------

#: Demo wildcard rules (stored WITHOUT the leading ``*.`` — the text the
#: host tail must equal one label below the star). ``*.ck`` says every
#: direct child of ``ck`` is itself a public suffix; ``*.kawasaki.jp``
#: is the canonical 3-label example from the real list.
PSL_WILDCARD = ("ck", "kawasaki.jp")
#: Demo exception rules (stored WITHOUT the leading ``!``). An exception
#: carves one name back out of a wildcard: ``!www.ck`` makes ``www.ck``
#: registrable (public suffix ``ck``) even though ``*.ck`` exists.
PSL_EXCEPTION = ("www.ck", "city.kawasaki.jp")


def psl_rules(wildcard=PSL_WILDCARD, exception=PSL_EXCEPTION,
              two_level=PSL_TWO_LEVEL, one_level=PSL_ONE_LEVEL):
    """The rule dimension as plain tuples ``(rule, nlab, kind)`` with
    ``kind`` in ``n`` (normal), ``w`` (wildcard, rule stored minus the
    ``*.``), ``e`` (exception, rule stored minus the ``!``).

    A full ~9k-rule Mozilla PSL drops in as a parquet read producing
    this exact schema (parse each line: ``!`` -> e, ``*.`` -> w, else
    n; ``nlab`` = dot count + 1) — the matcher below never assumes the
    dimension is inline, only that it is broadcastable (~9k rows)."""
    rows = [(s, s.count(".") + 1, "n") for s in one_level + two_level]
    rows += [(s, s.count(".") + 1, "w") for s in wildcard]
    rows += [(s, s.count(".") + 1, "e") for s in exception]
    return rows


def validate_psl_rules(rows) -> list:
    """Shape-check a PSL rule dimension and return it as a list —
    malformed dimensions must FAIL LOUDLY here, not be silently
    skipped by the matcher's structural guards (the ``L >= 2``
    exception guard in :func:`registrable_domain_psl` exists because a
    1-label exception rule like ``!com`` is meaningless under the
    published algorithm — its public suffix would be the empty
    string); a parquet file carrying one would otherwise just never
    match. Checks per row: kind ∈ {n,w,e}; ``nlab`` equals the rule's
    actual label count; labels non-empty (no leading/trailing/double
    dots); exception rules carry >= 2 labels."""
    out = []
    for rule, nlab, kind in rows:
        if kind not in ("n", "w", "e"):
            raise ValueError(f"PSL rule {rule!r}: unknown kind {kind!r}")
        labels = str(rule).split(".")
        if not rule or any(not lab for lab in labels):
            raise ValueError(f"PSL rule {rule!r}: empty label")
        if int(nlab) != len(labels):
            raise ValueError(
                f"PSL rule {rule!r}: nlab={nlab} but rule has "
                f"{len(labels)} labels")
        if kind == "e" and len(labels) < 2:
            raise ValueError(
                f"PSL rule {rule!r}: exception rules must carry >= 2 "
                "labels (the public suffix is the rule minus its "
                "leftmost label, which would be empty)")
        out.append((str(rule), int(nlab), str(kind)))
    return out


def psl_rules_from_parquet(spark, path: str) -> list:
    """Load a PSL rule dimension from parquet (columns: rule string,
    nlab int, kind string — the `psl_rules` schema; a full Mozilla
    list parses to ~9.5k such rows). The dimension is collected
    driver-side because the matcher broadcasts per-length slices
    anyway — 9k rows is far under any broadcast threshold, and the
    collect keeps `registrable_domain_psl` a pure function of plain
    tuples (testable without Spark). Rule shapes are validated
    loudly (:func:`validate_psl_rules`) — a malformed dimension is a
    data bug, not a silent no-match."""
    return validate_psl_rules(
        (r["rule"], int(r["nlab"]), r["kind"])
        for r in spark.read.parquet(path).collect())


#: The REAL Mozilla Public Suffix List (MPL-2.0), bundled verbatim as
#: shipped by the Debian ``publicsuffix`` package — ~9.5k rules, 107
#: wildcards, 8 exceptions, ICANN + PRIVATE sections.
PSL_DAT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "public_suffix_list.dat")


def _bundled_psl_text() -> str:
    """Read the bundled list ZIP-SAFELY: the production invocation
    ships the package as a ``--py-files`` zip (``session.package_zip``
    includes the .dat), where a filesystem ``open()`` on a
    ``__file__``-relative path raises — ``importlib.resources``
    resolves through the zip importer. The plain-path fallback covers
    editable/source checkouts on old loaders."""
    try:
        from importlib.resources import files

        return (files("ocr_automation_system_spark") / "data"
                / "public_suffix_list.dat").read_text("utf-8")
    except Exception:
        with open(PSL_DAT, encoding="utf-8") as fh:
            return fh.read()


def psl_rules_from_dat(path: str | None = None,
                       section: str | None = None) -> list:
    """Parse a Mozilla ``public_suffix_list.dat`` text into the
    ``(rule, nlab, kind)`` dimension the matcher broadcasts. The
    published format (publicsuffix.org/list): one rule per line up to
    the first whitespace; ``//`` lines are comments; ``!`` prefixes an
    exception, ``*.`` a wildcard; rules are already lowercase and the
    Unicode (not punycode) form is canonical. ``section`` filters to
    ``"icann"`` or ``"private"`` via the ``===BEGIN ICANN/PRIVATE
    DOMAINS===`` sentinels — eTLD+1 quota rollup conventionally wants
    BOTH (a ``github.io`` registrant is a quota unit), which is the
    ``None`` default. ``path=None`` reads the BUNDLED list zip-safely
    (:func:`_bundled_psl_text`); pass a filesystem path to load a
    newer snapshot."""
    if path is None:
        text = _bundled_psl_text()
    else:
        with open(path, encoding="utf-8") as fh:
            text = fh.read()
    rows, cur = [], None
    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            continue
        if line.startswith("//"):
            if "===BEGIN ICANN DOMAINS===" in line:
                cur = "icann"
            elif "===BEGIN PRIVATE DOMAINS===" in line:
                cur = "private"
            elif "===END" in line:
                cur = None
            continue
        if section is not None and cur != section:
            continue
        rule = line.split()[0]
        if rule.startswith("!"):
            kind, rule = "e", rule[1:]
        elif rule.startswith("*."):
            kind, rule = "w", rule[2:]
        elif rule == "*":
            # a bare-star rule is the implicit default the matcher
            # already applies; nothing to store
            continue
        else:
            kind = "n"
        rows.append((rule, rule.count(".") + 1, kind))
    return validate_psl_rules(rows)


@functools.lru_cache(maxsize=4)
def psl_full_rules(section: str | None = None) -> tuple:
    """The bundled real Mozilla list as the ``(rule, nlab, kind)``
    dimension, parsed once per process (the parse is ~10 ms; every
    query call and twin render reads this memo)."""
    return tuple(psl_rules_from_dat(section=section))


@functools.lru_cache(maxsize=1)
def psl_full_levels() -> tuple:
    """The real list's NORMAL rules sliced at one and two labels —
    the dimension pair the fast-path :func:`registrable_domain`
    broadcasts (7k of the 9.5k rules; the residue — 3-to-5-label
    normal rules, wildcards, exceptions — needs
    :func:`registrable_domain_psl`). Returns ``(two_level,
    one_level)`` sorted tuples."""
    rows = psl_full_rules()
    two = tuple(sorted(r for r, n, k in rows if k == "n" and n == 2))
    one = tuple(sorted(r for r, n, k in rows if k == "n" and n == 1))
    return two, one


def registrable_domain_psl(df: DataFrame, spark, host_col: str = "host",
                           rules=None):
    """Full public-suffix-list match: normal, wildcard (``*.ck``) and
    exception (``!www.ck``) rules, longest-match precedence with
    exceptions winning (the published PSL algorithm). Differences from
    the fast-path :func:`registrable_domain` demo matcher:

    * a wildcard rule stored at ``L`` labels makes the host's last
      ``L+1`` labels the public suffix (the star consumes exactly one
      real label — a host with only ``L`` labels is NOT matched);
    * an exception rule stored at ``L`` labels matches the host's last
      ``L`` labels and declares the public suffix to be the rule minus
      its leftmost label (``L-1`` labels), beating every other rule;
    * a host that IS a public suffix (``github.io``, ``foo.ck``) gets
      ``reg_domain = NULL`` — there is no registrant to roll up to, and
      silently rolling to the suffix would merge unrelated registrants.

    Scale shape: one zero-shuffle label census + ``max_rule_labels``
    broadcast LEFT hash joins against per-length slices of the rule
    dimension (each join map-side, each slice tiny even for the full
    9k-rule list); precedence is a pure ``coalesce``/``when`` chain —
    no groupBy, no window, no Python, so the matcher fuses with the
    scan at any corpus size. Reference analogy: the 8-method authority
    chain (`/root/reference/project/core/gst_certi.py` authority
    fallbacks) is the same first-match-wins cascade, here over suffix
    rules instead of extraction methods."""
    # default dimension: the REAL bundled Mozilla list (9.5k rules) —
    # the demo psl_rules() tuples remain for pinned unit fixtures
    rows = list(psl_full_rules()) if rules is None else list(rules)
    max_l = max(r[1] for r in rows)
    # tails are needed one label past the deepest stored rule (wildcard
    # suffixes) plus one more for the registrable domain itself.
    need_tail = max_l + 2

    h = F.lower(F.col(host_col))
    d = df.withColumn("_h", h).withColumn(
        "_nlab", F.size(F.split(h, r"\.")))
    for L in range(1, need_tail + 1):
        d = d.withColumn(
            f"_t{L}",
            F.when(F.col("_nlab") >= L, F.substring_index("_h", ".", -L)))
    # one broadcast join per stored rule length; each carries the kinds
    # present at that length as boolean flags so a single join answers
    # normal/wildcard/exception membership together.
    # fold duplicate rule texts driver-side (the dim is tiny) so the
    # dim side needs no aggregate exchange — the whole matcher stays
    # broadcast-joins-only. ONE createDataFrame carries every length
    # (a 9.5k-row dimension costs one Py4J round-trip, not one per
    # length); each join's side is a pruned filter of it, still a
    # tiny broadcast.
    merged: dict = {}
    for r in rows:
        k = merged.setdefault((r[1], r[0]), {"n": False, "w": False,
                                             "e": False})
        k[r[2]] = True
    all_dim = spark.createDataFrame(
        [(L, t, f["n"], f["w"], f["e"])
         for (L, t), f in sorted(merged.items())],
        "_rl int, _rt string, _fn boolean, _fw boolean, _fe boolean")
    lengths = sorted({r[1] for r in rows})
    for L in lengths:
        dim = (all_dim.filter(F.col("_rl") == L)
               .select(F.col("_rt").alias(f"_r{L}"),
                       F.col("_fn").alias(f"_n{L}"),
                       F.col("_fw").alias(f"_w{L}"),
                       F.col("_fe").alias(f"_e{L}")))
        d = d.join(F.broadcast(dim),
                   d[f"_t{L}"] == F.col(f"_r{L}"), "left")

    def flag(name: str) -> Column:
        return F.coalesce(F.col(name), F.lit(False))

    # exception wins outright; among exceptions the longest rule wins.
    ps_lab = F.lit(None).cast("int")
    for L in range(max_l, 0, -1):
        if f"_e{L}" in d.columns and L >= 2:
            ps_lab = F.coalesce(ps_lab,
                                F.when(flag(f"_e{L}"), F.lit(L - 1)))
    # then longest prevailing rule; a wildcard stored at L yields an
    # (L+1)-label suffix and requires the star to consume a label, so it
    # ranks with normal rules stored at L+1 (same suffix text on a tie).
    for eff in range(max_l + 1, 0, -1):
        cand = F.lit(None).cast("int")
        if f"_w{eff - 1}" in d.columns:
            cand = F.when(flag(f"_w{eff - 1}") &
                          (F.col("_nlab") >= eff), F.lit(eff))
        if f"_n{eff}" in d.columns:
            cand = F.coalesce(cand, F.when(flag(f"_n{eff}"), F.lit(eff)))
        ps_lab = F.coalesce(ps_lab, cand)
    # the PSL implicit ``*`` default: an unlisted TLD is its own suffix.
    ps_lab = F.coalesce(ps_lab, F.lit(1))

    tail = lambda n: F.element_at(  # noqa: E731 — tails precomputed above
        F.array(*[F.col(f"_t{L}") for L in range(1, need_tail + 1)]), n)
    suffix = tail(ps_lab)
    reg = F.when(F.col("_nlab") > ps_lab, tail(ps_lab + 1))
    return d.select(*df.columns, suffix.alias("public_suffix"),
                    reg.alias("reg_domain"))
