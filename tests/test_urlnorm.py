"""Fixture pins for URL canonicalization (functions/urlnorm.py) and the
corpus-level boilerplate-line removal (curation.boilerplate_line_removal).

Each canonicalization step from the urlnorm module doc gets an explicit
input → expected pair, evaluated through the real Spark expression tree
so the Java-regex spelling (not a Python re approximation) is what's
pinned.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_automation_system_spark.functions.curation import (
    boilerplate_line_removal,
)
from ocr_automation_system_spark.functions.urlnorm import (
    canonicalize_url, messy_variant, url_duplicates,
)

CANON_CASES = [
    # fragment stripped
    ("https://ex.com/a#sec-2", "https://ex.com/a"),
    # scheme+host lowercased, path case preserved
    ("HTTPS://Ex.COM/Path/File", "https://ex.com/Path/File"),
    # default ports dropped
    ("https://ex.com:443/a", "https://ex.com/a"),
    ("http://ex.com:80/a", "http://ex.com/a"),
    # non-default port kept
    ("https://ex.com:8443/a", "https://ex.com:8443/a"),
    # slash runs collapsed, /./ dropped (incl. the /././ double pass)
    ("https://ex.com//a///b", "https://ex.com/a/b"),
    ("https://ex.com/a/./b", "https://ex.com/a/b"),
    ("https://ex.com/a/././b", "https://ex.com/a/b"),
    # trailing index.html / index.htm and trailing slash
    ("https://ex.com/a/index.html", "https://ex.com/a"),
    ("https://ex.com/a/index.htm", "https://ex.com/a"),
    ("https://ex.com/a/", "https://ex.com/a"),
    # empty / root path canonicalizes to "/"
    ("https://ex.com", "https://ex.com/"),
    ("https://ex.com/", "https://ex.com/"),
    ("https://ex.com/index.html", "https://ex.com/"),
    # tracking params dropped, survivors sorted bytewise, '?' dropped
    # when nothing survives
    ("https://ex.com/a?utm_source=x&gclid=1", "https://ex.com/a"),
    ("https://ex.com/a?z=9&a=1&utm_medium=m&m=5",
     "https://ex.com/a?a=1&m=5&z=9"),
    ("https://ex.com/a?fbclid=f&ref=r&b=2", "https://ex.com/a?b=2"),
    # a param NAMED like a tracking prefix but not matching stays
    # (refresh=1 is not ref=)
    ("https://ex.com/a?refresh=1", "https://ex.com/a?refresh=1"),
    # query param case/order: values preserved byte-exact
    ("https://ex.com/a?B=2&a=1", "https://ex.com/a?B=2&a=1"),
    # everything at once
    ("HTTP://EX.com:80//x/./index.html?utm_campaign=c&b=2&a=1#f",
     "http://ex.com/x?a=1&b=2"),
]


@pytest.mark.parametrize("raw,expected", CANON_CASES)
def test_canonicalize_fixture(spark, raw, expected):
    out = (spark.createDataFrame([(raw,)], ["u"])
           .select(canonicalize_url(F.col("u")).alias("c"))
           .first()["c"])
    assert out == expected, raw


def test_canonicalize_idempotent(spark):
    """canon(canon(u)) == canon(u) for every fixture input."""
    df = spark.createDataFrame([(r,) for r, _ in CANON_CASES], ["u"])
    rows = df.select(
        canonicalize_url(F.col("u")).alias("c1"),
        canonicalize_url(canonicalize_url(F.col("u"))).alias("c2"),
    ).collect()
    for r in rows:
        assert r["c1"] == r["c2"]


def test_messy_variant_classes_and_roundtrip(spark):
    """Every messy class canonicalizes back to the clean URL, except the
    mixed-query class which keeps the sorted non-tracking params."""
    urls = [(f"https://site-{i}.example.com/p/{i}",) for i in range(64)]
    df = spark.createDataFrame(urls, ["u"]).select(
        "u",
        F.substring(F.md5("u"), 1, 1).alias("d"),
        canonicalize_url(messy_variant(F.col("u"))).alias("c"),
    )
    rows = df.collect()
    seen_classes = set()
    for r in rows:
        if r["d"] in "0123456789ab":
            assert r["c"] == r["u"], (r["d"], r["u"], r["c"])
            seen_classes.add("roundtrip")
        else:
            assert r["c"] == r["u"] + "?a=1&m=5&z=9", (r["u"], r["c"])
            seen_classes.add("mixed")
    assert seen_classes == {"roundtrip", "mixed"}


def test_url_duplicates_groups_variants(spark):
    clean = ["https://a.com/x", "https://b.com/y", "https://c.com/z"]
    raws = [(u,) for u in clean] + [
        ("HTTPS://A.com/x#frag",),
        ("https://a.com:443/x?utm_source=s",),
        ("https://b.com/y/.//index.html",),
    ]
    out = {r["canon_url"]: r for r in
           url_duplicates(spark.createDataFrame(raws, ["url"])).collect()}
    assert set(out) == set(clean)
    assert out["https://a.com/x"]["n_forms"] == 3
    assert out["https://a.com/x"]["n_distinct_raw"] == 3
    # min() keeps the uppercase spelling ('H' < 'h' bytewise)
    assert out["https://a.com/x"]["keep_url"] == "HTTPS://A.com/x#frag"
    assert out["https://b.com/y"]["n_forms"] == 2
    assert out["https://c.com/z"]["n_forms"] == 1


# ---------------------------------------------------------------------------
# boilerplate_line_removal
# ---------------------------------------------------------------------------


def test_boilerplate_line_removal(spark):
    boiler = "Cookie notice: we use cookies"
    docs = [(f"d{i}", f"{boiler}\nunique body {i}\n\nmore {i}")
            for i in range(10)]
    docs.append(("d-null", None))
    docs.append(("d-empty", ""))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           boilerplate_line_removal(df, min_docs=10).collect()}
    assert len(out) == 12
    for i in range(10):
        r = out[f"d{i}"]
        # blank line dropped unconditionally; boiler line dropped as
        # cross-doc boilerplate; the two unique lines survive in order
        assert r["n_lines_kept"] == 2
        assert r["n_lines_dropped"] == 1
        assert r["kept_text"] == f"unique body {i}\nmore {i}"
    for d in ("d-null", "d-empty"):
        assert out[d]["n_lines_kept"] == 0
        assert out[d]["n_lines_dropped"] == 0
        assert out[d]["kept_text"] == ""


def test_boilerplate_threshold_not_met(spark):
    """A line in only min_docs-1 documents survives everywhere."""
    docs = [(f"d{i}", f"shared header\nbody {i}") for i in range(4)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = boilerplate_line_removal(df, min_docs=5).collect()
    assert all(r["kept_text"].startswith("shared header\nbody ") for r in out)
    out2 = boilerplate_line_removal(df, min_docs=4).collect()
    assert all(r["kept_text"].startswith("body ") for r in out2)


def test_url_path_skeleton_and_trap_census(spark):
    """X85: hex runs fold before digit runs, query/fragment excluded,
    empty path reads '/', and the census flags a pattern crossing the
    trap threshold."""
    from pyspark.sql import functions as F

    from ocr_automation_system_spark.functions.urlnorm import (
        url_path_skeleton,
        url_pattern_census,
    )

    cases = {
        "https://a.com/item/12345": "/item/N",
        "https://a.com/cache/deadbeefcafe1234/x": "/cache/H/x",
        "https://a.com/2024/01/05/post?page=9#frag": "/N/N/N/post",
        "https://a.com": "/",
        "https://a.com/abc123def": "/H",      # 9 hex chars = one hex run
        "https://a.com/abcx123def": "/abcxNdef",  # x breaks the hex run
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r["sk"] for r in
           df.select("url", url_path_skeleton(F.col("url")).alias("sk"))
           .collect()}
    assert got == cases

    urls = ([(f"https://t.com/page/{i}",) for i in range(25)]
            + [(f"https://t.com/about",)])
    census = {r["skeleton"]: r for r in url_pattern_census(
        spark.createDataFrame(urls, "url string")).collect()}
    assert census["/page/N"]["n_urls"] == 25 and census["/page/N"]["trap"]
    assert not census["/about"]["trap"]
    assert census["/page/N"]["example_url"] == "https://t.com/page/0"


# ---------------------------------------------------------------------------
# Full PSL semantics (X177): wildcard + exception rules
# ---------------------------------------------------------------------------

# (host, expected_public_suffix, expected_reg_domain) — the published
# PSL algorithm's own worked examples plus the suffix-is-the-host edge.
PSL_CASES = [
    # plain one-level + implicit-* default
    ("example.com", "com", "example.com"),
    ("a.b.example.com", "com", "example.com"),
    ("host.unlistedtld", "unlistedtld", "host.unlistedtld"),
    # two-level + private-section suffixes
    ("shop.example.co.uk", "co.uk", "example.co.uk"),
    ("x.github.io", "github.io", "x.github.io"),
    # a host that IS a suffix has no registrable domain
    ("github.io", "github.io", None),
    ("com", "com", None),
    # wildcard *.ck: every child of ck is itself a suffix
    ("foo.ck", "foo.ck", None),
    ("a.foo.ck", "foo.ck", "a.foo.ck"),
    ("deep.a.foo.ck", "foo.ck", "a.foo.ck"),
    # exception !www.ck carves www.ck back out
    ("www.ck", "ck", "www.ck"),
    ("sub.www.ck", "ck", "www.ck"),
    # wildcard *.kawasaki.jp (3-label suffixes) + its exception
    ("host.kawasaki.jp", "host.kawasaki.jp", None),
    ("x.host.kawasaki.jp", "host.kawasaki.jp", "x.host.kawasaki.jp"),
    ("city.kawasaki.jp", "kawasaki.jp", "city.kawasaki.jp"),
    ("w.city.kawasaki.jp", "kawasaki.jp", "city.kawasaki.jp"),
    # DNS case-insensitivity folds before matching
    ("WWW.CK", "ck", "www.ck"),
]


def test_registrable_domain_psl_cases(spark):
    from ocr_automation_system_spark.functions.urlnorm import (
        registrable_domain_psl,
    )

    df = spark.createDataFrame([(h,) for h, _, _ in PSL_CASES],
                               "host string")
    out = {r["host"]: (r["public_suffix"], r["reg_domain"])
           for r in registrable_domain_psl(df, spark).collect()}
    # hosts are returned as given; only the MATCHING folds case
    got = {h: out[h] for h, _, _ in PSL_CASES}
    want = {h: (s, r) for h, s, r in PSL_CASES}
    assert got == want


def test_registrable_domain_psl_no_shuffle(spark):
    """The matcher must stay a scan-fused narrow plan: broadcast joins
    only, no Exchange on the corpus side."""
    from ocr_automation_system_spark.functions.urlnorm import (
        registrable_domain_psl,
    )

    df = spark.range(100).select(
        F.concat(F.lit("h"), F.col("id")).alias("host"))
    plan = (registrable_domain_psl(df, spark)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    # the only exchanges allowed are the broadcast ones
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "BroadcastExchange" in line, line


def test_psl_rules_parquet_swap_identical(spark, tmp_path):
    """The documented full-PSL drop-in, now at FULL cardinality: the
    real bundled 9.5k-rule Mozilla list written to and read back from
    a parquet dimension produces byte-identical matcher output vs the
    in-process default (which is the same list) — the swap point is
    real, not a docstring claim."""
    from ocr_automation_system_spark.functions.urlnorm import (
        psl_full_rules, psl_rules_from_parquet, registrable_domain_psl,
    )

    path = str(tmp_path / "psl")
    spark.createDataFrame(list(psl_full_rules()),
                          "rule string, nlab int, kind string") \
        .write.parquet(path)
    loaded = psl_rules_from_parquet(spark, path)
    assert sorted(loaded) == sorted(psl_full_rules())
    df = spark.createDataFrame([(h,) for h, _, _ in PSL_CASES],
                               "host string")
    base = sorted(map(tuple, registrable_domain_psl(df, spark).collect()))
    swap = sorted(map(tuple, registrable_domain_psl(
        df, spark, rules=loaded).collect()))
    assert base == swap


# ---------------------------------------------------------------------------
# The REAL bundled Mozilla list (round-5: the literal full dimension)
# ---------------------------------------------------------------------------


def test_psl_full_list_shape():
    """The bundled data file is the real list: full cardinality, all
    three rule kinds at their published counts, and every row passes
    the loud shape validation (validate_psl_rules runs inside the
    parser)."""
    from collections import Counter

    from ocr_automation_system_spark.functions.urlnorm import (
        psl_full_rules, psl_rules_from_dat,
    )

    rows = psl_full_rules()
    kinds = Counter(k for _, _, k in rows)
    assert len(rows) > 9000, len(rows)
    assert kinds["w"] > 100          # *.ck, *.kawasaki.jp, *.nom.br, ...
    assert kinds["e"] == 8           # !www.ck + the seven !city.*.jp
    assert max(n for _, n, _ in rows) == 5
    icann = psl_rules_from_dat(section="icann")
    private = psl_rules_from_dat(section="private")
    assert len(icann) + len(private) == len(rows)
    assert ("github.io", 2, "n") in private
    assert ("co.uk", 2, "n") in icann


def test_psl_full_list_exception_rule_end_to_end(spark):
    """A known exception rule the DEMO dimension never carried
    (!city.kobe.jp) resolves end-to-end through the default matcher:
    the wildcard *.kobe.jp makes host.kobe.jp its own suffix, while
    the exception carves city.kobe.jp back out as a registrable name
    under kobe.jp."""
    from ocr_automation_system_spark.functions.urlnorm import (
        registrable_domain_psl,
    )

    cases = [
        ("city.kobe.jp", "kobe.jp", "city.kobe.jp"),
        ("w.city.kobe.jp", "kobe.jp", "city.kobe.jp"),
        ("host.kobe.jp", "host.kobe.jp", None),
        ("x.host.kobe.jp", "host.kobe.jp", "x.host.kobe.jp"),
        # depth-3 and depth-4 NORMAL rules only the full list carries
        ("a.b.kasai.hyogo.jp", "kasai.hyogo.jp", "b.kasai.hyogo.jp"),
        # private-section multi-label suffix
        ("s3.amazonaws.com", "s3.amazonaws.com", None),
    ]
    df = spark.createDataFrame([(h,) for h, _, _ in cases],
                               "host string")
    out = {r["host"]: (r["public_suffix"], r["reg_domain"])
           for r in registrable_domain_psl(df, spark).collect()}
    for h, s, r in cases:
        assert out[h] == (s, r), h


def test_psl_validation_fails_loudly():
    """Malformed dimensions raise instead of silently never matching:
    unknown kind, nlab out of sync with the rule text, empty labels,
    and the 1-label exception rule the matcher's L >= 2 guard would
    otherwise skip."""
    import pytest

    from ocr_automation_system_spark.functions.urlnorm import (
        validate_psl_rules,
    )

    assert validate_psl_rules([("co.uk", 2, "n")]) == [("co.uk", 2, "n")]
    for bad in ([("co.uk", 2, "x")],
                [("co.uk", 3, "n")],
                [("co..uk", 3, "n")],
                [(".uk", 2, "n")],
                [("com", 1, "e")]):
        with pytest.raises(ValueError):
            validate_psl_rules(bad)
