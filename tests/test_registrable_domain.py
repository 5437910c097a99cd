"""X154 registrable-domain (eTLD+1): PSL longest-match semantics on
crafted hosts, the suffix-class separations that matter (private-section
vs ccTLD vs unknown TLD), and the broadcast zero-shuffle plan law."""

from pyspark.sql import functions as F

from ocr_automation_system_spark.functions.urlnorm import (
    PSL_ONE_LEVEL,
    PSL_TWO_LEVEL,
    registrable_domain,
)

CASES = [
    # host, expected_suffix, expected_reg_domain
    ("a.shop.co.uk", "co.uk", "shop.co.uk"),
    ("b.shop.co.uk", "co.uk", "shop.co.uk"),      # same registrant
    ("x.github.io", "github.io", "x.github.io"),  # private-section PSL
    ("y.github.io", "github.io", "y.github.io"),  # DIFFERENT registrant
    ("deep.a.b.example.com", "com", "example.com"),
    ("example.com", "com", "example.com"),
    ("host.unlistedtld", "unlistedtld", "host.unlistedtld"),  # implicit *
    ("co.uk", "co.uk", "co.uk"),                  # host == suffix edge
    ("news.com.au", "com.au", "news.com.au"),
]


def _run(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    return {r["host"]: r for r in
            registrable_domain(df, spark).collect()}


def test_longest_match_semantics(spark):
    rows = _run(spark, [c[0] for c in CASES])
    for host, suffix, reg in CASES:
        assert rows[host]["public_suffix"] == suffix, host
        assert rows[host]["reg_domain"] == reg, host


def test_case_insensitive_matching(spark):
    rows = _run(spark, ["Shop.CO.UK", "x.GitHub.IO"])
    assert rows["Shop.CO.UK"]["public_suffix"] == "co.uk"
    assert rows["Shop.CO.UK"]["reg_domain"] == "shop.co.uk"
    assert rows["x.GitHub.IO"]["reg_domain"] == "x.github.io"


def test_same_vs_different_registrant_buckets(spark):
    rows = _run(spark, ["a.shop.co.uk", "b.shop.co.uk",
                        "x.github.io", "y.github.io"])
    assert (rows["a.shop.co.uk"]["reg_domain"]
            == rows["b.shop.co.uk"]["reg_domain"])
    assert (rows["x.github.io"]["reg_domain"]
            != rows["y.github.io"]["reg_domain"])


def test_two_level_beats_one_level():
    # every two-level suffix's own TLD is also listed one-level, so the
    # longest-match order is what separates them (blogspot.com vs com)
    assert "blogspot.com" in PSL_TWO_LEVEL and "com" in PSL_ONE_LEVEL
    assert all("." in s for s in PSL_TWO_LEVEL)
    assert all("." not in s for s in PSL_ONE_LEVEL)


def test_plan_broadcast_no_shuffle(spark):
    df = spark.range(100).select(
        F.concat(F.lit("h"), F.col("id").cast("string"),
                 F.lit(".co.uk")).alias("host"))
    plan = (registrable_domain(df, spark)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan
