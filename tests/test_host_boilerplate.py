"""X158 host-templated boilerplate removal: per-host threshold
semantics (footer dropped on the big host, small host exempt, unique
lines kept), exact-integer boundary, order-preserving reassembly, and
the no-window plan law."""

from pyspark.sql import functions as F

from ocr_automation_system_spark.functions.curation import (
    host_boilerplate_removal,
)

FOOTER = "copyright example site all rights reserved"


def _docs():
    rows = []
    # big host: 6 docs, footer on ALL of them (6/6 >= 1/2 -> dropped)
    for i in range(6):
        rows.append((f"https://big.example.com/p/{i}", "big.example.com",
                     f"unique line {i}\n{FOOTER}"))
    # boundary host: 4 docs, footer on exactly 2 (2*2 >= 4 -> dropped)
    # but host has only 4 docs < min_host_docs=5 -> EXEMPT entirely
    for i in range(4):
        t = f"small body {i}" + (f"\n{FOOTER}" if i < 2 else "")
        rows.append((f"https://tiny.example.com/p/{i}", "tiny.example.com", t))
    # empty doc on the big host
    rows.append(("https://big.example.com/p/empty", "big.example.com", ""))
    return rows


def test_host_threshold_semantics(spark):
    df = spark.createDataFrame(_docs(), ["url", "host", "text"])
    out = {r["url"]: r for r in host_boilerplate_removal(df).collect()}
    # big host (7 docs with the empty one): footer on 6/7 >= 1/2 -> gone
    for i in range(6):
        r = out[f"https://big.example.com/p/{i}"]
        assert r["kept_text"] == f"unique line {i}"
        assert r["n_lines_dropped"] == 1 and r["n_lines_kept"] == 1
    # tiny host exempt: footer survives
    r = out["https://tiny.example.com/p/0"]
    assert FOOTER in r["kept_text"] and r["n_lines_dropped"] == 0
    # empty doc: zero counts, empty text
    r = out["https://big.example.com/p/empty"]
    assert r["n_lines_kept"] == 0 and r["kept_text"] == ""


def test_exact_integer_boundary(spark):
    # 5-doc host, footer on exactly 2: 2*2 = 4 < 5 -> kept;
    # footer on exactly 3: 3*2 = 6 >= 5 -> dropped
    for hits, expect_dropped in ((2, False), (3, True)):
        rows = []
        for i in range(5):
            t = f"body {i}" + (f"\n{FOOTER}" if i < hits else "")
            rows.append((f"https://h.example.com/p/{i}", "h.example.com", t))
        df = spark.createDataFrame(rows, ["url", "host", "text"])
        out = {r["url"]: r for r in host_boilerplate_removal(df).collect()}
        got = FOOTER not in out["https://h.example.com/p/0"]["kept_text"]
        assert got == expect_dropped, hits


def test_order_preserved(spark):
    rows = [(f"https://h.example.com/p/{i}", "h.example.com",
             f"alpha {i}\n{FOOTER}\nomega {i}") for i in range(5)]
    df = spark.createDataFrame(rows, ["url", "host", "text"])
    out = host_boilerplate_removal(df).collect()
    for r in out:
        i = r["url"].rsplit("/", 1)[1]
        assert r["kept_text"] == f"alpha {i}\nomega {i}"


def test_plan_no_window_anti_join(spark):
    df = spark.createDataFrame(_docs(), ["url", "host", "text"])
    plan = (host_boilerplate_removal(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    assert "LeftAnti" in plan
