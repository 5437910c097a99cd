"""X160 span-level decontamination: exact token excision, overlap
union, clean-doc passthrough, benchmark exclusion, short-doc edge,
and the broadcast-bench plan shape."""

from pyspark.sql import functions as F

from ocr_automation_system_spark.functions.curation import (
    decontaminate_spans,
)

BENCH = "alpha beta gamma delta epsilon zeta eta"  # doc_id 0 = benchmark


def _run(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: r for r in decontaminate_spans(df).collect()}


def test_exact_excision_and_overlap_union(spark):
    rows = [
        (0, BENCH),
        # shares 'alpha..epsilon' AND 'beta..zeta' (overlapping grams):
        # coverage union is tokens 2..7 of this 10-token doc
        (1, "intro words alpha beta gamma delta epsilon zeta tail end"),
        (2, "totally clean document with no overlap at all"),
        (3, "tiny doc"),
    ]
    out = _run(spark, rows)
    assert 0 not in out                      # benchmark docs excluded
    r = out[1]
    assert r["n_tokens"] == 10 and r["n_spans"] == 2
    assert r["n_tokens_removed"] == 6
    assert r["kept_text"] == "intro words tail end"
    r = out[2]
    assert r["n_spans"] == 0 and r["n_tokens_removed"] == 0
    assert r["kept_text"] == "totally clean document with no overlap at all"
    r = out[3]
    assert r["n_tokens"] == 2 and r["n_tokens_removed"] == 0
    assert r["kept_text"] == "tiny doc"


def test_whole_doc_excised_when_fully_contaminated(spark):
    rows = [(0, BENCH), (1, BENCH)]
    out = _run(spark, rows)
    r = out[1]
    assert r["n_tokens"] == 7 and r["n_tokens_removed"] == 7
    assert r["kept_text"] == ""
    assert r["n_spans"] == 3                 # 7 tokens -> 3 5-grams


def test_bench_side_broadcast(spark):
    df = spark.createDataFrame(
        [(0, BENCH), (1, "some other words here beyond")],
        ["doc_id", "text"])
    plan = (decontaminate_spans(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
