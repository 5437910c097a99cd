"""stratified_sample (domain-mixture resampling) and duplicate_spans
(ExactSubstr-style exact duplicated-span detection)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from ocr_automation_system_spark.functions.curation import (
    duplicate_spans, split_bucket, stratified_sample,
)

DOC_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("text", StringType(), True),
    StructField("source", StringType(), True),
])


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_duplicate_spans_exact_lengths(spark):
    span = _words("shared", 30)          # 30-token verbatim span
    short = _words("tiny", 10)           # second 10-token shared span
    rows = [
        (1, _words("a", 5) + " " + span + " " + _words("b", 5), "s"),
        (2, _words("c", 9) + " " + span + " " + short, "s"),
        (3, _words("d", 7) + " " + short + " " + _words("e", 6), "s"),
        (4, _words("zzz", 40), "s"),     # no overlap with anyone
        (5, None, "s"),
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {(r["doc_a"], r["doc_b"]): r
           for r in duplicate_spans(df, w=8).collect()}
    # 30-token span + 10-token span between docs 1-2? doc1 lacks `short`,
    # so 1-2 share exactly the 30-token span: 23 aligned 8-shingles.
    assert got[(1, 2)]["max_span_tokens"] == 30
    assert got[(1, 2)]["n_aligned"] == 30 - 8 + 1
    # docs 2-3 share the 10-token span: run of 3 shingles -> span 10
    assert got[(2, 3)]["max_span_tokens"] == 10
    assert got[(2, 3)]["n_aligned"] == 3
    assert (1, 3) not in got and not any(4 in k or 5 in k for k in got)


def test_duplicate_spans_occupancy_cap_censors_boilerplate(spark):
    boiler = _words("nav", 8)  # one 8-gram shared by 70 docs (> cap 64)
    rows = [(i, boiler + " " + _words(f"u{i}_", 4), "s") for i in range(70)]
    uniq = _words("quite", 20)
    rows += [(100, uniq, "s"), (101, uniq + " tail extra", "s")]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {(r["doc_a"], r["doc_b"]): r["max_span_tokens"]
           for r in duplicate_spans(df, w=8,
                                    max_docs_per_shingle=64).collect()}
    assert got == {(100, 101): 20}
    # without the cap the boilerplate pairs explode quadratically
    uncapped = duplicate_spans(df, w=8, max_docs_per_shingle=10**6)
    assert uncapped.count() == 70 * 69 // 2 + 1


def test_stratified_sample_rates_and_determinism(spark):
    rows = [(i, "text", ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    got = stratified_sample(df, {"a": 0, "b": 1000}).collect()
    srcs = {r["source"] for r in got}
    assert "a" not in srcs                      # rate 0 -> all dropped
    assert sum(r["source"] == "b" for r in got) == 100   # rate 1000 -> all
    # stratum 'c' takes the default (1000) -> all kept
    assert sum(r["source"] == "c" for r in got) == 100

    half = stratified_sample(df, {"a": 500, "b": 500, "c": 500})
    bucket = {r["doc_id"]: r["b"] for r in
              df.select("doc_id",
                        split_bucket(F.col("doc_id")).alias("b")).collect()}
    got_ids = {r["doc_id"] for r in half.collect()}
    assert got_ids == {i for i, b in bucket.items() if b < 500}
    rep = {r["doc_id"] for r in
           stratified_sample(df.repartition(7),
                             {"a": 500, "b": 500, "c": 500}).collect()}
    assert rep == got_ids


def test_stratified_sample_is_map_side_only(spark):
    df = spark.createDataFrame([(1, "t", "a")], DOC_SCHEMA)
    plan = (stratified_sample(df, {"a": 500})
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_chunk_documents_coverage_and_overlap(spark):
    from ocr_automation_system_spark.functions.curation import (
        chunk_documents,
    )

    n = 150
    rows = [(1, _words("w", n), "s"),     # 150 toks: 3 chunks at 64/8
            (2, _words("x", 10), "s"),    # short: 1 chunk of 10
            (3, None, "s"), (4, "", "s")]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["start_tok"], r["n_tokens"])
        for r in chunk_documents(df, chunk_tokens=64, overlap=8).collect())
    # stride 56: starts 0,56,112 -> sizes 64,64,38; every token covered,
    # consecutive chunks overlap by 8 (except the short tail)
    assert got == [(1, 0, 0, 64), (1, 1, 56, 64), (1, 2, 112, 38),
                   (2, 0, 0, 10)]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_chunk_documents_md5_enables_chunk_dedup(spark):
    from ocr_automation_system_spark.functions.curation import (
        chunk_documents,
    )

    shared = _words("same", 30)
    df = spark.createDataFrame(
        [(1, shared, "s"), (2, shared, "s"), (3, _words("oth", 30), "s")],
        DOC_SCHEMA)
    ch = chunk_documents(df, chunk_tokens=64, overlap=8)
    groups = (ch.groupBy("chunk_md5")
              .agg(F.count(F.lit(1)).alias("n")).collect())
    assert sorted(r["n"] for r in groups) == [1, 2]


def test_chunk_documents_no_shuffle(spark):
    from ocr_automation_system_spark.functions.curation import (
        chunk_documents,
    )

    df = spark.createDataFrame([(1, "a b c", "s")], DOC_SCHEMA)
    plan = (chunk_documents(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
