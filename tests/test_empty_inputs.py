"""Boundary robustness: every table-reading contract query must run on
EMPTY input tables (schema-only parquet) and return an empty result —
no None-collect crashes, no joins/windows/UDFs erroring on zero rows."""

from __future__ import annotations

import os

import pytest

from ocr_automation_system_spark.queries import CORPUS_QUERIES, REGISTRY
from ocr_automation_system_spark.sources.catalog import TABLE_NAMES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLE_NAMES:
        (spark.read.parquet(os.path.join(SF, f"{t}.parquet"))
         .limit(0).write.mode("overwrite")
         .parquet(os.path.join(d, f"{t}.parquet")))
    return d


def test_null_text_rows_never_crash_curation_ops(spark):
    """A 100 TB corpus will contain NULL text; the dedup/curation ladder
    must degrade gracefully (null quality = 0, no shingles, no crash)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from ocr_automation_system_spark.functions import curation as C
    from ocr_automation_system_spark.functions import dedup as D

    schema = StructType([
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("source", StringType(), True),
    ])
    rows = [(0, "the quick brown fox jumps over the lazy dog", "a"),
            (1, None, "a"), (2, None, "b"), (3, "", "b")]
    df = spark.createDataFrame(rows, schema)

    assert D.exact_duplicates(df).count() >= 1
    assert D.dedup_cluster_keep(df).count() == 4
    assert D.simhash_near_pairs(df).count() >= 0
    got = {r["doc_id"]: r for r in C.domain_quota(df, quota=5).collect()}
    assert got[1]["quality"] == 0.0 and len(got) == 4
    assert C.train_val_split(df).count() == 4
    assert C.benchmark_contamination(df).count() == 0
    pii = {r["doc_id"]: r for r in C.pii_scrub(df).collect()}
    assert len(pii) == 4 and pii[1]["scrubbed"] is None  # null stays null
    rep = {r["doc_id"]: r for r in C.repetition_scores(df).collect()}
    assert len(rep) == 4
    assert rep[1]["gram_rep"] == 0.0 and rep[1]["dup_line_frac"] == 0.0
    bad = df.sparkSession.createDataFrame([("a",)], ["source"])
    assert C.blocklist_filter(df, bad).count() == 2  # b-source rows survive


def test_every_table_query_runs_on_empty_tables(spark, empty_sf):
    failures = []
    for name, (fn, _sql) in REGISTRY.items():
        if name in CORPUS_QUERIES:
            continue  # synthetic-corpus queries don't read the sf tables
        try:
            n = fn(spark, empty_sf).count()
        except Exception as exc:
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
            continue
        if n != 0:
            failures.append(f"{name}: expected 0 rows, got {n}")
    assert not failures, "\n".join(failures)
