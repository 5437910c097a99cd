"""Guard the __spark_entry__ driver contract: entry() runs, queries() and
oracle_sql() agree, and a representative subset of oracle-checked queries
matches DuckDB exactly at sf0.001 (the full sweep is
scripts/compare_oracle.py; the per-round driver runs it at sf0.01)."""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

spec = importlib.util.spec_from_file_location(
    "spark_entry", os.path.join(REPO, "__spark_entry__.py"))
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)

sys.path.insert(0, os.path.join(REPO, "scripts"))
from compare_oracle import canon, duck_for, run_compare  # noqa: E402

from ocr_automation_system_spark.sources.catalog import TABLE_NAMES  # noqa: E402

SUBSET = [
    "usability_gate", "token_counts", "doc_fingerprint",
    "dedup_exact_groups", "minhash_lsh_pairs", "simhash_signatures",
    "dedup_cluster_keep", "train_val_split", "domain_quota",
    "embedding_topk", "embedding_lsh_bucket_stats", "embedding_ivf_topk",
    "embedding_kmeans_cells", "embedding_semdedup_keep",
    # NOTE: no __CORPUS__-twin queries here — entry_mod.oracle_sql()
    # renders them at the driver's sf0.01 corpus, while this test runs
    # Spark at sf0.001; the full-registry gate below covers them with
    # per-sf rendering.
    "incremental_dedup", "cms_source_counts",
    "doc_feature_table", "lm_perplexity_buckets",
    "entity_join_shape", "report_summary", "topk_per_group",
    "sessionize_events",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"doc_id", "usable", "quality", "content_hash"}


def test_registry_consistency():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # every oracle-less query is one of the binary-corpus pipeline ops
    for name in set(qs) - set(oracles):
        assert name.startswith(("pipeline_", "media_")), name


def test_oracle_sql_renders_from_cold_start(tmp_path, monkeypatch):
    """The driver imports __spark_entry__ from an arbitrary cwd and calls
    oracle_sql() before anything else — the twin parquet artifacts (the
    pipeline/media queries' oracle inputs) must materialize on that first
    call, not rely on a prior test or script having built them."""
    from ocr_automation_system_spark.oracle import twin
    from ocr_automation_system_spark.queries import _CORPUS_ROWS

    n = _CORPUS_ROWS["sf0.001"]
    for p in (twin.twin_extractions_path(n), twin.twin_media_path(n)):
        if os.path.exists(p):
            os.remove(p)
    monkeypatch.chdir(tmp_path)  # any cwd, not the repo root
    from ocr_automation_system_spark.queries import rendered_oracle_sql

    rendered = rendered_oracle_sql("/root/testdata/sf0.001")
    missing = set(entry_mod.queries()) - set(rendered)
    # only genuinely non-SQL-expressible ops may be rows-only checked
    assert not missing, f"queries without renderable oracle SQL: {missing}"
    for name, sql in rendered.items():
        assert "__TWIN_" not in sql and "__CORPUS__" not in sql, name
    assert os.path.exists(twin.twin_extractions_path(n))
    assert os.path.exists(twin.twin_media_path(n))


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    sp = qs[name](spark, SF_DIR).toPandas()
    du = duck.execute(oracles[name]).df()
    assert len(sp) == len(du), f"rowcount {len(sp)} != {len(du)}"
    assert sorted(sp.columns) == sorted(du.columns)
    a, b = canon(sp), canon(du)
    assert a.equals(b), f"value mismatch for {name}"


def test_full_registry_matches_oracle(spark):
    """THE gate: every registered query — including ones added five
    minutes before a round ends — gets the same rows+schema+hash
    comparison the driver runs, over the full registry, at sf0.001.
    A query without runnable oracle SQL or with a value mismatch fails
    here before it can ship unchecked."""
    failures = run_compare(spark, duck_for(SF_DIR), SF_DIR)
    assert failures == [], f"driver-gate replica failures: {failures}"
