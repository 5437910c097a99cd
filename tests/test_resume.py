"""Kill/resume semantics for the checkpointed extraction (SURVEY.md §7
step 6): completed buckets are never recomputed, a resumed run converges to
exactly the uninterrupted output, and lineage manifests account for every
row."""

from __future__ import annotations

import os

import pytest

from ocr_automation_system_spark.operators.extract import extract_documents
from ocr_automation_system_spark.plans.resume import (
    committed_buckets, lineage_summary, read_extractions,
    run_resumable_extraction,
)

N_BUCKETS = 8


@pytest.fixture(scope="module")
def docs(spark, corpus_path):
    return spark.read.parquet(corpus_path)


def _sorted_rows(df):
    return sorted(
        (r["url"], r["doc_status"], r["document_type"], r["extracted_text"],
         r["fields_json"]) for r in df.collect()
    )


def test_interrupted_then_resumed_equals_uninterrupted(spark, docs, tmp_path):
    out = str(tmp_path / "run")

    # "Kill" after 3 buckets.
    first = run_resumable_extraction(spark, docs, out, N_BUCKETS, max_buckets=3)
    assert first["ran"] == [0, 1, 2]
    assert committed_buckets(out, N_BUCKETS) == {0, 1, 2}

    manifests = {
        b: os.path.getmtime(os.path.join(out, "_manifest", f"bucket_{b:05d}.json"))
        for b in first["ran"]
    }

    # Resume: only the missing buckets run; committed ones are skipped.
    second = run_resumable_extraction(spark, docs, out, N_BUCKETS)
    assert second["skipped"] == [0, 1, 2]
    assert second["ran"] == [3, 4, 5, 6, 7]
    for b, mtime in manifests.items():
        assert os.path.getmtime(
            os.path.join(out, "_manifest", f"bucket_{b:05d}.json")) == mtime, \
            f"bucket {b} was recomputed"

    # Byte-equal to an uninterrupted single-pass run.
    resumed = read_extractions(spark, out)
    direct = extract_documents(docs)
    assert _sorted_rows(resumed) == _sorted_rows(direct)


def test_lineage_accounts_for_every_row(spark, docs, tmp_path):
    out = str(tmp_path / "run2")
    run_resumable_extraction(spark, docs, out, n_buckets=4)
    summary = lineage_summary(out, 4)
    assert summary["total_rows"] == docs.count()
    assert set(summary["buckets"]) == {0, 1, 2, 3}


def test_leftover_staging_dir_is_invisible(spark, docs, tmp_path):
    """A run killed mid-write leaves its partial output under _staging/,
    which partition discovery over extractions/ can never see — the
    resumed read returns only committed buckets."""
    out = str(tmp_path / "run4")
    run_resumable_extraction(spark, docs, out, n_buckets=4)
    committed = read_extractions(spark, out).count()

    # simulate a killed write: partial parquet parked in _staging
    stale = os.path.join(out, "_staging", "bucket=9")
    os.makedirs(stale)
    docs.limit(5).write.mode("overwrite").parquet(stale)

    again = read_extractions(spark, out)
    assert again.count() == committed
    assert "bucket" not in again.columns


def test_rerun_is_idempotent(spark, docs, tmp_path):
    out = str(tmp_path / "run3")
    run_resumable_extraction(spark, docs, out, n_buckets=4)
    third = run_resumable_extraction(spark, docs, out, n_buckets=4)
    assert third["ran"] == [] and third["skipped"] == [0, 1, 2, 3]
    assert read_extractions(spark, out).count() == docs.count()


def test_cc_resumes_from_committed_rounds(spark, tmp_path):
    """An interrupted distributed connected-components ladder resumes from
    its durable per-round parquet commits: the rerun reuses every committed
    round (files untouched) and still converges to the union-find answer."""
    from ocr_automation_system_spark.functions import dedup as D

    # a 30-node chain needs ~log2(30) pointer-doubling rounds, so
    # max_iter=2 dies mid-ladder with rounds committed
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)] + [(100, 101)], ["doc_a", "doc_b"])
    ckpt = str(tmp_path / "ck")
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(pairs, collect_threshold=0, max_iter=2,
                               checkpoint_dir=ckpt)
    cc_dir = os.path.join(ckpt, "cc")
    committed = sorted(os.listdir(cc_dir))
    assert "edges" in committed and "round_00002" in committed
    mtimes = {d: os.path.getmtime(os.path.join(cc_dir, d)) for d in committed}

    resumed = D.connected_components(pairs, collect_threshold=0,
                                     checkpoint_dir=ckpt)
    got = {r["node"]: r["cluster_id"] for r in resumed.collect()}
    want = {r["node"]: r["cluster_id"]
            for r in D.connected_components(pairs).collect()}  # driver path
    assert got == want
    assert all(v == 0 for k, v in got.items() if k <= 30)
    for d, t in mtimes.items():  # committed rounds were reused, not rebuilt
        assert os.path.getmtime(os.path.join(cc_dir, d)) == t, d


def test_cc_checkpoint_overwrites_inprogress_leftover(spark, tmp_path):
    """A round left as `.inprogress` by a killed run (no atomic rename)
    must be rebuilt, not trusted."""
    from ocr_automation_system_spark.functions import dedup as D

    pairs = spark.createDataFrame([(0, 1), (1, 2)], ["doc_a", "doc_b"])
    ckpt = str(tmp_path / "ck")
    leftover = os.path.join(ckpt, "cc", "edges.inprogress")
    os.makedirs(leftover)
    with open(os.path.join(leftover, "part-garbage.parquet"), "w") as fh:
        fh.write("not parquet")
    out = D.connected_components(pairs, collect_threshold=0,
                                 checkpoint_dir=ckpt)
    assert {r["cluster_id"] for r in out.collect()} == {0}
    assert not os.path.exists(leftover)
