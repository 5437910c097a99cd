"""k-means coarse quantizer + SemDedup (functions/clustering.py):
partitioning-independence, a pure-Python Lloyd reference, keep-earliest
semantics vs brute force, the occupancy cap, and the no-Python plan
assertion for the assignment projection."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ocr_automation_system_spark.functions import clustering as KM

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _py_kmeans(rows, k, iters):
    """Serial reference: identical quantized-Lloyd arithmetic."""
    q = {vid: [math.floor(float(x) * KM.QUANT_SCALE) for x in v]
         for vid, v in rows}
    dim = len(next(iter(q.values())))
    cents = [list(q[c]) for c in range(k)]

    def assign():
        return {vid: min((sum((v[i] - cv[i]) ** 2 for i in range(dim)), cid)
                         for cid, cv in enumerate(cents))[1]
                for vid, v in q.items()}

    for _ in range(iters):
        a = assign()
        sums, cnt = {}, {}
        for vid, cell in a.items():
            cnt[cell] = cnt.get(cell, 0) + 1
            s = sums.setdefault(cell, [0] * dim)
            for i in range(dim):
                s[i] += q[vid][i]
        for cell, s in sums.items():
            cents[cell] = [math.floor(float(s[i]) / cnt[cell])
                           for i in range(dim)]
    return cents, assign()


def test_kmeans_fit_matches_python_reference(spark, emb):
    rows = [(r["vec_id"], r["embedding"])
            for r in emb.filter(F.col("vec_id") < 80).collect()]
    want_cents, want_assign = _py_kmeans(rows, k=4, iters=3)
    sub = emb.filter(F.col("vec_id") < 80)
    got = KM.kmeans_fit(sub, k=4, iters=3)
    assert got == want_cents
    a = {r["vec_id"]: r["cell"] for r in sub.select(
        "vec_id", KM.kmeans_assign(F.col("embedding"), got).alias("cell")
    ).collect()}
    assert a == want_assign


def test_kmeans_partitioning_independence(spark, emb):
    """Centroids and cell stats must not depend on partitioning — the
    int64 sums commute; nothing else aggregates."""
    base = KM.kmeans_fit(emb, k=8, iters=3)
    shuffled = KM.kmeans_fit(emb.repartition(17, "label"), k=8, iters=3)
    assert base == shuffled
    s1 = sorted(map(tuple, KM.kmeans_cell_stats(emb).collect()))
    s2 = sorted(map(tuple,
                    KM.kmeans_cell_stats(emb.repartition(3)).collect()))
    assert s1 == s2 and len(s1) > 1


def test_kmeans_assignment_plan_is_jvm_only(spark, emb):
    cents = KM.kmeans_fit(emb, k=4, iters=1)
    df = emb.select(KM.kmeans_assign(F.col("embedding"), cents)
                    .alias("cell"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_empty_cell_keeps_previous_centroid(spark):
    """Two far clusters, k=3: the third seed (a duplicate of seed 1)
    loses every vector on iteration 1 and must keep its centroid —
    the coalesce branch of the twin."""
    rows = [(0, [0.0, 0.0]), (1, [1.0, 1.0]), (2, [1.0, 1.0]),
            (3, [0.1, 0.1]), (4, [0.9, 0.9])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = KM.kmeans_fit(df, k=3, iters=2)
    assert cents[2] == [1000000, 1000000]  # untouched seed


def test_semdedup_keep_earliest_vs_bruteforce(spark, emb):
    sub = emb.filter(F.col("vec_id") < 120)
    cents = KM.kmeans_fit(sub, k=4, iters=2)
    got = {r["vec_id"]: (r["cell"], r["keep"])
           for r in KM.semdedup_keep(sub, cents, threshold=0.3).collect()}
    # brute force on the driver
    import numpy as np

    rows = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in sub.collect()}
    cell = {vid: got[vid][0] for vid in rows}

    def cos(a, b):
        na, nb = math.sqrt(float(a @ a)), math.sqrt(float(b @ b))
        return float(a @ b) / (na * nb) if na * nb > 0 else 0.0

    for b in rows:
        dropped = any(
            a < b and cell[a] == cell[b]
            and round(cos(rows[a], rows[b]), 6) >= 0.3
            for a in rows)
        assert got[b][1] == (not dropped), b
    assert any(not k for _c, k in got.values())  # threshold actually bites


def test_semdedup_occupancy_cap_exempts_fat_cells(spark, emb):
    """With max_cell below every cell size no pair is ever formed:
    everything is kept — the cap bounds the quadratic join by
    construction (delete the cap and this test fails)."""
    cents = KM.kmeans_fit(emb, k=2, iters=1)
    out = KM.semdedup_keep(emb, cents, threshold=0.0, max_cell=10)
    assert out.filter(~F.col("keep")).count() == 0
    assert out.count() == emb.count()


def test_semdedup_stage_catches_reordered_paraphrases(spark):
    """Token-shuffled duplicates share a bag of words (cosine 1.0) but
    almost no 3-shingles — the gap the semantic stage exists to close."""
    from ocr_automation_system_spark.functions import dedup as D

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    toks = base.split()
    shuffled = " ".join(toks[::-1])
    rows = [("a", base), ("b", shuffled),
            ("c", "completely different words about ships and harbors"),
            ("d", None)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    from ocr_automation_system_spark.functions.clustering import (
        semdedup_stage,
    )

    got = {r["doc_id"]: r["keep"]
           for r in semdedup_stage(df, k=2, iters=1,
                                   threshold=0.9).collect()}
    assert got == {"a": True, "b": False, "c": True, "d": True}
    # and the shingle-based near-dedup indeed does NOT pair a with b
    pairs = D.ngram_jaccard_pairs(df.filter(df.text.isNotNull()),
                                  id_col="doc_id", text_col="text",
                                  threshold=0.5)
    assert pairs.count() == 0


def test_semdedup_cap_plan_has_no_window_on_cell(spark, emb):
    """Same plan contract as the ANN/SimHash caps: the max_cell occupancy
    cap is groupBy(cell).count() + broadcast LEFT ANTI, never a Window
    count (which would buffer a mega-cell in one task)."""
    cents = KM.kmeans_fit(emb, k=2, iters=1)
    out = KM.semdedup_keep(emb, cents, threshold=0.5, max_cell=100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan


def test_kmeans_overflow_guard_raises_not_wraps(spark):
    """Count-scale features at the default 10^6 quantization push
    (a-b)^2 past int64; the silent non-ANSI wraparound would corrupt
    assignments — kmeans_fit must raise instead, and the same features
    at scale=1 (exact integer counts) must fit cleanly."""
    import pytest

    big = 5000.0  # per-slot count diff ~5000 > the ~3036 wrap point
    rows = [(0, [0.0, 0.0]), (1, [big, big]),
            (2, [1.0, 0.0]), (3, [big - 1.0, big])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="int64-exact bound"):
        KM.kmeans_fit(df, k=2, iters=1)  # default scale=10^6
    cents = KM.kmeans_fit(df, k=2, iters=2, scale=1)
    cells = {r["vec_id"]: r["cell"] for r in df.select(
        "vec_id", KM.kmeans_assign(F.col("embedding"), cents,
                                   scale=1).alias("cell")).collect()}
    # the two big-count rows cluster together, away from the small ones
    assert cells[1] == cells[3] and cells[0] == cells[2]
    assert cells[0] != cells[1]


def test_semdedup_stage_auto_k_scales_with_corpus(spark):
    """k=None derives the cell count from the corpus size (parallelism
    grows with n instead of pinning the cell-keyed self-join at a fixed
    k) and runs the integer count features at scale=1."""
    from ocr_automation_system_spark.functions.clustering import (
        SEMDEDUP_TARGET_CELL, semdedup_stage,
    )

    rows = [(f"d{i:03d}", f"doc {i} text alpha beta w{i % 7}")
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = semdedup_stage(df, iters=1, threshold=0.99).collect()
    assert len(out) == 60 and all(r["keep"] is not None for r in out)
    # small corpus -> the k floor (16) applies; cells stay in range
    assert 0 <= min(r["cell"] for r in out)
    assert max(r["cell"] for r in out) < 16
    # very long repetitive doc (the overflow shape) no longer corrupts:
    fat = [("fat1", "spam " * 20000), ("fat2", "spam " * 20000),
           ("thin", "regular words here")]
    df2 = spark.createDataFrame(rows + fat, "doc_id string, text string")
    got = {r["doc_id"]: r["keep"]
           for r in semdedup_stage(df2, k=4, iters=1,
                                   threshold=0.95).collect()}
    assert got["fat1"] is True and got["fat2"] is False  # keep-earliest


def _pq_df(spark):
    """Two well-separated clusters; ids alternate so the k=2 seeds
    (smallest ids 0, 1) start one per cluster."""
    rows = []
    for i in range(6):
        rows.append((2 * i, [0.01 * i] * 8))          # cluster A, even ids
        rows.append((2 * i + 1, [0.5 + 0.01 * i] * 8))  # cluster B, odd
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_codes_separate_clusters(spark):
    df = _pq_df(spark)
    books = KM.pq_fit(df, m=2, k=2, iters=2)
    assert len(books) == 2 and all(len(b) == 2 for b in books)
    assert all(len(c) == 4 for b in books for c in b)  # dim 8 / m 2
    codes = {r["vec_id"]: r["pq_code"]
             for r in KM.pq_codes(df, books).collect()}
    a_codes = {codes[i] for i in codes if i % 2 == 0}
    b_codes = {codes[i] for i in codes if i % 2 == 1}
    assert len(a_codes) == 1 and len(b_codes) == 1
    assert a_codes != b_codes
    assert all(0 <= c < 2 ** 2 for c in codes.values())  # k^m packings


def test_pq_topk_adc_returns_query_cluster(spark):
    df = _pq_df(spark)
    books = KM.pq_fit(df, m=2, k=2, iters=2)
    top = KM.pq_topk(df, books, [0.02] * 8, k_results=6).collect()
    assert {r["vec_id"] for r in top} == {0, 2, 4, 6, 8, 10}
    # scores are exact ints, ties broken by vec_id ascending
    dists = [(r["pq_dist"], r["vec_id"]) for r in top]
    assert dists == sorted(dists)


def test_pq_partition_invariant_and_empty(spark):
    df = _pq_df(spark)
    books = KM.pq_fit(df, m=2, k=2, iters=2)
    one = sorted(map(tuple, KM.pq_codes(df.repartition(1), books).collect()))
    seven = sorted(map(tuple,
                       KM.pq_codes(df.repartition(7), books).collect()))
    assert one == seven
    empty = df.limit(0)
    assert KM.pq_fit(empty, m=2, k=2) == []
    with pytest.raises(ValueError):
        KM.pq_fit(df, m=3)  # dim 8 not divisible


def test_ivfpq_probe_prunes_to_query_cluster(spark):
    df = _pq_df(spark)
    coarse = KM.kmeans_fit(df, k=2, iters=2)
    books = KM.pq_fit(df, m=2, k=2, iters=2)
    # n_probe=1: only the query's coarse cell is scanned, so even with
    # k_results > |cluster| the other cluster can never appear
    top = KM.ivfpq_topk(df, coarse, books, [0.02] * 8,
                        n_probe=1, k_results=12).collect()
    assert {r["vec_id"] for r in top} == {0, 2, 4, 6, 8, 10}
    # n_probe=2 scans everything: falls back to plain PQ ADC ranking
    both = KM.ivfpq_topk(df, coarse, books, [0.02] * 8,
                         n_probe=2, k_results=12).collect()
    assert len(both) == 12
