"""Learned quality-probe trainer (functions/probe.py): exact-arithmetic
parity with a pure-Python reference, partitioning independence, plan
shape, and distillation usefulness. The cross-engine hash gate for the
two contract queries lives in test_entry_contract's full-registry
sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_automation_system_spark.functions import probe as P


def _rows(n=120):
    rows = []
    for i in range(n):
        if i % 3 == 0:  # high quality: long, alphabetic, stopworded
            text = ("the quick brown fox jumps over the lazy dog and "
                    "that is a fine tale of pace. " * 4) + f"tail {i}"
        elif i % 3 == 1:  # junk: short digit soup
            text = f"42 99 {i} 7!!"
        else:  # mid: long but no stopwords / low alpha
            text = ("0101 ##-- " * 40) + f"x{i}"
        rows.append((i, text))
    rows.append((n, None))
    return rows


def _py_features(text):
    import re
    txt = text or ""
    toks = [t for t in txt.strip().lower().split() if t] \
        if txt.strip() else []
    stops = sum(1 for t in toks if t in
                ("the", "a", "an", "of", "and", "to", "in", "is",
                 "that", "for"))
    digits = len(re.sub(r"[^0-9]", "", txt))
    punct = len(re.sub(r"[^.,;:!?]", "", txt))
    alpha = len(re.sub(r"[^A-Za-z]", "", txt))

    def idiv(c, d):
        return min(int(c // d), 15)

    return [8, idiv(len(toks), 32), idiv(len(txt), 256),
            idiv(digits, 8), idiv(stops, 4), idiv(punct, 4),
            min(int(alpha * 15 / max(len(txt), 1)), 15)]


def _py_label(text):
    import re
    txt = text or ""
    toks = [t for t in txt.strip().lower().split() if t] \
        if txt.strip() else []
    sw = (sum(1 for t in toks if t in
              ("the", "a", "an", "of", "and", "to", "in", "is",
               "that", "for")) / len(toks)) if toks else 0.0
    mwl = (sum(len(t) for t in toks) / len(toks)) if toks else 0.0
    alpha = (len(re.sub(r"[^A-Za-z]", "", txt)) / len(txt)) \
        if txt else 0.0
    q = ((0.25 if len(txt) >= 200 else 0.0)
         + (0.25 if alpha >= 0.6 else 0.0)
         + (0.25 if 3.0 <= mwl <= 10.0 else 0.0)
         + (0.25 if sw >= 0.05 else 0.0))
    return 1 if q >= 0.75 else 0


def _py_fit(rows, iters):
    feats = [(_py_features(t), _py_label(t) * P.PROBE_SCALE)
             for _, t in rows]
    dens = [max(P.PROBE_DIM * sum(x[j] * x[j] for x, _ in feats), 1)
            for j in range(P.PROBE_DIM)]
    w = [0] * P.PROBE_DIM
    for _ in range(iters):
        g = [0] * P.PROBE_DIM
        for x, ys in feats:
            r = sum(xj * wj for xj, wj in zip(x, w)) - ys
            for j in range(P.PROBE_DIM):
                g[j] += x[j] * r
        w = [wi - g[j] // dens[j] for j, wi in enumerate(w)]
    return w


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_probe_fit_matches_python_reference(spark):
    rows = _rows(60)
    got = P.probe_fit(_df(spark, rows), iters=5)
    assert got == _py_fit(rows, iters=5)


def test_probe_fit_partitioning_independent(spark):
    rows = _rows(90)
    base = P.probe_fit(_df(spark, rows), iters=4)
    shuffled = P.probe_fit(_df(spark, rows).repartition(13, "text"),
                           iters=4)
    assert base == shuffled


def test_probe_distills_teacher_above_baseline(spark):
    """The probe must beat the trivial majority-class predictor on the
    mixed synthetic corpus — separation, not just exactness."""
    rows = _rows(120)
    out = P.quality_probe_scores(_df(spark, rows)).collect()
    base = max(sum(1 for r in out if r["y"]),
               sum(1 for r in out if not r["y"])) / len(out)
    agree = sum(1 for r in out if r["pred"] == r["y"]) / len(out)
    assert agree > base
    hi = [r["score"] for r in out if r["y"]]
    lo = [r["score"] for r in out if not r["y"]]
    assert sum(hi) / len(hi) > sum(lo) / len(lo)


def test_probe_scoring_plan_is_jvm_codegen(spark):
    """Scoring is a narrow projection: no Python UDF, no shuffle."""
    w = [100] * P.PROBE_DIM
    df = _df(spark, _rows(10)).select(
        P.probe_dot(P.probe_features(F.col("text")), w).alias("score"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_probe_empty_input_returns_no_model(spark):
    df = _df(spark, []).limit(0)
    assert P.probe_fit(df, iters=3) == []
    assert P.probe_weights_table(df).count() == 0
    assert P.quality_probe_scores(df).count() == 0


def test_probe_weight_bound_guard():
    """The scoring dot product stays int64-exact iff |w| stays under
    PROBE_W_BOUND: dim * 15 * 2^40 < 2^63."""
    assert P.PROBE_DIM * 15 * P.PROBE_W_BOUND < 2 ** 63


def test_probe_weights_table_names(spark):
    t = P.probe_weights_table(_df(spark, _rows(30)), iters=2)
    rows = {r["feature"]: r["weight"] for r in t.collect()}
    assert set(rows) == set(P.PROBE_FEATURES)


def test_probe_scoring_streams_with_frozen_weights(spark, tmp_path):
    """Production shape: fit on a batch sample, freeze the weights,
    score the stream — the scoring projection is stateless, so the SAME
    expression runs under readStream and reproduces the batch rows
    (the repo's one-definition/two-modes property)."""
    import os

    rows = _rows(40)
    batch = _df(spark, rows)
    w = P.probe_fit(batch, iters=3)

    d = str(tmp_path / "in")
    os.makedirs(d)
    batch.write.parquet(os.path.join(d, "drop1"))
    stream_in = (spark.readStream.schema("doc_id long, text string")
                 .parquet(os.path.join(d, "*")))

    def score(df):
        s = P.probe_dot(P.probe_features(F.col("text")), w)
        return df.select("doc_id", s.alias("score"),
                         (s * 2 >= P.PROBE_SCALE).alias("pred"))

    out = str(tmp_path / "out")
    q = (score(stream_in).writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    want = sorted(tuple(r) for r in score(batch).collect())
    assert got == want and len(got) == 41


# ---------------------------------------------------------------------------
# warm-start refit, weight artifact, per-source calibrated keep
# ---------------------------------------------------------------------------

def test_probe_warm_start_resumes_exactly(spark):
    """Exact arithmetic makes a warm-started continuation bit-identical
    to the longer cold fit on the same data — the incremental-refit
    contract."""
    df = _df(spark, _rows(45))
    cold8 = P.probe_fit(df, iters=8)
    w5 = P.probe_fit(df, iters=5)
    assert P.probe_fit(df, iters=3, init_w=w5) == cold8


def test_probe_init_w_validates_dim(spark):
    with pytest.raises(ValueError, match="init_w"):
        P.probe_fit(_df(spark, _rows(6)), iters=1, init_w=[1, 2])


def test_probe_weights_artifact_roundtrip(spark, tmp_path):
    w = P.probe_fit(_df(spark, _rows(30)), iters=4)
    path = str(tmp_path / "probe_weights")
    P.write_probe_weights(spark, w, path)
    assert P.read_probe_weights(spark, path) == w
    with pytest.raises(ValueError, match="expected"):
        P.write_probe_weights(spark, [1, 2, 3], path)


def _src_rows(n=90):
    """Three sources with skewed quality mixes: srcA mostly good, srcB
    mostly junk, srcC mixed — the shape where one global threshold
    keeps ~all of A and ~none of B."""
    base = _rows(n)  # (doc_id, text) rotating good/junk/mid
    out = []
    for i, (doc_id, text) in enumerate(base):
        src = ("srcA" if i % 3 == 0 else "srcB" if i % 3 == 1
               else "srcC") if i % 7 else None  # some null sources
        out.append((doc_id, text, src))
    return out


def _sdf(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string")


def _brute_calibrated(rows, w, keep_pct):
    import collections
    by_src = collections.defaultdict(list)
    for doc_id, text, src in rows:
        score = sum(x * wi for x, wi in zip(_py_features(text), w))
        by_src[src or ""].append((-score, doc_id, score))
    kept = set()
    for src, docs in by_src.items():
        docs.sort()
        k = (len(docs) * keep_pct + 99) // 100
        kept.update((d, src, s) for _, d, s in docs[:k])
    return kept


@pytest.mark.parametrize("keep_pct", [0, 37, 60, 100])
def test_probe_calibrated_keep_matches_bruteforce(spark, keep_pct):
    rows = _src_rows(60)
    w = P.probe_fit(_sdf(spark, rows), iters=4)
    got = {(r["doc_id"], r["source"], r["score"])
           for r in P.probe_calibrated_keep(
               _sdf(spark, rows), keep_pct=keep_pct, weights=w).collect()}
    assert got == _brute_calibrated(rows, w, keep_pct)


def test_probe_calibrated_keeps_every_source_tail(spark):
    """The calibration property itself: with one global threshold the
    junk-heavy source would lose (or keep) everything; per-source
    ranking keeps exactly ceil(60%) of EACH source."""
    import collections
    rows = _src_rows(63)
    kept = P.probe_calibrated_keep(_sdf(spark, rows), keep_pct=60).collect()
    per_src_total = collections.Counter(
        (s or "") for _, _, s in rows)
    per_src_kept = collections.Counter(r["source"] for r in kept)
    for src, n in per_src_total.items():
        assert per_src_kept[src] == (n * 60 + 99) // 100, src


def test_probe_calibrated_plan_broadcasts_cutoffs(spark):
    """The cutoff table joins back as a broadcast (never a shuffled
    sort-merge join of the corpus against per-source cutoffs)."""
    df = _sdf(spark, _src_rows(30))
    w = [1, 2, 3, 4, 5, 6, 7]
    plan = P.probe_calibrated_keep(df, weights=w) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_probe_calibrated_keep_pct_validates(spark):
    with pytest.raises(ValueError, match="keep_pct"):
        P.probe_calibrated_keep(_sdf(spark, _src_rows(9)), keep_pct=101)
