"""Distributed quality-classifier probe: exact-arithmetic linear model.

The modern curation stack (CCNet, FineWeb-Edu, DCLM) filters with a
LEARNED quality classifier: an expensive teacher labels a sample, a
cheap linear/fastText student scores the whole corpus. This module is
that student, trained INSIDE the engine: a linear probe over small
integer text features, fit by exact fixed-point batch gradient descent,
distilling the repo's rule-based ``text.quality_score`` teacher
(reference gate lineage: /root/reference/project/core/extractor.py:40-59)
into one scoring projection.

Exactness contract (same discipline as ``clustering.kmeans_fit``):

* features are SMALL NON-NEGATIVE INTEGERS (bucketed counts, 0..15) —
  no float features, no normalization drift;
* weights are int64 fixed-point at ``PROBE_SCALE``;
* the gradient ``g_j = sum_i x_ij * (x_i . w - y_i * PROBE_SCALE)`` is
  summed as DECIMAL(38,0) — exact and partitioning-independent where an
  int64 sum could overflow at 10^12 rows (per-row terms reach ~2^50,
  decimal38 holds ~2^126) and a double sum would be order-dependent;
* the update ``w_j -= floor(g_j / (dim * sxx_j))`` is Jacobi-
  preconditioned GD — ``sxx_j = sum_i x_ij^2`` is the exact integer
  diagonal of the Hessian, computed ONCE before the loop, and the
  ``1/dim`` damping bounds the off-diagonal mass (Gershgorin), so the
  step is stable and scale-free without a tuned learning rate (a global
  rate crawls: the feature second moments here spread ~64x..225x). The
  floor division is Python big-int on the driver; the DuckDB twin
  reproduces it with the HUGEINT positive-mod trick
  (``(g - ((g % d) + d) % d) // d``) so both engines floor identically
  for negative gradients.

Scale shape: one persisted feature projection (the 100-TB scan runs
once); each iteration is ONE map-side-combined aggregate shipping
``dim + 1`` decimals to the driver — model state never exceeds a few
hundred bytes, executors never see each other's partials. Scoring is a
narrow whole-stage-codegen dot product against a broadcast literal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import STOPWORDS, quality_score, ws_tokens

#: fixed-point scale for weights and labels (2^16).
PROBE_SCALE = 65_536

#: default GD step count; with the Jacobi preconditioner each step
#: contracts every Hessian eigendirection by >= ~1/dim, so 12 steps
#: close >= ~85% of the gap in the slowest direction.
PROBE_ITERS = 12

#: feature names, index == weight position.
PROBE_FEATURES = ("bias", "tokens_b", "chars_b", "digits_b",
                  "stopwords_b", "punct_b", "alpha_pct_b")

PROBE_DIM = len(PROBE_FEATURES)

#: |w| guard: keeps the scoring dot product (dim * 15 * |w|) far inside
#: int64. GD at the fixed lr cannot plausibly reach this; a violation
#: means the arithmetic contract is broken, so fail loudly.
PROBE_W_BOUND = 1 << 40


def probe_features(text: Column) -> Column:
    """array<long>[7] of bucketed (0..15) integer text signals.

    Buckets are integer divisions of counts both engines compute
    identically (whitespace tokens / char-class strips — the same
    primitives as ``text.quality_score``); the bias slot is 8 so every
    feature lives on one magnitude scale."""
    txt = F.coalesce(text, F.lit(""))
    toks = ws_tokens(txt)
    n_chars = F.length(txt)

    # integer division via floor: all operands non-negative ints, so
    # floor(double div) is exact (counts < 2^52)
    def idiv(c: Column, div: int) -> Column:
        return F.least(F.floor(c.cast("double") / div), F.lit(15)) \
                .cast("long")

    n_alpha = F.length(F.regexp_replace(txt, "[^A-Za-z]", ""))
    return F.array(
        F.lit(8).cast("long"),
        idiv(F.size(toks), 32),
        idiv(n_chars, 256),
        idiv(F.length(F.regexp_replace(txt, "[^0-9]", "")), 8),
        idiv(F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))), 4),
        idiv(F.length(F.regexp_replace(txt, "[^.,;:!?]", "")), 4),
        F.least(F.floor(n_alpha.cast("double") * 15
                        / F.greatest(n_chars, F.lit(1)).cast("double")),
                F.lit(15)).cast("long"),
    )


def probe_label(text: Column) -> Column:
    """Teacher label: the rule-based composite quality gate's top tier
    (``quality_score >= 0.75`` — at least 3 of the 4 gates pass)."""
    return quality_score(F.coalesce(text, F.lit(""))) >= 0.75


def probe_dot(vec: Column, weights: list) -> Column:
    """Exact int64 dot product feature-vector . weight-literal (ONE
    ``F.lit`` for the whole vector — the k-means py4j lesson)."""
    w = F.lit([int(v) for v in weights]).cast("array<long>")
    return F.aggregate(
        F.zip_with(vec, w, lambda x, wi: x * wi),
        F.lit(0).cast("long"), lambda acc, t: acc + t)


def probe_fit(df: DataFrame, text_col: str = "text",
              iters: int = PROBE_ITERS,
              init_w: list | None = None) -> list:
    """Fit the probe by ``iters`` exact preconditioned-GD steps;
    returns the int64 weight vector (empty input -> ``[]``, the
    kmeans_fit convention: no data, no model).

    One pre-pass aggregates the exact Hessian diagonal ``sxx_j`` (and
    warms the persisted feature projection every step reuses); each
    iteration is then ONE groupless aggregate of ``dim`` DECIMAL(38,0)
    gradient sums — the partial combine means ~``dim`` numbers reach
    the driver per step regardless of corpus size.

    ``init_w`` warm-starts from a stored weight vector (the persisted
    probe artifact): because every quantity is exact integer arithmetic,
    continuing a fit is EXACTLY the longer fit on the same data —
    ``probe_fit(df, iters=a+b) == probe_fit(df, iters=b,
    init_w=probe_fit(df, iters=a))`` — so incremental re-fits resume
    bit-for-bit, the same resume discipline as the CC round checkpoints."""
    if init_w is not None and len(init_w) != PROBE_DIM:
        raise ValueError(f"init_w must have {PROBE_DIM} entries, "
                         f"got {len(init_w)}")
    feats = df.select(
        probe_features(F.col(text_col)).alias("x"),
        (probe_label(F.col(text_col)).cast("long")
         * PROBE_SCALE).alias("ys")).persist()
    w = [int(v) for v in init_w] if init_w is not None else [0] * PROBE_DIM
    try:
        pre = feats.agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum((F.element_at("x", j + 1)
                     * F.element_at("x", j + 1)).cast("decimal(38,0)"))
              .alias(f"s{j}") for j in range(PROBE_DIM)]).collect()[0]
        if not pre["n"]:
            return []
        dens = [max(PROBE_DIM * int(pre[f"s{j}"] or 0), 1)
                for j in range(PROBE_DIM)]
        for _ in range(iters):
            resid = (probe_dot(F.col("x"), w) - F.col("ys")).alias("r")
            agg = feats.select(F.col("x"), resid).agg(
                *[F.sum((F.element_at("x", j + 1) * F.col("r"))
                        .cast("decimal(38,0)")).alias(f"g{j}")
                  for j in range(PROBE_DIM)]).collect()[0]
            w = [wi - int(agg[f"g{j}"] or 0) // dens[j]
                 for j, wi in enumerate(w)]
            if any(abs(wi) >= PROBE_W_BOUND for wi in w):
                raise ValueError(f"probe weights escaped the int64 "
                                 f"scoring bound: {w}")
    finally:
        feats.unpersist()
    return w


def quality_probe_scores(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         iters: int = PROBE_ITERS) -> DataFrame:
    """Fit on the corpus, then score it: (doc_id, score, pred, y).

    ``score`` is the fixed-point logit (int64, exact); ``pred`` is the
    0.5 threshold (``2*score >= PROBE_SCALE``); ``y`` is the teacher
    label the probe distills. Scoring is one narrow projection — at
    100 TB the fit runs on a sample and the frozen weights broadcast
    into this same projection."""
    w = probe_fit(df, text_col=text_col, iters=iters) \
        or [0] * PROBE_DIM  # empty corpus: projection yields 0 rows
    score = probe_dot(probe_features(F.col(text_col)), w)
    return df.select(
        F.col(id_col).alias("doc_id"),
        score.alias("score"),
        (score * 2 >= PROBE_SCALE).alias("pred"),
        probe_label(F.col(text_col)).alias("y"))


def probe_weights_table(df: DataFrame, text_col: str = "text",
                        iters: int = PROBE_ITERS) -> DataFrame:
    """The trained model as a (feature, weight) table — the auditable
    artifact a production run would persist and broadcast. Empty
    corpus -> empty table (no data, no model)."""
    w = probe_fit(df, text_col=text_col, iters=iters)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(name, int(wi)) for name, wi in zip(PROBE_FEATURES, w)],
        "feature string, weight long")


def write_probe_weights(spark, weights: list, path: str) -> None:
    """Persist a trained weight vector as the (feature, weight) parquet
    artifact (atomic via Spark's commit protocol). An empty vector is a
    contract error — no data, no artifact."""
    if len(weights) != PROBE_DIM:
        raise ValueError(f"expected {PROBE_DIM} weights, got {len(weights)}")
    spark.createDataFrame(
        [(name, int(wi)) for name, wi in zip(PROBE_FEATURES, weights)],
        "feature string, weight long").coalesce(1) \
        .write.mode("overwrite").parquet(path)


def read_probe_weights(spark, path: str) -> list:
    """Load a persisted weight artifact back into feature order (the
    parquet row order is not contractual)."""
    by_name = {r["feature"]: int(r["weight"])
               for r in spark.read.parquet(path).collect()}
    missing = [n for n in PROBE_FEATURES if n not in by_name]
    if missing:
        raise ValueError(f"weight artifact at {path} missing {missing}")
    return [by_name[n] for n in PROBE_FEATURES]


def probe_calibrated_keep(df: DataFrame, keep_pct: int = 60,
                          id_col: str = "doc_id", text_col: str = "text",
                          source_col: str = "source",
                          iters: int = PROBE_ITERS,
                          weights: list | None = None) -> DataFrame:
    """PER-SOURCE calibrated selection: keep each source's top
    ``ceil(n_source * keep_pct / 100)`` documents by (probe score desc,
    doc_id asc). A single global threshold (0.5 logit or a corpus
    percentile) is miscalibrated on skewed corpora — a high-quality
    source would survive wholesale while a boilerplate-heavy source is
    wiped out; ranking WITHIN each source keeps the mixture while
    still dropping each source's worst tail. Returns
    (doc_id, source, score).

    Scale shape (the X47 boundary-bucket discipline — NOT a corpus-wide
    window): scores take at most |feature-bucket lattice| distinct
    values (7 features x 16 buckets), so ``groupBy(source, score)``
    is a bounded-key map-side-combined histogram. Per-source cutoffs
    come from a window over that TINY histogram, broadcast back; whole
    score groups are kept/dropped by the verdict, and only the single
    boundary (source, score) group per source pays a per-doc
    row_number tie-break."""
    from pyspark.sql import Window

    if not 0 <= keep_pct <= 100:
        raise ValueError(f"keep_pct must be 0..100, got {keep_pct}")
    w = (list(weights) if weights is not None
         else probe_fit(df, text_col=text_col, iters=iters)) \
        or [0] * PROBE_DIM
    scored = df.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.col(source_col), F.lit("")).alias("source"),
        probe_dot(probe_features(F.col(text_col)), w).alias("score"))

    hist = scored.groupBy("source", "score") \
        .agg(F.count(F.lit(1)).alias("cnt"))
    # histogram-side window: partitions are sources, rows are distinct
    # scores — bounded by the feature lattice, never corpus-sized
    hw = Window.partitionBy("source").orderBy(F.desc("score")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cuts = hist.select(
        "source", "score", "cnt",
        F.sum("cnt").over(hw).alias("cum"),
        # ceil-div via double: exact while n_source*keep_pct+99 < 2^53
        # (10^12 rows x 100 ~ 2^47 — 64x of headroom)
        ((F.sum("cnt").over(Window.partitionBy("source"))
          * keep_pct + 99) / 100).cast("long").alias("k"))
    cuts = cuts.select(
        "source", "score",
        F.when(F.col("cum") - F.col("cnt") >= F.col("k"), F.lit(0))
        .when(F.col("cum") <= F.col("k"), F.lit(-1))  # -1 = keep all
        .otherwise(F.col("k") - (F.col("cum") - F.col("cnt")))
        .alias("take_n"))

    joined = scored.join(F.broadcast(cuts), ["source", "score"])
    kept_full = joined.filter(F.col("take_n") == -1)
    boundary = joined.filter(F.col("take_n") > 0)
    bw = Window.partitionBy("source", "score").orderBy(F.asc("doc_id"))
    kept_boundary = boundary \
        .withColumn("_rk", F.row_number().over(bw)) \
        .filter(F.col("_rk") <= F.col("take_n")).drop("_rk")
    return kept_full.unionByName(kept_boundary) \
        .select("doc_id", "source", "score")
