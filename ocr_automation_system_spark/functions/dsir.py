"""DSIR-style importance weighting over hashed n-gram features.

Data Selection via Importance Resampling (Xie et al. 2023) scores every
raw-corpus document by how much its hashed n-gram feature distribution
looks like a trusted target corpus: fit unigram+bigram bucket
distributions for target and raw, weight each document by the
likelihood ratio, resample by weight. The same two-phase shape as the
CCNet scorer (``functions/lm.py``), Spark-first:

1. **Fit** — two bucket censuses (target slice, full raw corpus): one
   map-side-combined groupBy each, bounded at ``N_BUCKETS`` rows — the
   model is a tiny (bucket, p_target, p_raw, ratio) table, broadcast
   everywhere.
2. **Score** — explode each document's features, broadcast-join the
   ratio table, fold per-document statistics on the uniform doc key.

Scoring statistics are RATIONAL (the lm.py contract): per-bucket
``ratio = p_t / p_r`` with Laplace smoothing is three correctly-rounded
double divisions; the per-document fold sums ratios sorted by bucket
(equal addends within a bucket -> deterministic value sequence), giving
``mean_ratio`` and ``frac_target_favored`` that hash-match the DuckDB
twin bit-for-bit. The paper's log-likelihood form (sum of
``ln ratio``) ranks identically at the extremes and is a driver-side
swap — ``ln`` stays outside the cross-engine gate (Java's ``Math.log``
is 1-ulp, not correctly rounded).

Scale shape at 10^12 docs: censuses are aggregations (stopword-skew
absorbed map-side, output bounded at N_BUCKETS); the ratio table is
KBs; scoring is one broadcast join + one groupBy(doc) — the same
certified-scalable plan as ``lm_score``. Resampling off the weights is
``stratified_sample``-style md5-bucket thresholding downstream.

No reference counterpart; this tier exists for the training-mixture
design the engine's corpus feeds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lm import tokens_lower
from .text import bind_array, lazy_seq

#: hashed feature space size (buckets). Small enough to broadcast, big
#: enough that unigram+bigram collisions stay rare at contract scale.
N_BUCKETS = 1024


def feature_buckets(text: Column) -> Column:
    """Hashed unigram+bigram bucket ids for a document: md5-derived, so
    the twin reproduces them exactly."""
    def _bigrams(tk):
        return F.transform(
            lazy_seq(F.size(tk) >= 2, F.lit(1), F.size(tk) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(tk, i.cast("int")),
                F.element_at(tk, (i + F.lit(1)).cast("int"))))

    feats = bind_array(tokens_lower(text),
                       lambda tk: F.concat(tk, _bigrams(tk)))
    return F.transform(
        feats,
        lambda ft: F.pmod(
            F.conv(F.substring(F.md5(ft), 1, 8), 16, 10).cast("long"),
            F.lit(N_BUCKETS)))


def bucket_census(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(bucket, n) feature counts — bounded at N_BUCKETS rows."""
    return (df.select(F.explode(feature_buckets(F.col(text_col)))
                      .alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n")))


def ratio_table(target: DataFrame, raw: DataFrame,
                text_col: str = "text") -> DataFrame:
    """(bucket, ratio) Laplace-smoothed likelihood-ratio model:
    ``((n_t + 1) / (T_t + B)) / ((n_r + 1) / (T_r + B))`` — three
    correctly-rounded divisions in a fixed order, mirrored by the twin.
    Covers every bucket observed in the RAW corpus (a document can only
    hit those)."""
    t = bucket_census(target, text_col).withColumnRenamed("n", "n_t")
    r = bucket_census(raw, text_col).withColumnRenamed("n", "n_r")
    tt = t.agg(F.sum("n_t").alias("_tt"))
    tr = r.agg(F.sum("n_r").alias("_tr"))
    joined = (r.join(t, "bucket", "left")
              .crossJoin(F.broadcast(tt)).crossJoin(F.broadcast(tr)))
    p_t = ((F.coalesce(F.col("n_t"), F.lit(0)) + 1).cast("double")
           / (F.coalesce(F.col("_tt"), F.lit(0)) + N_BUCKETS)
           .cast("double"))
    p_r = ((F.col("n_r") + 1).cast("double")
           / (F.col("_tr") + N_BUCKETS).cast("double"))
    return joined.select("bucket", (p_t / p_r).alias("ratio"))


def importance_weights(df: DataFrame, ratios: DataFrame,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per-document importance statistics against a fitted ratio table:
    (doc_id, n_feats, mean_ratio, frac_target_favored). Featureless
    documents score 0.0 / 0.0 (kept, flagged by n_feats = 0)."""
    feats = (df.select(F.col(id_col).alias("doc_id"),
                       F.explode(feature_buckets(F.col(text_col)))
                       .alias("bucket")))
    scored = feats.join(F.broadcast(ratios), "bucket")
    agg = (scored.groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_feats"),
                F.aggregate(
                    F.sort_array(F.collect_list(
                        F.struct("bucket", "ratio"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["ratio"]).alias("_s"),
                F.sum(F.when(F.col("ratio") > 1.0, 1).otherwise(0))
                .alias("_fav")))
    return (df.select(F.col(id_col).alias("doc_id"))
            .join(agg, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(F.col("n_feats"), F.lit(0)).cast("long")
                .alias("n_feats"),
                F.when(F.coalesce(F.col("n_feats"), F.lit(0)) > 0,
                       F.col("_s") / F.col("n_feats").cast("double"))
                .otherwise(F.lit(0.0)).alias("mean_ratio"),
                F.when(F.coalesce(F.col("n_feats"), F.lit(0)) > 0,
                       F.col("_fav").cast("double")
                       / F.col("n_feats").cast("double"))
                .otherwise(F.lit(0.0)).alias("frac_target_favored")))
