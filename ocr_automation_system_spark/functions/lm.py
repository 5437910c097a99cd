"""Corpus-trained unigram language-model quality scoring.

CCNet ranks web documents by the perplexity of a KenLM model trained on
a trusted corpus; documents whose token distribution diverges from the
reference read as noise/spam. The same two-phase shape, Spark-first:

1. **Train** — a global token census: one groupBy over the exploded
   token stream (two-phase partial aggregation: each partition collapses
   its repeats map-side before the shuffle). The model is the relative
   frequency table ``p(w) = count(w) / total`` — one row per vocabulary
   word, orders of magnitude smaller than the corpus.
2. **Score** — join each document's tokens against the model and fold
   per-document statistics.

Scoring statistics are RATIONAL, not log-space: mean token probability
and rare-token fraction. Log-probabilities would put ``ln`` into the
contract surface, and Java's ``Math.log`` is only 1-ulp-accurate (not
correctly rounded) — a cross-engine hash over transcendental outputs is
a latent flake. Mean-p and rare-frac are built from exact double
division, ordered left-associative folds, and exact comparisons, so the
DuckDB twin matches bit-for-bit; both rank documents the same way a
perplexity score does at the extremes (token mass on very rare words =
low mean-p = high perplexity). Swap point for a real KenLM scorer: a
``mapInPandas`` stage with a per-worker model singleton, exactly like
the OCR engine wrapper (``oracle/ocr_stub.py``).

Scale shape at 10^12 docs (~10^9-word vocabulary):

* census: one shuffle, map-side combined; the vocabulary table is the
  artifact you keep (write it bucketed by token);
* scoring join: tokens shuffle on the token key against the bucketed
  vocabulary (or broadcast, if a capped vocabulary fits); the per-doc
  fold then groups on the uniform doc id — one more shuffle;
* skew: stopwords are mega-hot token keys, but the census is an
  AGGREGATION (partial combine absorbs the skew map-side), not a join,
  and the scoring join's hot rows spread over the token-key shuffle's
  hash space with AQE skew handling on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: token pattern shared verbatim with the DuckDB twin (RE2-compatible).
TOKEN_RE = r"[a-z0-9]+"
#: tokens with corpus probability below this are "rare" (exact double
#: literal on both engines).
RARE_P = 1e-4


def tokens_lower(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(F.coalesce(text, F.lit(""))),
                                F.lit(TOKEN_RE), 0)


def token_census(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, n, p) — the unigram model. One map-side-combined shuffle;
    ``p = n / total`` with the 1-row total attached by broadcast
    cross-join (lazy, no driver action)."""
    toks = (df.select(F.explode(tokens_lower(F.col(text_col)))
                      .alias("token")))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("_total"))
    return (counts.crossJoin(F.broadcast(total))
            .select("token", "n",
                    (F.col("n").cast("double") / F.col("_total"))
                    .alias("p")))


def lm_score(df: DataFrame, model: DataFrame, id_col: str = "doc_id",
             text_col: str = "text",
             broadcast_model: bool = True) -> DataFrame:
    """Per-document unigram statistics against a trained model:
    (id, n_tokens, mean_token_p, rare_token_frac).

    ``mean_token_p`` folds the per-token probabilities sorted by
    (token, p), left-associatively — within a tie group every addend is
    identical (p is a function of the token), so the fold sequence is a
    deterministic value sequence and the sum is bit-exact under any
    partitioning (and reproducible by the DuckDB twin's
    ``list(p ORDER BY token)`` + ``list_reduce``). Tokens absent from
    the model score p=0 (counted as rare). Empty/null docs: n_tokens=0,
    mean 0.0, rare_frac 0.0.

    ``broadcast_model=False`` switches the token join to a shuffle for
    vocabularies beyond broadcast reach — at scale, persist the model
    bucketed by token instead.
    """
    toks = (
        df.select(F.col(id_col).alias("_id"),
                  F.explode(tokens_lower(F.col(text_col))).alias("token")))
    m = model.select("token", "p")
    mj = F.broadcast(m) if broadcast_model else m
    scored = (toks.join(mj, "token", "left")
              .select("_id", "token",
                      F.coalesce(F.col("p"), F.lit(0.0)).alias("p")))
    agg = scored.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.aggregate(F.array_sort(F.collect_list(F.struct("token", "p"))),
                    F.lit(0.0), lambda acc, x: acc + x["p"]).alias("_sum_p"),
        F.sum(F.when(F.col("p") < F.lit(RARE_P), 1).otherwise(0))
        .alias("_n_rare"),
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(agg, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long")
            .alias("n_tokens"),
            F.when(F.coalesce(F.col("n_tokens"), F.lit(0)) > 0,
                   F.col("_sum_p") / F.col("n_tokens").cast("double"))
            .otherwise(F.lit(0.0)).alias("mean_token_p"),
            F.when(F.coalesce(F.col("n_tokens"), F.lit(0)) > 0,
                   F.col("_n_rare").cast("double")
                   / F.col("n_tokens").cast("double"))
            .otherwise(F.lit(0.0)).alias("rare_token_frac"),
        )
    )


def bpe_pair_counts(df: DataFrame, text_col: str = "text",
                    k: int = 50) -> DataFrame:
    """One BPE merge round's candidate table: the census of adjacent
    character pairs inside tokens, top-k by count (ties on the pair
    string) — the inner loop of tokenizer vocabulary induction
    (Sennrich et al., 2016), run corpus-wide.

    Scale shape: the pair stream explodes to ~chars-per-corpus rows, but
    the groupBy key space is bounded by charset^2 (~1.3k for [a-z0-9]) —
    the map-side partial combine collapses each partition to at most
    that many rows before the only shuffle, and the top-k is a
    TakeOrdered over a tiny aggregate. No joins, no skew exposure.
    """
    from .text import lazy_seq

    toks = df.select(F.explode(tokens_lower(F.col(text_col))).alias("t"))
    pairs = toks.select(F.explode(F.transform(
        lazy_seq(F.length("t") >= 2, F.lit(1), F.length("t") - 1),
        lambda i: F.col("t").substr(i, F.lit(2)))).alias("pair"))
    return (pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("pair")).limit(k))
