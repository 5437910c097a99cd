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


def _bigram_structs(text: Column) -> Column:
    """Positional (w1, w2) adjacent-pair structs over the LM token
    stream (codegen-safe: lazy_seq + bind_array via positional_grams)."""
    from .text import positional_grams

    return positional_grams(
        tokens_lower(text), 2,
        lambda s: F.struct(F.element_at(s, 1).alias("w1"),
                           F.element_at(s, 2).alias("w2")))


def bigram_census(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(w1, w2, n12) — the bigram model table. Same shape as the unigram
    census: one map-side-combined groupBy over the exploded pair stream;
    at web scale the table is ~10^10 rows — keep it bucketed by (w1,w2),
    never broadcast (the ``broadcast_model`` knob is for test scale)."""
    bg = df.select(F.explode(_bigram_structs(F.col(text_col))).alias("b"))
    return (bg.groupBy(F.col("b.w1").alias("w1"),
                       F.col("b.w2").alias("w2"))
            .agg(F.count(F.lit(1)).alias("n12")))


def stupid_backoff_score(df: DataFrame, unigrams: DataFrame,
                         bigrams: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", alpha: float = 0.4,
                         broadcast_model: bool = True) -> DataFrame:
    """Per-document bigram fluency against a trained reference model —
    Brants et al. 2007's stupid backoff, the KenLM-shaped upgrade of
    ``lm_score``'s unigram statistics:

        S(w2|w1) = n12 / n1           when the model saw the bigram
                 = alpha * p(w2)      otherwise (0.4, the published const)

    (denominator = the model's unigram count of w1 — the standard
    corpus approximation of the prefix count). Returns
    (id, n_bigrams, mean_bigram_s, backoff_frac): fluent prose on
    in-model vocabulary scores high conditional mass; word-salad or
    out-of-domain text backs off constantly (backoff_frac -> 1) and its
    mean collapses toward alpha * unigram mass. Scores stay RATIONAL —
    every S is one or two correctly-rounded double ops, folded in
    position order — so the DuckDB twin matches bit-for-bit (same
    discipline as ``lm_score``; no ``ln`` in the contract surface).

    Scale shape: the pair stream left-joins the bigram table on
    (w1, w2) and the unigram table twice (w1 denominator, w2 backoff);
    with ``broadcast_model=False`` those are shuffle joins against the
    bucketed model tables — stopword-hot keys spread over the hash
    space with AQE skew handling; the per-doc fold groups on the
    uniform id. Empty/one-token docs: n_bigrams=0, mean 0.0, frac 0.0.
    """
    bg = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(_bigram_structs(F.col(text_col)))
        .alias("_pos", "b"))
    bg = bg.select("_id", "_pos",
                   F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    bm = bigrams.select("w1", "w2", "n12")
    u1 = unigrams.select(F.col("token").alias("w1"),
                         F.col("n").alias("_n1"))
    u2 = unigrams.select(F.col("token").alias("w2"),
                         F.col("p").alias("_p2"))
    if broadcast_model:
        bm, u1, u2 = F.broadcast(bm), F.broadcast(u1), F.broadcast(u2)
    s = F.when(F.col("n12").isNotNull(),
               F.col("n12").cast("double") / F.col("_n1").cast("double")) \
        .otherwise(F.lit(float(alpha))
                   * F.coalesce(F.col("_p2"), F.lit(0.0)))
    scored = (bg.join(bm, ["w1", "w2"], "left")
              .join(u1, "w1", "left")
              .join(u2, "w2", "left")
              .select("_id", "_pos", s.alias("_s"),
                      F.when(F.col("n12").isNull(), 1).otherwise(0)
                      .alias("_backed")))
    agg = scored.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.aggregate(F.array_sort(F.collect_list(F.struct("_pos", "_s"))),
                    F.lit(0.0), lambda acc, x: acc + x["_s"])
        .alias("_sum_s"),
        F.sum("_backed").alias("_n_back"))
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(agg, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long")
            .alias("n_bigrams"),
            F.when(F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
                   F.col("_sum_s") / F.col("n_bigrams").cast("double"))
            .otherwise(F.lit(0.0)).alias("mean_bigram_s"),
            F.when(F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
                   F.col("_n_back").cast("double")
                   / F.col("n_bigrams").cast("double"))
            .otherwise(F.lit(0.0)).alias("backoff_frac")))


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


def _merge_pair(syms: Column, left: str, right: str) -> Column:
    """Apply ONE BPE merge to a symbol array: leftmost non-overlapping,
    single left-to-right pass (Sennrich et al. 2016 semantics), as a
    fold — if the accumulator's last symbol is exactly ``left`` and the
    current symbol is ``right``, the last symbol becomes ``left+right``
    (which can never re-merge within the same pass: left+right != left).
    ``try_element_at`` keeps the empty-accumulator probe null-safe under
    ANSI mode."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms, F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)))
        .otherwise(F.concat(acc, F.array(x))))


def bpe_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) census — the BPE trainer's working set. THE scale
    insight of the classic trainer: after this one corpus-wide map-side
    combined groupBy, every merge iteration runs over the distinct-word
    table (10^5-10^7 rows at web scale), never the corpus again."""
    return (df.select(F.explode(tokens_lower(F.col(text_col)))
                      .alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def bpe_train(df: DataFrame, n_merges: int = 6, text_col: str = "text",
              checkpoint_every: int = 0) -> "DataFrame":
    """Full iterative BPE tokenizer training (Sennrich et al. 2016):
    n_merges rounds of [adjacent-pair census over the (word, freq)
    vocab -> pick argmax pair (count DESC, then pair lexicographic) ->
    apply the merge to every word's symbol array]. Returns the merge
    table (rank, left, right, merged, pair_count) — the tokenizer
    artifact ``bpe_segment`` applies.

    Scale shape: the corpus is touched ONCE (``bpe_vocab``'s map-side
    combined groupBy); each round is one groupBy over the exploded
    adjacent pairs of the vocab table (key space bounded by the live
    symbol vocabulary, so the partial combine collapses it map-side), a
    TakeOrdered(1) to the driver (one bounded row per round, the k-means
    centroid precedent), and one narrow fold projection. No joins, no
    skew exposure. For production merge counts (10^4+), set
    ``checkpoint_every`` (~50): each round chains a fold onto the plan,
    and localCheckpoint truncates the lineage before plan-compile time
    grows quadratic."""
    spark = df.sparkSession
    vocab = bpe_vocab(df, text_col).select(
        "freq", F.split("word", "").alias("syms")).persist()
    merges = []
    prev = vocab
    for rank in range(1, n_merges + 1):
        pairs = prev.select(
            "freq",
            F.explode(F.zip_with(
                F.slice("syms", 1, F.size("syms") - 1),
                F.slice("syms", 2, F.size("syms") - 1),
                lambda a, b: F.struct(a.alias("l"), b.alias("r"))))
            .alias("pr"))
        top = (pairs.groupBy("pr.l", "pr.r")
               .agg(F.sum("freq").alias("n"))
               .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
               .limit(1).collect())
        if not top:  # vocabulary of single-symbol words: nothing to merge
            break
        left, right, n = top[0]["l"], top[0]["r"], top[0]["n"]
        merges.append((rank, left, right, left + right, int(n)))
        nxt = prev.select("freq",
                          _merge_pair(F.col("syms"), left, right)
                          .alias("syms"))
        if checkpoint_every and rank % checkpoint_every == 0:
            nxt = nxt.localCheckpoint()
        else:
            nxt = nxt.persist()
        prev.unpersist()
        prev = nxt
    prev.unpersist()
    return spark.createDataFrame(
        merges,
        "rank long, left string, right string, merged string, "
        "pair_count long")


def bpe_segment(df: DataFrame, merges: list, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Apply a trained merge list to a corpus: per document, tokenize,
    split each token to characters, replay the merges IN RANK ORDER
    (the standard greedy encoder), and return (id, n_tokens, n_subwords,
    subword-per-token ratio) — the fertility diagnostic used to size a
    tokenizer against a corpus. One narrow projection, zero shuffle;
    each merge is one fold layer in the same codegen expression."""
    toks = tokens_lower(F.col(text_col))
    subs = F.transform(toks, lambda t: F.split(t, ""))
    for _rank, left, right, _m, _n in sorted(merges):
        subs = F.transform(subs, lambda s: _merge_pair(s, left, right))
    n_sub = F.aggregate(subs, F.lit(0),
                        lambda acc, s: acc + F.size(s))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        n_sub.cast("long").alias("n_subwords"),
        F.when(F.size(toks) > 0,
               F.round(n_sub.cast("double") / F.size(toks), 6))
        .otherwise(F.lit(0.0)).alias("fertility"))


def lexical_diversity(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Frequency-weighted lexical-concentration census per document —
    the Gopher-family signals `repetition_scores` (distinct/total) can't
    see: a doc repeating ONE word 100× and a doc with 100 words twice
    each have the same n-gram-distinct profile but opposite
    concentration. Returns (doc_id, n_tokens, n_types, ttr,
    repeat_prob, top_frac):

    * ``ttr`` — type/token ratio;
    * ``repeat_prob`` — Simpson concentration: P(two tokens drawn
      without replacement are equal) = (Σc² − n) / (n(n−1));
    * ``top_frac`` — most-common-token mass (the Gopher rule's
      "fraction of the most common word").

    Exactness: token run-lengths come from the SORTED token array
    inside one narrow projection (run starts → bound diffs), so Σc²,
    max c and the type count are exact integers; each ratio is ONE
    correctly-rounded double division — bit-identical cross-engine
    (the DuckDB twin counts per-token groups instead; same integers,
    same single divisions). n ≤ 1 rows report 0.0 everywhere.

    Scale shape: ZERO shuffle — a narrow per-row projection (the
    higher-order array ops run interpreted, outside whole-stage
    codegen, which is inherent to HOF lambdas — plan-asserted); the
    per-row sort is O(L log L) in document length, never corpus size."""
    from .text import lazy_seq

    toks = tokens_lower(F.col(text_col))
    st = F.array_sort(toks)
    n = F.size(st)
    # sequence(1, 0) is DESCENDING [1, 0] — a zero-token doc must get
    # the empty index array, not an index-0 probe (lazy_seq's contract)
    idx = lazy_seq(n > 0, F.lit(1), n)
    # the i==1 arm does NOT short-circuit element_at(st, 0) (ANSI index
    # error), so the predecessor index is clamped to 1 — st[1] != st[1]
    # is false and the OR keeps position 1 a run start regardless
    starts = F.filter(
        idx, lambda i: (i == 1) | (F.element_at(st, i)
                                   != F.element_at(
                                       st, F.greatest(i - 1, F.lit(1)))))
    ends = F.concat(F.slice(starts, 2, F.greatest(
        F.size(starts) - 1, F.lit(0))), F.array(n + 1))
    counts = F.zip_with(starts, ends,
                        lambda s, e: (e - s).cast("long"))
    sum_sq = F.aggregate(counts, F.lit(0).cast("long"),
                         lambda acc, c: acc + c * c)
    max_c = F.coalesce(F.array_max(counts), F.lit(0).cast("long"))
    n_types = F.size(starts)
    nl = n.cast("long")
    zero = F.lit(0.0)
    return df.select(
        F.col(id_col).alias("doc_id"),
        nl.alias("n_tokens"),
        n_types.cast("long").alias("n_types"),
        F.when(n > 0, n_types.cast("double") / n.cast("double"))
        .otherwise(zero).alias("ttr"),
        F.when(n > 1, (sum_sq - nl).cast("double")
               / (nl * (nl - 1)).cast("double"))
        .otherwise(zero).alias("repeat_prob"),
        F.when(n > 0, max_c.cast("double") / n.cast("double"))
        .otherwise(zero).alias("top_frac"))
