"""Inverted index construction and TF-IDF term scoring.

The export side of a web corpus: once extraction/dedup settle, you build
(1) token -> posting-list tables for retrieval and corpus introspection,
and (2) per-document salient-term vectors for clustering / labeling /
mixture design. Both are pure relational shapes with exact DuckDB twins.

Cross-engine determinism notes (same contract as ``functions/lm.py``):

* tokenization shares ``lm.TOKEN_RE`` verbatim with the twin;
* posting lists are CAPPED per token with a (token-keyed) window rank
  BEFORE any list materializes — a stopword's posting head is 32 doc
  ids, never 10^11 — and serialized sorted, so the string is a pure
  function of the pair set;
* TF-IDF deliberately uses the RATIONAL idf ``N / df`` instead of
  ``ln(N/df)``: one correctly-rounded double division both engines agree
  on bit-for-bit, monotone in the same direction, no 1-ulp ``Math.log``
  flake in the hash gate (see lm.py's rationale). Swap ``ln`` back in
  driver-side if downstream wants the classic scale.

Scale shape at 10^12 docs:

* ``token_postings``: explode is narrow; distinct(token, doc) and the
  df-count + head aggregations all hash on the token key — AQE coalesces
  the reused exchange; output is the artifact (write bucketed by token).
  Stopword skew lands in AGGREGATIONS (map-side partial combine absorbs
  it), never in an unbounded collect.
* ``tfidf_top_terms``: tf agg shuffles on (doc, token); the df table
  aggregates FROM tf (token-keyed shuffle of the already-collapsed tf
  rows, not the raw stream); df joins back small (capped vocabulary ->
  broadcast); the final top-k is a WindowGroupLimit on the doc key —
  rank <= k prunes partitions before the full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .lm import tokens_lower
from .text import bind_array, lazy_seq
from .util import ensure_parallelism

#: posting-list head size (documented cap — the full df count is kept).
POSTINGS_CAP = 32


def query_tokens(query: str) -> list:
    """Normalize a user query string through the SAME tokenizer the
    document side uses (``lm.TOKEN_RE`` over lowercased text). A
    punctuated query term (``"don't"``, ``"e-mail"``) split on
    whitespace can never equal a ``TOKEN_RE`` document token — it
    silently matches nothing; this folds it to the tokens it would
    produce in a document (``don t`` / ``e mail``)."""
    import re

    from .lm import TOKEN_RE

    return re.findall(TOKEN_RE, query.lower())


def token_doc_pairs(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Distinct (token, doc) membership pairs — the index's edge list."""
    return (ensure_parallelism(df)
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(tokens_lower(F.col(text_col)))
                    .alias("token"))
            .distinct())


def token_postings(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   cap: int = POSTINGS_CAP) -> DataFrame:
    """(token, df_docs, postings): document frequency + the first ``cap``
    doc ids ascending, comma-joined.

    The head is ranked per token BEFORE collecting, so no task ever holds
    more than ``cap`` ids for one token; df_docs comes from the full pair
    set via a map-side-combined count. Both aggregations key on token —
    one logical shuffle, reused."""
    pairs = token_doc_pairs(df, id_col, text_col)
    counts = pairs.groupBy("token").agg(
        F.count(F.lit(1)).alias("df_docs"))
    w = Window.partitionBy("token").orderBy(F.col("doc_id").asc())
    heads = (pairs
             .withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") <= cap)
             .groupBy("token")
             .agg(F.array_join(
                 F.transform(F.sort_array(F.collect_list("doc_id")),
                             lambda x: x.cast("string")),
                 ",").alias("postings")))
    return counts.join(heads, "token")


def merge_token_postings(a: DataFrame, b: DataFrame,
                         cap: int = POSTINGS_CAP) -> DataFrame:
    """Merge two ``token_postings`` artifacts built over DISJOINT doc-id
    sets — the monthly-crawl index-maintenance op: the new snapshot's
    small index folds into the stored one WITHOUT re-touching either
    corpus.

    Exactness: ``df_docs`` adds exactly (disjoint doc sets), and the
    capped heads are EXACTLY mergeable — the ``cap`` smallest doc ids
    of the union are always a subset of the union of each half's
    ``cap``-smallest — so ``merge(postings(A), postings(B)) ==
    postings(A ∪ B)`` identically (the contract query pins this against
    the full-corpus oracle). Both halves must use the same ``cap``.

    Scale shape: ONE full-outer join keyed on token (two index tables,
    orders of magnitude smaller than the corpora); the head merge is a
    per-row codegen array op. Bucket both artifacts by token and the
    join is co-located."""
    def _side(df: DataFrame, sfx: str) -> DataFrame:
        return df.select("token", F.col("df_docs").alias("df" + sfx),
                         F.col("postings").alias("p" + sfx))

    def _arr(c: str):
        return F.when(
            F.col(c).isNull() | (F.col(c) == ""),
            F.array().cast("array<bigint>")
        ).otherwise(
            F.transform(F.split(F.col(c), ","),
                        lambda x: x.cast("long")))

    j = _side(a, "_a").join(_side(b, "_b"), "token", "full_outer")
    merged = F.slice(F.array_sort(F.concat(_arr("p_a"), _arr("p_b"))),
                     1, cap)
    zero = F.lit(0).cast("long")
    return j.select(
        "token",
        (F.coalesce(F.col("df_a"), zero)
         + F.coalesce(F.col("df_b"), zero)).alias("df_docs"),
        F.array_join(F.transform(merged, lambda x: x.cast("string")),
                     ",").alias("postings"))


def takedown_postings(index: DataFrame, corpus: DataFrame,
                      takedown: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      cap: int = POSTINGS_CAP) -> DataFrame:
    """Deletion propagation (right-to-be-forgotten / DMCA takedown)
    through a stored ``token_postings`` artifact: given the index built
    over ``corpus`` and a small ``takedown`` id set, produce EXACTLY
    ``token_postings(corpus minus takedown)`` without rebuilding the
    index — the maintenance op that makes honoring deletions affordable
    when the index is orders of magnitude cheaper to patch than to
    recompute (the reference's closest analogue is the first-wins
    idempotent re-run discipline around its JSON outputs,
    /root/reference/project/main.py:60-96; deletion is the inverse op
    its single-node world never needs).

    Exact algebra where the artifact allows it, targeted refill where
    it doesn't:

    * ``df_docs`` subtracts exactly — the removed per-token doc counts
      come from tokenizing ONLY the takedown docs (a semi-join the size
      of the takedown set). Tokens whose count reaches 0 drop.
    * a head repaired by ``array_except`` is PROVABLY complete iff
      ``size(filtered) == least(new_df, cap)``: an untruncated head
      lists every doc, and a truncated head that lost no member still
      holds the cap-smallest survivors (if it had lost rank there would
      have to be < cap survivors in it, contradiction).
    * every other token (truncated head that lost a member — in
      practice the stopword tier) is refilled by ONE pass over the
      surviving corpus filtered to that token set BEFORE the rank: the
      giant all-token shuffle and distinct never happen again.

    Scale shape: removed-token censuses are bounded by the takedown
    text volume (per-token removed-id lists are O(|takedown|), the
    id set and the refill vocabulary broadcast); the refill pass is a
    corpus scan whose explode is pre-filtered to the refill vocabulary,
    so the shuffle carries only refill tokens. Never all-pairs, never a
    full index rebuild."""
    ids = takedown.select(F.col(id_col).alias("_td_id")).distinct()
    gone = corpus.join(F.broadcast(ids),
                       F.col(id_col) == F.col("_td_id"), "left_semi")
    rm = (token_doc_pairs(gone, id_col, text_col)
          .groupBy("token")
          .agg(F.count(F.lit(1)).alias("_rm_cnt"),
               F.sort_array(F.collect_set("doc_id")).alias("_rm_ids")))

    def _arr(c: str):
        return F.when(
            F.col(c).isNull() | (F.col(c) == ""),
            F.array().cast("array<bigint>")
        ).otherwise(
            F.transform(F.split(F.col(c), ","),
                        lambda x: x.cast("long")))

    zero = F.lit(0).cast("long")
    upd = (index.join(F.broadcast(rm), "token", "left")
           .select(
               "token",
               (F.col("df_docs")
                - F.coalesce("_rm_cnt", zero)).alias("new_df"),
               F.array_except(
                   _arr("postings"),
                   F.coalesce(F.col("_rm_ids"),
                              F.array().cast("array<bigint>")))
               .alias("_filt"))
           .filter(F.col("new_df") > 0))
    exact = F.size("_filt") == F.least(F.col("new_df"), F.lit(cap))
    refill_tokens = upd.filter(~exact).select("token")

    survivors = corpus.join(F.broadcast(ids),
                            F.col(id_col) == F.col("_td_id"), "left_anti")
    pairs = (token_doc_pairs(survivors, id_col, text_col)
             .join(F.broadcast(refill_tokens), "token", "left_semi"))
    w = Window.partitionBy("token").orderBy(F.col("doc_id").asc())
    refill = (pairs
              .withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= cap)
              .groupBy("token")
              .agg(F.array_join(
                  F.transform(F.sort_array(F.collect_list("doc_id")),
                              lambda x: x.cast("string")),
                  ",").alias("_new_p")))
    return (upd.join(F.broadcast(refill), "token", "left")
            .select(
                "token", F.col("new_df").alias("df_docs"),
                F.coalesce(
                    "_new_p",
                    F.array_join(F.transform(
                        "_filt", lambda x: x.cast("string")), ","))
                .alias("postings")))


def tfidf_top_terms(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 5) -> DataFrame:
    """Top-``k`` salient terms per document by rational TF-IDF:
    (doc_id, token, tf, df_docs, score, rk) with
    ``score = (tf * N) / df_docs`` as one exact integer product and one
    correctly-rounded division.

    Ties break (score desc, token asc) — total order, token is unique
    within a doc."""
    toks = (ensure_parallelism(df)
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(tokens_lower(F.col(text_col)))
                    .alias("token")))
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    n_docs = df.select(F.count(F.lit(1)).alias("_n"))
    scored = (tf.join(F.broadcast(dfreq), "token")
              .crossJoin(F.broadcast(n_docs))
              .withColumn(
                  "score",
                  (F.col("tf") * F.col("_n")).cast("double")
                  / F.col("df_docs").cast("double")))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc())
    return (scored
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("doc_id", "token",
                    F.col("tf").cast("long").alias("tf"),
                    F.col("df_docs").cast("long").alias("df_docs"),
                    "score",
                    F.col("rk").cast("int").alias("rk")))


def collocations(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 min_count: int = 5) -> DataFrame:
    """Corpus collocations by rational PMI:
    (x, y, n_xy, score) with ``score = p_xy / (p_x * p_y)`` — the
    likelihood ratio whose log is classic PMI, kept ratio-form so every
    value is a product/quotient of correctly-rounded doubles both
    engines agree on bit-for-bit (the ``ln`` is a driver-side swap, as
    in lm.py / dsir.py).

    Scale shape: the bigram and unigram censuses are map-side-combined
    aggregations (stopword skew dies in the partial combine; outputs are
    vocabulary-sized, not corpus-sized); the two unigram attachments are
    BROADCAST joins against the collapsed bigram table; totals attach as
    broadcast 1-row aggregates. ``min_count`` prunes the long tail
    before the joins."""
    def _bigrams(tk):
        return F.transform(
            lazy_seq(F.size(tk) >= 2, F.lit(1), F.size(tk) - 1),
            lambda i: F.struct(
                F.element_at(tk, i.cast("int")).alias("x"),
                F.element_at(tk, (i + F.lit(1)).cast("int")).alias("y")))

    pairs = (ensure_parallelism(df)
             .select(F.explode(
                 bind_array(tokens_lower(F.col(text_col)), _bigrams))
                 .alias("bg"))
             .select("bg.x", "bg.y"))
    n_xy = (pairs.groupBy("x", "y").agg(F.count(F.lit(1)).alias("n_xy"))
            .filter(F.col("n_xy") >= min_count))
    uni = (ensure_parallelism(df)
           .select(F.explode(tokens_lower(F.col(text_col))).alias("t"))
           .groupBy("t").agg(F.count(F.lit(1)).alias("n")))
    t1 = uni.agg(F.sum("n").alias("_t1"))
    t2 = pairs.agg(F.count(F.lit(1)).alias("_t2"))
    joined = (n_xy
              .join(F.broadcast(uni.select(F.col("t").alias("x"),
                                           F.col("n").alias("n_x"))), "x")
              .join(F.broadcast(uni.select(F.col("t").alias("y"),
                                           F.col("n").alias("n_y"))), "y")
              .crossJoin(F.broadcast(t1)).crossJoin(F.broadcast(t2)))
    p_xy = F.col("n_xy").cast("double") / F.col("_t2").cast("double")
    p_x = F.col("n_x").cast("double") / F.col("_t1").cast("double")
    p_y = F.col("n_y").cast("double") / F.col("_t1").cast("double")
    return joined.select(
        "x", "y", F.col("n_xy").cast("long").alias("n_xy"),
        (p_xy / (p_x * p_y)).alias("score"))


def write_postings_index(df: DataFrame, path: str, id_col: str = "doc_id",
                         text_col: str = "text", cap: int = POSTINGS_CAP,
                         n_buckets: int = 64) -> None:
    """Materialize the inverted index as parquet bucketed by a stable
    md5-derived token bucket — the production form: the expensive
    tokenize -> distinct -> rank pass runs ONCE per corpus snapshot,
    then term lookups and index merges read only the matching bucket
    files (1/n_buckets of the bytes). Bucket = first 2 md5 hex chars of
    the token mod n_buckets, so the same token always lands in the same
    file set across snapshots — incremental merges co-locate without a
    shuffle."""
    (token_postings(df, id_col, text_col, cap)
     .withColumn("bucket",
                 F.pmod(F.conv(F.substring(F.md5("token"), 1, 2), 16, 10)
                        .cast("long"), F.lit(n_buckets)))
     .write.mode("overwrite").partitionBy("bucket").parquet(path))


def lookup_postings(spark, path: str, token: str,
                    n_buckets: int = 64) -> DataFrame:
    """Point lookup against a written postings index: computes the
    token's bucket driver-side and reads ONLY that partition directory
    (partition pruning on the bucket column, then a token filter pushed
    to the parquet scan)."""
    import hashlib

    b = int(hashlib.md5(token.encode()).hexdigest()[:2], 16) % n_buckets
    return (spark.read.parquet(path)
            .filter((F.col("bucket") == b) & (F.col("token") == token)))


def skipgram_pairs(df: DataFrame, text_col: str = "text",
                   window: int = 3, k: int = 100) -> DataFrame:
    """Window-k co-occurrence census — the (center, context) pair counts
    a word2vec/GloVe run trains on, generalizing ``collocations`` from
    adjacent bigrams to every unordered token pair within ``window``
    positions. Top-k by count (ties on the pair) keeps the contract
    surface bounded; the full census is the same plan minus the limit.

    Scale shape: the pair stream is narrow (one codegen projection,
    window*len pairs per doc); the census groupBy's key space is
    vocabulary^2 in principle but stopword-pair skew lands in the
    map-side partial combine (aggregation, never a join); the top-k is
    a TakeOrdered over the collapsed census."""
    from .lm import tokens_lower
    from .text import bind_array, lazy_seq

    def _pairs(tk):
        n = F.size(tk)
        return F.flatten(F.transform(
            lazy_seq(n >= 2, F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, F.least(i + F.lit(window), n)),
                lambda j: F.concat_ws(
                    " ",
                    F.least(F.element_at(tk, i.cast("int")),
                            F.element_at(tk, j.cast("int"))),
                    F.greatest(F.element_at(tk, i.cast("int")),
                               F.element_at(tk, j.cast("int")))))))

    pairs = df.select(F.explode(
        bind_array(tokens_lower(F.col(text_col)), _pairs)).alias("pair"))
    return (pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("pair")).limit(k))


def bm25_search(df: DataFrame, query_terms: list, id_col: str = "doc_id",
                text_col: str = "text", k: int = 10, k1: float = 1.2,
                b: float = 0.75, weights: dict | None = None) -> DataFrame:
    """Top-k documents for a fixed term set by RATIONAL BM25:

        score = sum_t idf_r(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
        idf_r(t) = (N - df + 0.5) / (df + 0.5)

    idf_r is the inside of the classic BM25 log — monotone in the same
    direction, kept rational so the cross-engine hash has no 1-ulp
    ``Math.log`` exposure (same policy as TF-IDF/LM scoring; apply
    ``ln`` driver-side for the classic scale). The per-doc sum folds in
    sorted term order (partitioning-independent doubles).

    Scale shape: the token stream is FILTERED to the query terms before
    any aggregation — tf is at most |terms| rows per doc; doc lengths
    are one map-side-combined groupBy; N/avgdl/df are broadcast 1-row /
    |terms|-row aggregates; final ranking is TakeOrdered(k).

    Query terms are normalized through ``query_tokens`` (the document
    tokenizer), so a punctuated term matches the tokens it would
    produce in a document instead of silently matching nothing.

    ``weights``: optional per-term boost factors (keyed by the
    NORMALIZED term; unlisted terms default to 1.0) — field/recency
    boosts, user term weighting. Each term's rational BM25 part is
    multiplied by its boost before the sorted-order per-doc fold, so
    the weighted score stays bit-reproducible."""
    from .lm import tokens_lower

    terms = sorted({t for qt in query_terms for t in query_tokens(qt)})
    if not terms:
        raise ValueError("bm25_search needs at least one tokenizable term")
    wmap = {t: float((weights or {}).get(t, 1.0)) for t in terms}
    toks = (ensure_parallelism(df)
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(tokens_lower(F.col(text_col)))
                    .alias("token")))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    qtf = (toks.filter(F.col("token").isin(terms))
           .groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf")))
    qdf = qtf.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    return _bm25_rank(qtf, qdf, dl, terms, wmap, k, k1, b)


def _bm25_rank(qtf: DataFrame, qdf: DataFrame, dl: DataFrame,
               terms: list, wmap: dict, k: int, k1: float,
               b: float) -> DataFrame:
    """Shared BM25 ranking tail: the SAME expression tree whether the
    (tf, df, dl) inputs come from a corpus scan (``bm25_search``) or
    from stored index artifacts (``bm25_from_index``) — structural
    guarantee that the two paths agree bit-for-bit."""
    stats = dl.agg(F.count(F.lit(1)).alias("_n"),
                   F.sum("dl").alias("_tot"))
    avgdl = (F.col("_tot").cast("double") / F.col("_n").cast("double"))
    boost = F.element_at(
        F.create_map(*[F.lit(v) for t in terms
                       for v in (t, wmap[t])]), F.col("token"))
    part = (
        qtf.join(F.broadcast(qdf), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "part",
            ((F.col("_n") - F.col("df_docs")).cast("double") + F.lit(0.5))
            / (F.col("df_docs").cast("double") + F.lit(0.5))
            * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
            / (F.col("tf").cast("double")
               + F.lit(k1) * (F.lit(1.0 - b)
                              + F.lit(b) * F.col("dl").cast("double")
                              / avgdl))
            * boost))
    scored = (part.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("token", "part"))),
            F.lit(0.0),
            lambda acc, x: acc + x["part"]).alias("score"),
        F.count(F.lit(1)).alias("n_terms_hit")))
    return (scored
            .select("doc_id", F.round("score", 6).alias("score"),
                    F.col("n_terms_hit").cast("long").alias("n_terms_hit"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def anchor_bm25_search(edges: DataFrame, query_terms: list, k: int = 10,
                       k1: float = 1.2, b: float = 0.75,
                       weights: dict | None = None,
                       dst_col: str = "dst_url",
                       anchor_col: str = "anchor_text") -> DataFrame:
    """BM25 over each url's INCOMING anchor-text field — the classic
    web-IR ranking signal (anchor text describes the TARGET better
    than the target describes itself; it's how navigational queries
    resolve). The "document" is the destination url, its "text" is the
    multiset of anchor tokens pointing at it; scoring reuses the exact
    rational-BM25 tail (`_bm25_rank`), so anchor-field ranking is
    bit-reproducible like the body-field ranking and a BM25F-style
    fusion is a weighted driver-side sum of the two scores.

    Scale shape: tf/dl/df all derive from ONE exploded anchor-token
    stream FILTERED to the query terms before any wide aggregation
    (dl needs the unfiltered stream, but that census is map-side
    combinable on the dst key); no anchor concatenation is ever
    materialized."""
    from .lm import tokens_lower

    terms = sorted({t for qt in query_terms for t in query_tokens(qt)})
    if not terms:
        raise ValueError("anchor_bm25_search needs at least one "
                         "tokenizable term")
    wmap = {t: float((weights or {}).get(t, 1.0)) for t in terms}
    toks = (edges.select(
        F.col(dst_col).alias("doc_id"),
        F.explode(tokens_lower(F.coalesce(F.col(anchor_col), F.lit(""))))
        .alias("token")))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    qtf = (toks.filter(F.col("token").isin(terms))
           .groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf")))
    qdf = qtf.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    return _bm25_rank(qtf, qdf, dl, terms, wmap, k, k1, b)


def write_doclen_table(df: DataFrame, path: str, id_col: str = "doc_id",
                       text_col: str = "text") -> None:
    """Doc-length artifact (doc_id, dl) — the BM25 normalizer table a
    production index build writes next to the positional index, so
    query-time never re-tokenizes the corpus. Thin (2 columns), one
    map-side-combined groupBy."""
    from .lm import tokens_lower

    (ensure_parallelism(df)
     .select(F.col(id_col).alias("doc_id"),
             F.explode(tokens_lower(F.col(text_col))).alias("token"))
     .groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
     .write.mode("overwrite").parquet(path))


def bm25_from_index(spark, index_path: str, dl_path: str,
                    query_terms: list, k: int = 10, k1: float = 1.2,
                    b: float = 0.75, weights: dict | None = None,
                    n_buckets: int = 64) -> DataFrame:
    """BM25 against STORED artifacts: tf comes from the positional
    index (``size(positions)``, reading ONLY the query terms' buckets —
    partition pruning + token pushdown), dl/N/avgdl from the doc-length
    table. Identical ranking contract to the scan-based ``bm25_search``
    (shared ``_bm25_rank`` tail, parity pinned by test) — at corpus
    scale this turns the full tokenize pass into a few bucket reads
    plus one uniform doc_id join against the thin dl table."""
    import hashlib

    terms = sorted({t for qt in query_terms for t in query_tokens(qt)})
    if not terms:
        raise ValueError("bm25_from_index needs at least one "
                         "tokenizable term")
    wmap = {t: float((weights or {}).get(t, 1.0)) for t in terms}
    buckets = sorted({int(hashlib.md5(t.encode()).hexdigest()[:2], 16)
                      % n_buckets for t in terms})
    idx = (spark.read.parquet(index_path)
           .filter(F.col("bucket").isin(buckets)
                   & F.col("token").isin(terms)))
    qtf = idx.select("doc_id", "token",
                     F.size("positions").cast("long").alias("tf"))
    qdf = qtf.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    dl = spark.read.parquet(dl_path).select("doc_id", "dl")
    return _bm25_rank(qtf, qdf, dl, terms, wmap, k, k1, b)


def kwic_snippets(df: DataFrame, term: str, width: int = 40,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Keyword-in-context: the first occurrence of ``term``
    (case-insensitive substring) per matching document, with ``width``
    characters of context each side — the display surface a retrieval
    stack pairs with ``bm25_search``. Pure narrow projection + filter
    (position arithmetic identical across engines), zero shuffle."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    pos = F.instr(F.lower(txt), term.lower())
    start = F.greatest(pos - width, F.lit(1))
    return (df.select(F.col(id_col).alias("doc_id"),
                      pos.cast("long").alias("pos"),
                      txt.substr(start.cast("int"),
                                 F.lit(2 * width + len(term)))
                      .alias("snippet"))
            .filter(F.col("pos") > 0))


def phrase_kwic(df: DataFrame, phrase: str, width: int = 40,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Snippet highlighting for quoted-phrase search: the FIRST token-
    adjacent occurrence of ``phrase`` per document with up to ``width``
    chars of same-line context each side — the display surface for
    ``phrase_hits`` (whose match set this reproduces exactly: the
    regex encodes the same token-adjacency, boundary-guarded).

    One RE2-safe regex shared verbatim with the DuckDB twin: tokens
    are ``[a-z0-9]+`` (no escaping needed), separators are
    ``[^a-z0-9]+``, and ``.`` keeps snippets on one line in both
    engines. Narrow zero-shuffle projection + filter."""
    words = query_tokens(phrase)
    if not words:
        raise ValueError("phrase_kwic needs a non-empty phrase")
    pat = phrase_kwic_pattern(words, width)
    snip = F.regexp_extract(F.lower(F.coalesce(F.col(text_col),
                                               F.lit(""))), pat, 1)
    return (df.select(F.col(id_col).alias("doc_id"),
                      snip.alias("snippet"))
            .filter(F.length("snippet") > 0))


def phrase_kwic_pattern(words: list, width: int) -> str:
    """The shared Spark/DuckDB context-window regex for a normalized
    token list: bounded greedy context, boundary-guarded core."""
    core = "[^a-z0-9]+".join(words)
    return (f"(.{{0,{width}}}(?:^|[^a-z0-9]){core}"
            f"(?:[^a-z0-9]|$).{{0,{width}}})")


def phrase_hits(df: DataFrame, phrase: str, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact-phrase match positions per document (token-adjacency, the
    quoted-query primitive): returns (doc_id, n_hits, first_pos) for
    matching docs. Phrase matching against a document is ROW-LOCAL, so
    this is a narrow zero-shuffle projection — the positional-index
    join shape only pays off once the index is precomputed; against raw
    text this plan strictly dominates."""
    from .lm import tokens_lower
    from .text import bind_array, lazy_seq

    words = query_tokens(phrase)
    n = len(words)
    if n == 0:
        raise ValueError("phrase_hits needs a non-empty phrase")

    def _hits(tk):
        span = F.size(tk) - (n - 1)
        cond = lambda i: reduce_and(tk, i, words)
        return F.filter(lazy_seq(span > 0, F.lit(1), span), cond)

    def reduce_and(tk, i, ws):
        c = F.element_at(tk, i.cast("int")) == ws[0]
        for d, w in enumerate(ws[1:], start=1):
            c = c & (F.element_at(tk, (i + d).cast("int")) == w)
        return c

    hits = bind_array(tokens_lower(F.col(text_col)), _hits)
    return (df.select(F.col(id_col).alias("doc_id"), hits.alias("_h"))
            .filter(F.size("_h") > 0)
            .select("doc_id",
                    F.size("_h").cast("long").alias("n_hits"),
                    F.element_at("_h", 1).cast("long").alias("first_pos")))


def write_positional_index(df: DataFrame, path: str,
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           n_buckets: int = 64) -> None:
    """Positional inverted index artifact: (token, doc_id, positions)
    parquet partitioned by the same stable md5 token bucket as
    ``write_postings_index`` — phrase/proximity queries then read ONLY
    the buckets of their query terms. Positions are 1-based token
    offsets, sorted; the expensive tokenize pass runs once per corpus
    snapshot."""
    toks = (ensure_parallelism(df)
            .select(F.col(id_col).alias("doc_id"),
                    F.posexplode(tokens_lower(F.col(text_col)))
                    .alias("pos0", "token")))
    positional = (toks
                  .groupBy("token", "doc_id")
                  .agg(F.sort_array(F.collect_list(F.col("pos0") + 1))
                       .alias("positions")))
    (positional
     .withColumn("bucket",
                 F.pmod(F.conv(F.substring(F.md5("token"), 1, 2), 16, 10)
                        .cast("long"), F.lit(n_buckets)))
     .write.mode("overwrite").partitionBy("bucket").parquet(path))


def phrase_hits_from_index(spark, path: str, phrase: str,
                           n_buckets: int = 64) -> DataFrame:
    """Quoted-phrase search against the STORED positional index: reads
    only the query terms' buckets (partition pruning + token pushdown),
    then adjacency-joins consecutive terms' position lists doc-by-doc.
    Identical output contract to the raw-text ``phrase_hits``
    (doc_id, n_hits, first_pos) — parity pinned by test."""
    import hashlib
    from functools import reduce

    words = query_tokens(phrase)
    if not words:
        raise ValueError("phrase_hits_from_index needs a non-empty phrase")
    idx = spark.read.parquet(path)

    def term_df(w: str, d: int) -> DataFrame:
        b = int(hashlib.md5(w.encode()).hexdigest()[:2], 16) % n_buckets
        return (idx.filter((F.col("bucket") == b) & (F.col("token") == w))
                .select("doc_id",
                        F.col("positions").alias(f"p{d}")))

    cur = term_df(words[0], 0)
    for d, w in enumerate(words[1:], start=1):
        cur = cur.join(term_df(w, d), "doc_id")
    # adjacency: position i starts a hit iff every term d has i+d
    hit_positions = F.filter(
        F.col("p0"),
        lambda i: reduce(lambda acc, d: acc & F.array_contains(
            F.col(f"p{d}"), i + d), range(1, len(words)), F.lit(True)))
    return (cur.select("doc_id", hit_positions.alias("_h"))
            .filter(F.size("_h") > 0)
            .select("doc_id",
                    F.size("_h").cast("long").alias("n_hits"),
                    F.element_at("_h", 1).cast("long").alias("first_pos")))


def proximity_hits(df: DataFrame, term_a: str, term_b: str,
                   max_dist: int = 5, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """NEAR/k search: documents where ``term_a`` and ``term_b`` occur
    within ``max_dist`` token positions (either order). Row-local like
    ``phrase_hits`` — per doc, the two (bounded) position lists cross
    inside one codegen expression; zero shuffle. Returns
    (doc_id, n_hits, min_dist).

    Terms are normalized through ``query_tokens`` (each must fold to
    exactly one document token). With ``term_a == term_b`` a position
    pairs with itself at distance 0 — a spurious hit for every doc
    containing the term once — so the equal-term case counts each
    unordered position pair exactly once (``j > i``)."""
    from .lm import tokens_lower
    from .text import bind_array, lazy_seq

    ta, tb = query_tokens(term_a), query_tokens(term_b)
    if len(ta) != 1 or len(tb) != 1:
        raise ValueError("proximity_hits terms must each normalize to "
                         f"one token, got {ta!r} and {tb!r}")
    a, b = ta[0], tb[0]

    def _pairs(tk):
        def positions(w):
            return F.filter(
                lazy_seq(F.size(tk) > 0, F.lit(1), F.size(tk)),
                lambda i: F.element_at(tk, i.cast("int")) == w)

        pa, pb = positions(a), positions(b)
        if a == b:
            dists = F.flatten(F.transform(
                pa, lambda i: F.transform(
                    F.filter(pb, lambda j: j > i), lambda j: j - i)))
        else:
            dists = F.flatten(F.transform(
                pa, lambda i: F.transform(pb, lambda j: F.abs(i - j))))
        return F.filter(dists, lambda d: d <= max_dist)

    hits = bind_array(tokens_lower(F.col(text_col)), _pairs)
    return (df.select(F.col(id_col).alias("doc_id"), hits.alias("_d"))
            .filter(F.size("_d") > 0)
            .select("doc_id",
                    F.size("_d").cast("long").alias("n_hits"),
                    F.array_min("_d").cast("long").alias("min_dist")))


def proximity_hits_from_index(spark, path: str, term_a: str, term_b: str,
                              max_dist: int = 5,
                              n_buckets: int = 64) -> DataFrame:
    """NEAR/k search against the STORED positional index written by
    ``write_positional_index``: reads ONLY the two query terms' buckets
    (partition pruning + token pushdown — the same pruned-read shape as
    ``phrase_hits_from_index``), then crosses the two (bounded) position
    lists per doc inside one codegen expression. Identical output
    contract to the raw-text ``proximity_hits`` (doc_id, n_hits,
    min_dist) — parity pinned by test. At corpus scale this turns a
    full-text scan into two bucket reads plus one uniform doc_id join."""
    import hashlib

    ta, tb = query_tokens(term_a), query_tokens(term_b)
    if len(ta) != 1 or len(tb) != 1:
        raise ValueError("proximity_hits_from_index terms must each "
                         f"normalize to one token, got {ta!r} and {tb!r}")
    a, b = ta[0], tb[0]
    idx = spark.read.parquet(path)

    def term_df(w: str, col: str) -> DataFrame:
        bk = int(hashlib.md5(w.encode()).hexdigest()[:2], 16) % n_buckets
        return (idx.filter((F.col("bucket") == bk) & (F.col("token") == w))
                .select("doc_id", F.col("positions").alias(col)))

    if a == b:
        # one bucket read; unordered pairs within one list, each once
        cur = term_df(a, "pa")
        dists = F.flatten(F.transform(
            F.col("pa"), lambda i: F.transform(
                F.filter(F.col("pa"), lambda j: j > i), lambda j: j - i)))
    else:
        cur = term_df(a, "pa").join(term_df(b, "pb"), "doc_id")
        dists = F.flatten(F.transform(
            F.col("pa"),
            lambda i: F.transform(F.col("pb"), lambda j: F.abs(i - j))))
    hits = F.filter(dists, lambda d: d <= max_dist)
    return (cur.select("doc_id", hits.alias("_d"))
            .filter(F.size("_d") > 0)
            .select("doc_id",
                    F.size("_d").cast("long").alias("n_hits"),
                    F.array_min("_d").cast("long").alias("min_dist")))


def boolean_search(df: DataFrame, must: list, must_not: list = (),
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Boolean retrieval: documents containing ALL ``must`` terms and
    NONE of the ``must_not`` terms — (doc_id, n_must_occurrences) with
    the occurrence total of the must terms as a cheap rank proxy. The
    classic AND/NOT filter every corpus-slicing workflow needs before
    a scoring pass (bm25_search is the scored sibling).

    Terms normalize through ``query_tokens`` (each must fold to exactly
    one document token). Entirely row-local: per doc, the token array
    answers every membership test inside one codegen projection — zero
    shuffle, zero Python, and the scan prunes to (id, text)."""
    from .lm import tokens_lower
    from .text import bind_array

    def one(term: str, side: str) -> str:
        ts = query_tokens(term)
        if len(ts) != 1:
            raise ValueError(f"boolean_search {side} terms must each "
                             f"normalize to one token, got {ts!r}")
        return ts[0]

    m = [one(t, "must") for t in must]
    n = [one(t, "must_not") for t in must_not]
    if not m:
        raise ValueError("boolean_search needs >= 1 must term")

    def _row(tk):
        ok = F.lit(True)
        for w in m:
            ok = ok & F.array_contains(tk, w)
        for w in n:
            ok = ok & ~F.array_contains(tk, w)
        occ = F.size(F.filter(tk, lambda t: t.isin(m)))
        return F.struct(ok.alias("ok"), occ.alias("occ"))

    r = bind_array(tokens_lower(F.col(text_col)), _row)
    return (df.select(F.col(id_col).alias("doc_id"), r.alias("_r"))
            .filter(F.col("_r.ok"))
            .select("doc_id",
                    F.col("_r.occ").cast("long")
                    .alias("n_must_occurrences")))


def boolean_from_index(spark, path: str, must: list, must_not: list = (),
                       n_buckets: int = 64) -> DataFrame:
    """Boolean retrieval against the STORED positional index (which
    keeps FULL membership — unlike the capped postings heads): must
    terms intersect by doc_id equi-joins, must_not terms drop via ONE
    broadcastable anti-join over their unioned doc lists; occurrence
    totals come from the stored position-list sizes. Identical output
    contract to the raw-text ``boolean_search`` — parity pinned by
    test. Reads ONLY the query terms' buckets (partition pruning +
    token pushdown)."""
    import hashlib
    from functools import reduce

    def one(term: str, side: str) -> str:
        ts = query_tokens(term)
        if len(ts) != 1:
            raise ValueError(f"boolean_from_index {side} terms must "
                             f"each normalize to one token, got {ts!r}")
        return ts[0]

    m = [one(t, "must") for t in must]
    n = [one(t, "must_not") for t in must_not]
    if not m:
        raise ValueError("boolean_from_index needs >= 1 must term")
    idx = spark.read.parquet(path)

    def term_df(w: str, col: str) -> DataFrame:
        bk = int(hashlib.md5(w.encode()).hexdigest()[:2], 16) % n_buckets
        return (idx.filter((F.col("bucket") == bk) & (F.col("token") == w))
                .select("doc_id", F.size("positions").alias(col)))

    cur = term_df(m[0], "c0")
    for d, w in enumerate(m[1:], start=1):
        cur = cur.join(term_df(w, f"c{d}"), "doc_id")
    if n:
        ban = reduce(lambda a, b: a.unionByName(b),
                     [term_df(w, "cx").select("doc_id") for w in n])
        cur = cur.join(ban, "doc_id", "left_anti")
    occ = reduce(lambda a, d: a + F.col(f"c{d}"),
                 range(1, len(m)), F.col("c0"))
    return cur.select("doc_id",
                      occ.cast("long").alias("n_must_occurrences"))
