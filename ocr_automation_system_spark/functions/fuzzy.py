"""Approximate string join (record linkage): all (left, right) pairs
within Levenshtein distance ``max_dist`` — the "match OCR'd entity
names against a registry" operator — WITHOUT the all-pairs cross join.

Blocking is classic q-gram prefix filtering (Gravano et al., VLDB 2001;
ED-Join, Xiao et al., VLDB 2008), recall-lossless:

* Strings are padded with ``q-1`` sentinel chars on each side and cut
  into DISTINCT padded q-grams. One edit touches at most ``q`` padded
  gram positions, so a pair within distance ``d`` shares at least
  ``max(|A|,|B|) - d*q`` gram types (A = a string's distinct-gram set).
* **Prefix filter**: order all grams by global rarity (a census over
  both sides — the gram key space is bounded by charset^q, so the
  census is a tiny map-side-combined aggregate). Keep only each
  string's ``d*q + 1`` rarest grams. By the prefix-filter lemma, any
  pair satisfying the count bound above shares a gram within both
  prefixes — so the equi-join on prefix grams finds every true pair
  whose count bound is non-vacuous. Rarity ordering also means hot
  grams ("th", "er") only survive into prefixes of strings that have
  nothing rarer — the hot-bucket problem mostly prunes itself.
* **Short leg**: pairs where BOTH gram sets have <= ``d*q`` grams can
  evade the count bound entirely ("a" vs "bc" at d=2 share nothing).
  Such strings are very short, so their DISTINCT values are few: the
  short leg cross-joins the two distinct-value sets (bounded x bounded)
  and maps survivors back to ids. Long×short pairs stay in the main
  leg (the long side's bound is >= 1, and the short side's whole gram
  set fits inside its prefix budget).
* Candidates — and only candidates — are verified with the exact
  banded Levenshtein (``F.levenshtein(l, r, threshold)``: early-exits
  at the band, returns -1 beyond it).

Scale shape: one bounded census + broadcast rarity join; prefix
selection is a rank-limit window (WindowGroupLimit: partial top-K
map-side before the id shuffle); the candidate join shuffles on the
8-to-48-bit gram key, never on pairs that share nothing; verify is a
narrow projection on candidates only. No driver loops; the only
collect-free bounded structure is the census, which stays distributed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Sentinel used to pad string ends before gram extraction (Gravano's
#: '#'/'$' trick): end-grams become position-anchored, which both
#: tightens the count bound and lets 1-char strings share grams.
PAD_CHAR = "\x01"


def padded_grams(text: Column, q: int = 2) -> Column:
    """DISTINCT q-grams of ``text`` padded with q-1 sentinels each side.
    Row-local, codegen-friendly (one bound array, no per-element
    re-evaluation of the padded string)."""
    from .text import bind_array, lazy_seq

    padded = F.concat(F.lit(PAD_CHAR * (q - 1)), text,
                      F.lit(PAD_CHAR * (q - 1)))

    def _grams(p: Column) -> Column:
        n = F.length(p) - (q - 1)
        return F.array_distinct(
            F.transform(lazy_seq(n > 0, F.lit(1), n),
                        lambda i: F.substring(p, i, q)))

    # bind_array binds the padded string once per row — the gram lambda
    # must not re-evaluate the concat per position
    return bind_array(padded, _grams)


def _gram_stream(df: DataFrame, id_col: str, text_col: str,
                 q: int) -> DataFrame:
    """(id, text, gram, n_grams) — one row per distinct padded gram."""
    g = df.select(
        F.col(id_col), F.col(text_col),
        padded_grams(F.col(text_col), q).alias("_grams"))
    return (g.withColumn("_n_grams", F.size("_grams"))
            .select(id_col, text_col, "_n_grams",
                    F.explode("_grams").alias("_gram")))


def fuzzy_join(left: DataFrame, right: DataFrame,
               l_id: str, l_text: str, r_id: str, r_text: str,
               max_dist: int = 2, q: int = 2) -> DataFrame:
    """All (left, right) pairs with ``levenshtein(l_text, r_text) <=
    max_dist``, as (l_id, l_text, r_id, r_text, dist) — exactly the
    rows the quadratic cross join + filter would produce (the DuckDB
    oracle twin runs that quadratic form; recall-losslessness of the
    blocking is what makes the hash comparison meaningful).

    Column names must be disjoint between the two sides. NULL texts
    never match (as in SQL)."""
    k_prefix = max_dist * q + 1
    lg = _gram_stream(left.filter(F.col(l_text).isNotNull()),
                      l_id, l_text, q)
    rg = _gram_stream(right.filter(F.col(r_text).isNotNull()),
                      r_id, r_text, q)

    # global gram rarity census over BOTH sides: bounded key space
    # (<= charset^q + short-string grams), map-side combined
    census = (lg.select(F.col("_gram"))
              .unionByName(rg.select(F.col("_gram")))
              .groupBy("_gram").agg(F.count(F.lit(1)).alias("_freq")))

    def prefix(g: DataFrame, id_col: str, text_col: str) -> DataFrame:
        ranked = g.join(F.broadcast(census), "_gram")
        w = (Window.partitionBy(id_col)
             .orderBy(F.col("_freq").asc(), F.col("_gram").asc()))
        return (ranked.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= k_prefix)
                .select(id_col, text_col, "_gram"))

    # main leg: prefix-gram equi-join; short×short pairs (both gram
    # sets <= d*q) are the only ones the count bound cannot protect
    lp = prefix(lg.filter(F.col("_n_grams") > max_dist * q), l_id, l_text)
    rp = prefix(rg.filter(F.col("_n_grams") > max_dist * q), r_id, r_text)
    # a short string still joins LONG partners through the long side's
    # prefix, so short rows keep their full (<= d*q-gram) stream here
    lp_short = (lg.filter(F.col("_n_grams") <= max_dist * q)
                .select(l_id, l_text, "_gram"))
    rp_short = (rg.filter(F.col("_n_grams") <= max_dist * q)
                .select(r_id, r_text, "_gram"))
    cand = (lp.unionByName(lp_short)
            .join(rp.unionByName(rp_short), "_gram")
            .select(l_id, l_text, r_id, r_text)
            .distinct())

    # short×short leg: distinct VALUES cross join (bounded x bounded),
    # then map back to ids — never a row-level cross join
    l_short_vals = (lg.filter(F.col("_n_grams") <= max_dist * q)
                    .select(l_text).distinct())
    r_short_vals = (rg.filter(F.col("_n_grams") <= max_dist * q)
                    .select(r_text).distinct())
    short_pairs = l_short_vals.crossJoin(F.broadcast(r_short_vals))
    short_cand = (
        short_pairs
        .join(left.select(l_id, l_text), l_text)
        .join(right.select(r_id, r_text), r_text)
        .select(l_id, l_text, r_id, r_text)
    )

    dist = F.levenshtein(F.col(l_text), F.col(r_text), max_dist)
    return (
        cand.unionByName(short_cand).distinct()
        # banded verify on candidates only: -1 means "beyond the band"
        .withColumn("dist", dist)
        .filter(F.col("dist") >= 0)
    )
