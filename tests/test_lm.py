"""Corpus-trained unigram LM quality scoring (functions/lm.py).

Covers: hand-computed census counts/probabilities, scoring against a
model trained on a DIFFERENT corpus (out-of-vocabulary tokens score
p=0 and count as rare), null/empty documents, bit-exact partitioning
invariance of the double statistics, broadcast vs shuffle join parity,
and the broadcast plan shape of the scoring join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from ocr_automation_system_spark.functions import lm

SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("text", StringType(), True),
])


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog ate the cat food"),
        (2, None),
        (3, ""),
        (4, "Zyzzyva! THE the"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_token_census_counts_and_probabilities(spark, docs):
    got = {r["token"]: r for r in lm.token_census(docs).collect()}
    # tokens: the x6 (2+2+2), cat x2, sat, on, mat, dog, ate, food,
    # zyzzyva -> total 15
    assert got["the"]["n"] == 6
    assert got["cat"]["n"] == 2
    assert got["zyzzyva"]["n"] == 1
    total = sum(r["n"] for r in got.values())
    assert total == 15
    assert got["the"]["p"] == 6 / 15
    assert abs(sum(r["p"] for r in got.values()) - 1.0) < 1e-12


def test_lm_score_against_foreign_model(spark, docs):
    """Model trained on a disjoint corpus: every token is OOV -> p=0,
    mean 0.0, rare_frac 1.0; empty/null docs keep zero defaults."""
    other = spark.createDataFrame([(100, "completely different words")],
                                  SCHEMA)
    model = lm.token_census(other)
    got = {r["doc_id"]: r for r in lm.lm_score(docs, model).collect()}
    assert len(got) == 5
    assert got[0]["n_tokens"] == 6
    assert got[0]["mean_token_p"] == 0.0
    assert got[0]["rare_token_frac"] == 1.0
    for empty_id in (2, 3):
        r = got[empty_id]
        assert (r["n_tokens"], r["mean_token_p"],
                r["rare_token_frac"]) == (0, 0.0, 0.0)


def test_lm_score_self_trained_hand_computed(spark, docs):
    model = lm.token_census(docs)
    got = {r["doc_id"]: r for r in lm.lm_score(docs, model).collect()}
    # doc 0: the(6/15) x2, cat(2/15), sat/on/mat(1/15 each)
    want_mean0 = (2 * (6 / 15) + 2 / 15 + 3 * (1 / 15)) / 6
    assert got[0]["n_tokens"] == 6
    assert abs(got[0]["mean_token_p"] - want_mean0) < 1e-15
    # vocabulary is tiny, every p >= 1/15 > 1e-4 -> nothing is rare
    assert all(r["rare_token_frac"] == 0.0 for r in got.values()
               if r["n_tokens"] > 0)


def test_lm_score_bit_exact_under_partitioning(spark, docs):
    model = lm.token_census(docs)
    base = sorted(tuple(r) for r in lm.lm_score(docs, model).collect())
    for n_parts in (1, 3, 7):
        d2 = docs.repartition(n_parts)
        got = sorted(tuple(r)
                     for r in lm.lm_score(d2, lm.token_census(d2))
                     .collect())
        assert got == base, n_parts  # exact double equality


def test_lm_score_shuffle_join_parity(spark, docs):
    model = lm.token_census(docs)
    a = sorted(tuple(r) for r in
               lm.lm_score(docs, model, broadcast_model=True).collect())
    b = sorted(tuple(r) for r in
               lm.lm_score(docs, model, broadcast_model=False).collect())
    assert a == b


def test_lm_score_broadcasts_model(spark, docs):
    plan = (lm.lm_score(docs, lm.token_census(docs))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# BPE trainer (lm.bpe_train / lm.bpe_segment)
# ---------------------------------------------------------------------------

def _py_bpe(texts, k):
    """Reference trainer: Sennrich et al. 2016 greedy loop, leftmost
    non-overlapping merge application, (count DESC, pair ASC) tie-break."""
    import collections
    import re

    vocab = collections.Counter()
    for t in texts:
        for w in re.findall(lm.TOKEN_RE, (t or "").lower()):
            vocab[w] += 1
    words = {w: list(w) for w in vocab}
    merges = []
    for rank in range(1, k + 1):
        pc = collections.Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += vocab[w]
        if not pc:
            break
        (left, right), n = sorted(pc.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, left, right, left + right, n))
        for w, syms in words.items():
            out = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            words[w] = out
    return merges, words


def test_bpe_train_matches_reference_trainer(spark):
    texts = ["the cat sat on the mat", "the thin cat, that fat cat!",
             "banana bandana banner", "aaaa aa aaa a", "singleton", None]
    want, _ = _py_bpe(texts, 8)
    df = spark.createDataFrame(list(enumerate(texts)), SCHEMA)
    got = [tuple(r) for r in lm.bpe_train(df, 8).collect()]
    assert got == want


def test_bpe_merge_leftmost_nonoverlapping(spark):
    """'aaaa' under merge (a,a) must become (aa)(aa), never (a)(aa)(a)
    or a re-merged (aaaa); 'aaa' -> (aa)(a)."""
    df = spark.createDataFrame([(0, "aaaa aaa")], SCHEMA)
    merged = df.select(
        lm._merge_pair(F.split(F.lit("aaaa"), ""), "a", "a").alias("m1"),
        lm._merge_pair(F.split(F.lit("aaa"), ""), "a", "a").alias("m2"),
    ).first()
    assert merged["m1"] == ["aa", "aa"] and merged["m2"] == ["aa", "a"]


def test_bpe_train_checkpoint_parity(spark):
    texts = ["ababab abab", "banana bandana", "cabbage baggage"]
    df = spark.createDataFrame(list(enumerate(texts)), SCHEMA)
    base = [tuple(r) for r in lm.bpe_train(df, 6).collect()]
    ckpt = [tuple(r) for r in
            lm.bpe_train(df, 6, checkpoint_every=2).collect()]
    assert base == ckpt and len(base) == 6


def test_bpe_train_single_symbol_vocab_stops(spark):
    df = spark.createDataFrame([(0, "a b c d"), (1, "e f")], SCHEMA)
    assert lm.bpe_train(df, 4).collect() == []


def test_bpe_segment_fertility(spark):
    texts = ["the cat sat on the mat", "the thin cat, that fat cat!",
             "banana bandana banner", "aaaa aa aaa a"]
    merges, words = _py_bpe(texts, 8)
    df = spark.createDataFrame(
        list(enumerate(texts)) + [(9, None), (10, "")], SCHEMA)
    got = {r["doc_id"]: (r["n_tokens"], r["n_subwords"], r["fertility"])
           for r in lm.bpe_segment(df, merges).collect()}
    import re
    for i, t in enumerate(texts):
        toks = re.findall(lm.TOKEN_RE, t.lower())
        n_sub = sum(len(words[w]) for w in toks)
        assert got[i] == (len(toks), n_sub,
                          round(n_sub / len(toks), 6)), i
    assert got[9] == (0, 0, 0.0) and got[10] == (0, 0, 0.0)


def test_stupid_backoff_by_hand(spark):
    """Reference 'a b a c': unigrams a:2 b:1 c:1 (total 4), bigrams
    (a,b):1 (b,a):1 (a,c):1. Scoring:
      'a b x' -> (a,b) seen: 1/2; (b,x) unseen, x OOV: 0.4*0 = 0
                 mean 0.25, backoff_frac 0.5
      'a c'   -> (a,c) seen: 1/2 -> mean 0.5, frac 0.0
      'c b'   -> (c,b) unseen, b in-vocab: 0.4 * 1/4 = 0.1, frac 1.0
      ''      -> n_bigrams 0, mean 0.0, frac 0.0
    """
    ref = spark.createDataFrame([(0, "a b a c")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "a b x"), (2, "a c"), (3, "c b"), (4, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in lm.stupid_backoff_score(
        docs, lm.token_census(ref), lm.bigram_census(ref)).collect()}
    assert got[1]["n_bigrams"] == 2
    assert got[1]["mean_bigram_s"] == 0.25
    assert got[1]["backoff_frac"] == 0.5
    assert got[2]["mean_bigram_s"] == 0.5 and got[2]["backoff_frac"] == 0.0
    assert got[3]["mean_bigram_s"] == pytest.approx(0.1)
    assert got[3]["backoff_frac"] == 1.0
    assert got[4]["n_bigrams"] == 0 and got[4]["mean_bigram_s"] == 0.0


def test_stupid_backoff_ranks_fluency(spark):
    """In-model prose outscores word salad over the same vocabulary
    (the property the quality filter keys on)."""
    sent = "the quick brown fox jumps over the lazy dog"
    ref = spark.createDataFrame([(i, sent) for i in range(5)],
                                "doc_id long, text string")
    docs = spark.createDataFrame(
        [(100, sent), (101, "dog the over fox lazy brown jumps quick the")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in lm.stupid_backoff_score(
        docs, lm.token_census(ref), lm.bigram_census(ref)).collect()}
    assert got[100]["mean_bigram_s"] > got[101]["mean_bigram_s"]
    assert got[100]["backoff_frac"] == 0.0
    assert got[101]["backoff_frac"] > 0.5


def test_lexical_diversity_hand_computed(spark):
    """X77: one doc repeating a single word, one balanced doc, one empty
    — concentration separates what distinct/total repetition can't."""
    docs = spark.createDataFrame(
        [(1, "spam spam spam spam"),          # one type, total repeat
         (2, "a b c d"),                      # all distinct
         (3, "x x y y"),                      # balanced pairs
         (4, None),                           # null text
         (5, "solo")],                        # n == 1 edge
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in lm.lexical_diversity(docs).collect()}
    assert (got[1]["n_tokens"], got[1]["n_types"]) == (4, 1)
    assert got[1]["ttr"] == 0.25
    assert got[1]["repeat_prob"] == 1.0       # (16-4)/(4*3)
    assert got[1]["top_frac"] == 1.0
    assert got[2]["repeat_prob"] == 0.0 and got[2]["ttr"] == 1.0
    assert got[2]["top_frac"] == 0.25
    assert got[3]["repeat_prob"] == (8 - 4) / 12
    assert got[3]["top_frac"] == 0.5
    assert (got[4]["n_tokens"], got[4]["ttr"], got[4]["repeat_prob"],
            got[4]["top_frac"]) == (0, 0.0, 0.0, 0.0)
    assert (got[5]["n_tokens"], got[5]["repeat_prob"]) == (1, 0.0)
