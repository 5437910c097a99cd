"""DSIR-style importance weighting (functions/dsir.py): ranking
direction, featureless-document handling, and partitioning-invariant
bit-exact folds. Cross-engine hashes are gated by the registry sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_automation_system_spark.functions.dsir import (
    bucket_census, importance_weights, ratio_table,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _fixture(spark):
    target_like = "clean prose about science and history " * 5
    raw_junk = "zzz spam click here buy now " * 5
    rows = ([(i, target_like, "trusted") for i in range(5)]
            + [(100 + i, raw_junk, "web") for i in range(5)]
            + [(200, target_like, "web"),   # target-like doc in the wild
               (201, "", "web")])           # featureless
    docs = _docs(spark, rows)
    target = docs.filter(F.col("source") == "trusted")
    return docs, target


def test_importance_ranks_target_like_docs_higher(spark):
    docs, target = _fixture(spark)
    out = {r["doc_id"]: r for r in
           importance_weights(docs, ratio_table(target, docs)).collect()}
    assert len(out) == 12  # every doc scored, including featureless
    # a target-like doc in the raw corpus outranks junk on both stats
    assert out[200]["mean_ratio"] > out[100]["mean_ratio"]
    assert out[200]["frac_target_favored"] > out[100]["frac_target_favored"]
    # ... and matches the docs the model was fitted on
    assert out[200]["mean_ratio"] == out[0]["mean_ratio"]


def test_featureless_document_scores_zero(spark):
    docs, target = _fixture(spark)
    row = (importance_weights(docs, ratio_table(target, docs))
           .filter("doc_id = 201").collect()[0])
    assert (row["n_feats"], row["mean_ratio"],
            row["frac_target_favored"]) == (0, 0.0, 0.0)


def test_weights_invariant_under_repartitioning(spark):
    """The ordered fold makes the double stats a pure function of the
    data — any partitioning gives bit-identical rows."""
    docs, target = _fixture(spark)
    ratios = ratio_table(target, docs)
    a = sorted(tuple(r) for r in
               importance_weights(docs, ratios).collect())
    b = sorted(tuple(r) for r in
               importance_weights(docs.repartition(7), ratios).collect())
    assert a == b


def test_bucket_census_bounded_and_counts_features(spark):
    docs = _docs(spark, [(1, "a b c", "s")])  # 3 unigrams + 2 bigrams
    rows = bucket_census(docs).collect()
    assert sum(r["n"] for r in rows) == 5
    assert all(0 <= r["bucket"] < 1024 for r in rows)


def test_curation_verdicts_first_fail_wins(spark):
    from ocr_automation_system_spark.functions.curation import (
        curation_verdicts,
    )

    good = ("the quick brown fox jumps over the lazy dog and that is fine "
            "for a test of the quality gate with enough length to pass " * 3)
    rows = [
        (1, good, "en"),                          # keep
        (2, "x", "en"),                           # unusable (too short)
        (3, "the cat sat here now " * 40, "en"),  # repetitive 2-grams
        (4, good, "fr"),                          # confident en != fr
        (5, good + " a@b.com c@d.com e@f.org 10.0.0.1", "en"),  # pii x4>2
        (6, None, "en"),                          # null text -> unusable
    ]
    out = {r["doc_id"]: (r["verdict"], r["keep"]) for r in curation_verdicts(
        spark.createDataFrame(rows, "doc_id long, text string, lang string")
    ).collect()}
    assert out[1] == ("keep", True)
    assert out[2] == ("unusable", False)
    assert out[3] == ("too_repetitive", False)
    assert out[4] == ("lang_mismatch", False)
    assert out[5] == ("pii_heavy", False)
    assert out[6] == ("unusable", False)
    # usability outranks repetition: a short repetitive doc is 'unusable'
    short_rep = [(7, "aa aa aa", "en")]
    v = curation_verdicts(spark.createDataFrame(
        short_rep, "doc_id long, text string, lang string")).collect()[0]
    assert v["verdict"] == "unusable"


def test_curation_verdicts_is_narrow(spark):
    from ocr_automation_system_spark.functions.curation import (
        curation_verdicts,
    )

    df = spark.createDataFrame([(1, "text here", "en")],
                               "doc_id long, text string, lang string")
    plan = (curation_verdicts(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Python" not in plan
