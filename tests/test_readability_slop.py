"""X168/X169: Flesch band sanity on crafted texts and slop-lexicon
rate arithmetic (via the registered queries' expression shapes)."""

from pyspark.sql import functions as F

from ocr_automation_system_spark.functions.text import clean_text, ws_tokens
from ocr_automation_system_spark.queries import SLOP_WORDS


def test_flesch_bands(spark):
    easy = "The cat sat. The dog ran. We play all day. It is fun. "
    hard = ("Notwithstanding institutional heterogeneity considerations "
            "emphasizing multidimensional organizational interdependencies "
            "continuously")
    df = spark.createDataFrame([(1, easy), (2, hard)], ["doc_id", "text"])
    t = F.coalesce(F.col("text"), F.lit(""))
    words = F.size(ws_tokens(clean_text(t)))
    sents = F.greatest(F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1))
    syl = F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+"))
    flesch = (F.lit(206.835)
              - F.lit(1.015) * (words.cast("double") / sents.cast("double"))
              - F.lit(84.6) * (syl.cast("double")
                               / F.greatest(words, F.lit(1)).cast("double")))
    rows = {r["doc_id"]: r["f"] for r in
            df.select("doc_id", flesch.alias("f")).collect()}
    assert rows[1] >= 60.0          # short words, short sentences
    assert rows[2] < 30.0           # polysyllabic single sentence


def test_slop_rate_arithmetic(spark):
    from ocr_automation_system_spark.functions.curation import (
        word_blocklist_scores,
    )

    text = ("we delve into the vibrant tapestry of this realm to delve "
            "deeper")  # 12 tokens, 4 slop hits (delve x2 tapestry vibrant
    # realm = 5? count: delve, vibrant, tapestry, realm, delve -> 5)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = word_blocklist_scores(df, words=SLOP_WORDS).collect()[0]
    assert r["n_blocked"] == 5
    assert r["n_blocked_distinct"] == 4
    assert not r["keep"]


def test_slop_list_lowercase_distinct():
    assert all(w == w.lower() for w in SLOP_WORDS)
    assert len(set(SLOP_WORDS)) == len(SLOP_WORDS)


def test_slop_by_lang_cross_language(spark):
    """X178: a document is scored only against ITS language's lexicon —
    English slop words inside a French doc must not count, and a lang
    with no lexicon reports has_lexicon=false, never fake-clean zeros."""
    from ocr_automation_system_spark.queries import SLOP_LEXICONS

    dim = spark.createDataFrame(
        [(lang, list(ws)) for lang, ws in sorted(SLOP_LEXICONS.items())],
        "lang string, lex array<string>")
    rows = [
        (1, "en", "we delve into the tapestry of delve"),     # 3 en hits
        (2, "fr", "delve tapestry pivotal"),                  # en words, fr doc
        (3, "fr", "plonger dans un univers incontournable"),  # 2 fr hits
        (4, "zh", "delve plonger eintauchen"),                # no zh lexicon
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    toks = ws_tokens(clean_text(F.coalesce(F.col("text"), F.lit(""))))
    d = (df.select("doc_id", "lang", toks.alias("_toks"))
         .join(F.broadcast(dim), "lang", "left"))
    hits = F.filter(F.col("_toks"),
                    lambda x: F.array_contains(F.col("lex"), x))
    out = {r["doc_id"]: r for r in d.select(
        "doc_id", F.col("lex").isNotNull().alias("has_lexicon"),
        F.coalesce(F.size(hits), F.lit(0)).alias("n_slop")).collect()}
    assert out[1]["n_slop"] == 3
    assert out[2]["n_slop"] == 0          # cross-language words don't count
    assert out[3]["n_slop"] == 2
    assert not out[4]["has_lexicon"] and out[4]["n_slop"] == 0
