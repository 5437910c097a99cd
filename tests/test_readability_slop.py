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
