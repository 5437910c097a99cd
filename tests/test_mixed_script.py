"""X155 mixed-script spoof detection: within-word mixing vs bilingual
co-presence, pair coverage (Cyrillic and Greek homoglyph alphabets),
CJK exemption, and the narrow-plan law."""

from pyspark.sql import functions as F

from ocr_automation_system_spark.functions.text import (
    MIXED_SCRIPT_PAIRS,
    SCRIPT_RANGES,
    mixed_script_words,
)

DOCS = [
    # doc_id, text, expected n_mixed, expected example
    (1, "pure latin words only", 0, None),
    (2, "обычный русский текст", 0, None),               # pure Cyrillic
    (3, "visit наш сайт today", 0, None),                # bilingual, whole words
    (4, "login to pаypal now", 1, "pаypal"),             # Cyrillic а in Latin
    (5, "buy miсrοsoft stock", 1, "miсrοsoft"),          # Cyrillic с + Greek ο
    (6, "ελληνικά words beside", 0, None),               # pure Greek word
    (7, "vοte here", 1, "vοte"),                         # Greek ο in Latin
    (8, "tvあanime 東京 tower", 0, None),                 # CJK mixing exempt
    (9, "", 0, None),
]


def test_within_word_vs_bilingual(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, _, _ in DOCS], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in mixed_script_words(df).collect()}
    for i, _, n, ex in DOCS:
        assert rows[i]["n_mixed_words"] == n, i
        assert rows[i]["example_word"] == ex, i
    assert rows[9]["n_words"] == 0 and rows[9]["mixed_frac"] == 0.0


def test_pairs_are_the_homoglyph_alphabets():
    names = [n for n, _ in SCRIPT_RANGES]
    assert MIXED_SCRIPT_PAIRS == (("latin", "cyrillic"), ("latin", "greek"))
    for a, b in MIXED_SCRIPT_PAIRS:
        assert a in names and b in names
    # CJK deliberately not a pair (unit/model-name mixing is normal)
    assert not any("cjk" in p for p in MIXED_SCRIPT_PAIRS)


def test_plan_is_narrow(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("pаypal login").alias("text"))
    plan = (mixed_script_words(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Window" not in plan
