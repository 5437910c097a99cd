"""X156 declared-vs-detected language confusion census: fixture
semantics (agree / disagree / und rows, shares sum to 1 per declared
label) and the single-corpus-pass plan shape."""

from pyspark.sql import functions as F

from ocr_automation_system_spark.functions.text import lang_id


def _census(spark, rows):
    from pyspark.sql.window import Window

    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    d = df.select(F.col("lang").alias("declared"),
                  lang_id(F.col("text")).alias("detected"))
    cm = (d.groupBy("declared", "detected")
          .agg(F.count(F.lit(1)).cast("long").alias("n_docs")))
    w = Window.partitionBy("declared")
    return cm.select(
        "declared", "detected", "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6)
        .alias("frac_of_declared"),
        (F.col("declared") == F.col("detected")).alias("agree")).collect()


def test_confusion_census_semantics(spark):
    rows = [
        (1, "the cat and the dog is in that house", "en"),   # en -> en
        (2, "el perro y la casa de los vecinos", "en"),      # en -> es (noise)
        (3, "der hund und die katze ist nicht da", "de"),    # de -> de
        (4, "zzz qqq xxx", "de"),                            # de -> und
    ]
    out = {(r["declared"], r["detected"]): r for r in _census(spark, rows)}
    assert out[("en", "en")]["agree"] and out[("en", "en")]["n_docs"] == 1
    assert not out[("en", "es")]["agree"]
    assert out[("de", "und")]["n_docs"] == 1
    # shares within a declared label sum to 1
    for lab in ("en", "de"):
        s = sum(r["frac_of_declared"] for k, r in out.items() if k[0] == lab)
        assert abs(s - 1.0) < 1e-9


def test_single_pass_plan(spark):
    """The census query must scan its input exactly once: the share
    denominator is a window over the aggregated (bounded) matrix, not
    a second aggregate subtree re-reading the corpus."""
    from ocr_automation_system_spark.queries import q_lang_mismatch_census

    plan = (q_lang_mismatch_census(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Scan parquet") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
