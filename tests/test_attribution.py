"""X167 memorization attribution: verbatim reuse must attribute (the
winnowing guarantee), novel text must not, common-phrase fingerprints
cap out, and more shared content outranks less."""

from pyspark.sql import functions as F

from ocr_automation_system_spark.queries import REGISTRY

SPAN_A = ("the quick brown fox jumps over the lazy dog near the river "
          "bank at dawn every single morning")
SPAN_B = ("colorless green ideas sleep furiously while the committee "
          "debates the annual budget line by line tonight")
BOILER = "click here to accept all cookies and continue to the site"
NOVEL = "zebra quartz method piano velvet rocket garden stone"


def _attribution(spark, rows):
    from ocr_automation_system_spark.functions import curation as C

    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = C.winnow_fingerprints(docs).select("doc_id", "fp").distinct()
    is_gen = F.pmod(F.col("doc_id"), F.lit(173)) == 0
    gf = fps.filter(is_gen).select(F.col("doc_id").alias("gen_id"), "fp")
    cf0 = fps.filter(~is_gen)
    hot = (cf0.groupBy("fp").agg(F.count(F.lit(1)).alias("_n"))
           .filter(F.col("_n") > 64).select("fp"))
    cf = cf0.join(F.broadcast(hot), "fp", "left_anti")
    from pyspark.sql.window import Window

    sh = (gf.join(cf, "fp").groupBy("gen_id", "doc_id")
          .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
          .filter(F.col("n_shared") >= 2))
    w = Window.partitionBy("gen_id").orderBy(F.desc("n_shared"),
                                             F.asc("doc_id"))
    return (sh.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= 3)
            .select("gen_id", "rank", "doc_id", "n_shared")).collect()


def test_verbatim_reuse_attributes_and_novel_does_not(spark):
    rows = [
        (1, SPAN_A + " plus unrelated trailing words here"),
        (2, SPAN_B + " with its own extra content attached"),
        # gen 173: quotes a long span of doc 1 -> MUST attribute to 1
        (173, "my model wrote " + SPAN_A + " verbatim today"),
        # gen 346: wholly novel -> no attribution rows
        (346, NOVEL),
    ]
    out = _attribution(spark, rows)
    by_gen = {}
    for r in out:
        by_gen.setdefault(r["gen_id"], []).append(r)
    assert 173 in by_gen and by_gen[173][0]["doc_id"] == 1
    assert 346 not in by_gen


def test_more_shared_content_outranks(spark):
    rows = [
        (1, SPAN_A + " " + SPAN_B),          # shares both spans
        (2, SPAN_B + " nothing else at all"),  # shares one span
        (173, SPAN_A + " and then " + SPAN_B),
    ]
    out = _attribution(spark, rows)
    ranked = sorted((r["rank"], r["doc_id"]) for r in out
                    if r["gen_id"] == 173)
    assert ranked[0] == (1, 1)               # doc 1 shares more -> rank 1
    assert (2, 2) in ranked


def test_boilerplate_caps_out(spark):
    # the boiler phrase lives in 70 corpus docs (> 64 cap) — a
    # generation made ONLY of it must attribute to nothing
    rows = [(i + 1, BOILER + f" filler {i}") for i in range(70)]
    rows.append((173, BOILER))
    out = _attribution(spark, rows)
    assert [r for r in out if r["gen_id"] == 173] == []


def test_query_registered():
    assert "memorization_attribution" in REGISTRY
