"""X175 code-switching census: bilingual doc flagged, monolingual and
noise docs not, dominant paragraph language by priority, plan law."""

from pyspark.sql import functions as F

from ocr_automation_system_spark.functions import text as T


def _census(spark, rows):
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    t = F.coalesce(F.col("text"), F.lit(""))
    paras = F.filter(F.split(t, "\n"),
                     lambda x: F.length(F.trim(x)) > 0)
    langs = F.transform(paras, lambda p: T.lang_id(p))

    def _stats(ls):
        nonund = F.filter(ls, lambda x: x != "und")
        counts = {lang: F.size(F.filter(ls, lambda x: x == lang))
                  for lang, _ in T.LANG_PROFILES}
        best = F.greatest(*counts.values())
        dom = F.lit("none")
        for lang, _ in reversed(T.LANG_PROFILES):
            dom = F.when((counts[lang] > 0) & (counts[lang] == best),
                         F.lit(lang)).otherwise(dom)
        return F.struct(F.size(ls).alias("n_paras"),
                        F.size(nonund).alias("n_lang_paras"),
                        F.size(F.array_distinct(nonund)).alias("nd"),
                        dom.alias("dom"))

    s = T.bind_array(langs, _stats)
    out = docs.select("doc_id", s["n_paras"].alias("n_paras"),
                      s["nd"].alias("n_distinct"),
                      (s["nd"] >= 2).alias("switching"),
                      s["dom"].alias("dom"))
    return {r["doc_id"]: r for r in out.collect()}


EN = "the cat and the dog is in that house of a king"
DE = "der hund und die katze ist nicht in das haus"
NOISE = "zzz qqq 12345"


def test_code_switching_detection(spark):
    out = _census(spark, [
        (1, EN + "\n" + DE + "\n" + EN),     # bilingual -> switching
        (2, EN + "\n" + EN),                 # monolingual
        (3, NOISE + "\n" + NOISE),           # no confident lang at all
        (4, ""),
    ])
    assert out[1]["switching"] and out[1]["n_distinct"] == 2
    assert out[1]["dom"] == "en"             # 2 en paras vs 1 de
    assert not out[2]["switching"] and out[2]["dom"] == "en"
    assert out[3]["n_distinct"] == 0 and out[3]["dom"] == "none"
    assert out[4]["n_paras"] == 0 and not out[4]["switching"]


def test_plan_is_narrow(spark):
    from ocr_automation_system_spark.queries import q_code_switch_census

    plan = (q_code_switch_census(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Window" not in plan
