"""X159 DOM tag-skeleton templates: text/attribute invariance, tag
sensitivity, non-HTML exclusion, case folding, and the zero-shuffle
plan law."""

from pyspark.sql import functions as F

from ocr_automation_system_spark.functions.links import dom_skeletons


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, bytearray(h.encode())) for u, h in rows], ["url", "html"])


def test_skeleton_ignores_text_and_attrs(spark):
    a = "<html><body><p class='x'>hello world</p></body></html>"
    b = '<html><body><p id="y">entirely different words</p></body></html>'
    c = "<html><body><div>same text as a? hello world</div></body></html>"
    rows = dom_skeletons(_df(spark, [
        ("https://h.example.com/1", a),
        ("https://h.example.com/2", b),
        ("https://h.example.com/3", c)])).collect()
    sk = {r["url"][-1]: r["skeleton"] for r in rows}
    assert sk["1"] == sk["2"]        # text/attrs invisible
    assert sk["1"] != sk["3"]        # tag change -> new template


def test_case_folds_and_close_tags_count(spark):
    a = "<HTML><BODY><P>x</P></BODY></HTML>"
    b = "<html><body><p>x</p></body></html>"
    unclosed = "<html><body><p>x</body></html>"
    rows = dom_skeletons(_df(spark, [
        ("https://h.example.com/1", a),
        ("https://h.example.com/2", b),
        ("https://h.example.com/3", unclosed)])).collect()
    sk = {r["url"][-1]: (r["skeleton"], r["n_tags"]) for r in rows}
    assert sk["1"] == sk["2"]
    assert sk["1"][1] == 6
    assert sk["3"][0] != sk["1"][0] and sk["3"][1] == 5


def test_non_html_payloads_excluded(spark):
    rows = dom_skeletons(_df(spark, [
        ("https://h.example.com/1", "<html><body></body></html>"),
        ("https://h.example.com/2", "%PDF-1.4 not a page"),
        ("https://h.example.com/3", "")])).collect()
    assert [r["url"][-1] for r in rows] == ["1"]


def test_plan_is_narrow(spark):
    df = _df(spark, [("https://h.example.com/1",
                      "<html><body></body></html>")])
    plan = (dom_skeletons(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Window" not in plan
