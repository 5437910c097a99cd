"""X173 image alt-text pair mining: attribute extraction, relative-src
resolution, empty/short-alt filtering, non-html exclusion."""

from pyspark.sql import functions as F

from ocr_automation_system_spark.functions.links import page_html
from ocr_automation_system_spark.functions.urlnorm import URL_PREFIX_RE
from ocr_automation_system_spark.queries import (
    _IMG_ALT_RE,
    _IMG_SRC_RE,
    _IMG_TAG_RE,
)


def _pairs(spark, rows):
    df = spark.createDataFrame(
        [(u, bytearray(h.encode())) for u, h in rows], ["url", "html"])
    page = page_html(F.col("html"))
    tags = F.regexp_extract_all(page, F.lit(_IMG_TAG_RE), F.lit(0))
    d = (df.select("url", F.explode(tags).alias("tag"))
         .select("url",
                 F.regexp_extract("tag", _IMG_SRC_RE, 1).alias("src"),
                 F.regexp_extract("tag", _IMG_ALT_RE, 1).alias("alt")))
    pre = F.regexp_extract("url", URL_PREFIX_RE, 1)
    img_url = (F.when(F.col("src").rlike("^[A-Za-z][A-Za-z0-9+.-]*://"),
                      F.col("src"))
               .when(F.col("src").startswith("/"),
                     F.concat(pre, F.col("src")))
               .otherwise(F.concat(pre, F.lit("/"), F.col("src"))))
    return (d.filter(F.length(F.trim(F.col("alt"))) >= 5)
            .select("url", img_url.alias("img_url"), "alt")).collect()


def test_extraction_resolution_and_filters(spark):
    html = ('<html><body>'
            '<img src="/pics/a.jpg" alt="a red bicycle at dawn">'
            '<img src="rel.png" alt="relative path image">'
            '<img alt="an absolute cdn shot" src="https://cdn.x.net/b.png">'
            '<img src="/decor.gif" alt="">'
            '<img src="/tiny.gif" alt="img">'
            '</body></html>')
    out = _pairs(spark, [("https://site.example.com/page", html)])
    got = sorted((r["img_url"], r["alt"]) for r in out)
    assert got == [
        ("https://cdn.x.net/b.png", "an absolute cdn shot"),
        ("https://site.example.com/pics/a.jpg", "a red bicycle at dawn"),
        ("https://site.example.com/rel.png", "relative path image"),
    ]


def test_non_html_payloads_yield_nothing(spark):
    out = _pairs(spark, [
        ("https://s.example.com/x", '%PDF-1.4 <img src="/a.jpg" '
                                    'alt="hidden in a pdf stream">')])
    assert out == []
