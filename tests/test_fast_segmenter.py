"""A/B equivalence: the fast regex scanner must produce byte-identical
block records to the stdlib-HTMLParser reference on every corpus payload,
the adversarial cases, and fuzzed inputs — it is the golden-text hot path."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocr_automation_system_spark.corpus import generate_rows
from ocr_automation_system_spark.oracle.html_extract import (
    _fast_segment, _segment_blocks_htmlparser, extract_main_text,
)
from ocr_automation_system_spark.oracle.pdf_stub import is_pdf_payload

CASES = [
    "",
    "plain text no tags at all",
    "<p>simple</p>",
    "<div><p>" + "unterminated " * 10,
    "<!-- <p>ghost</p> --><p>kept content here for sure ok</p>",
    "<script>var x = '<p>fake</p>';</script><p>after script body</p>",
    "<style>p{color:red}</style><p>after style body text</p>",
    "<SCRIPT>UPPER case raw text</SCRIPT><p>kept</p>",
    "<script>never closed...",
    "<p>caf&eacute; &amp; cr&egrave;me &#233; &unknown; x</p>",
    "<a href='x>y'>quoted gt in attr</a><p>content continues here</p>",
    "<nav><a href='/'>Home</a></nav><article><p>body text</p></article>",
    "<br><br>lines<br>split",
    "<td>cell</td><td>cell2</td>",
    "\x00\xff<not html",
    "<p>self closing<br/>continues</p>",
    "<!DOCTYPE html><?xml version='1.0'?><p>after doctype</p>",
    "<![CDATA[ raw <p>cdata</p> ]]><p>after cdata</p>",
    "a < b and c > d <p>math soup</p>",
]


def test_ab_on_adversarial_cases():
    for html in CASES:
        assert _fast_segment(html) == _segment_blocks_htmlparser(html), html


def test_ab_on_full_corpus():
    rows = generate_rows(800, seed=123)
    checked = 0
    for r in rows:
        if is_pdf_payload(r["html"]):
            continue
        html = bytes(r["html"]).decode("utf-8", errors="replace")
        assert _fast_segment(html) == _segment_blocks_htmlparser(html), r["url"]
        checked += 1
    assert checked > 500


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=600))
@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_ab_fuzz(text):
    assert _fast_segment(text) == _segment_blocks_htmlparser(text)


@given(st.lists(st.sampled_from(
    ["<p>", "</p>", "<div>", "</div>", "<nav>", "</nav>", "<a href='/x'>",
     "</a>", "<script>", "</script>", "<br>", "word soup text here ",
     "&amp;", "<!-- c -->", "<td>", "x<y", "1 > 0 "]), max_size=40).map("".join))
@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_ab_fuzz_taggy(html):
    assert _fast_segment(html) == _segment_blocks_htmlparser(html)


def test_extract_main_text_still_works():
    out = extract_main_text(
        "<nav><a href='/'>Home Nav Links Here</a></nav>"
        "<article><p>this is the real article body with enough characters"
        " to pass the block threshold</p></article>")
    assert "real article body" in out and "Home Nav" not in out
