"""A/B equivalence: the fast regex scanner must produce byte-identical
block records to the stdlib-HTMLParser reference on every corpus payload,
the adversarial cases, and fuzzed inputs — it is the golden-text hot path."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocr_automation_system_spark.corpus import generate_rows
from ocr_automation_system_spark.oracle.html_extract import (
    _Anomaly, _fast_segment, _fast_segment_strict,
    _segment_blocks_htmlparser, extract_main_text,
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
    # --- truncated-markup tail paths (hypothesis-discovered family:
    # html.parser emits incomplete constructs at EOF as raw data) ------
    "<!", "<?", "<?x", "<!x", "<!doctype html", "<!--", "<!--abc",
    "<!--abc--", "<![CDATA[x", "p<![CDATA[", "<p>x<!", "x<!", "<!-",
    "<div>x</div><!q", "<!-->", "<!--->", "<!---->",
    # --- comment close is --\s*> (not just -->) -----------------------
    "<!--x-- >y<p>after loose comment close stays in sync</p>",
    # --- bogus / tolerant end-tag forms --------------------------------
    "</ >", "</>", "</ div>in-div-closed-by-spaced-endtag</div>",
    "</div attr='>'>quote-naive endtag span</div>",
    "</a@>x", "</a b='>'>x",
    # --- start-tag name charset / malformed innards -------------------
    "<a@b>not an anchor: tolerant name is 'a@b'</a@b><p>done</p>",
    "<a\vhref>vertical tab is a stdlib name char</a>",
    "<a href=x/>bare-value-then-slash is NOT self-closing</a>",
    "<a href=''x>", "<a ,>x", "<td x=1, y=2>cell</td>",
    "<a =>x", "<a href=>x", "<br clear=x/>next", "<!DOCTYPEjunk>x",
    # --- cdata-mode close edge cases -----------------------------------
    "<script>x</script y></script><p>bogus close stays in cdata</p>",
    "<script>a</ScRiPt >b<p>case+space close</p>",
    "<script>a</ script>b<p>spaced close</p>",
    "<script><!--</script>--></script>ok",
    # --- marked sections beyond CDATA ----------------------------------
    "<![if x]>y", "<![unknown[x]]>y", "<![ignore[ hidden ]]>shown",
    "<![CDATA[x] ]>loose marked close<p>after</p>",
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


#: Markup fragments chosen to hit parser-boundary seams: truncation,
#: bogus closes, marked sections, loose comment closes, cdata escapes.
_SOUP_ATOMS = [
    "<", ">", "/", "!", "?", "-", "[", "]", "=", '"', "'", "&", ";",
    " ", "\t", "\n", "\v", "\f", "a", "b", "p", "x", "1", "@", "\x00",
    "<p>", "</p>", "<div>", "</div>", "<a href='x'>", "</a>", "<br>",
    "<br/>", "<script>", "</script>", "<style>", "</style>",
    "<!--", "-->", "<![CDATA[", "]]>", "<!doctype html>", "<?pi?>",
    "&amp;", "&lt", "&#65;", "word ", "</ div>", "<a@b>", "<td x=1>",
    "</tr>", "-- >", "] ]>", "<![if x]>", "<![ignore[", "<!x>", "</>",
]


@given(st.lists(st.sampled_from(_SOUP_ATOMS), max_size=30).map("".join))
@settings(max_examples=400, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_ab_fuzz_markup_soup(html):
    assert _fast_segment(html) == _segment_blocks_htmlparser(html)


def test_strict_path_is_the_common_path():
    """The anomaly fallback exists for pathological rows only: clean
    pages must run the strict scanner (perf guarantee), while truncated
    markup must raise _Anomaly (correctness guarantee — remove the
    anomaly raises and the A/B assertions above go red)."""
    # clean page: no fallback
    blocks = _fast_segment_strict(
        "<nav><a href='/'>Home</a></nav><article><p>body text ok</p>"
        "</article>")
    assert blocks
    # truncated markup: must defer to the reference parser
    for bad in ("<!", "<?x", "<!--abc", "<![CDATA[x", "\x00\xff<not html"):
        try:
            _fast_segment_strict(bad)
        except _Anomaly:
            continue
        raise AssertionError(f"expected _Anomaly for {bad!r}")


def test_extract_main_text_still_works():
    out = extract_main_text(
        "<nav><a href='/'>Home Nav Links Here</a></nav>"
        "<article><p>this is the real article body with enough characters"
        " to pass the block threshold</p></article>")
    assert "real article body" in out and "Home Nav" not in out
