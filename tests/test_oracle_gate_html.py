"""Unit tests: usability gate (F1), HTML block scoring (S1 analogue),
PDF stub (S1/S3)."""

from ocr_automation_system_spark.oracle.gate import is_text_usable
from ocr_automation_system_spark.oracle.html_extract import (
    block_stats, extract_main_text, segment_blocks,
)
from ocr_automation_system_spark.oracle.pdf_stub import (
    extract_pdf_pages, extract_pdf_text, is_pdf_payload, make_synthetic_pdf,
)


class TestGate:
    def test_short_text_rejected(self):
        assert not is_text_usable("short")

    def test_low_alpha_rejected(self):
        # >=50 chars but mostly digits: alpha ratio < 0.4
        assert not is_text_usable("12345 67890 " * 10)

    def test_usable(self):
        assert is_text_usable("This is a perfectly usable block of document text here.")

    def test_strip_before_length(self):
        # gate strips before measuring (`core/extractor.py:38`)
        assert not is_text_usable(" " * 100 + "abc")

    def test_unicode_letters_count_as_alpha(self):
        # Python str.isalpha is Unicode-aware: \p{L}, not [A-Za-z]
        assert is_text_usable("ÜBERGRÖSSE MÜNCHEN STRASSE " * 3)


class TestHtmlExtract:
    HTML = (
        "<html><head><title>T</title><script>var x=1;</script></head><body>"
        "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
        "<div class='main'>This is the principal content block of the page, "
        "long enough to be kept by the scorer.</div>"
        "<div><a href='/x'>link one</a> <a href='/y'>link two</a> tiny</div>"
        "<footer><a href='/p'>Privacy</a></footer>"
        "</body></html>"
    )

    def test_main_content_kept_boilerplate_dropped(self):
        text = extract_main_text(self.HTML)
        assert "principal content block" in text
        assert "Home" not in text
        assert "Privacy" not in text

    def test_link_dense_block_dropped(self):
        text = extract_main_text(self.HTML)
        assert "link one" not in text

    def test_script_dropped(self):
        assert "var x" not in extract_main_text(self.HTML)

    def test_bytes_input(self):
        assert extract_main_text(self.HTML.encode()) == extract_main_text(self.HTML)

    def test_br_preserves_lines(self):
        html = "<div>first line of the content here<br>second line of the content here</div>"
        text = extract_main_text(html)
        assert text.splitlines() == [
            "first line of the content here",
            "second line of the content here",
        ]

    def test_empty_and_poison_inputs(self):
        assert extract_main_text(None) == ""
        assert extract_main_text("") == ""
        assert extract_main_text(b"\x00\xff\xfe<not html") == ""

    def test_block_stats(self):
        kept, dropped = block_stats(self.HTML)
        assert kept == 1 and dropped >= 2

    def test_determinism(self):
        assert extract_main_text(self.HTML) == extract_main_text(self.HTML)

    def test_segment_blocks_records(self):
        blocks = segment_blocks(self.HTML)
        assert all(set(b) == {"text", "n_chars", "link_chars", "boilerplate"} for b in blocks)


class TestPdfStub:
    def test_roundtrip(self):
        payload = make_synthetic_pdf(["page one text", "page two text"])
        assert is_pdf_payload(payload)
        pages = extract_pdf_pages(payload)
        assert [p["text"] for p in pages] == ["page one text", "page two text"]
        assert [p["page"] for p in pages] == [1, 2]
        # page join matches `project/main.py:8`
        assert extract_pdf_text(payload) == "page one text page two text"

    def test_non_pdf(self):
        assert not is_pdf_payload(b"<html>")
        assert not is_pdf_payload(None)

    def test_real_pdf_raises_not_implemented(self):
        import pytest

        with pytest.raises(NotImplementedError):
            extract_pdf_pages(b"%PDF-1.4\nreal pdf bytes without synth header")
