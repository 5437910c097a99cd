"""Main-content extraction from raw HTML (the graft's analogue of the
reference's PDF text scan, operator S1 in SURVEY.md §2.1).

The reference reads document text with PyMuPDF and gates it for usability
(`/root/reference/project/core/pdf_text.py:4-16`,
`core/extractor.py:34-48`). For Common-Crawl-style pages the equivalent
problem is boilerplate stripping: separate the main content from nav/header/
footer chrome. We use the classic text-density + link-density block scoring
of Readability/Boilerpipe (public heuristics), implemented from scratch on
the stdlib ``html.parser`` so it is pure Python and byte-deterministic.

Algorithm
---------
1. Stream-parse the HTML into a flat list of *blocks*: a block is the text
   accumulated between block-level tag boundaries (``p div section article
   li td h1..h6 pre blockquote table ul ol`` …). ``<br>`` starts a new line
   inside the current block. ``script/style/noscript/template/svg/head``
   content is dropped entirely.
2. Per block, track: total text chars, chars that occur inside ``<a>``
   (anchor text), and whether the block sits inside a boilerplate container
   (``nav header footer aside form``).
3. Score: a block is *content* iff
     - it is not inside a boilerplate container, and
     - its stripped text has >= MIN_BLOCK_CHARS characters, and
     - its link density (anchor chars / total chars) <= MAX_LINK_DENSITY.
4. The extracted text is the kept blocks' lines joined with ``"\\n"``; each
   line has runs of whitespace collapsed to single spaces and is stripped.

All thresholds are module constants so the Spark pipeline and this oracle
can never disagree. The function is total: any bytes/str input returns a
(possibly empty) string — parse errors yield the text salvaged so far
(exception isolation per SURVEY.md §4 "rule error ⇒ SKIPPED").
"""

from __future__ import annotations

from html.parser import HTMLParser

MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 0.33

# Tags whose open OR close flushes the current block.
BLOCK_TAGS = frozenset(
    """p div section article main li td th h1 h2 h3 h4 h5 h6 pre blockquote
       table tr ul ol dl dt dd figure figcaption fieldset address hr
       body html""".split()
)
# Content inside these containers is boilerplate chrome.
BOILERPLATE_CONTAINERS = frozenset("nav header footer aside form".split())
# Content inside these is dropped entirely.
DROP_TAGS = frozenset("script style noscript template svg head title".split())

_WS_CHARS = " \t\r\n\f\v"


def _collapse_ws(s: str) -> str:
    return " ".join(s.split())


class _BlockParser(HTMLParser):
    """Accumulates (lines, n_chars, link_chars, boilerplate) block records."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._lines: list[str] = []
        self._buf: list[str] = []
        self._chars = 0
        self._link_chars = 0
        self._drop_depth = 0
        self._anchor_depth = 0
        self._boiler_depth = 0

    # -- block lifecycle ---------------------------------------------------
    def _end_line(self) -> None:
        line = _collapse_ws("".join(self._buf))
        self._buf = []
        if line:
            self._lines.append(line)

    def _flush_block(self) -> None:
        self._end_line()
        if self._lines:
            text = "\n".join(self._lines)
            self.blocks.append(
                {
                    "text": text,
                    "n_chars": self._chars,
                    "link_chars": self._link_chars,
                    "boilerplate": self._boiler_depth > 0,
                }
            )
        self._lines = []
        self._chars = 0
        self._link_chars = 0

    # -- parser callbacks ----------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in DROP_TAGS:
            self._drop_depth += 1
            return
        if tag == "br":
            self._end_line()
            return
        if tag in BLOCK_TAGS or tag in BOILERPLATE_CONTAINERS:
            self._flush_block()
        if tag in BOILERPLATE_CONTAINERS:
            self._boiler_depth += 1
        if tag == "a":
            self._anchor_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if tag in BLOCK_TAGS or tag in BOILERPLATE_CONTAINERS:
            self._flush_block()
        if tag in BOILERPLATE_CONTAINERS:
            self._boiler_depth = max(0, self._boiler_depth - 1)
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag == "br":
            self._end_line()

    def handle_data(self, data: str) -> None:
        if self._drop_depth:
            return
        self._buf.append(data)
        # Non-whitespace count: invariant to how the tokenizer chunks data
        # runs (len(strip()) would count inner spaces, making the density
        # score depend on parser chunking). Unrolled str.count chain — the
        # hottest line of the segmenter; a genexpr here costs a generator
        # frame per text chunk (~50 chunks/doc).
        n = (len(data) - data.count(" ") - data.count("\t")
             - data.count("\r") - data.count("\n")
             - data.count("\f") - data.count("\v"))
        self._chars += n
        if self._anchor_depth:
            self._link_chars += n


def _segment_blocks_htmlparser(html: str) -> list[dict]:
    """Reference implementation on stdlib HTMLParser — kept as the A/B
    check for the fast scanner below (tests assert byte-equal output)."""
    parser = _BlockParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass  # salvage whatever was parsed; poison input costs one row
    parser._flush_block()
    return parser.blocks


# -- fast regex scanner -------------------------------------------------------
# HTMLParser is pure-Python per-callback dispatch: ~1.3 MB/s/core on
# production-sized (~100KB) pages, which makes it the engine's hot-path
# bottleneck. This scanner walks the same token stream with one C-level
# finditer + raw-text skips for script/style, feeding the identical block
# state machine — same blocks, byte for byte (test_fast_segmenter_ab).

import re as _re
from html import unescape as _unescape

_TOKEN_RE = _re.compile(
    r"<!--.*?(?:-->|$)"                       # comments (unterminated: to EOF)
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"             # CDATA sections
    r"|<[!?][^>]*>?"                          # doctype / processing instr.
    r"|<(/?)([a-zA-Z][a-zA-Z0-9:._-]*)"       # tag open: (1)=/, (2)=name
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)"      # attrs (quoted '>' safe)
    r"(/?)>",                                 # (4) self-closing slash
    _re.S,
)
#: script/style content is raw text until the matching close tag
#: (HTMLParser CDATA_CONTENT_ELEMENTS).
_RAWTEXT_TAGS = ("script", "style")


#: Per-tag action codes for the inline state machine below. The tag sets
#: are mutually disjoint (asserted), so one code per tag captures exactly
#: what _BlockParser's callbacks would do; unknown tags map to None = no
#: state change (HTMLParser callbacks fall through for them too).
_ACT_DROP, _ACT_BR, _ACT_BLOCK, _ACT_BOILER, _ACT_A = 1, 2, 3, 4, 5
_TAG_ACTION: dict = {}
for _t in BLOCK_TAGS:
    _TAG_ACTION[_t] = _ACT_BLOCK
for _t in BOILERPLATE_CONTAINERS:
    _TAG_ACTION[_t] = _ACT_BOILER
for _t in DROP_TAGS:
    _TAG_ACTION[_t] = _ACT_DROP
_TAG_ACTION["br"] = _ACT_BR
_TAG_ACTION["a"] = _ACT_A
assert len(_TAG_ACTION) == (len(BLOCK_TAGS) + len(BOILERPLATE_CONTAINERS)
                            + len(DROP_TAGS) + 2), "tag sets must be disjoint"


def _fast_segment(html: str) -> list[dict]:
    """One finditer walk with the _BlockParser state machine INLINED —
    ~450k Python callback invocations per 3k thin pages were pure call
    overhead (57% of extraction time was segmentation). Byte-identical
    to `_segment_blocks_htmlparser` by the A/B suite
    (tests/test_fast_segmenter.py: adversarial cases + 800-doc corpus +
    two hypothesis fuzzers)."""
    blocks: list[dict] = []
    lines: list[str] = []
    buf: list[str] = []
    chars = link_chars = 0
    drop_depth = anchor_depth = boiler_depth = 0
    search = _TOKEN_RE.search
    unescape = _unescape
    act_of = _TAG_ACTION.get
    lower = None  # lazily built lowercase copy for raw-text close search
    pos = 0
    n = len(html)
    while pos < n:
        m = search(html, pos)
        start = n if m is None else m.start()
        if start > pos:  # handle_data, inlined
            data = unescape(html[pos:start])
            if not drop_depth:
                buf.append(data)
                c = (len(data) - data.count(" ") - data.count("\t")
                     - data.count("\r") - data.count("\n")
                     - data.count("\f") - data.count("\v"))
                chars += c
                if anchor_depth:
                    link_chars += c
        if m is None:
            break
        pos = m.end()
        name = m.group(2)
        if name is None:
            continue  # comment / doctype / CDATA — no state change
        act = act_of(name.lower())
        if act is None:
            continue  # unknown tag: every callback falls through
        if m.group(1):  # ---- end tag --------------------------------
            if act == _ACT_DROP:
                if drop_depth:
                    drop_depth -= 1
            elif act == _ACT_BLOCK or act == _ACT_BOILER:
                # _flush_block, inlined (boilerplate read BEFORE depth--)
                line = " ".join("".join(buf).split())
                del buf[:]
                if line:
                    lines.append(line)
                if lines:
                    blocks.append({
                        "text": "\n".join(lines), "n_chars": chars,
                        "link_chars": link_chars,
                        "boilerplate": boiler_depth > 0,
                    })
                    del lines[:]
                chars = link_chars = 0
                if act == _ACT_BOILER and boiler_depth:
                    boiler_depth -= 1
            elif act == _ACT_A:
                if anchor_depth:
                    anchor_depth -= 1
            # br end tag: no-op
        elif m.group(4):  # ---- self-closing: only <br/> acts --------
            if act == _ACT_BR:
                line = " ".join("".join(buf).split())
                del buf[:]
                if line:
                    lines.append(line)
        else:  # ---- start tag ---------------------------------------
            if act == _ACT_DROP:
                drop_depth += 1
                tag = name.lower()
                if tag == "script" or tag == "style":
                    # raw text until the matching close (CDATA content)
                    if lower is None:
                        lower = html.lower()
                    close = lower.find("</" + tag, pos)
                    if close == -1:  # unterminated: swallow to EOF
                        pos = n
                    else:
                        gt = lower.find(">", close)
                        if drop_depth:  # the skipped close tag's effect
                            drop_depth -= 1
                        pos = n if gt == -1 else gt + 1
            elif act == _ACT_BR:
                line = " ".join("".join(buf).split())
                del buf[:]
                if line:
                    lines.append(line)
            elif act == _ACT_BLOCK or act == _ACT_BOILER:
                line = " ".join("".join(buf).split())
                del buf[:]
                if line:
                    lines.append(line)
                if lines:
                    blocks.append({
                        "text": "\n".join(lines), "n_chars": chars,
                        "link_chars": link_chars,
                        "boilerplate": boiler_depth > 0,
                    })
                    del lines[:]
                chars = link_chars = 0
                if act == _ACT_BOILER:
                    boiler_depth += 1
            else:  # _ACT_A
                anchor_depth += 1
    # final flush (matches sink._flush_block() after the loop)
    line = " ".join("".join(buf).split())
    if line:
        lines.append(line)
    if lines:
        blocks.append({
            "text": "\n".join(lines), "n_chars": chars,
            "link_chars": link_chars, "boilerplate": boiler_depth > 0,
        })
    return blocks


def segment_blocks(html: str) -> list[dict]:
    """Parse HTML into scored block records (step 1-2 above)."""
    try:
        return _fast_segment(html)
    except Exception:
        # Defensive: any scanner bug degrades to the stdlib parser rather
        # than poisoning the row.
        return _segment_blocks_htmlparser(html)


def block_is_content(block: dict) -> bool:
    """Text-density + link-density keep rule (step 3 above)."""
    if block["boilerplate"]:
        return False
    text = block["text"].strip()
    if len(text) < MIN_BLOCK_CHARS:
        return False
    n = block["n_chars"]
    if n <= 0:
        return False
    return (block["link_chars"] / n) <= MAX_LINK_DENSITY


def extract_main_text(html: str | bytes | None) -> str:
    """HTML -> main-content plain text (golden surface; byte-identity target).

    Accepts bytes (decoded utf-8, errors replaced) or str. Returns the kept
    blocks joined with newlines; empty string for unusable input.
    """
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    if not html:
        return ""
    blocks = segment_blocks(html)
    kept = [b["text"] for b in blocks if block_is_content(b)]
    return "\n".join(kept)


def block_records(url: str, payload) -> list[dict]:
    """Per-block scoring records — the Readability/Boilerpipe decision
    surface itself, one row per block: sizes, link density, the
    boilerplate-container flag, the keep verdict, and an md5 of the block
    text (the raw text stays out of the contract row; the md5 pins it).

    The caller gates the leg (non-PDF, non-empty payload); this function
    is total over any bytes/str and returns [] for undecodable-to-empty
    input. ``link_density`` is the exact double ``link_chars / n_chars``
    both the Spark batch and the serial twin compute with the same
    IEEE-754 division.
    """
    import hashlib

    if payload is None:
        return []
    if isinstance(payload, (bytes, bytearray, memoryview)):
        payload = bytes(payload).decode("utf-8", errors="replace")
    if not payload:
        return []
    out = []
    for i, b in enumerate(segment_blocks(payload)):
        n = b["n_chars"]
        out.append({
            "url": url,
            "block_idx": i,
            "n_lines": b["text"].count("\n") + 1,
            "n_chars": n,
            "link_chars": b["link_chars"],
            "link_density": (b["link_chars"] / n) if n > 0 else 0.0,
            "boilerplate": bool(b["boilerplate"]),
            "kept": block_is_content(b),
            "text_md5": hashlib.md5(b["text"].encode("utf-8")).hexdigest(),
        })
    return out


def block_stats(html: str | bytes | None) -> tuple[int, int]:
    """(blocks_kept, blocks_dropped) — extraction-metric counters (G5)."""
    if html is None:
        return (0, 0)
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    blocks = segment_blocks(html)
    kept = sum(1 for b in blocks if block_is_content(b))
    return kept, len(blocks) - kept
