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
# search loop + raw-text skips for script/style, feeding the identical
# block state machine — same blocks, byte for byte (test_fast_segmenter).
#
# Parity strategy (three tiers):
#   1. CLEAN tokens — well-formed comments/doctypes/tags where the big
#      token regex's span and semantics provably equal html.parser's —
#      are handled inline (the common case on real pages).
#   2. Tag-shaped constructs outside the clean form (odd name chars,
#      unquoted-value edge cases, bogus end tags like ``</ div>``) go
#      through exact mirrors of ``parse_starttag``/``parse_endtag``/
#      ``parse_marked_section`` built on html.parser's OWN compiled
#      regexes, so the span/name math cannot drift from the stdlib.
#   3. Anything html.parser would treat via its incomplete-at-EOF
#      raw-data tail, malformed-tag raw emission, or error() paths
#      raises ``_Anomaly`` and the WHOLE document re-parses on the
#      reference parser — byte-identity by construction, at reference
#      speed, only for pathological inputs (hypothesis-discovered:
#      truncated markup like ``'<!'`` at EOF).

import re as _re
from html import unescape as _unescape

import _markupbase as _mb
import html.parser as _hp


class _Anomaly(Exception):
    """Markup construct outside the fast scanner's provable subset."""


_TOKEN_RE = _re.compile(
    r"<!--.*?--\s*>"                           # 1 clean comment (stdlib close)
    r"|<!--"                                   # 2 unterminated comment
    r"|<!\["                                   # 3 marked section (handler)
    r"|<[!?][^>]*>"                            # 4 doctype/bogus/PI: first '>'
    r"|<[!?]"                                  # 5 unterminated decl/PI
    r"|<([a-zA-Z][a-zA-Z0-9:._-]*)"            # 6 clean start tag: (1)=name
    r"(?=[\t\n\r\f />])"                       #   stdlib name-boundary chars
    r"((?:[\t\n\r\f ]+[^\s/>=]+"               #   (2)=attrs: WS+ name
    r"(?:[\t\n\r\f ]*=[\t\n\r\f ]*"            #   optional = value
    r"(?:\"[^\"]*\"|'[^']*'"                   #   quoted value
    r"|[^\s>\"'=/]+(?=[\t\n\r\f >])))?)*)"     #   bare value (not before '/')
    r"[\t\n\r\f ]*(/?)>"                       # (3)=self-closing slash
    r"|</([a-zA-Z][a-zA-Z0-9:._-]*)"           # 7 clean end tag: (4)=name
    r"[\t\n\r\f ]*>"                           #   (same span as endtagfind)
    r"|<[a-zA-Z]"                              # 8 non-clean start tag (handler)
    r"|</",                                    # 9 non-clean end tag (handler)
    _re.S,
)
#: script/style content is raw text until the matching close tag
#: (HTMLParser CDATA_CONTENT_ELEMENTS).
_RAWTEXT_TAGS = ("script", "style")

#: ``</\s*script`` / ``</\s*style`` — html.parser's cdata-mode
#: ``interesting`` pattern (set_cdata_mode), verbatim semantics.
_CDATA_CLOSE = {t: _re.compile(r"</\s*%s" % t, _re.IGNORECASE)
                for t in _RAWTEXT_TAGS}

#: check_for_whole_start_tag's "end of input in or before attribute
#: value" character class, verbatim.
_NEXT_INCOMPLETE = "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _starttag_exact(html: str, i: int) -> tuple[str, bool, int]:
    """(tag, self_closing, endpos) for a start tag at ``i``, mirroring
    ``HTMLParser.parse_starttag`` + ``check_for_whole_start_tag`` on the
    stdlib's own compiled regexes. Raises ``_Anomaly`` exactly where the
    stdlib would defer (incomplete at EOF), emit the raw tag slice as
    data (malformed innards), or call ``error()``."""
    m = _hp.locatestarttagend_tolerant.match(html, i)
    if m is None:  # stdlib: AssertionError -> salvage-abort
        raise _Anomaly
    j = m.end()
    nxt = html[j:j + 1]
    if nxt == ">":
        endpos = j + 1
    elif nxt == "/" and html.startswith("/>", j):
        endpos = j + 2
    else:
        # '', letters/=// (incomplete), lone '/', or the return-j
        # malformed path — all end in raw data or error() upstream.
        raise _Anomaly
    mt = _hp.tagfind_tolerant.match(html, i + 1)
    if mt is None:
        raise _Anomaly
    tag = mt.group(1).lower()
    k = mt.end()
    while k < endpos:
        ma = _hp.attrfind_tolerant.match(html, k)
        if ma is None:
            break
        k = ma.end()
    end = html[k:endpos].strip()
    if end == ">":
        return tag, False, endpos
    if end == "/>":
        return tag, True, endpos
    raise _Anomaly  # stdlib: handle_data(rawdata[i:endpos]) raw


def _endtag_exact(html: str, i: int) -> tuple[str | None, int]:
    """(tag_or_None, endpos) for ``</`` at ``i``, mirroring
    ``HTMLParser.parse_endtag`` outside cdata mode: full ``endtagfind``
    match, tolerant-name discarded-junk form, silent ``</>``, and the
    bogus-comment fallthrough. ``None`` = no endtag callback fires."""
    mgt = _hp.endendtag.search(html, i + 1)
    if mgt is None:  # incomplete at EOF -> raw-data tail path
        raise _Anomaly
    m = _hp.endtagfind.match(html, i)
    if m is not None:
        return m.group(1).lower(), m.end()
    mn = _hp.tagfind_tolerant.match(html, i + 2)
    if mn is not None:
        # name can't contain '>', so find() is >= 0 here (endendtag hit)
        return mn.group(1).lower(), html.find(">", mn.end()) + 1
    if html.startswith("</>", i):
        return None, i + 3
    g = html.find(">", i + 2)  # parse_bogus_comment: no state change
    if g < 0:
        raise _Anomaly
    return None, g + 1


def _marked_exact(html: str, i: int) -> int:
    """Span end of a ``<![`` marked section at ``i``, mirroring
    ``_markupbase.parse_marked_section`` (``unknown_decl`` is a no-op in
    the block parser, so only the resume position matters)."""
    m = _mb._declname_match(html, i + 3)  # bound .match in _markupbase
    if m is None:  # _scan_name error() -> salvage-abort
        raise _Anomaly
    if m.end() == len(html):  # name runs to end of buffer -> incomplete
        raise _Anomaly
    name = m.group().strip().lower()
    if name in ("temp", "cdata", "ignore", "include", "rcdata"):
        mc = _mb._markedsectionclose.search(html, i + 3)
    elif name in ("if", "else", "endif"):
        mc = _mb._msmarkedsectionclose.search(html, i + 3)
    else:  # unknown status keyword -> error()
        raise _Anomaly
    if mc is None:  # unterminated -> raw-data tail path
        raise _Anomaly
    return mc.end()


def _cdata_skip(html: str, pos: int, tag: str) -> tuple[int, bool]:
    """(resume_pos, close_tag_fired) across script/style raw content,
    mirroring html.parser cdata mode: the ``</\\s*tag`` interesting
    pattern, ``parse_endtag``'s stay-in-cdata branches for bogus or
    wrong-name closes, and silent swallow-to-EOF when unterminated.
    The content itself is dropped by the caller (DROP_TAGS), so only
    the resume position and the close-fired flag are observable."""
    search = _CDATA_CLOSE[tag].search
    i = pos
    while True:
        m = search(html, i)
        if m is None:
            return len(html), False  # unterminated: swallowed, stays open
        j = m.start()
        mgt = _hp.endendtag.search(html, j + 1)
        if mgt is None:  # '</tag' then EOF without '>': rest swallowed
            return len(html), False
        mfull = _hp.endtagfind.match(html, j)
        if mfull is not None and mfull.group(1).lower() == tag:
            return mfull.end(), True
        # bogus / wrong-name close: raw data (dropped), stay in cdata
        i = mgt.end()


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
    """Fast scanner with reference fallback: clean markup runs through
    `_fast_segment_strict`; any `_Anomaly` (markup html.parser handles
    via its raw-tail / malformed / error paths) re-parses the whole
    document on the reference parser. Byte-identical to
    `_segment_blocks_htmlparser` on EVERY input by the A/B suite
    (tests/test_fast_segmenter.py: adversarial cases + 800-doc corpus +
    hypothesis fuzzers)."""
    try:
        return _fast_segment_strict(html)
    except _Anomaly:
        return _segment_blocks_htmlparser(html)


def _fast_segment_strict(html: str) -> list[dict]:
    """One search-loop walk with the _BlockParser state machine INLINED —
    ~450k Python callback invocations per 3k thin pages were pure call
    overhead (57% of extraction time was segmentation). Raises
    ``_Anomaly`` for constructs outside the provable-parity subset
    (see the tier comment above `_TOKEN_RE`)."""
    blocks: list[dict] = []
    lines: list[str] = []
    buf: list[str] = []
    chars = link_chars = 0
    drop_depth = anchor_depth = boiler_depth = 0
    search = _TOKEN_RE.search
    unescape = _unescape
    act_of = _TAG_ACTION.get
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
        name = m.group(1)
        if name is not None:  # ---- clean start tag (the hot path) ----
            pos = m.end()
            tag = name.lower()
            self_closing = m.group(3) == "/"
        else:
            etag = m.group(4)
            if etag is not None:  # ---- clean end tag (hot path) ------
                pos = m.end()
                etag = etag.lower()
            else:
                t = m.group(0)
                c1 = t[1:2]
                if c1 == "/":  # non-clean end tag: exact stdlib mirror
                    etag, pos = _endtag_exact(html, m.start())
                    if etag is None:
                        continue  # </> / bogus comment: no callback
                elif t.startswith("<!["):  # marked section
                    pos = _marked_exact(html, m.start())
                    continue
                elif t.startswith("<!--"):  # comment: clean or anomaly
                    if len(t) == 4:
                        raise _Anomaly  # unterminated -> raw-tail path
                    pos = m.end()
                    continue
                elif c1 == "!" or c1 == "?":  # doctype / bogus / PI
                    if not t.endswith(">"):
                        raise _Anomaly  # unterminated -> raw-tail path
                    pos = m.end()
                    continue
                else:  # non-clean start tag: exact stdlib mirror
                    tag, self_closing, pos = _starttag_exact(
                        html, m.start())
                    etag = None
            if etag is not None:  # ---- end-tag state machine ---------
                act = act_of(etag)
                if act is None:
                    continue
                if act == _ACT_DROP:
                    if drop_depth:
                        drop_depth -= 1
                elif act == _ACT_BLOCK or act == _ACT_BOILER:
                    # _flush_block, inlined (boilerplate read pre-depth--)
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
                continue
        # ---- start tag state machine (clean + non-clean paths) ------
        act = act_of(tag)
        if act is None:
            continue  # unknown tag: every callback falls through
        if self_closing:  # handle_startendtag: only <br/> acts
            if act == _ACT_BR:
                line = " ".join("".join(buf).split())
                del buf[:]
                if line:
                    lines.append(line)
        elif act == _ACT_DROP:
            drop_depth += 1
            if tag == "script" or tag == "style":
                # raw text until the matching close (cdata mode)
                pos, closed = _cdata_skip(html, pos, tag)
                if closed and drop_depth:  # the close tag's endtag effect
                    drop_depth -= 1
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
