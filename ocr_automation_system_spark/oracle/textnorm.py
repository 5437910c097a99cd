"""Optional heading/sentence line-merge normalizer (operator P32,
`/root/reference/project/core/text_normalizer.py:3-48`).

Dead code in the reference — the import is commented out at
`core/extractor.py:30` and the live path returns raw page text — so this
stage is OFF by default (``extract_document`` never calls it) and exists to
complete the operator inventory: enable it between text assembly and field
extraction when a corpus needs it.

Semantics (re-expressed, not copied): consecutive all-uppercase lines of
<= 5 words merge into one heading line; a line continues the previous
buffered sentence unless that buffer already ends with ``.``/``:``/``;``;
blank lines vanish; every output line is whitespace-collapsed."""

from __future__ import annotations

import re

_WS = re.compile(r"\s+")
_TERMINATORS = (".", ":", ";")


def _is_heading(line: str) -> bool:
    return line.isupper() and len(line.split()) <= 5


def normalize_text(raw_text: str) -> str:
    """P32: merge split headings and unterminated sentences across lines."""
    if not raw_text or not isinstance(raw_text, str):
        return ""

    merged: list[str] = []
    sentence = ""
    heading_run: list[str] = []
    for line in (ln.strip() for ln in raw_text.splitlines()):
        if not line:
            continue
        if _is_heading(line):
            heading_run.append(line)
            continue
        if heading_run:
            merged.append(" ".join(heading_run))
            heading_run = []
        if not sentence:
            sentence = line
        elif sentence.endswith(_TERMINATORS):
            merged.append(sentence)
            sentence = line
        else:
            sentence += " " + line
    if heading_run:
        merged.append(" ".join(heading_run))
    if sentence:
        merged.append(sentence)

    return "\n".join(_WS.sub(" ", ln).strip() for ln in merged)
