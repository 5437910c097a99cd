"""Text-usability gate (operator F1 in SURVEY.md §2.2).

Semantics match the reference's source-selection gate
(`/root/reference/project/core/extractor.py:34-48`): a text leg is usable iff
the stripped text has >= 50 characters AND the ratio of Unicode-letter
characters (Python ``str.isalpha``) to total length is >= 0.4.

Kept in pure Python (not a Spark ``rlike``) because ``str.isalpha`` is
Unicode-letter semantics (``\\p{L}``), and the gate decides which extraction
leg produced the golden text — it must be byte-faithful to the oracle.
"""

from __future__ import annotations

MIN_USABLE_CHARS = 50
MIN_ALPHA_RATIO = 0.4

_ASCII_LETTERS = b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


def _count_alpha(text: str) -> int:
    """Count of chars where ``str.isalpha()`` is True — C-speed fast path.

    For ASCII text (the overwhelming case) isalpha is exactly [A-Za-z], so
    deleting those bytes and diffing lengths gives the count via two
    C-level calls instead of a per-character Python loop (the profiled #1
    hot spot on ~100KB pages: 3.5s of a 6.3s batch). Non-ASCII falls back
    to the exact per-char check, so Unicode-letter semantics (\\p{L}) are
    preserved byte-for-byte."""
    try:
        b = text.encode("ascii")
    except UnicodeEncodeError:
        return sum(map(str.isalpha, text))
    return len(b) - len(b.translate(None, _ASCII_LETTERS))


def alpha_ratio(text: str) -> float:
    """Fraction of characters that are Unicode letters (0.0 for empty)."""
    if not text:
        return 0.0
    return _count_alpha(text) / max(len(text), 1)


def is_text_usable(text: str) -> bool:
    """True iff the text passes the reference's usability gate.

    Reference: `core/extractor.py:34-48` (len(strip) >= 50 and
    alpha_ratio >= 0.4, computed on the *stripped* text).
    """
    text = text.strip()
    if len(text) < MIN_USABLE_CHARS:
        return False
    return alpha_ratio(text) >= MIN_ALPHA_RATIO
