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


def alpha_ratio(text: str) -> float:
    """Fraction of characters that are Unicode letters (0.0 for empty)."""
    if not text:
        return 0.0
    return sum(c.isalpha() for c in text) / max(len(text), 1)


def is_text_usable(text: str) -> bool:
    """True iff the text passes the reference's usability gate.

    Reference: `core/extractor.py:34-48` (len(strip) >= 50 and
    alpha_ratio >= 0.4, computed on the *stripped* text).
    """
    text = text.strip()
    if len(text) < MIN_USABLE_CHARS:
        return False
    return alpha_ratio(text) >= MIN_ALPHA_RATIO
