"""PAN-doctype field extraction (operators P2-P7, P29 in SURVEY.md §2.3).

Fresh implementation of the semantics of the reference PAN extractor
(`/root/reference/project/core/extractors/pan_card.py`): first-match-wins
regex fallback chains, positional name extraction anchored on the PAN token,
legal-suffix name cleanup, and missing-field accounting. Divergence from the
reference (documented in SURVEY.md §7): ``missing_fields`` is *sorted* —
the reference's ``list(set(...))`` at `pan_card.py:176` is nondeterministic.
"""

from __future__ import annotations

import re

# P3 — 4th PAN char -> holder type (`pan_card.py:12-24`).
PAN_HOLDER_TYPES = {
    "P": "PERSON",
    "C": "COMPANY",
    "F": "FIRM",
    "L": "LLP",
    "T": "TRUST",
    "H": "HUF",
    "A": "AOP",
    "B": "BOI",
    "J": "ARTIFICIAL_JURIDICAL_PERSON",
    "G": "GOVERNMENT",
}

# P2 — ordered fallback chain (`pan_card.py:103-108`); first match wins.
PAN_PATTERNS = [
    re.compile(r"\b([A-Z]{5}\d{4}[A-Z])\b"),
    re.compile(r"PAN\s*:?\s*([A-Z]{5}\d{4}[A-Z])"),
    re.compile(r"PERMANENT ACCOUNT NUMBER\s*:?\s*([A-Z]{5}\d{4}[A-Z])"),
    re.compile(r"([A-HJKMNPR-Z]{5}[0-9]{4}[A-HJKMNPR-Z])"),
]

# P7 — date fallback chain (`pan_card.py:216-218`): DD/MM/YYYY then
# YYYY/MM/DD, separators [/-.] and 19xx/20xx years.
DATE_PATTERNS = [
    re.compile(r"\b(0[1-9]|[12][0-9]|3[01])[/\-.](0[1-9]|1[0-2])[/\-.]((19|20)\d{2})\b"),
    re.compile(r"\b((19|20)\d{2})[/\-.](0[1-9]|1[0-2])[/\-.](0[1-9]|[12][0-9]|3[01])\b"),
]

# P4 — header-word blacklist for person names (`pan_card.py:33-36`).
PERSON_NAME_BLACKLIST = (
    "INCOME TAX", "DEPARTMENT", "GOVT", "GOVERNMENT",
    "INDIA", "CARD", "NUMBER", "PERMANENT",
)
_NAME_CHARS = re.compile(r"[A-Z\s\.]+")

# P5 — company-line keyword / blacklist sets (`pan_card.py:124-129`).
COMPANY_BLACKLIST = ("INCOME TAX", "DEPARTMENT", "GOVT", "GOVERNMENT", "INDIA", "MINISTRY")
COMPANY_KEYWORDS = ("PRIVATE", "LIMITED", "PVT", "LTD", "LLP", "COMPANY", "CORPORATION")

# P6 — legal suffixes by priority (`pan_card.py:191-197`).
LEGAL_SUFFIXES = ("PRIVATE LIMITED", "PVT LTD", "PRIVATE LTD", "LIMITED", "LTD")
_TRAILING_NOISE = re.compile(r"\b[A-Z]{1,3}\d{0,3}$")


def pan_holder_type(pan: str) -> str | None:
    """P3: decode holder type from the 4th char (`pan_card.py:5-25`)."""
    if len(pan) != 10:
        return None
    return PAN_HOLDER_TYPES.get(pan[3])


def find_pan(text: str) -> str | None:
    """P2: first-match-wins over the 4-pattern chain (`pan_card.py:110-116`)."""
    for pat in PAN_PATTERNS:
        m = pat.search(text)
        if m:
            return m.group(1)
    return None


def _is_valid_person_name(line: str) -> bool:
    """Candidate validation (`pan_card.py:42-60`): no blacklist word, only
    ``[A-Z\\s.]``, 2-4 words each >= 3 chars, total length >= 10."""
    if any(bad in line for bad in PERSON_NAME_BLACKLIST):
        return False
    if not _NAME_CHARS.fullmatch(line):
        return False
    words = line.split()
    if not (2 <= len(words) <= 4):
        return False
    if any(len(w) < 3 for w in words):
        return False
    return len(line) >= 10


def extract_person_name(text: str, pan: str) -> str | None:
    """P4: positional anchor scan (`pan_card.py:27-86`) — lines *after* the
    PAN token first (stop at "FATHER"), then lines *before* it in reverse."""
    anchor = re.search(rf"\b{re.escape(pan)}\b", text)
    if not anchor:
        return None

    for line in text[anchor.end():].splitlines():
        line = line.strip()
        if "FATHER" in line:
            break
        if _is_valid_person_name(line):
            return re.sub(r"\s+", " ", line)

    for line in reversed(text[: anchor.start()].splitlines()):
        line = line.strip()
        if "FATHER" in line:
            break
        if _is_valid_person_name(line):
            return re.sub(r"\s+", " ", line)
    return None


def clean_company_name(name: str) -> str:
    """P6: truncate after the first legal suffix by priority; fallback strips
    one trailing short uppercase/number token (`pan_card.py:181-208`)."""
    name = re.sub(r"\s+", " ", name.strip())
    for suffix in LEGAL_SUFFIXES:
        idx = name.find(suffix)
        if idx != -1:
            return name[: idx + len(suffix)].strip()
    return _TRAILING_NOISE.sub("", name).strip()


def extract_company_name(text: str) -> str | None:
    """P5: first line after the PAN containing a company keyword and no
    blacklist word; fallback whole-text scan; strip non-``[A-Z\\s&.]``
    (`pan_card.py:123-151`)."""

    def valid(line: str) -> bool:
        if any(bad in line for bad in COMPANY_BLACKLIST):
            return False
        return any(key in line for key in COMPANY_KEYWORDS)

    candidate = None
    anchor = re.search(r"\b[A-Z]{5}\d{4}[A-Z]\b", text)
    if anchor:
        for line in text[anchor.end():].splitlines():
            if valid(line):
                candidate = re.sub(r"[^A-Z\s&\.]", "", line)
                break
    if not candidate:
        for line in text.splitlines():
            if valid(line):
                candidate = re.sub(r"[^A-Z\s&\.]", "", line)
                break
    return candidate


def extract_incorporation_date(text: str) -> str | None:
    """P7: first match over the two date patterns (`pan_card.py:210-226`)."""
    for pat in DATE_PATTERNS:
        m = pat.search(text)
        if m:
            return m.group(0)
    return None


def extract_pan_fields(raw_text: str) -> dict:
    """Full PAN extraction record (`pan_card.py:88-178` semantics).

    Returns ``{document_type, fields, missing_fields, debug}`` with
    ``missing_fields`` sorted (determinism divergence, see module doc).
    """
    text = raw_text.upper()
    fields: dict = {}
    missing: list[str] = []

    pan = find_pan(text)
    if pan:
        fields["pan"] = pan
        fields["pan_type"] = pan_holder_type(pan)
    else:
        missing.append("pan")

    pan_type = fields.get("pan_type")
    if pan_type == "COMPANY":
        company = extract_company_name(text)
        if company:
            fields["name"] = clean_company_name(company)
        else:
            missing.append("name")
    elif pan_type == "PERSON":
        person = extract_person_name(text, fields["pan"])
        if person:
            fields["name"] = person
        else:
            missing.append("name")
    else:
        missing.append("name")

    inc_date = extract_incorporation_date(text)
    if inc_date:
        fields["incorporation_date"] = inc_date
    else:
        missing.append("incorporation_date")

    return {
        "document_type": "PAN",
        "fields": fields,
        "missing_fields": sorted(set(missing)),
        "debug": {
            "raw_text_length": len(raw_text),
            "text_preview": raw_text[:200] if raw_text else "EMPTY OCR",
        },
    }
