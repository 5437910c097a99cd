"""Udyam-certificate field + table extraction (P30-P31, T1-T6 in SURVEY.md §2).

Fresh implementation of the semantics of the reference Udyam extractor
(`/root/reference/project/core/extractors/udhyam_certi.py:430-703` — the live
code; lines 1-428 there are commented-out history). Scalar fields are anchored
label regexes; the six tables are ``finditer``-driven extractions (the
reference's UDTF surface, SURVEY.md §2.4). Enterprise name is matched against
the RAW (non-uppercased) text per `udhyam_certi.py:460-463`.
"""

from __future__ import annotations

import re

UDYAM_NUMBER_RE = re.compile(r"UDYAM-[A-Z]{2}-\d{2}-\d{7}")
_PAN_RE = re.compile(r"\b([A-Z]{5}\d{4}[A-Z])\b")
_MOBILE_RE = re.compile(r"MOBILE\s+(\d{10})")
_EMAIL_RE = re.compile(r"EMAIL\s*:?\s+([A-Z0-9._%+-]+@[A-Z0-9.-]+\.[A-Z]{2,})")
_ENTERPRISE_NAME_RE = re.compile(r"NAME OF ENTERPRISE\s*[:\-]?\s*(.+?)\n", re.IGNORECASE)


def _labeled_date(text: str, label: str) -> str | None:
    """Labeled DD/MM/YYYY date (`udhyam_certi.py:485-490`)."""
    m = re.search(rf"{label}.*?(\d{{2}}/\d{{2}}/\d{{4}})", text)
    return m.group(1) if m else None


# -- T1-T6: table extractors (regex-finditer -> rows) ------------------------

_CLASSIFICATION_RE = re.compile(r"(\d+)\s+(\d{4}-\d{2})\s+(MICRO|SMALL|MEDIUM)\s+(\d{2}/\d{2}/\d{4})")
_EMPLOYMENT_RE = re.compile(
    r"EMPLOYMENT DETAILS\s+MALE\s+FEMALE\s+OTHER\s+TOTAL\s+(\d+)\s+(\d+)\s+(\d+)\s+(\d+)"
)
_INVESTMENT_RE = re.compile(
    r"(\d+)\s+(\d{4}-\d{2})\s+(MICRO|SMALL|MEDIUM)\s+([\d.]+)\s+([\d.]+)\s+([\d.]+)\s+"
    r"([\d.]+)\s+([\d.]+)\s+([\d.]+)\s+(YES|NO)\s+ITR\s*-?\s*([\d,\s]+)"
)
_UNITS_SECTION_RE = re.compile(r"UNIT\(S\) DETAILS(.*?)OFFICIAL ADDRESS OF ENTERPRISE", re.S)
_UNITS_ROW_RE = re.compile(
    r"(\d+)\s+(M/S\s+[A-Z\s]+?)\s+(SURVEY NO:|FLAT|PLOT)\s*:?\s*([\d,\s&A-Z]+)\s+"
    r"([A-Z][A-Z\s]+?)\s+([A-Z][A-Z\s]+?)\s+([A-Z][A-Z]+)\s+([A-Z][A-Z\s]+?)\s+"
    r"(\d{6})\s+(GUJARAT|[A-Z]+)\s+([A-Z]+)"
)
_NIC_RE = re.compile(
    r"(\d+)\s+(\d{2})\s*-\s*([A-Z][^\d]+?)\s+(\d{4})\s*-\s*([A-Z][^\d]+?)\s+"
    r"(\d{5})\s*-\s*([^\n]+?)\s+(MANUFACTURING|SERVICE)"
)
_BANK_RE = re.compile(
    r"BANK DETAILS\s+BANK NAME\s+IFS CODE\s+BANK ACCOUNT NUMBER\s+"
    r"([A-Z][A-Z\s&.]+?)\s+([A-Z]{4}0[A-Z0-9]{6})\s+(\d+)"
)


def extract_classification_table(text: str) -> list:
    """T1 (`udhyam_certi.py:582-596`)."""
    return [
        {"sno": m.group(1), "classification_year": m.group(2),
         "enterprise_type": m.group(3), "classification_date": m.group(4)}
        for m in _CLASSIFICATION_RE.finditer(text)
    ]


def extract_employment_table(text: str) -> dict:
    """T2 (`udhyam_certi.py:599-612`) — single header-anchored int row."""
    m = _EMPLOYMENT_RE.search(text)
    if not m:
        return {}
    return {"male": int(m.group(1)), "female": int(m.group(2)),
            "other": int(m.group(3)), "total": int(m.group(4))}


def extract_investment_table(text: str) -> list:
    """T3 (`udhyam_certi.py:615-636`) — float coercion on 6 numeric cols."""
    rows = []
    for m in _INVESTMENT_RE.finditer(text):
        rows.append({
            "sno": m.group(1),
            "financial_year": m.group(2),
            "enterprise_type": m.group(3),
            "wdv": float(m.group(4)),
            "exclusion_cost": float(m.group(5)),
            "net_investment": float(m.group(6)),
            "total_turnover": float(m.group(7)),
            "export_turnover": float(m.group(8)),
            "net_turnover": float(m.group(9)),
            "itr_filled": m.group(10) == "YES",
            "itr_type": m.group(11).strip(),
        })
    return rows


def extract_units_table(text: str) -> list:
    """T4 (`udhyam_certi.py:639-663`) — scope-then-match positional rows."""
    section = _UNITS_SECTION_RE.search(text)
    if not section:
        return []
    rows = []
    for m in _UNITS_ROW_RE.finditer(section.group(1)):
        rows.append({
            "sno": m.group(1), "unit_name": m.group(2).strip(),
            "flat": m.group(4).strip(), "building": m.group(5).strip(),
            "village_town": m.group(6).strip(), "block": m.group(7).strip(),
            "road": m.group(8).strip(), "pin": m.group(9),
            "state": m.group(10).strip(), "district": m.group(11).strip(),
        })
    return rows


def extract_nic_table(text: str) -> list:
    """T5 (`udhyam_certi.py:666-686`) — first-occurrence dedup on 5-digit code."""
    rows = []
    seen: set = set()
    for m in _NIC_RE.finditer(text):
        code5 = m.group(6)
        if code5 in seen:
            continue
        seen.add(code5)
        rows.append({
            "sno": m.group(1),
            "nic_2_digit": f"{m.group(2)} - {m.group(3).strip()}",
            "nic_4_digit": f"{m.group(4)} - {m.group(5).strip()}",
            "nic_5_digit": f"{m.group(6)} - {m.group(7).strip()}",
            "activity": m.group(8),
        })
    return rows


def extract_bank_details(text: str) -> dict:
    """T6 (`udhyam_certi.py:689-702`)."""
    m = _BANK_RE.search(text)
    if not m:
        return {}
    return {"bank_name": m.group(1).strip(), "ifsc_code": m.group(2).strip(),
            "account_number": m.group(3).strip()}


# -- P31: official address ----------------------------------------------------

_ADDR_SECTION_RE = re.compile(
    # "OFFIC[AI]AL" — the reference deliberately matches the certificate's
    # typo'd header too (`udhyam_certi.py:519-523`).
    r"OFFIC[AI]AL ADDRESS OF ENTERPRISE(.*?)(?:DATE OF INCORPORATION|NATIONAL INDUSTRY)",
    re.S,
)
# Anchored sub-field regexes (`udhyam_certi.py:528-577`), data-driven.
_ADDR_FIELD_SPECS: list[tuple] = [
    ("flat_no", re.compile(r"(?:FLAT/DOOR/BLOCK|FLAT)\s+(?:NO\.?|NUMBER)?\s+([A-Z0-9-]+)")),
    ("building", re.compile(r"NAME OF\s+PREMISES[/\s]+BUILDING\s+([A-Z][A-Z\s]+?)(?:VILLAGE|TOWN)")),
    ("village_town", re.compile(r"VILLAGE/TOWN\s+([A-Z][A-Z\s]+?)(?:BLOCK|\s+BLOCK)")),
    ("block", re.compile(r"BLOCK\s+([A-Z][A-Z\s]+?)(?:ROAD|STREET)")),
    ("road", re.compile(r"(?:ROAD/STREET/LANE|ROAD)\s+([A-Z][A-Z\s]+?)(?:CITY)")),
    ("city", re.compile(r"CITY\s+([A-Z][A-Z]+)\s+STATE")),
    ("state", re.compile(r"STATE\s+(GUJARAT|[A-Z]+(?:\s+[A-Z]+)?)\s+DISTRICT")),
]
_ADDR_DISTRICT_PIN_RE = re.compile(r"DISTRICT\s+([A-Z]+(?:\s+[A-Z]+)?)\s*,?\s*(?:PIN|Pin)\s*:?\s*(\d{6})")


def extract_official_address(text: str) -> dict:
    """P31: scope the address section, apply anchored sub-field regexes."""
    section = _ADDR_SECTION_RE.search(text)
    if not section:
        return {}
    addr_text = section.group(1)
    address: dict = {}
    for key, pat in _ADDR_FIELD_SPECS:
        m = pat.search(addr_text)
        if m:
            address[key] = m.group(1).strip()
    m = _ADDR_DISTRICT_PIN_RE.search(addr_text)
    if m:
        address["district"] = m.group(1).strip()
        address["pin"] = m.group(2).strip()
    m = _MOBILE_RE.search(addr_text)
    if m:
        address["mobile"] = m.group(1)
    m = _EMAIL_RE.search(addr_text)
    if m:
        address["email"] = m.group(1)
    return address


def extract_udyam_fields(raw_text: str) -> dict:
    """Full Udyam record (`udhyam_certi.py:435-512` semantics):
    {document_type, fields, tables, flags, missing_fields}."""
    raw = raw_text
    text = raw_text.upper()

    fields: dict = {}
    flags: list = []
    missing: list = []

    m = UDYAM_NUMBER_RE.search(text)
    if m:
        fields["udyam_number"] = m.group()
    else:
        missing.append("udyam_number")

    m = _ENTERPRISE_NAME_RE.search(raw)  # raw, NOT uppercased
    if m:
        fields["enterprise_name"] = m.group(1).strip()
    else:
        missing.append("enterprise_name")

    m = _PAN_RE.search(text)
    if m:
        fields["pan"] = m.group(1)
    else:
        missing.append("pan")

    m = _MOBILE_RE.search(text)
    if m:
        fields["mobile"] = m.group(1)
    m = _EMAIL_RE.search(text)
    if m:
        fields["email"] = m.group(1)

    fields["incorporation_date"] = _labeled_date(text, "DATE OF INCORPORATION")
    fields["commencement_date"] = _labeled_date(text, "DATE OF COMMENCEMENT")

    # Extraction-time flag, duplicated by rule R12 at validation time — both
    # kept to match the reference (`udhyam_certi.py:493-499`).
    if (fields.get("incorporation_date") and fields.get("commencement_date")
            and fields["incorporation_date"] == fields["commencement_date"]):
        flags.append({"code": "INCORPORATION_EQUALS_COMMENCEMENT", "severity": "HIGH"})

    fields["official_address"] = extract_official_address(text)

    tables = {
        "classification_history": extract_classification_table(text),
        "employment_details": extract_employment_table(text),
        "investment_details": extract_investment_table(text),
        "units_details": extract_units_table(text),
        "nic_codes": extract_nic_table(text),
        "bank_details": extract_bank_details(text),
    }

    return {
        "document_type": "UDYAM",
        "fields": fields,
        "tables": tables,
        "flags": flags,
        "missing_fields": missing,
    }
