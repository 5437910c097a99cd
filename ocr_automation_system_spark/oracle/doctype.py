"""Doctype dispatch + canonical extraction record (the oracle's end-to-end
path; reference lifecycle EP1/EP2 in SURVEY.md §3).

``extract_document`` is the single-node golden function: payload bytes ->
one flat record. The Spark pipeline (``operators/extract.py``) runs this
exact function inside ``mapInPandas`` batches, which is what guarantees
byte-identical ``extracted_text`` and ``fields_json`` per url.

Leg selection (reference F2, `core/extractor.py:51-78`):
* payload starts with ``%PDF`` -> PDF leg: per-page usability gate; if any
  page passes, keep only usable pages (source ``pdf``); else fall back to the
  expensive leg over all pages (source ``ocr`` — OCR itself is stubbed, see
  ``pdf_stub``). Pages are space-joined per `project/main.py:8`.
* otherwise -> HTML leg: boilerplate-strip main-content extraction; the
  whole-document usability gate marks the row unusable when it fails.

Exception isolation (`verification_engine/engine.py:105-114` contract):
any per-row error is captured into ``doc_status='poison'`` + ``error`` —
never raised."""

from __future__ import annotations

import json
import re

from .gate import is_text_usable
from .gst import extract_gst_fields
from .html_extract import block_is_content, extract_main_text, segment_blocks
from .ocr_stub import ocr_pages
from .pan import extract_pan_fields
from .pdf_stub import extract_pdf_pages, is_pdf_payload
from .udyam import extract_udyam_fields

DOC_STATUS_OK = "ok"
DOC_STATUS_UNUSABLE = "unusable"
DOC_STATUS_POISON = "poison"

_UDYAM_ID = re.compile(r"UDYAM-[A-Z]{2}-\d{2}-\d{7}")
_GSTIN_ID = re.compile(r"\b\d{2}[A-Z]{5}\d{4}[A-Z][A-Z\d]Z[A-Z\d]\b")
_GST_HEADER = re.compile(r"GOODS AND SERVICES TAX|FORM GST", re.IGNORECASE)
_PAN_ID = re.compile(r"\b[A-Z]{5}\d{4}[A-Z]\b")

#: Single-scan detector: one pass over the uppercased page instead of up
#: to four (UNKNOWN pages — the overwhelming majority of a web corpus —
#: paid all four full-text scans). Equivalence to the four separate
#: searches (fuzz-pinned by tests/test_oracle_extractors.py::
#: test_detect_document_type_single_scan_equivalence):
#: * IGNORECASE on _GST_HEADER is a no-op over text.upper();
#: * the alternatives' first chars are disjoint (digit / U / G|F /
#:   letter), and every span an alternative consumes is alnum-or-space
#:   text that no other alternative can start inside (GSTIN/PAN carry
#:   leading \b and ids are boundary-free inside; "UDYAM-" needs a
#:   hyphen no other span contains), so non-overlapping finditer sees
#:   exactly the matches the separate scans see.
_ANY_DOC_ID = re.compile(
    r"(?P<udyam>UDYAM-[A-Z]{2}-\d{2}-\d{7})"
    r"|(?P<gstin>\b\d{2}[A-Z]{5}\d{4}[A-Z][A-Z\d]Z[A-Z\d]\b)"
    r"|(?P<gsthdr>GOODS AND SERVICES TAX|FORM GST)"
    r"|(?P<pan>\b[A-Z]{5}\d{4}[A-Z]\b)")


def detect_document_type(text: str) -> str:
    """Doctype gate. Order matters: Udyam certificates contain a PAN and GST
    numbers embed one, so the most specific id wins (Udyam > GST > PAN)."""
    upper = text.upper()
    saw_gst = saw_pan = False
    for m in _ANY_DOC_ID.finditer(upper):
        kind = m.lastgroup
        if kind == "udyam":
            return "UDYAM"
        if kind == "pan":
            saw_pan = True
        else:  # gstin or gsthdr
            saw_gst = True
    if saw_gst:
        return "GST_CERTIFICATE"
    if saw_pan:
        return "PAN"
    return "UNKNOWN"


def canonical_json(obj) -> str:
    """Deterministic JSON for the golden ``fields_json`` column: insertion
    order fixed by the extractors, ``ensure_ascii=False`` matching the
    reference sinks (`project/test_pan_extraction.py:27-28`)."""
    return json.dumps(obj, ensure_ascii=False, separators=(", ", ": "))


def _entity_keys(doc_type: str, fields: dict) -> dict:
    """Flat join keys for the cross-document validation stage (A5-A7 shaped
    projections; the full adapters live in ``operators/adapters.py``)."""
    keys = {"pan": "", "gstin": "", "udyam": "", "name": "", "date": "", "pin": ""}
    if doc_type == "PAN":
        keys["pan"] = fields.get("pan") or ""
        keys["name"] = fields.get("name") or ""
        keys["date"] = fields.get("incorporation_date") or ""
    elif doc_type == "GST_CERTIFICATE":
        gstin = fields.get("gst_number") or ""
        keys["gstin"] = gstin
        # P10: PAN derived from GSTIN chars 3..12 (`adapters/gst_adapter.py:38-40`).
        keys["pan"] = gstin[2:12].upper() if len(gstin) == 15 else ""
        keys["name"] = fields.get("name") or ""
        addr = fields.get("principal_address") or {}
        if isinstance(addr, dict):
            keys["pin"] = addr.get("pin_code") or ""
    elif doc_type == "UDYAM":
        keys["udyam"] = fields.get("udyam_number") or ""
        keys["pan"] = fields.get("pan") or ""
        keys["name"] = fields.get("enterprise_name") or ""
        keys["date"] = fields.get("incorporation_date") or ""
        addr = fields.get("official_address") or {}
        if isinstance(addr, dict):
            keys["pin"] = addr.get("pin") or ""
    return keys


def extract_fields_for_type(doc_type: str, text: str) -> dict:
    """Per-doctype extraction dispatch (EP1/EP2 step 4)."""
    if doc_type == "PAN":
        return extract_pan_fields(text)
    if doc_type == "GST_CERTIFICATE":
        return extract_gst_fields(text)
    if doc_type == "UDYAM":
        return extract_udyam_fields(text)
    # Unsupported doctype (reference fixture analogues: Aadhaar/GPCB docs
    # have no extractor — SURVEY.md §5): everything missing.
    return {"document_type": "UNKNOWN", "fields": {}, "missing_fields": ["document_type"]}


def empty_record(url: str, status: str, error: str = "") -> dict:
    return {
        "url": url,
        "doc_status": status,
        "source_leg": "none",
        "document_type": "UNKNOWN",
        "extracted_text": "",
        "fields_json": "{}",
        "tables_json": "{}",
        "missing_fields": [],
        "entity_pan": "",
        "entity_gstin": "",
        "entity_udyam": "",
        "entity_name": "",
        "entity_date": "",
        "entity_pin": "",
        "blocks_kept": 0,
        "blocks_dropped": 0,
        "error": error,
    }


def extract_document(url: str, payload: bytes | None) -> dict:
    """Single-node golden path: payload -> flat extraction record."""
    try:
        if payload is None or len(payload) == 0:
            return empty_record(url, DOC_STATUS_UNUSABLE, "empty payload")

        blocks_kept = blocks_dropped = 0
        if is_pdf_payload(payload):
            pages = extract_pdf_pages(bytes(payload))
            usable = [p for p in pages if is_text_usable(p.get("text", ""))]
            if usable:
                source_leg = "pdf"
                text = " ".join(p["text"] for p in usable)
                if not is_text_usable(text):
                    return empty_record(url, DOC_STATUS_UNUSABLE, "pdf text failed gate")
            else:
                # OCR fallback leg (F2): the expensive pass re-recognizes
                # ALL pages (S2/S3 + F3 confidence filter in ocr_stub). The
                # reference does NOT re-gate OCR output
                # (`core/extractor.py:69-78` returns the records as-is).
                source_leg = "ocr"
                text = " ".join(p["text"] for p in ocr_pages(pages))
                if not text.strip():
                    return empty_record(url, DOC_STATUS_UNUSABLE, "ocr produced no text")
        else:
            source_leg = "html"
            html = bytes(payload).decode("utf-8", errors="replace")
            blocks = segment_blocks(html)
            kept = [b["text"] for b in blocks if block_is_content(b)]
            blocks_kept = len(kept)
            blocks_dropped = len(blocks) - blocks_kept
            text = "\n".join(kept)
            if not is_text_usable(text):
                rec = empty_record(url, DOC_STATUS_UNUSABLE, "html text failed gate")
                rec["blocks_kept"] = blocks_kept
                rec["blocks_dropped"] = blocks_dropped
                return rec

        doc_type = detect_document_type(text)
        result = extract_fields_for_type(doc_type, text)
        fields = result.get("fields", {})
        keys = _entity_keys(doc_type, fields)

        return {
            "url": url,
            "doc_status": DOC_STATUS_OK,
            "source_leg": source_leg,
            "document_type": doc_type,
            "extracted_text": text,
            "fields_json": canonical_json(fields),
            "tables_json": canonical_json(result.get("tables", {})),
            "missing_fields": list(result.get("missing_fields", [])),
            "entity_pan": keys["pan"],
            "entity_gstin": keys["gstin"],
            "entity_udyam": keys["udyam"],
            "entity_name": keys["name"],
            "entity_date": keys["date"],
            "entity_pin": keys["pin"],
            "blocks_kept": blocks_kept,
            "blocks_dropped": blocks_dropped,
            "error": "",
        }
    except Exception as exc:  # poison row: record, never raise
        return empty_record(url, DOC_STATUS_POISON, f"{type(exc).__name__}: {exc}")
