"""OCR fallback leg (operators S2/S3/F3 in SURVEY.md §2.1-2.2).

The reference renders pages at dpi=300 (`/root/reference/project/core/
pdf_images.py:4-14`), caps the longest side at 2500 px, runs PaddleOCR and
keeps lines with score > 0.25 (`core/ocr_engine.py:13-23,26-70`). PaddleOCR
isn't in this container, so — per the build instructions — the *inference*
call is a deterministic fake behind the same knobs, while every piece of
surrounding plumbing is real and tested:

* the render-geometry math (dpi scaling, max-side cap),
* the per-line confidence filter (F3: ``score > 0.25 and line.strip()``),
* the model-singleton pattern (module-level lazy init, one per Python
  worker — `core/ocr_engine.py:6-11`; amortized by
  ``spark.python.worker.reuse``),
* newline-joined page records ``{page, source:'ocr', text}``
  (`core/ocr_engine.py:64-68`).

Swapping in real PaddleOCR changes only ``_StubModel.infer``.
"""

from __future__ import annotations

import hashlib

DPI = 300
MAX_SIDE_PX = 2500
SCORE_CUTOFF = 0.25

#: A4 at 72pt — the page-geometry the render math scales from.
_PAGE_PT = (595.0, 842.0)


def render_geometry(page_pt: tuple[float, float] = _PAGE_PT,
                    dpi: int = DPI, max_side: int = MAX_SIDE_PX) -> tuple[int, int, float]:
    """S2: (width_px, height_px, effective_scale) after dpi render + cap.

    Mirrors ``pdf_to_images`` (dpi/72 zoom) composed with ``_resize_keep``
    (`core/ocr_engine.py:13-23`): the longest side is clamped to
    ``max_side`` — the reference's per-record cost/memory bound."""
    zoom = dpi / 72.0
    w, h = page_pt[0] * zoom, page_pt[1] * zoom
    longest = max(w, h)
    scale = 1.0 if longest <= max_side else max_side / longest
    return int(w * scale), int(h * scale), zoom * scale


class _StubModel:
    """Deterministic fake OCR model. Singleton per process, lazily built —
    the reference's model-load pattern (`core/ocr_engine.py:6-11`)."""

    def infer(self, page_text: str) -> list[tuple[str, float]]:
        """STUB for PaddleOCR inference: "recognizes" the page's embedded
        text line-by-line with a deterministic per-line confidence in
        [0.05, 1.0) derived from the line content — so the F3 cutoff
        genuinely drops a stable subset of lines."""
        out = []
        for line in page_text.split("\n"):
            h = hashlib.md5(line.encode("utf-8")).digest()
            score = 0.05 + (h[0] / 256.0) * 0.95
            out.append((line, score))
        return out


_MODEL: _StubModel | None = None


def get_model() -> _StubModel:
    global _MODEL
    if _MODEL is None:
        _MODEL = _StubModel()
    return _MODEL


def ocr_page(page_text: str, score_cutoff: float = SCORE_CUTOFF) -> str:
    """S3+F3: run (stub) inference over a rendered page, keep lines with
    ``score > cutoff`` and non-blank text, newline-join
    (`core/ocr_engine.py:46-63`)."""
    model = get_model()
    render_geometry()  # the render-cost bound runs even in the stub path
    kept = [
        txt for txt, score in model.infer(page_text)
        if score > score_cutoff and txt.strip()
    ]
    return "\n".join(kept)


def ocr_pages(pages: list[dict], score_cutoff: float = SCORE_CUTOFF) -> list[dict]:
    """Full OCR leg over page records: every page re-recognized
    (`core/ocr_engine.py:26-70` returns one record per page)."""
    return [
        {"page": p.get("page", i + 1), "source": "ocr",
         "text": ocr_page(p.get("text", ""), score_cutoff)}
        for i, p in enumerate(pages)
    ]
