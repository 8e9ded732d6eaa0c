"""Per-span extraction routing — the scalar reference semantics.

One span in, (canonical_text, route, score) out.  Routes:

* ``text`` -> pass-through native span;
* ``html`` -> boilerplate strip (text-density heuristics);
* ``pdf``  -> native text-layer parse, agreement-scored against the OCR
  route (SequenceMatcher ratio, mirroring the reference hybrid engine's
  confidence routing at ``hybrid_ocr_engine.py:152-182``); the winner is
  the native parse when agreement >= threshold, else the OCR text;
* ``scan`` -> OCR route only (mock engine in this sandbox).

The Ray stage (``stages/extract.py``) applies the same logic per batch;
the golden-fixture oracle applies this scalar form directly.
"""

from __future__ import annotations

from typing import Tuple

from ..config import EXTRACTION
from .html_strip import strip_html
from .mock_ocr import decode_media, mock_confidence
from .pdf_parse import parse_text_layer
from .similarity import agreement_ratio


def extract_span(kind: str, text: str, media_ref: str,
                 agreement_threshold: float | None = None) -> Tuple[str, str, float]:
    """-> (canonical_text, route, score)."""
    thr = agreement_threshold if agreement_threshold is not None \
        else EXTRACTION["agreement_threshold"]
    if kind == "text":
        return text, "native", 1.0
    if kind == "html":
        return strip_html(text), "html", 1.0
    if kind == "scan":
        decoded = decode_media(media_ref)
        return decoded, "ocr", mock_confidence(decoded)
    if kind == "pdf":
        native = parse_text_layer(text)
        if not media_ref:
            return native, "native", 1.0
        ocr = decode_media(media_ref)
        ratio = agreement_ratio(native, ocr)
        if ratio >= thr:
            return native, "native", ratio
        return ocr, "ocr", ratio
    # unknown kind: pass through untouched (quarantine-friendly)
    return text, "passthrough", 0.0
