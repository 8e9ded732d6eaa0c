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
from .mock_ocr import decode_media, mock_bbox, mock_confidence
from .pdf_parse import parse_text_layer, text_layer_bbox
from .similarity import agreement_ratio

NO_BBOX = [0, 0, 0, 0]  # spans without geometry (native text, html)


def extract_span(kind: str, text: str, media_ref: str,
                 agreement_threshold: float | None = None,
                 ) -> Tuple[str, str, float, list]:
    """-> (canonical_text, route, score, bbox).

    ``bbox`` is the per-fragment ``[x1, y1, x2, y2]`` geometry the
    reference's ``OCRResult`` carries (``ocr_engine.py:18-23`` polygon /
    ``deepseek_ocr2_engine.py:21-26`` 4-tuple, unified per SURVEY §7.6):
    engine boxes on the OCR route, layer-coordinate union on the native
    pdf parse, [0,0,0,0] where no geometry exists.
    """
    thr = agreement_threshold if agreement_threshold is not None \
        else EXTRACTION["agreement_threshold"]
    if kind == "text":
        return text, "native", 1.0, list(NO_BBOX)
    if kind == "html":
        return strip_html(text), "html", 1.0, list(NO_BBOX)
    if kind == "scan":
        decoded = decode_media(media_ref)
        return decoded, "ocr", mock_confidence(decoded), mock_bbox(decoded)
    if kind == "pdf":
        native = parse_text_layer(text)
        if not media_ref:
            return native, "native", 1.0, text_layer_bbox(text)
        ocr = decode_media(media_ref)
        ratio = agreement_ratio(native, ocr)
        if ratio >= thr:
            return native, "native", ratio, text_layer_bbox(text)
        return ocr, "ocr", ratio, mock_bbox(ocr)
    # unknown kind: pass through untouched (quarantine-friendly)
    return text, "passthrough", 0.0, list(NO_BBOX)
