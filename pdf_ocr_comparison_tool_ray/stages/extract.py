"""Span extraction stage — the hybrid routing engine as an actor pool.

One callable class handles all four kinds per batch (the reference's
``HybridOCREngine`` shape: one actor owning every engine,
``hybrid_ocr_engine.py:49-247``).  State (compiled patterns, the OCR
"model", thresholds) is built once per actor in ``__init__`` and reused
across batches; a real OCR model would be loaded in exactly the same
place (``ocr_engine.py:56-73``, ``deepseek_ocr2_engine.py:60-94``).

``kind == "text"`` rows take a vectorized zero-copy fast path; the other
kinds are inherently per-string algorithms (DOM parse, layout parse,
model inference) executed in the batch loop.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import EXTRACTION
from ..functions.html_strip import strip_html
from ..functions.mock_ocr import (
    decode_media,
    decode_media_accurate,
    mock_confidence,
    mock_confidence_accurate,
)
from ..functions.pdf_parse import parse_text_layer
from ..functions.similarity import agreement_ratio


# ---------------------------------------------------------------------------
# extension surface: custom extractors keyed by span kind
# (the reference's engine factory, ``main.py:29-48`` get_ocr_engine /
# ``hybrid_ocr_engine.py:250-264`` get_hybrid_engine, generalized: a kind ->
# callable(text, media_ref) -> (out_text, route, score) registry)
# ---------------------------------------------------------------------------
EXTRACTOR_REGISTRY: dict = {}


def register_extractor(kind: str):
    """Register a module-level extractor for a custom span kind.

    Registration must execute in the worker process too (put it at import
    time of a module the pipeline imports), or pass the extractor
    per-pipeline via ``SpanExtractor(extra_extractors={kind: fn})`` which
    ships it inside the actor constructor args.
    """

    def deco(fn):
        EXTRACTOR_REGISTRY[kind] = fn
        return fn

    return deco


def extract_light_batch(batch: pa.Table) -> pa.Table:
    """Stateless route for cheap kinds (text passthrough, html strip).

    The filter-split half of the reference's hybrid engine
    (``hybrid_ocr_engine.py:49-247``): light spans never occupy the
    heavy (model-holding) actor pool.  Input batches must contain only
    ``kind in {text, html}`` rows (the split filter guarantees this).
    """
    kinds = batch["kind"].to_pylist()
    texts = batch["text"].to_pylist()
    n = len(batch)
    out_text = texts
    routes = [""] * n
    for i, k in enumerate(kinds):
        if k == "text":
            routes[i] = "native"
        elif k == "html":
            out_text[i] = strip_html(texts[i])
            routes[i] = "html"
        else:  # pragma: no cover - split filter violated
            raise ValueError(f"heavy kind {k!r} routed to the light path")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "kind": batch["kind"],
            "text": pa.array(out_text, type=pa.string()),
            "media_ref": batch["media_ref"],
            "offset": batch["offset"],
            "route": pa.array(routes),
            "score": pa.array([1.0] * n, type=pa.float64()),
        }
    )


class SpanExtractor:
    def __init__(
        self,
        agreement_threshold: float | None = None,
        extra_extractors: dict | None = None,
    ):
        self.thr = (
            agreement_threshold
            if agreement_threshold is not None
            else EXTRACTION["agreement_threshold"]
        )
        # Warm per-actor state here.  The mock engine has no weights; a real
        # deployment loads the OCR model / HTML parser pools at this point.
        self._strip = strip_html
        self._parse_pdf = parse_text_layer
        self._ocr = decode_media
        # custom kinds: module registry merged with per-pipeline extractors
        self._custom = {**EXTRACTOR_REGISTRY, **(extra_extractors or {})}

    def __call__(self, batch: pa.Table) -> pa.Table:
        kind_arr = batch["kind"]
        all_text = pc.all(pc.equal(kind_arr, "text")).as_py()
        n = len(batch)
        if all_text:
            # zero-copy fast path: canonical text == input text
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "kind": kind_arr,
                    "text": batch["text"],
                    "media_ref": batch["media_ref"],
                    "offset": batch["offset"],
                    "route": pa.array(["native"] * n),
                    "score": pa.array([1.0] * n, type=pa.float64()),
                }
            )
        kinds = kind_arr.to_pylist()
        texts = batch["text"].to_pylist()
        refs = batch["media_ref"].to_pylist()
        out_text = texts  # reuse list; overwrite in place where routed
        routes = [""] * n
        scores = [0.0] * n
        thr = self.thr
        for i, k in enumerate(kinds):
            # poison-row quarantine: a malformed payload marks ITS span
            # (route="error", score 0, text preserved) instead of failing
            # the task — the reference logs-and-skips per file
            # (main.py:244-252, run_ocr.py:222-224); at 100 TB a corrupt
            # document must never kill the job or trigger retry storms.
            try:
                if k == "text":
                    routes[i] = "native"
                    scores[i] = 1.0
                elif k == "html":
                    out_text[i] = self._strip(texts[i])
                    routes[i] = "html"
                    scores[i] = 1.0
                elif k == "scan":
                    decoded = self._ocr(refs[i])
                    out_text[i] = decoded
                    routes[i] = "ocr"
                    scores[i] = mock_confidence(decoded)
                elif k == "pdf":
                    native = self._parse_pdf(texts[i])
                    if not refs[i]:
                        out_text[i] = native
                        routes[i] = "native"
                        scores[i] = 1.0
                    else:
                        ocr = self._ocr(refs[i])
                        ratio = agreement_ratio(native, ocr)
                        out_text[i] = native if ratio >= thr else ocr
                        routes[i] = "native" if ratio >= thr else "ocr"
                        scores[i] = ratio
                elif k in self._custom:
                    out_text[i], routes[i], scores[i] = self._custom[k](
                        texts[i], refs[i]
                    )
                else:
                    routes[i] = "passthrough"
            except Exception:
                out_text[i] = texts[i]
                routes[i] = "error"
                scores[i] = 0.0
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "kind": kind_arr,
                "text": pa.array(out_text, type=pa.string()),
                "media_ref": batch["media_ref"],
                "offset": batch["offset"],
                "route": pa.array(routes),
                "score": pa.array(scores, type=pa.float64()),
            }
        )


class SecondPassExtractor:
    """Confidence-routed second-engine rerun — the heavy half of the
    reference's smart mode (``hybrid_ocr_engine.py:152-182``: Paddle
    first; a page whose average confidence falls below threshold reruns
    on DeepSeek and the higher-confidence result wins).

    Input batches hold only the low-confidence scan rows (the filter
    split upstream guarantees it); each is re-decoded with the heavier
    engine and the better of the two answers is kept, with ``route``
    recording which engine won ("ocr" kept / "ocr2" rerun won).  A real
    deployment loads the second model in ``__init__``.
    """

    def __init__(self):
        self._ocr2 = decode_media_accurate

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        refs = batch["media_ref"].to_pylist()
        scores = batch["score"].to_pylist()
        out_t, out_r, out_s = [], [], []
        for t0, ref, s0 in zip(texts, refs, scores):
            try:
                t2 = self._ocr2(ref)
                s2 = mock_confidence_accurate(t2)
            except Exception:
                t2, s2 = t0, -1.0  # poison-row quarantine: keep pass 1
            if s2 > s0:
                out_t.append(t2)
                out_r.append("ocr2")
                out_s.append(s2)
            else:
                out_t.append(t0)
                out_r.append("ocr")
                out_s.append(s0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "kind": batch["kind"],
                "text": pa.array(out_t, type=pa.string()),
                "media_ref": batch["media_ref"],
                "offset": batch["offset"],
                "route": pa.array(out_r, type=pa.string()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )
