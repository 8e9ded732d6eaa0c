"""Pure-Python golden oracle — no Ray.

Computes, for a flat (doc_id, text) corpus, the exact output the
distributed pipeline must reproduce under span-sequence equality
(kind, text, media_ref, order).  Used to build committed golden fixtures
and inside tests for on-the-fly comparison.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

from .functions.extract import extract_span
from .sources.interleave import derive_spans


def golden_spans_for_doc(doc_id: str, text: str, seed: int = 42) -> List[Dict]:
    """Ordered golden span rows for one document."""
    spans = sorted(derive_spans(doc_id, text, seed), key=lambda s: s["offset"])
    rows: List[Dict] = []
    for seq, s in enumerate(spans):
        extracted, route, score, bbox = extract_span(
            s["kind"], s["text"], s["media_ref"]
        )
        rows.append(
            {
                "doc_id": doc_id,
                "seq": seq,
                "kind": s["kind"],
                "text": extracted,
                "media_ref": s["media_ref"],
                "route": route,
                "score": score,
                "bbox": bbox,
            }
        )
    return rows


def golden_spans(corpus: Iterable[Tuple[str, str]], seed: int = 42) -> List[Dict]:
    """Golden span rows for a corpus of (doc_id, text), ordered by doc then seq."""
    out: List[Dict] = []
    for doc_id, text in sorted(corpus, key=lambda p: p[0]):
        out.extend(golden_spans_for_doc(doc_id, text, seed))
    return out
