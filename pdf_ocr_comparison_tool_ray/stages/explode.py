"""Explode the ``spans`` list column into one row per span.

Reference M1 (``pdf_processor.py:492-505`` — document -> stream of
pages), re-expressed as zero-copy Arrow kernels:
``list_parent_indices`` + ``list_flatten`` + ``take`` — no Python loop,
no row materialization.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def explode_spans(batch: pa.Table) -> pa.Table:
    """(doc_id, spans) -> (doc_id, kind, text, media_ref, offset) rows."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans)
    flat = pc.list_flatten(spans)
    doc_id = pc.take(batch.column("doc_id"), parent)
    return pa.table(
        {
            "doc_id": doc_id,
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
            "offset": flat.field("offset"),
        }
    )
