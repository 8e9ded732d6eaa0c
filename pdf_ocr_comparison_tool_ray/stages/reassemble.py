"""Ordered reassembly — the invariant-bearing shuffle.

Reference J6 (``content_matcher.py:415-508`` merge assumes ascending
page order; ``pdf_processor.py:332-349`` sorts by page_num before run
grouping).  In Ray Data the physical arrival order of spans is
arbitrary after the extraction fan-out, so order is *restored
explicitly*: ``groupby(doc_id)`` co-locates a document's spans, then an
in-group sort on ``offset`` (stable; offsets are unique per doc by
construction, with (kind, media_ref) as a deterministic tiebreak for
robustness) assigns the final ``seq``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def reassemble_group(group: pa.Table) -> pa.Table:
    """One document's spans -> ordered output rows with dense ``seq``."""
    idx = pc.sort_indices(
        group,
        sort_keys=[("offset", "ascending"), ("kind", "ascending"), ("media_ref", "ascending")],
    )
    g = group.take(idx)
    seq = pa.array(np.arange(len(g), dtype=np.int32))
    return pa.table(
        {
            "doc_id": g["doc_id"],
            "seq": seq,
            "kind": g["kind"],
            "text": g["text"],
            "media_ref": g["media_ref"],
            "route": g["route"],
            "score": g["score"],
        }
    )
