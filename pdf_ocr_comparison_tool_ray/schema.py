"""Arrow schemas for the engine's tables.

Input (per BASELINE.json input_hint): one row per interleaved document,
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset:int32>>)``.

``kind ∈ {"text", "html", "pdf", "scan"}``:
* ``text`` — native text span, ``text`` populated, ``media_ref == ""``
* ``html`` — raw HTML needing boilerplate strip
* ``pdf``  — positioned text-layer serialization (block/line order) in
  ``text`` plus a scan payload in ``media_ref`` (the OCR fallback route)
* ``scan`` — ``text == ""``; ``media_ref`` holds the page-image pointer
  (mock payload in this sandbox)

Output: exploded/reassembled span rows with extraction metadata.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Exploded span rows (post-explode, pre-extraction)
SPAN_ROWS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

# Extracted span rows (post-extraction): canonical text + route metadata
EXTRACTED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("kind", pa.string()),
        ("text", pa.string()),        # canonical extracted text
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
        ("route", pa.string()),       # native | html | ocr
        ("score", pa.float64()),      # agreement/confidence score for the route
    ]
)

# Final reassembled output (the invariant-bearing table): one row per span in
# final order; span-sequence equality = (doc_id, seq, kind, text, media_ref).
OUTPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("seq", pa.int32()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("route", pa.string()),
        ("score", pa.float64()),
    ]
)
