"""Feature enrichment: per-span feature columns over extracted text.

Reference M7–M17: regex features (``ocr_engine.py:351-373``), top-10
keywords (``:392-412``), rule classification
(``document_classifier.py:62-103``), content hash
(``content_matcher.py:30-35``) — one stateless vectorized projection
adding ``dates/amounts/numbers/keywords`` list columns plus
``doc_type``, ``type_confidence``, ``text_hash``.

Compiled state (regexes, classifier patterns) lives in a callable class
so it is built once per actor, not once per batch.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import DOCUMENT_TYPES_ZH
from ..functions.classify import RuleClassifier
from ..functions.features import extract_amounts, extract_dates, extract_numbers
from ..functions.textnorm import text_hash_many
from ..functions.tokenize import top_keywords


class FeatureEnricher:
    def __init__(self, doc_types: dict | None = None):
        self.classifier = RuleClassifier(doc_types or DOCUMENT_TYPES_ZH)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        dates = [extract_dates(t) for t in texts]
        amounts = [extract_amounts(t) for t in texts]
        numbers = [extract_numbers(t) for t in texts]
        keywords = [top_keywords(t, 10) for t in texts]
        doc_types, confs = self.classifier.classify_many(texts)
        hashes = text_hash_many(texts)
        out = batch
        for name, arr in (
            ("dates", pa.array(dates, type=pa.list_(pa.string()))),
            ("amounts", pa.array(amounts, type=pa.list_(pa.string()))),
            ("numbers", pa.array(numbers, type=pa.list_(pa.string()))),
            ("keywords", pa.array(keywords, type=pa.list_(pa.string()))),
            ("doc_type", pa.array(doc_types)),
            ("type_confidence", pa.array(confs, type=pa.float64())),
            ("text_hash", pa.array(hashes)),
        ):
            out = out.append_column(name, arr)
        return out


def enrich(ds, *, doc_types: dict | None = None, batch_size: int = 1024):
    """Attach feature columns to a span-rows Dataset."""
    return ds.map_batches(
        FeatureEnricher,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=4,
        fn_constructor_kwargs={"doc_types": doc_types} if doc_types else None,
    )
