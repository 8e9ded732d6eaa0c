"""Flagship pipeline: interleaved documents -> ordered extracted spans.

    read (parquet/lance) -> derive/validate interleaved spans
      -> explode (zero-copy Arrow)
      -> [optional repartition to defuse media-heavy skew]
      -> SpanExtractor actor pool (hybrid routing)
      -> groupby(doc_id) ordered reassembly shuffle
      -> Dataset of OUTPUT_SCHEMA rows (stream to write_parquet or iterate)

Mirrors the reference lifecycle ``run_ocr.py:115-308`` (rasterize ->
OCR -> features -> per-file collection) with the driver-side per-page
loops replaced by Dataset stages; the driver holds no per-page state.
"""

from __future__ import annotations

from typing import Optional

import ray.data

from ..config import STAGE
from ..sources.interleave import derive_documents_batch
from ..stages.explode import explode_spans
from ..stages.extract import SpanExtractor
from ..stages.reassemble import reassemble_group


def read_flat_documents(path: str, columns=("doc_id", "text")) -> ray.data.Dataset:
    """Read a flat documents parquet, pruned to the needed columns."""
    return ray.data.read_parquet(path, columns=list(columns))


def interleave(flat: ray.data.Dataset, seed: int = 42) -> ray.data.Dataset:
    """Flat (doc_id, text) -> interleaved (doc_id, spans) documents."""
    return flat.map_batches(
        derive_documents_batch,
        batch_format="pandas",
        batch_size=STAGE["batch_size"],
        fn_kwargs={"seed": seed},
    )


def read_interleaved(path: str) -> ray.data.Dataset:
    """Read an interleaved documents table (lance when available, else parquet)."""
    try:
        import lance  # noqa: F401

        return ray.data.read_lance(path)
    except ImportError:
        return ray.data.read_parquet(path)


def extract_spans(
    docs: ray.data.Dataset,
    *,
    ocr_concurrency: Optional[int] = None,
    batch_size: Optional[int] = None,
    num_output_blocks: Optional[int] = None,
) -> ray.data.Dataset:
    """Interleaved documents -> extracted (unordered) span rows."""
    spans = docs.map_batches(explode_spans, batch_format="pyarrow")
    if num_output_blocks:
        # spread media-heavy documents' spans across tasks (skew defusal);
        # plain repartition splits blocks without a full shuffle
        spans = spans.repartition(num_output_blocks)
    if ocr_concurrency is None:
        # autoscaling pool capped below the CPU count so the pool never
        # starves the read / shuffle stages (see ray_guide: a pool that
        # reserves every CPU serializes the pipeline)
        import ray

        total_cpus = int(ray.cluster_resources().get("CPU", 4))
        ocr_concurrency = (1, max(1, min(STAGE["ocr_concurrency"], total_cpus - 1)))
    return spans.map_batches(
        SpanExtractor,
        batch_format="pyarrow",
        batch_size=batch_size or STAGE["ocr_batch_size"],
        concurrency=ocr_concurrency,
    )


def reassemble(extracted: ray.data.Dataset) -> ray.data.Dataset:
    """Extracted span rows -> ordered span sequences (the output invariant)."""
    return extracted.groupby("doc_id").map_groups(
        reassemble_group, batch_format="pyarrow"
    )


def run_extraction(
    docs: ray.data.Dataset,
    *,
    ocr_concurrency: Optional[int] = None,
    batch_size: Optional[int] = None,
    num_output_blocks: Optional[int] = None,
) -> ray.data.Dataset:
    """Full flagship pipeline over an interleaved documents Dataset."""
    extracted = extract_spans(
        docs,
        ocr_concurrency=ocr_concurrency,
        batch_size=batch_size,
        num_output_blocks=num_output_blocks,
    )
    return reassemble(extracted)


def run_extraction_from_flat(
    flat_path: str,
    *,
    seed: int = 42,
    ocr_concurrency: Optional[int] = None,
    batch_size: Optional[int] = None,
    num_output_blocks: Optional[int] = None,
) -> ray.data.Dataset:
    """Convenience: flat documents parquet -> interleave -> extract -> reassemble."""
    docs = interleave(read_flat_documents(flat_path), seed=seed)
    return run_extraction(
        docs,
        ocr_concurrency=ocr_concurrency,
        batch_size=batch_size,
        num_output_blocks=num_output_blocks,
    )
