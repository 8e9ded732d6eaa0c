"""Output sinks: categorized partitioned write (S7) and per-document
full-text rendering (S8 analog).

Reference: ``pdf_processor.py:423-466`` (``PDFCopier.copy_to_category``
copies each file into ``output/{project}/{doc_type}/``) and
``run_ocr.py:47-112`` (searchable-PDF writer; per-page text framed with
``=== 第N页 ===`` delimiters, ``run_ocr.py:60-70``).  Ray-native form:
the categorized copy becomes a hive-partitioned ``write_parquet`` (one
directory per category — also the resumable unit), and the searchable
artifact becomes the per-document ordered full text (the canonical
ordered span table remains the primary output).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from .extraction import tune_context


def _vote_main_type(group: pa.Table) -> pa.Table:
    """A8 vote (main.py:305-306): mode of span doc_types, deterministic
    tiebreak (count desc, name asc); every span row re-emitted with the
    doc-level ``main_type`` column for the partitioned write.  Pyarrow
    in/out: list columns (dates/keywords/...) pass through zero-copy."""
    from collections import Counter

    counts = Counter(group["doc_type"].to_pylist())
    best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    return group.append_column("main_type", pa.array([best] * len(group)))


def categorize(enriched: ray.data.Dataset) -> ray.data.Dataset:
    """Enriched span rows -> same rows + doc-level ``main_type``."""
    tune_context()
    return enriched.groupby("doc_id").map_groups(
        _vote_main_type, batch_format="pyarrow"
    )


def write_categorized(
    enriched: ray.data.Dataset, out_dir: str, project_col: str | None = None
) -> None:
    """S7: hive-partitioned parquet, one directory per category.

    Partition dirs are the resume unit: a re-run can skip categories
    already present.  ``project_col`` (if the rows carry one) becomes the
    outer partition level, mirroring ``output/{project}/{doc_type}/``.
    """
    cols = [project_col, "main_type"] if project_col else ["main_type"]
    categorize(enriched).write_parquet(out_dir, partition_cols=cols)


_PAGE_FRAME = "=== 第{n}页 ==="  # run_ocr.py:60-70 framing


def _render_doc(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values("seq")
    parts = []
    for _, r in g.iterrows():
        parts.append(_PAGE_FRAME.format(n=int(r["seq"]) + 1))
        parts.append(r["text"])
    return pd.DataFrame(
        {
            "doc_id": [g["doc_id"].iloc[0]],
            "full_text": ["\n".join(parts)],
            "n_spans": pd.Series([len(g)], dtype="int64"),
        }
    )


def render_full_text(reassembled: ray.data.Dataset) -> ray.data.Dataset:
    """S8 analog: ordered span rows -> one framed full-text row per doc."""
    tune_context()
    light = reassembled.select_columns(["doc_id", "seq", "text"])
    return light.groupby("doc_id").map_groups(_render_doc, batch_format="pandas")
