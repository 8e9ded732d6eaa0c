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


def _vote_main_type(bucket: pa.Table) -> pa.Table:
    """A8 vote (main.py:305-306): mode of span doc_types per document,
    deterministic tiebreak (count desc, name asc); every span row
    re-emitted with the doc-level ``main_type`` column for the
    partitioned write.  Handles MANY documents per table (bucket-wise
    co-partition); pyarrow in/out so list columns (dates/keywords/...)
    pass through zero-copy while the vote runs on two scalar columns."""
    from .reports import doc_type_mode_frame

    light = bucket.select(["doc_id", "doc_type"]).to_pandas()
    best = doc_type_mode_frame(light)
    main = light["doc_id"].map(dict(zip(best["doc_id"], best["main_type"])))
    return bucket.append_column(
        "main_type", pa.array(main.to_numpy(), type=pa.string())
    )


def categorize(enriched: ray.data.Dataset) -> ray.data.Dataset:
    """Enriched span rows -> same rows + doc-level ``main_type``."""
    from ..stages.bucketed import bucketed_map_groups

    tune_context()
    return bucketed_map_groups(
        enriched, "doc_id", _vote_main_type, n_buckets=64, batch_format="pyarrow"
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


def _nest_batch(batch: pa.Table) -> pa.Table:
    """Ordered span rows (doc-local batch) -> nested documents rows.

    Inverse of ``explode_spans``: emits the canonical interleaved shape
    ``(doc_id, spans: list<struct<kind,text,media_ref,offset>>)`` plus the
    extraction columns folded into each span struct.  Valid per batch only
    when a document's rows are batch-local — guaranteed straight after
    reassembly (both paths emit whole documents per block).
    """
    import numpy as np

    has_bbox = "bbox" in batch.column_names
    if len(batch) == 0:
        # empty block (empty input split / upstream filter): emit the
        # explicit nested schema instead of indexing into nothing
        fields = [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
            ("route", pa.string()),
            ("score", pa.float64()),
        ]
        if has_bbox:
            fields.append(("bbox", pa.list_(pa.int32())))
        span_t = pa.struct(fields)
        return pa.schema(
            [("doc_id", batch.schema.field("doc_id").type), ("spans", pa.list_(span_t))]
        ).empty_table()
    idx = pa.compute.sort_indices(
        batch, sort_keys=[("doc_id", "ascending"), ("seq", "ascending")]
    )
    g = batch.take(idx)
    doc = np.asarray(g["doc_id"])
    n = len(g)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = doc[1:] != doc[:-1]
    starts = np.flatnonzero(change)
    offsets = np.append(starts, n).astype("int32")
    arrays = [
        g["kind"].combine_chunks(),
        g["text"].combine_chunks(),
        g["media_ref"].combine_chunks(),
        pa.compute.cast(g["seq"].combine_chunks(), pa.int32()),
        g["route"].combine_chunks(),
        g["score"].combine_chunks(),
    ]
    names = ["kind", "text", "media_ref", "offset", "route", "score"]
    if has_bbox:
        arrays.append(g["bbox"].combine_chunks())
        names.append("bbox")
    span_struct = pa.StructArray.from_arrays(arrays, names=names)
    spans = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), span_struct)
    return pa.table({"doc_id": pa.array(doc[starts]), "spans": spans})


def nest_spans(reassembled: ray.data.Dataset) -> ray.data.Dataset:
    """Ordered span rows -> canonical nested documents table."""
    return reassembled.map_batches(_nest_batch, batch_format="pyarrow", batch_size=None)


def write_documents(reassembled: ray.data.Dataset, path: str) -> None:
    """Write the extraction output in the INPUT's canonical nested shape
    (lance when available, else parquet) — a consumer of the source table
    can read the extracted table with the same reader."""
    nested = nest_spans(reassembled)
    try:
        import lance  # noqa: F401

        nested.write_lance(path)
    except ImportError:
        nested.write_parquet(path)


_PAGE_FRAME = "=== 第{n}页 ==="  # run_ocr.py:60-70 framing


def _render_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
    """Vectorized framing for every document in the bucket: per-row
    framed strings built column-wise, one string-join per doc."""
    g = bucket.sort_values(["doc_id", "seq"], kind="mergesort")
    pre, post = _PAGE_FRAME.split("{n}")
    framed = pre + (g["seq"].astype("int64") + 1).astype(str) + post + "\n" + g["text"]
    out = (
        g.assign(_part=framed)
        .groupby("doc_id", sort=False, as_index=False)
        .agg(full_text=("_part", "\n".join), n_spans=("_part", "size"))
    )
    out["n_spans"] = out["n_spans"].astype("int64")
    return out


def render_full_text(reassembled: ray.data.Dataset) -> ray.data.Dataset:
    """S8 analog: ordered span rows -> one framed full-text row per doc
    (bucket-wise co-partition; framing from run_ocr.py:60-70)."""
    from ..stages.bucketed import bucketed_map_groups

    tune_context()
    light = reassembled.select_columns(["doc_id", "seq", "text"])
    return bucketed_map_groups(light, "doc_id", _render_bucket, n_buckets=64)


def merge_by_category(enriched: ray.data.Dataset) -> ray.data.Dataset:
    """S6 analog (``pdf_processor.py:370-420`` ``PDFMerger.merge``): one
    merged, ordered artifact per category.

    Spans vote a doc-level ``main_type`` (A8), documents render to framed
    text in span order, and each category concatenates its documents in
    doc_id order with a per-document header — the text equivalent of the
    reference's per-category combined PDF.  -> (main_type, merged_text,
    n_docs).

    Scale note: a merged category artifact is inherently ONE sequential
    file (the reference has the same constraint); at corpus scale, shard
    the category into doc_id ranges upstream and merge per shard.
    """
    from ..stages.bucketed import bucketed_map_groups

    cat = categorize(enriched)
    light = cat.select_columns(["doc_id", "offset", "text", "main_type"])

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["doc_id", "offset"], kind="mergesort")
        pre, post = _PAGE_FRAME.split("{n}")
        seq = g.groupby("doc_id", sort=False).cumcount()
        part = pre + (seq + 1).astype(str) + post + "\n" + g["text"]
        docs = (
            g.assign(_p=part)
            .groupby("doc_id", sort=False)
            .agg(main_type=("main_type", "first"), body=("_p", "\n".join))
            .reset_index()
            .sort_values("doc_id", kind="mergesort")
        )
        docs["_doc"] = "--- " + docs["doc_id"].astype(str) + " ---\n" + docs["body"]
        out = docs.groupby("main_type", as_index=False).agg(
            merged_text=("_doc", "\n".join), n_docs=("doc_id", "size")
        )
        out["n_docs"] = out["n_docs"].astype("int64")
        return out

    return bucketed_map_groups(light, "main_type", merge_bucket, n_buckets=8)


def write_merged_by_category(enriched: ray.data.Dataset, out_dir: str) -> dict:
    """Write each category's merged artifact as one text file (atomic
    rename; the per-category file is the resume unit).  Returns
    {main_type: path}."""
    import os
    from pathlib import Path

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths: dict = {}
    for row in merge_by_category(enriched).iter_rows():
        name = row["main_type"]
        f = out / f"{name}.txt"
        tmp = out / f".tmp-{name}-{os.getpid()}.txt"
        tmp.write_text(row["merged_text"])
        os.replace(tmp, f)
        paths[name] = str(f)
    return paths


def export_rows(ds: ray.data.Dataset, path: str, fmt: str = "parquet") -> None:
    """Format-symmetric sink for FLAT row tables — the writer-side
    mirror of ``extraction.read_flat_documents``'s parquet/csv/jsonl
    readers (S1), so a pipeline can round-trip through any of the three
    interchange formats.  One file per block (Ray's writers), which is
    also the resumable unit.  Nested columns (``spans``) need
    ``write_documents`` — csv/jsonl flatten poorly and this refuses
    rather than guessing.
    """
    schema = ds.schema()
    base = getattr(schema, "base_schema", schema)
    if hasattr(base, "types") and any(
        pa.types.is_nested(t) for t in base.types if isinstance(t, pa.DataType)
    ):
        raise ValueError(
            "export_rows is for flat tables; use write_documents for "
            "nested span documents"
        )
    fmt = fmt.lower()
    if fmt == "parquet":
        ds.write_parquet(path)
    elif fmt in ("jsonl", "json", "ndjson"):
        ds.write_json(path)
    elif fmt == "csv":
        ds.write_csv(path)
    else:
        raise ValueError(f"unknown export format: {fmt!r}")
