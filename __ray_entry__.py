"""Driver contract for the Ray-Data-native extraction engine.

``entry()`` runs the flagship interleaved-extraction pipeline on
sf0.001; ``queries()`` exposes every implemented operator/pipeline from
SURVEY.md §2 (plus the dedup / similarity-search / text-analysis
extensions); ``oracle_sql()`` gives the DuckDB-equivalent SQL for each
SQL-expressible query.  Ray is initialised by the driver — nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

sys.path.insert(0, str(Path(__file__).parent))


def entry() -> Any:
    """Flagship pipeline: interleave sf0.001 documents -> extract -> reassemble."""
    from pdf_ocr_comparison_tool_ray.pipelines.extraction import (
        run_extraction_from_flat,
    )

    return run_extraction_from_flat("/root/testdata/sf0.001/documents.parquet")


# ---------------------------------------------------------------------------
# non-SQL-expressible pipelines (driver records rows-only checks)
# ---------------------------------------------------------------------------
def _q_approx_distinct_by_lang(sf_dir: str):
    """HLL sketch: per-language approximate distinct sources — mergeable
    register partials, 2^p bytes per (key, batch) through the shuffle."""
    import ray.data

    from pdf_ocr_comparison_tool_ray.stages.sketch import approx_distinct_by

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "doc_id"])
    return approx_distinct_by(ds, "lang", "doc_id", p=12)


def _q_approx_top_tokens(sf_dir: str):
    """Count-Min heavy hitters over exploded document tokens —
    shuffle-free approximate top-k (sketch partials + candidate union)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from pdf_ocr_comparison_tool_ray.stages.sketch import approx_topk

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def toks(batch: pa.Table) -> pd.DataFrame:
        out = []
        for t in batch["text"].to_pylist():
            out.extend(t.split())
        return pd.DataFrame({"tok": out})

    return approx_topk(ds.map_batches(toks, batch_format="pyarrow"), "tok", k=20)


def _q_multimodal_features(sf_dir: str):
    import ray.data

    from pdf_ocr_comparison_tool_ray.stages.multimodal import (
        featurize_media,
        media_from_text_batch,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    media = docs.map_batches(media_from_text_batch, batch_format="pyarrow")
    return featurize_media(media, concurrency=2, batch_size=64)


def _q_multimodal_preprocessed(sf_dir: str):
    """M2/M3 in the chain: decode -> grayscale/denoise/contrast/deskew ->
    featurize, all actor-pool stages over binary payloads."""
    import ray.data

    from pdf_ocr_comparison_tool_ray.stages.multimodal import (
        featurize_media,
        media_from_text_batch,
        preprocess_media,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    media = docs.map_batches(media_from_text_batch, batch_format="pyarrow")
    return featurize_media(
        preprocess_media(media, concurrency=2, batch_size=64),
        concurrency=2,
        batch_size=64,
    )


def _q_embedding_dup_lsh(sf_dir: str):
    """Scale path of embedding near-dup: random-hyperplane LSH buckets +
    in-bucket cosine (the exact all-pairs variant is the `embedding_dup`
    oracle)."""
    import ray.data

    from pdf_ocr_comparison_tool_ray.stages.dedup import embedding_dup_pairs

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return embedding_dup_pairs(ds, threshold=0.45, n_planes=6, n_tables=8)


def queries() -> dict[str, Callable[[str], Any]]:
    from pdf_ocr_comparison_tool_ray.pipelines.queries import SQL_QUERIES

    out: dict[str, Callable[[str], Any]] = {
        name: fn for name, (fn, _sql) in SQL_QUERIES.items()
    }
    out.update(
        {
            "multimodal_features": _q_multimodal_features,
            "multimodal_preprocessed": _q_multimodal_preprocessed,
            "embedding_dup_lsh": _q_embedding_dup_lsh,
            "approx_distinct_by_lang": _q_approx_distinct_by_lang,
            "approx_top_tokens": _q_approx_top_tokens,
        }
    )
    return out


def oracle_sql() -> dict[str, str]:
    from pdf_ocr_comparison_tool_ray.pipelines.queries import SQL_QUERIES

    return {name: sql for name, (_fn, sql) in SQL_QUERIES.items()}
