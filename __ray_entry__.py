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
# The driver's correctness gate records at most 50 entries; every exposed
# query must land inside that window WITH its oracle, so these six stay
# out of the driver surface.  Each is a physical-plan or parameter
# VARIANT of a checked sibling, and all six remain fully verified by the
# local gate mirror (scripts/check_queries.py runs the complete
# SQL_QUERIES registry) and by pytest.
_LOCAL_ONLY = {
    "compare_pipeline_shuffle",  # plan variant of compare_pipeline (+ equivalence test)
    "session_window",            # gap-sessionization cousin of sessionize_events
    "user_hourly_activity",      # time-bucketed agg cousin of events_daily
    "supplier_nation_revenue",   # broadcast-join+agg cousin of nation/region_revenue
    "hash_sample",               # one-line hash-mod sampling
    "promo_revenue_ratio",       # single-row ratio agg cousin of token_stats
    # round-3 breadth additions (the exposed 50 are all driver-green;
    # these carry the same full-SQL oracle through the local mirror)
    "pii_redact",                # sequential regexp redaction + per-kind counts
    "tfidf_topk",                # open-vocab df join + per-doc top-k, both bucketed
    "inverted_index",            # token -> df/total_tf/postings, bucketed
    "value_histogram",           # mergeable fixed-bin histogram partials
    "stratified_sample",         # per-group md5-rate sampling (hash_sample cousin)
    "user_value_quantiles",      # dyadic multi-quantiles (user_value_median cousin)
    "near_dedup_keep",           # composed minhash->clusters->canonical filter
    "subword_token_stats",       # BPE-style pre-tokenizer token budget per doc
    "top_tokens_by_lang",        # per-group exact top-k over the open vocabulary
}


def queries() -> dict[str, Callable[[str], Any]]:
    from pdf_ocr_comparison_tool_ray.pipelines.queries import SQL_QUERIES

    return {
        name: fn
        for name, (fn, _sql) in SQL_QUERIES.items()
        if name not in _LOCAL_ONLY
    }


def oracle_sql() -> dict[str, str]:
    from pdf_ocr_comparison_tool_ray.pipelines.queries import SQL_QUERIES

    return {
        name: sql
        for name, (_fn, sql) in SQL_QUERIES.items()
        if name not in _LOCAL_ONLY
    }
