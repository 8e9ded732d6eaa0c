"""In-suite oracle parity: a fast subset of the DuckDB-checked queries at
sf0.001, using the same compare the driver-mirror script uses.  The full
suite runs via ``python scripts/check_queries.py /root/testdata/sf0.01``."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

SF = "/root/testdata/sf0.001"

FAST_QUERIES = [
    "normalize_hash",
    "classify_documents",
    "lang_id",
    "events_daily",
    "timeline",
    "rolling_user_value",
    "order_events_1d",
    "hash_sample",
    "split_runs",
    "customers_without_orders",
    "asof_event_order",
    "region_revenue",
    "pii_redact",
    "tfidf_topk",
    "inverted_index",
    "value_histogram",
    "stratified_sample",
    "user_value_quantiles",
    "near_dedup_keep",
    "subword_token_stats",
    "top_tokens_by_lang",
    # round-5 SemDeDup (cluster-based semantic dedup) + DSIR selection
    "semdedup",
    "dsir_select",
    # round-4 breadth
    "paragraph_dedup",
    "pack_sequences",
    "bigram_logprob",
    "knn_filtered",
    "domain_quota_sample",
    # round-5 continuation: BM25 ranked retrieval + exact SSJoin
    "bm25_topk",
    "set_similarity_join",
]


@pytest.fixture(scope="module")
def duck():
    from check_queries import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(name, duck):
    from check_queries import compare, to_df

    from pdf_ocr_comparison_tool_ray.pipelines.queries import SQL_QUERIES

    fn, sql = SQL_QUERIES[name]
    ray_df = to_df(fn(SF))
    sql_df = duck.execute(sql).df()
    assert compare(name, ray_df, sql_df), f"{name} diverged from its oracle"


@pytest.mark.usefixtures("ray_session")
def test_exact_match_join_paths_equivalent(monkeypatch):
    """The size-routed exact-match join must produce identical pairs on
    both physical plans: broadcast index (small build) and co-partition
    equi-join (build side above the broadcast cap)."""
    from check_queries import to_df

    from pdf_ocr_comparison_tool_ray.pipelines import compare as compare_mod
    from pdf_ocr_comparison_tool_ray.pipelines.queries import q_exact_match_join

    def run():
        df = to_df(q_exact_match_join(SF))
        return (
            df.sort_values(["source_doc_id", "target_doc_id"])
            .reset_index(drop=True)
        )

    broadcast = run()
    monkeypatch.setattr(compare_mod, "BROADCAST_MAX_BUILD_ROWS", 1)
    shuffled = run()
    assert broadcast.equals(shuffled)
    assert len(broadcast) > 0


@pytest.mark.usefixtures("ray_session")
def test_region_revenue_routes_equivalent(monkeypatch):
    """region_revenue's size-routed build side: the shuffle-free
    broadcast map (customer under the cap) and the bucketed
    co-partition join (large build) must agree — the bucketed branch
    never fires at test corpus sizes, so force it by zeroing the cap."""
    from check_queries import to_df

    from pdf_ocr_comparison_tool_ray.pipelines import compare as compare_mod
    from pdf_ocr_comparison_tool_ray.pipelines.queries import q_region_revenue

    def run():
        return (
            to_df(q_region_revenue(SF))
            .sort_values("r_name")
            .reset_index(drop=True)
        )

    broadcast = run()
    monkeypatch.setattr(compare_mod, "BROADCAST_MAX_BUILD_ROWS", -1)
    bucketed = run()
    import pandas as pd

    pd.testing.assert_frame_equal(bucketed[broadcast.columns], broadcast)
    assert len(broadcast) == 5  # all five regions present


@pytest.mark.usefixtures("ray_session")
def test_tfidf_routes_equivalent(monkeypatch):
    """tf-idf's size-routed df attach: broadcast lookup (vocab under the
    cap) vs bucketed token join (oversized-vocab fallback) must agree."""
    from check_queries import to_df

    from pdf_ocr_comparison_tool_ray.pipelines import queries as q_mod

    def run():
        return (
            to_df(q_mod.q_tfidf_topk(SF))
            .sort_values(["doc_id", "rk"])
            .reset_index(drop=True)
        )

    broadcast = run()
    monkeypatch.setattr(q_mod, "TFIDF_BROADCAST_VOCAB_MAX", -1)
    joined = run()
    import pandas as pd

    pd.testing.assert_frame_equal(joined[broadcast.columns], broadcast)
    assert len(broadcast) > 0
