"""Edge-semantics unit tests for the round-4 operators, on planted
corpora (tiny parquet tables in a tmp sf_dir).  The DuckDB oracles pin
value parity on the driver tables; these pin the EDGE rules the synthetic
corpus may not exercise: over-budget docs in packing, cross-document
boilerplate in paragraph dedup, label exclusion in filtered ANN,
hand-computed NLL, per-source caps."""

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from pdf_ocr_comparison_tool_ray.pipelines.queries import (
    _PACK_BUDGET,
    _PACK_SHARDS,
    _QUOTA_K,
    q_bigram_logprob,
    q_domain_quota_sample,
    q_knn_filtered,
    q_pack_sequences,
    q_paragraph_dedup,
)


def _write_docs(tmp_path, rows):
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def _shard(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % _PACK_SHARDS


@pytest.mark.usefixtures("ray_session")
def test_pack_sequences_greedy_rules(tmp_path):
    # find three doc_ids in one shard so the greedy order is known
    ids = [i for i in range(1000) if _shard(i) == _shard(0)][:3]
    big = " ".join(["w"] * (_PACK_BUDGET + 50))       # over budget alone
    half = " ".join(["w"] * (_PACK_BUDGET // 2))      # two halves fit one bin
    rows = [
        {"doc_id": ids[0], "text": big},
        {"doc_id": ids[1], "text": half},
        {"doc_id": ids[2], "text": half},
    ]
    out = q_pack_sequences(_write_docs(tmp_path, rows)).to_pandas()
    out = out.set_index("doc_id")
    # over-budget doc gets bin 0 of its own; the two halves share bin 1
    assert out.loc[ids[0], "bin"] == 0
    assert out.loc[ids[1], "bin"] == 1 and out.loc[ids[2], "bin"] == 1
    assert out.loc[ids[0], "n_tokens"] == _PACK_BUDGET + 50


@pytest.mark.usefixtures("ray_session")
def test_paragraph_dedup_cross_doc_boilerplate(tmp_path):
    # 12-word pages: doc 1 = A B, doc 2 = A C (A = shared boilerplate
    # window) -> doc 2 keeps only C; doc 3 = A alone -> drops entirely
    a = " ".join(f"boiler{i}" for i in range(12))
    b = " ".join(f"bodyb{i}" for i in range(12))
    c = " ".join(f"bodyc{i}" for i in range(12))
    rows = [
        {"doc_id": 1, "text": f"{a} {b}"},
        {"doc_id": 2, "text": f"{a} {c}"},
        {"doc_id": 3, "text": a},
    ]
    out = (
        q_paragraph_dedup(_write_docs(tmp_path, rows))
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc["1", "text"] == f"{a} {b}" and out.loc["1", "n_kept"] == 2
    assert out.loc["2", "text"] == c and out.loc["2", "n_kept"] == 1
    assert "3" not in out.index  # every window already seen


@pytest.mark.usefixtures("ray_session")
def test_bigram_logprob_hand_computed(tmp_path):
    # corpus: doc 1 "a b a b", doc 2 "a b".  V = {a, b} -> 2.
    # bigrams: (a,b) x3, (b,a) x1.  c1: a->3, b->1.
    rows = [{"doc_id": 1, "text": "a b a b"}, {"doc_id": 2, "text": "a b"},
            {"doc_id": 3, "text": "solo"}]  # 1 token -> no bigram -> dropped
    out = (
        q_bigram_logprob(_write_docs(tmp_path, rows))
        .to_pandas()
        .set_index("doc_id")
    )
    p_ab = (3 + 1.0) / (3 + 3)   # V=3 (a, b, solo)
    p_ba = (1 + 1.0) / (1 + 3)
    want1 = -(math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    want2 = -math.log(p_ab)
    assert out.loc[1, "n_bigrams"] == 3
    assert abs(out.loc[1, "avg_nll"] - want1) < 1e-9
    assert abs(out.loc[2, "avg_nll"] - want2) < 1e-9
    assert 3 not in out.index


@pytest.mark.usefixtures("ray_session")
def test_knn_filtered_excludes_other_labels(tmp_path):
    # query = vec 0; vec 1 (label 1) is IDENTICAL to the query but must
    # be excluded; vecs 2/3 carry label 2 and are the only legal hits
    vecs = {
        0: ([1.0, 0.0, 0.0, 0.0], 1),
        1: ([1.0, 0.0, 0.0, 0.0], 1),
        2: ([0.9, 0.1, 0.0, 0.0], 2),
        3: ([0.0, 1.0, 0.0, 0.0], 2),
    }
    pd.DataFrame(
        {
            "vec_id": list(vecs),
            "embedding": [np.array(v[0], dtype=np.float32) for v in vecs.values()],
            "label": np.array([v[1] for v in vecs.values()], dtype=np.int32),
        }
    ).to_parquet(tmp_path / "embeddings.parquet")
    out = q_knn_filtered(str(tmp_path))
    hits = out[out["query_id"] == 0]
    assert set(hits["vec_id"]) == {2, 3}
    assert hits.sort_values("rk")["vec_id"].tolist() == [2, 3]


@pytest.mark.usefixtures("ray_session")
def test_domain_quota_sample_caps_hot_source(tmp_path):
    rows = [
        {"doc_id": i, "text": "t", "source": "hot"} for i in range(100)
    ] + [{"doc_id": 1000 + i, "text": "t", "source": "cold"} for i in range(3)]
    out = q_domain_quota_sample(_write_docs(tmp_path, rows))
    by = out.groupby("source")["doc_id"].apply(list)
    assert len(by["hot"]) == _QUOTA_K
    assert sorted(by["cold"]) == [1000, 1001, 1002]  # under cap: all kept
    # deterministic md5 pick: recompute expected winners
    want = sorted(
        range(100), key=lambda d: hashlib.md5(str(d).encode()).hexdigest()
    )[:_QUOTA_K]
    assert sorted(by["hot"]) == sorted(want)


# ---------------------------------------------------------------------------
# pure greedy-packing invariants (no Ray)
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_ocr_comparison_tool_ray.pipelines.queries import greedy_bins


def test_greedy_bins_zero_token_regression():
    """The hypothesis-found divergence, pinned explicitly: a zero-token
    doc opening a bin must NOT let the next over-budget doc join it
    (the SQL recursion starts a new bin; the engine now matches)."""
    assert greedy_bins([0, 2], 1) == [0, 1]
    assert greedy_bins([5, 0, 9], 4) == [0, 1, 2]


@given(
    st.lists(st.integers(0, 400), max_size=60),
    st.integers(1, 300),
)
@settings(max_examples=200)
def test_greedy_bins_invariants(tokens, budget):
    bins = greedy_bins(tokens, budget)
    assert len(bins) == len(tokens)
    if not bins:
        return
    # consecutive ids from 0 (each step same bin or +1)
    assert bins[0] == 0
    assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
    # every bin's total <= budget unless it holds exactly one doc
    # (an over-budget doc always sits alone — even a zero-token doc
    # opens a fresh bin after it, matching the SQL recursion)
    totals: dict[int, list[int]] = {}
    for n, b in zip(tokens, bins):
        totals.setdefault(b, []).append(n)
    for members in totals.values():
        assert sum(members) <= budget or len(members) == 1
    # greedy = no doc could move to the PREVIOUS bin (it was full for it)
    for (n, b) in zip(tokens, bins):
        if b > 0:
            prev_total = sum(totals[b - 1])
            first_in_bin = totals[b][0]
            if n == first_in_bin and bins.index(b) == len(
                [x for x in bins if x < b]
            ):
                assert prev_total + n > budget
