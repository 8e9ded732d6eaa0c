"""Edge-semantics tests for the round-5 final-continuation operators,
each against an independent brute-force reimplementation on planted
corpora: Apriori frequent itemsets (candidate pruning == unpruned
answer, cross-block basket dedup) and sorted-neighborhood blocking
(window semantics over the total order, exactly-once pair emission
across rank-block boundaries, Jaccard verify)."""

from itertools import combinations

import numpy as np
import pandas as pd

from pdf_ocr_comparison_tool_ray.pipelines.queries import (
    _FI_MINSUP,
    _SNM_THR,
    _SNM_W,
    q_frequent_itemsets,
    q_sorted_neighborhood_pairs,
)


def _write_lineitem(tmp_path, orders):
    rows = []
    for ok, parts in enumerate(orders, start=1):
        for p in parts:
            rows.append({"l_orderkey": ok, "l_partkey": p})
    pd.DataFrame(rows).to_parquet(tmp_path / "lineitem.parquet")
    return str(tmp_path)


def _write_docs(tmp_path, texts):
    pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    ).to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def _brute_itemsets(orders, minsup):
    """All size-2/3 itemsets with support >= minsup, over DEDUPED baskets."""
    out = {}
    for parts in orders:
        basket = sorted(set(parts))
        for sz in (2, 3):
            for c in combinations(basket, sz):
                out[c] = out.get(c, 0) + 1
    return {k: v for k, v in out.items() if v >= minsup}


def test_frequent_itemsets_vs_brute(ray_session, tmp_path):
    rng = np.random.RandomState(11)
    orders = [
        list(rng.randint(0, 12, size=rng.randint(2, 6)))
        for _ in range(60)
    ]
    # plant a guaranteed frequent triple + duplicate lines in one basket
    orders += [[1, 2, 3], [1, 2, 3, 7], [1, 2, 2, 3]]
    got = q_frequent_itemsets(_write_lineitem(tmp_path, orders)).to_pandas()
    want = _brute_itemsets(orders, _FI_MINSUP)
    got_map = {}
    for r in got.itertuples():
        key = (r.i1, r.i2) if r.sz == 2 else (r.i1, r.i2, r.i3)
        got_map[key] = r.support
        assert (r.i3 == -1) == (r.sz == 2)
    assert got_map == want
    assert got_map[(1, 2, 3)] >= 3  # the planted triple (dup line deduped)


def test_frequent_itemsets_no_triples(ray_session, tmp_path):
    # disjoint pairs only: frequent pairs exist, zero frequent triples
    orders = [[1, 2], [1, 2], [3, 4], [3, 4], [5, 6]]
    got = q_frequent_itemsets(_write_lineitem(tmp_path, orders)).to_pandas()
    assert set(got["sz"]) == {2}
    assert {(r.i1, r.i2) for r in got.itertuples()} == {(1, 2), (3, 4)}


def test_frequent_itemsets_basket_spanning_blocks(ray_session, tmp_path):
    # one order repeated many times as separate rows: per-batch dedup
    # undercounts if the basket spans read blocks; support must count
    # ORDERS, not rows
    orders = [[1, 2] * 50, [1, 2]]  # 100 rows for order 1, 2 for order 2
    got = q_frequent_itemsets(_write_lineitem(tmp_path, orders)).to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["support"] == 2


def _brute_snm(texts, w, thr):
    """Window-w pairs over the (normalized text, doc_id) total order."""
    nt = [" ".join(t.lower().split()) for t in texts]
    order = sorted(range(len(texts)), key=lambda i: (nt[i], i))
    out = []
    for a in range(len(order)):
        for b in range(a + 1, min(a + w, len(order))):
            i, j = order[a], order[b]
            ta, tb = set(nt[i].split(" ")), set(nt[j].split(" "))
            c = len(ta & tb)
            jv = c / (len(ta) + len(tb) - c)
            if jv >= thr:
                out.append((i, j, jv))
    return sorted(out)


def test_snm_pairs_vs_brute(ray_session, tmp_path):
    rng = np.random.RandomState(5)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(3, 7)))
        for _ in range(80)
    ]
    # plant exact dups and a near-dup with messy whitespace
    texts += [texts[0], "  " + texts[1].upper() + "  ", texts[2] + " zeta"]
    got = q_sorted_neighborhood_pairs(_write_docs(tmp_path, texts)).to_pandas()
    got_set = sorted(
        (int(r.d1), int(r.d2), float(r.jacc)) for r in got.itertuples()
    )
    assert got_set == _brute_snm(texts, _SNM_W, _SNM_THR)
    assert len(got_set) > 0  # the planted dups must surface


def test_snm_exactly_once_across_block_boundary(ray_session, tmp_path):
    # every doc identical: every in-window pair qualifies with jacc=1;
    # emission count must be exactly n*(w-1) - (w-1)*w/2 (tail windows
    # truncate), each pair once, regardless of rank-block boundaries
    n = 23
    texts = ["same words here"] * n
    got = q_sorted_neighborhood_pairs(_write_docs(tmp_path, texts)).to_pandas()
    expect = sum(min(_SNM_W - 1, n - 1 - a) for a in range(n))
    assert len(got) == expect
    assert not got.duplicated(["d1", "d2"]).any()
    assert (got["jacc"] == 1.0).all()
    # ranks tie-break on doc_id, so every emitted pair has d1 < d2 here
    assert (got["d1"] < got["d2"]).all()


def test_snm_tiny_input_no_window(ray_session, tmp_path):
    got = q_sorted_neighborhood_pairs(
        _write_docs(tmp_path, ["a b c", "a b c"])
    ).to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["jacc"] == 1.0
