"""Edge-semantics unit tests for the round-5 continuation operators,
each against an independent brute-force reimplementation on planted
corpora: skyline dominance (ties, strict dominance, incomparability,
cross-block merge)."""

import numpy as np
import pandas as pd
import pytest

from pdf_ocr_comparison_tool_ray.pipelines.queries import (
    _ZORDER_SHARDS_LOG2,
    _morton16,
    _skyline_pairs,
    q_funnel_stages,
    q_global_rank,
    q_item_cf_topk,
    q_jsd_source_drift,
    q_naive_bayes_classify,
    q_rollup_stats,
    q_skyline_select,
    q_triangle_count,
    q_upsert_merge,
    q_zorder_layout,
)


def _write_lineitem(tmp_path, orders):
    """orders: list of part lists; one synthetic lineitem row per part."""
    rows = []
    for ok, parts in enumerate(orders, start=1):
        for p in parts:
            rows.append(
                {
                    "l_orderkey": ok,
                    "l_partkey": p,
                    "l_suppkey": 1,
                    "l_quantity": 1.0,
                    "l_extendedprice": 1.0,
                    "l_discount": 0.0,
                    "l_tax": 0.0,
                    "l_returnflag": "N",
                    "l_linestatus": "O",
                    "l_shipdate": pd.Timestamp("1995-06-01"),
                }
            )
    pd.DataFrame(rows).to_parquet(tmp_path / "lineitem.parquet")
    return str(tmp_path)


def _write_docs(tmp_path, rows):
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def _brute_skyline(points):
    """O(n^2) dominance check: keep p iff no q >= p on both dims with
    one strict."""
    out = []
    for i, (a1, a2) in enumerate(points):
        dominated = any(
            b1 >= a1 and b2 >= a2 and (b1 > a1 or b2 > a2)
            for j, (b1, b2) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append(i)
    return out


def test_skyline_pairs_vs_brute():
    rng = np.random.RandomState(7)
    for n in (1, 2, 17, 200):
        m1 = rng.randint(0, 12, size=n).astype(np.int64)
        m2 = rng.randint(0, 12, size=n).astype(np.int64)
        s1, s2 = _skyline_pairs(m1, m2)
        got = set(zip(s1.tolist(), s2.tolist()))
        idx = _brute_skyline(list(zip(m1.tolist(), m2.tolist())))
        want = {(int(m1[i]), int(m2[i])) for i in idx}
        assert got == want


def test_skyline_pairs_empty():
    e = np.array([], dtype=np.int64)
    s1, s2 = _skyline_pairs(e, e)
    assert len(s1) == 0 and len(s2) == 0


@pytest.mark.usefixtures("ray_session")
def test_skyline_select_planted(tmp_path):
    # texts engineered so vocab (distinct [A-Za-z0-9]+ tokens) is the
    # word count; chars is the planted n_chars column.
    rows = [
        # (chars, vocab): (100, 3) and (100, 3) — exact tie, BOTH stay
        {"doc_id": 1, "text": "alpha beta gamma", "n_chars": 100},
        {"doc_id": 2, "text": "delta epsilon zeta", "n_chars": 100},
        # (90, 5): incomparable with (100, 3) — stays
        {"doc_id": 3, "text": "one two three four five", "n_chars": 90},
        # (80, 2): dominated by doc 3 (90>=80, 5>=2, strict) — dropped
        {"doc_id": 4, "text": "six seven", "n_chars": 80},
        # (100, 2): dominated by docs 1/2 (equal chars, fewer vocab)
        {"doc_id": 5, "text": "eight nine", "n_chars": 100},
        # (101, 1): max chars — stays
        {"doc_id": 6, "text": "ten", "n_chars": 101},
    ]
    out = q_skyline_select(_write_docs(tmp_path, rows))
    assert out["doc_id"].tolist() == [1, 2, 3, 6]
    assert out["chars"].tolist() == [100, 100, 90, 101]
    assert out["vocab"].tolist() == [3, 3, 5, 1]


def test_morton16_vs_brute():
    rng = np.random.RandomState(11)
    qx = rng.randint(0, 65536, size=300).astype(np.int64)
    qy = rng.randint(0, 65536, size=300).astype(np.int64)
    got = _morton16(qx, qy)
    for x, y, z in zip(qx.tolist(), qy.tolist(), got.tolist()):
        want = 0
        for i in range(16):
            want |= ((x >> i) & 1) << (2 * i)
            want |= ((y >> i) & 1) << (2 * i + 1)
        assert z == want


def test_zorder_data_skipping_beats_single_dim_layout():
    """The point of Z-order: a predicate on the SECOND dimension prunes
    most shards under the Morton layout but nothing under an
    x-sorted layout (whose zone maps all span the full y range)."""
    rng = np.random.RandomState(3)
    n, shards = 20000, 1 << _ZORDER_SHARDS_LOG2
    x = rng.randint(0, 65536, size=n).astype(np.int64)
    y = rng.randint(0, 65536, size=n).astype(np.int64)
    # y-only box predicate covering ~1/8 of the domain
    y0, y1 = 8192, 16384

    shard_z = _morton16(x, y) >> (32 - _ZORDER_SHARDS_LOG2)
    df = pd.DataFrame({"s": shard_z, "y": y})
    zm = df.groupby("s")["y"].agg(["min", "max"])
    touched_z = int(((zm["min"] <= y1) & (zm["max"] >= y0)).sum())

    shard_x = np.argsort(np.argsort(x)) * shards // n  # x-sorted layout
    dfx = pd.DataFrame({"s": shard_x, "y": y})
    zmx = dfx.groupby("s")["y"].agg(["min", "max"])
    touched_x = int(((zmx["min"] <= y1) & (zmx["max"] >= y0)).sum())

    assert touched_x == shards  # x-sort cannot prune a y predicate
    assert touched_z <= shards // 4  # Morton layout prunes >= 75%


@pytest.mark.usefixtures("ray_session")
def test_zorder_layout_manifest(tmp_path):
    # 4 corner clusters -> distinct Morton quadrants; counts and zone
    # maps must match the planted clusters exactly.
    rows = []
    oid = 0
    for cust, day, cnt in [
        (10, "1994-01-01", 5),    # lo/lo quadrant
        (9990, "1994-01-02", 7),  # hi/lo
        (11, "1998-12-30", 3),    # lo/hi
        (9991, "1998-12-31", 4),  # hi/hi
    ]:
        for _ in range(cnt):
            rows.append(
                {
                    "o_orderkey": oid,
                    "o_custkey": cust,
                    "o_orderstatus": "O",
                    "o_totalprice": 1.0,
                    "o_orderdate": pd.Timestamp(day),
                    "o_orderpriority": "1-URGENT",
                }
            )
            oid += 1
    pd.DataFrame(rows).to_parquet(tmp_path / "orders.parquet")
    out = q_zorder_layout(str(tmp_path))
    assert out["cnt"].sum() == 19
    assert len(out) == 4  # one shard per corner cluster
    assert sorted(out["cnt"].tolist()) == [3, 4, 5, 7]
    # zone maps are tight: each shard's cust min == max (single cluster)
    assert (out["min_cust"] == out["max_cust"]).all()


@pytest.mark.usefixtures("ray_session")
def test_upsert_merge_semantics(tmp_path):
    # keys chosen to hit every CDC branch:
    #   31  -> DELETE tombstone (vanishes)
    #   5   -> UPDATE (price*1.1, status U, version 2)
    #   155 -> %31 AND %5: delete takes priority (vanishes)
    #   97  -> spawns an INSERT at key 97+max_key; base row unchanged
    #   3   -> untouched base row (version 1)
    rows = [
        {"o_orderkey": k, "o_custkey": 1, "o_orderstatus": "O",
         "o_totalprice": float(100 * k), "o_orderdate": pd.Timestamp("1995-01-01"),
         "o_orderpriority": "1-URGENT"}
        for k in (3, 5, 31, 97, 155)
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "orders.parquet")
    out = (
        q_upsert_merge(str(tmp_path))
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    snap = {
        int(r.o_orderkey): (r.o_totalprice, r.o_orderstatus, int(r.version))
        for r in out.itertuples()
    }
    assert set(snap) == {3, 5, 97, 97 + 155}
    assert snap[3] == (300.0, "O", 1)           # untouched base
    assert snap[5] == (500.0 * 1.1, "U", 2)     # update won
    assert snap[97] == (9700.0, "O", 1)         # insert source unchanged
    assert snap[97 + 155] == (9700.0 + 1000.0, "N", 2)  # fresh insert
    assert 31 not in snap and 155 not in snap   # tombstones dropped


@pytest.mark.usefixtures("ray_session")
def test_jsd_source_drift_vs_dense_brute(tmp_path):
    import re as _re
    from collections import Counter

    rows = [
        {"doc_id": 1, "text": "apple apple banana cherry", "source": "a"},
        {"doc_id": 2, "text": "apple durian durian", "source": "a"},
        {"doc_id": 3, "text": "xylophone zebra zebra quartz", "source": "b"},
        {"doc_id": 4, "text": "apple banana banana zebra", "source": "c"},
    ]
    out = q_jsd_source_drift(_write_docs(tmp_path, rows))

    # dense brute force over the full source x vocab cross
    tok_re = _re.compile(r"[A-Za-z0-9]+")
    per = {}
    for r in rows:
        per.setdefault(r["source"], Counter()).update(
            tok_re.findall(r["text"])
        )
    glob = Counter()
    for c in per.values():
        glob.update(c)
    vocab = sorted(glob)
    nn = sum(glob.values())
    q = np.array([glob[t] / nn for t in vocab])
    want = {}
    for s, cnt in per.items():
        n = sum(cnt.values())
        p = np.array([cnt[t] / n for t in vocab])
        m = (p + q) / 2
        kl_pm = np.where(p > 0, p * np.log(np.where(p > 0, p, 1) / m), 0.0)
        kl_qm = np.where(q > 0, q * np.log(np.where(q > 0, q, 1) / m), 0.0)
        want[s] = 0.5 * kl_pm.sum() + 0.5 * kl_qm.sum()

    got = dict(zip(out["source"], out["jsd"]))
    assert set(got) == set(want)
    for s in want:
        assert abs(got[s] - want[s]) < 1e-12
        assert 0.0 <= got[s] <= np.log(2.0) + 1e-12


@pytest.mark.usefixtures("ray_session")
def test_naive_bayes_vs_brute(tmp_path):
    import math
    import re as _re
    from collections import Counter

    rows = [
        {"doc_id": 1, "text": "hund katze hund maus", "lang": "de"},
        {"doc_id": 2, "text": "katze katze vogel", "lang": "de"},
        {"doc_id": 3, "text": "dog cat dog mouse", "lang": "en"},
        {"doc_id": 4, "text": "cat bird bird", "lang": "en"},
        {"doc_id": 5, "text": "dog hund", "lang": "en"},  # mixed doc
    ]
    out = q_naive_bayes_classify(_write_docs(tmp_path, rows)).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)

    tok_re = _re.compile(r"[A-Za-z0-9]+")
    ct: dict = {}
    docs_per: Counter = Counter()
    vocab = set()
    for r in rows:
        docs_per[r["lang"]] += 1
        cnt = ct.setdefault(r["lang"], Counter())
        toks = tok_re.findall(r["text"])
        cnt.update(toks)
        vocab.update(toks)
    langs = sorted(ct)
    v = len(vocab)
    for r in rows:
        want_scores = {}
        for lg in langs:
            n_c = sum(ct[lg].values())
            s = math.log(docs_per[lg] / len(rows))
            for tok, dc in Counter(tok_re.findall(r["text"])).items():
                s += dc * math.log((ct[lg][tok] + 1) / (n_c + v))
            want_scores[lg] = s
        best = min(langs, key=lambda lg: (-want_scores[lg], lg))
        got = out[out["doc_id"] == r["doc_id"]].iloc[0]
        assert got["pred_lang"] == best
        assert abs(got["score"] - want_scores[best]) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_naive_bayes_tie_breaks_on_label(tmp_path):
    # perfectly symmetric classes -> every score ties -> smallest label
    rows = [
        {"doc_id": 1, "text": "aa bb", "lang": "x"},
        {"doc_id": 2, "text": "aa bb", "lang": "y"},
        {"doc_id": 3, "text": "aa bb", "lang": "y"},
        {"doc_id": 4, "text": "aa bb", "lang": "x"},
    ]
    out = q_naive_bayes_classify(_write_docs(tmp_path, rows)).to_pandas()
    assert (out["pred_lang"] == "x").all()


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_k4(tmp_path):
    # one order containing 4 parts -> K4: C(4,2)=6 edges, C(4,3)=4 triangles
    out = q_triangle_count(_write_lineitem(tmp_path, [[1, 2, 3, 4]]))
    assert out["n_edges"].iloc[0] == 6
    assert out["n_triangles"].iloc[0] == 4


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_star_and_closure(tmp_path):
    # star via pairwise orders (hub 1 with leaves 2..6): 5 edges, no
    # triangles; closing one leaf pair (2,3) adds exactly 1 triangle.
    star = [[1, leaf] for leaf in (2, 3, 4, 5, 6)]
    out = q_triangle_count(_write_lineitem(tmp_path, star))
    assert out["n_edges"].iloc[0] == 5
    assert out["n_triangles"].iloc[0] == 0

    closed = star + [[2, 3]]
    out2 = q_triangle_count(_write_lineitem(tmp_path, closed))
    assert out2["n_edges"].iloc[0] == 6
    assert out2["n_triangles"].iloc[0] == 1


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_vs_brute_random(tmp_path):
    from itertools import combinations

    rng = np.random.RandomState(5)
    orders = [
        sorted(rng.choice(np.arange(1, 13), size=rng.randint(2, 5),
                          replace=False).tolist())
        for _ in range(25)
    ]
    edges = set()
    for parts in orders:
        edges.update(combinations(sorted(set(parts)), 2))
    tri = sum(
        1
        for a, b, c in combinations(sorted({p for o in orders for p in o}), 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    )
    out = q_triangle_count(_write_lineitem(tmp_path, orders))
    assert out["n_edges"].iloc[0] == len(edges)
    assert out["n_triangles"].iloc[0] == tri


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_semi_join_route_equivalence(tmp_path, monkeypatch):
    """Forcing the above-cap co-partition route must reproduce the
    broadcast-probe route's counts exactly."""
    import pdf_ocr_comparison_tool_ray.pipelines.queries as Q

    orders = [[1, 2, 3, 4], [3, 4, 5], [5, 6], [1, 5, 6]]
    sf = _write_lineitem(tmp_path, orders)
    base = q_triangle_count(sf)
    monkeypatch.setattr(Q, "_TRI_BCAST_CAP", 0)
    forced = q_triangle_count(sf)
    assert base["n_edges"].iloc[0] == forced["n_edges"].iloc[0]
    assert base["n_triangles"].iloc[0] == forced["n_triangles"].iloc[0]


def _write_events(tmp_path, rows):
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"])
    df["event_id"] = np.arange(1, len(df) + 1)
    df["value"] = 1.0
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet")
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
def test_funnel_ordering_semantics(tmp_path):
    rows = [
        # user 1: full ordered funnel -> reached 3
        {"user_id": 1, "event_type": "view", "ts": "2024-01-01 10:00"},
        {"user_id": 1, "event_type": "click", "ts": "2024-01-01 11:00"},
        {"user_id": 1, "event_type": "purchase", "ts": "2024-01-01 12:00"},
        # user 2: click BEFORE first view -> stuck at 1
        {"user_id": 2, "event_type": "click", "ts": "2024-01-02 09:00"},
        {"user_id": 2, "event_type": "view", "ts": "2024-01-02 10:00"},
        # user 3: click at the SAME instant as view (strictly-after
        # rule) -> stuck at 1
        {"user_id": 3, "event_type": "view", "ts": "2024-01-03 10:00"},
        {"user_id": 3, "event_type": "click", "ts": "2024-01-03 10:00"},
        # user 4: no view at all -> reached 0
        {"user_id": 4, "event_type": "error", "ts": "2024-01-04 10:00"},
        # user 5: view then purchase but no click -> stuck at 1
        {"user_id": 5, "event_type": "view", "ts": "2024-01-05 10:00"},
        {"user_id": 5, "event_type": "purchase", "ts": "2024-01-05 11:00"},
        # user 6: second view later; click after first view counts -> 2
        {"user_id": 6, "event_type": "view", "ts": "2024-01-06 10:00"},
        {"user_id": 6, "event_type": "click", "ts": "2024-01-06 10:30"},
        {"user_id": 6, "event_type": "view", "ts": "2024-01-06 11:00"},
    ]
    out = (
        q_funnel_stages(_write_events(tmp_path, rows))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert dict(zip(out["user_id"], out["reached"])) == {
        1: 3, 2: 1, 3: 1, 4: 0, 5: 1, 6: 2,
    }


@pytest.mark.usefixtures("ray_session")
def test_rollup_levels(tmp_path):
    rows = [
        {"doc_id": 1, "text": "x", "lang": "en", "source": "web",
         "n_chars": 10},
        {"doc_id": 2, "text": "x", "lang": "en", "source": "web",
         "n_chars": 20},
        {"doc_id": 3, "text": "x", "lang": "en", "source": "book",
         "n_chars": 5},
        {"doc_id": 4, "text": "x", "lang": "de", "source": "web",
         "n_chars": 7},
    ]
    out = q_rollup_stats(_write_docs(tmp_path, rows))
    m = {
        (r.lang, r.source): (int(r.n_docs), int(r.sum_chars))
        for r in out.itertuples()
    }
    assert m[("en", "web")] == (2, 30)
    assert m[("en", "book")] == (1, 5)
    assert m[("de", "web")] == (1, 7)
    assert m[("en", "ALL")] == (3, 35)
    assert m[("de", "ALL")] == (1, 7)
    assert m[("ALL", "ALL")] == (4, 42)
    assert len(m) == 6


@pytest.mark.usefixtures("ray_session")
def test_item_cf_scores_and_ties(tmp_path):
    # baskets: {1,2} x2, {1,3}, {2,3}, plus a duplicate (order, part)
    # row for part 1 in the first order (must NOT inflate frequencies)
    orders = [[1, 2, 1], [1, 2], [1, 3], [2, 3]]
    out = (
        q_item_cf_topk(_write_lineitem(tmp_path, orders))
        .to_pandas()
        .sort_values(["item", "nbr"])
        .reset_index(drop=True)
    )
    # frequencies: n1=3, n2=3, n3=2; co-counts: c12=2, c13=1, c23=1
    want = {
        (1, 2): 2 / np.sqrt(3 * 3),
        (1, 3): 1 / np.sqrt(3 * 2),
        (2, 1): 2 / np.sqrt(3 * 3),
        (2, 3): 1 / np.sqrt(3 * 2),
        (3, 1): 1 / np.sqrt(2 * 3),
        (3, 2): 1 / np.sqrt(2 * 3),
    }
    got = {
        (int(r.item), int(r.nbr)): r.score for r in out.itertuples()
    }
    assert got == want  # bit-exact: same integer inputs, same expression
    # item 3's two neighbors tie exactly; output keeps both, nbr asc
    sub = out[out["item"] == 3]
    assert sub["nbr"].tolist() == [1, 2]


def _write_orders(tmp_path, prices):
    rows = [
        {
            "o_orderkey": i + 1,
            "o_custkey": 1,
            "o_orderstatus": "O",
            "o_totalprice": float(p),
            "o_orderdate": pd.Timestamp("1995-01-01"),
            "o_orderpriority": "1-URGENT",
        }
        for i, p in enumerate(prices)
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "orders.parquet")
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
def test_global_rank_exact_with_heavy_ties(tmp_path):
    # many duplicate prices (they must co-locate in one range) plus a
    # tiny sample (keys 16/32/48... only) so bounds are coarse — the
    # rank must still be the exact (price, orderkey) row_number
    rng = np.random.RandomState(9)
    prices = rng.choice([10.0, 20.0, 20.0, 30.0, 40.0], size=200).tolist()
    out = (
        q_global_rank(_write_orders(tmp_path, prices))
        .to_pandas()
        .sort_values("rnk")
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame(
            {
                "o_orderkey": np.arange(1, 201),
                "o_totalprice": prices,
            }
        )
        .sort_values(["o_totalprice", "o_orderkey"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert out["rnk"].tolist() == list(range(1, 201))
    assert out["o_orderkey"].tolist() == want["o_orderkey"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_global_rank_tiny_input_empty_sample(tmp_path):
    # 3 rows, none with orderkey % 16 == 0 -> empty sample -> one range
    out = (
        q_global_rank(_write_orders(tmp_path, [5.0, 1.0, 3.0]))
        .to_pandas()
        .sort_values("rnk")
    )
    assert out["o_orderkey"].tolist() == [2, 3, 1]
    assert out["rnk"].tolist() == [1, 2, 3]


@pytest.mark.usefixtures("ray_session")
def test_jsd_single_source_is_zero(tmp_path):
    rows = [
        {"doc_id": 1, "text": "only one source here", "source": "solo"},
        {"doc_id": 2, "text": "more words from it", "source": "solo"},
    ]
    out = q_jsd_source_drift(_write_docs(tmp_path, rows))
    # sole source == corpus distribution -> divergence exactly 0
    assert len(out) == 1
    assert abs(float(out["jsd"].iloc[0])) < 1e-15
