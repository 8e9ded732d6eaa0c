"""Fixed-point PageRank against an independent pure-Python reference on
a planted graph (dangling + isolated nodes exercised), plus rank-mass
accounting, and Gopher-filter rule precedence on constructed texts."""

from collections import Counter

import pandas as pd
import pytest
import ray

from pdf_ocr_comparison_tool_ray.stages.pagerank import pagerank_fixedpoint


def _ref_pagerank(edges, nodes, iters, num, den, scale):
    outdeg = Counter(s for s, _ in edges)
    n = len(nodes)
    r = {v: scale // n for v in nodes}
    base = ((den - num) * (scale // n)) // den
    for _ in range(iters):
        dang = sum(rv for v, rv in r.items() if outdeg[v] == 0)
        contrib = Counter()
        for s, d in edges:
            contrib[d] += r[s] // outdeg[s]
        r = {v: base + (num * (contrib[v] + dang // n)) // den for v in r}
    return r


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"),                      # d feeds c, receives nothing back
    ("e", "a"), ("e", "b"), ("e", "c"), ("e", "d"),
    # f is DANGLING (in-edges only), g is ISOLATED (no edges at all)
    ("a", "f"), ("b", "f"),
]
NODES = list("abcdefg")


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("iters", [1, 3])
@pytest.mark.parametrize("route", ["driver", "bucketed"])
def test_pagerank_matches_reference(iters, route, monkeypatch):
    """Both size-routed plans reproduce the pure-Python fixed-point
    reference EXACTLY (int64 sums are associative — no float slack)."""
    from pdf_ocr_comparison_tool_ray.stages import pagerank as prmod

    if route == "bucketed":
        monkeypatch.setattr(prmod, "PAGERANK_DRIVER_EDGES_MAX", -1)
    edges = ray.data.from_pandas(
        pd.DataFrame(EDGES, columns=["src", "dst"])
    ).repartition(3)
    nodes = ray.data.from_pandas(pd.DataFrame({"node": NODES})).repartition(2)
    got = (
        prmod.pagerank_fixedpoint(
            edges, nodes, iters=iters, scale=1 << 30, n_buckets=4
        )
        .to_pandas()
        .set_index("node")["rank_fp"]
        .to_dict()
    )
    want = _ref_pagerank(EDGES, NODES, iters, 85, 100, 1 << 30)
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_pagerank_mass_and_teleport_floor():
    scale, iters = 1 << 30, 3
    edges = ray.data.from_pandas(pd.DataFrame(EDGES, columns=["src", "dst"]))
    nodes = ray.data.from_pandas(pd.DataFrame({"node": NODES}))
    df = pagerank_fixedpoint(edges, nodes, iters=iters, scale=scale).to_pandas()
    # floor-division loses < 1 unit per node per floor site; total mass
    # stays within that quantization envelope of the full scale
    loss_bound = len(NODES) * (iters + 1) * 4 + len(EDGES) * iters
    assert 0 <= scale - int(df["rank_fp"].sum()) <= loss_bound
    # the isolated node receives exactly the teleport-only floor, and
    # nobody ranks below it
    floor = int(df.loc[df["node"] == "g", "rank_fp"].iloc[0])
    assert int(df["rank_fp"].min()) == floor
    # rank is the exact dyadic quotient (scale is a power of two)
    assert (df["rank"] == df["rank_fp"] / scale).all()


def _ref_labelprop(edges, nodes, iters):
    from collections import Counter

    lab = {v: v for v in nodes}
    for _ in range(iters):
        cnt = {}
        for s, d in edges:
            cnt.setdefault(d, Counter())[lab[s]] += 1
        new = dict(lab)
        for d, c in cnt.items():
            best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[d] = best
        lab = new
    return lab


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("route", ["driver", "bucketed"])
def test_label_propagation_matches_reference(route, monkeypatch):
    from pdf_ocr_comparison_tool_ray.stages import labelprop as lpmod

    if route == "bucketed":
        monkeypatch.setattr(lpmod, "LABELPROP_DRIVER_EDGES_MAX", -1)
    # two triangles bridged by one edge + the isolated node g
    lp_edges = [
        ("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("a", "c"),
        ("c", "a"), ("d", "e"), ("e", "d"), ("e", "f"), ("f", "e"),
        ("d", "f"), ("f", "d"), ("c", "d"),
    ]
    edges = ray.data.from_pandas(
        pd.DataFrame(lp_edges, columns=["src", "dst"])
    ).repartition(3)
    nodes = ray.data.from_pandas(pd.DataFrame({"node": NODES})).repartition(2)
    got = (
        lpmod.label_propagation(edges, nodes, iters=3, n_buckets=4)
        .to_pandas()
        .set_index("node")["label"]
        .to_dict()
    )
    want = _ref_labelprop(lp_edges, NODES, 3)
    assert got == want
    assert got["g"] == "g"  # isolated node keeps its own label


@pytest.mark.usefixtures("ray_session")
def test_chi2_keyness_planted_token(tmp_path):
    """A token planted exclusively in one language tops that language's
    keyness ranking, with chi2 matching the hand formula."""
    import ray.data  # noqa: F401  (session fixture)

    from pdf_ocr_comparison_tool_ray.pipelines.queries import q_chi2_keyness

    rows = []
    for i in range(40):
        lang = "aa" if i % 2 == 0 else "bb"
        text = f"common words here item{i:02d} filler"
        if lang == "aa":
            text += " zebraword"
        rows.append({"doc_id": i, "lang": lang, "text": text})
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    out = q_chi2_keyness(str(tmp_path))
    aa = out[out["lang"] == "aa"].reset_index(drop=True)
    assert aa.loc[0, "token"] == "zebraword"
    # a=20, b=0, c=0, d=20, N=40 -> chi2 = 40*(400)^2/(20*20*20*20) = 40
    assert aa.loc[0, "chi2"] == 40.0
    # tokens present in every doc carry no keyness signal anywhere
    assert "common" not in set(out["token"])


def _ref_hits(edges, nodes, iters, scale):
    hub = {v: scale // len(nodes) for v in nodes}
    auth = {v: 0 for v in nodes}
    for _ in range(iters):
        auth = {v: 0 for v in nodes}
        for s, d in edges:
            auth[d] += hub[s]
        t = sum(auth.values())
        if t:
            auth = {v: x * scale // t for v, x in auth.items()}
        hub = {v: 0 for v in nodes}
        for s, d in edges:
            hub[s] += auth[d]
        t = sum(hub.values())
        if t:
            hub = {v: x * scale // t for v, x in hub.items()}
    return hub, auth


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("route", ["driver", "bucketed"])
def test_hits_matches_reference(route, monkeypatch):
    from pdf_ocr_comparison_tool_ray.stages import hits as hmod

    # the bucketed leg runs ONE round: route equivalence is
    # iteration-independent and each bucketed round costs ~45 s of pure
    # task overhead at test scale (the driver leg keeps 3 rounds)
    iters = 3
    if route == "bucketed":
        monkeypatch.setattr(hmod, "HITS_DRIVER_EDGES_MAX", -1)
        iters = 1
    # directed bipartite-ish graph: a,b,e point at c,d,f; g isolated
    h_edges = [
        ("a", "c"), ("a", "d"), ("b", "c"), ("e", "c"), ("e", "d"),
        ("e", "f"), ("b", "f"),
    ]
    scale = 1 << 40
    edges = ray.data.from_pandas(
        pd.DataFrame(h_edges, columns=["src", "dst"])
    ).repartition(3)
    nodes = ray.data.from_pandas(pd.DataFrame({"node": NODES})).repartition(2)
    df = (
        hmod.hits_fixedpoint(
            edges, nodes, iters=iters, scale=scale, n_buckets=4
        )
        .to_pandas()
        .set_index("node")
    )
    want_h, want_a = _ref_hits(h_edges, NODES, iters, scale)
    assert df["hub_fp"].to_dict() == want_h
    assert df["auth_fp"].to_dict() == want_a
    # sinks carry no hub mass, sources no authority, isolated g neither
    assert df.loc["c", "hub_fp"] == 0 and df.loc["a", "auth_fp"] == 0
    assert df.loc["g", "hub_fp"] == 0 and df.loc["g", "auth_fp"] == 0
    # the best-connected hub (e) and authority (c) dominate
    assert df["hub_fp"].idxmax() == "e" and df["auth_fp"].idxmax() == "c"


def _ref_kmeans(X, k, iters):
    """Pure-Python fixed-point Lloyd on pre-quantized int matrices."""
    import numpy as np

    from pdf_ocr_comparison_tool_ray.stages.kmeans import OFFSET, QSCALE

    Q = np.floor((X + OFFSET) * QSCALE).astype(np.int64)
    C = Q[:k].copy()
    for _ in range(iters):
        d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        cid = d2.argmin(1)
        for c in range(k):
            m = cid == c
            if m.any():
                C[c] = Q[m].sum(0) // int(m.sum())
    d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    cid = d2.argmin(1)
    return cid, d2[np.arange(len(Q)), cid]


@pytest.mark.usefixtures("ray_session")
def test_kmeans_matches_reference_and_recovers_plant(tmp_path):
    import numpy as np

    from pdf_ocr_comparison_tool_ray.stages.kmeans import kmeans_fixedpoint

    rng = np.random.RandomState(11)
    centers = np.array([[0.4] * 8, [-0.4] * 8, [0.4] * 4 + [-0.4] * 4,
                        [-0.4] * 4 + [0.4] * 4])
    plant = np.tile(np.arange(4), 25)  # seeds (rows 0-3) span all groups
    X = (centers[plant] + rng.uniform(-0.05, 0.05, (100, 8))).astype(
        np.float32
    ).astype(np.float64)
    df = pd.DataFrame(
        {"vec_id": range(100), "embedding": [r.tolist() for r in X]}
    )
    ds = ray.data.from_pandas(df).repartition(4)
    got = (
        kmeans_fixedpoint(ds, k=4, iters=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # vec_ids are pre-sorted, so reference init (first k rows) matches
    want_cid, want_d2 = _ref_kmeans(X, 4, 2)
    assert got["cluster"].tolist() == want_cid.tolist()
    assert got["dist2"].tolist() == want_d2.tolist()
    # well-separated plant: every planted group lands in ONE cluster,
    # and distinct groups in distinct clusters
    lab = got["cluster"].to_numpy()
    assert all(len(set(lab[plant == g])) == 1 for g in range(4))
    assert len({lab[plant == g][0] for g in range(4)}) == 4


def test_gopher_verdict_rule_precedence():
    from pdf_ocr_comparison_tool_ray.functions.quality import (
        GOPHER_MIN_WORDS,
        gopher_verdict,
        quality_signals,
        repetition_signals,
    )

    def verdict(text):
        return gopher_verdict(quality_signals(text), repetition_signals(text))

    assert verdict("tiny doc") == "too_short"
    assert verdict("word " * 200) == "too_long"
    # 30 distinct long words -> word_len fires before stopword check
    longw = " ".join(f"extraordinarily{i}" for i in range(30))
    assert verdict(longw) == "word_len"
    # right length + word size (4 chars, mean inside [4,5]) but no stopwords
    nostop = " ".join(f"ab{i:02d}" for i in range(40))
    assert verdict(nostop) == "few_stopwords"
    # stopword-bearing but one word repeated heavily -> dup_words
    dup = "the " + "same " * 49
    sig = quality_signals(dup)
    assert sig["n_words"] >= GOPHER_MIN_WORDS
    assert verdict(dup) in ("dup_words", "word_len")  # mean len 3.94 edge
    dup2 = "with with with " + "also " * 45  # mean word len exactly 4.0
    assert verdict(dup2) == "dup_words"
    # clean: varied words with stopwords sprinkled in
    clean = " ".join(
        ("the" if i % 5 == 0 else f"itm{i:02d}") for i in range(60)
    )  # mean word len (12*3 + 48*5)/60 = 4.6
    assert verdict(clean) == ""
