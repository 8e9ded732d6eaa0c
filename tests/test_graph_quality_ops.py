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
