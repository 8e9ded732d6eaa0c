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


def _brute_heavy_hitters(texts, k):
    from collections import Counter

    cnt = Counter()
    for t in texts:
        cnt.update(re.findall(r"[A-Za-z0-9]+", t))
    n = sum(cnt.values())
    hh = [(t, c) for t, c in cnt.items() if c * k > n]
    return sorted(hh, key=lambda tc: (-tc[1], tc[0]))


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_zipf_vocab_exceeds_k(tmp_path):
    """Vocabulary (500 tokens) >> k (32): per-batch MG compression must
    actually prune, and the two-pass result still equals brute-force
    exactly — including a token sitting just ABOVE the N/k threshold
    and one just BELOW it (strict > boundary)."""
    import numpy as np

    from pdf_ocr_comparison_tool_ray.pipelines.queries import (
        _HH_K,
        q_heavy_hitters,
    )

    rng = np.random.default_rng(11)
    vocab = [f"tk{i:03d}" for i in range(500)]
    # zipf-ish weights: a handful of heavy tokens over a long tail
    weights = 1.0 / np.arange(1, len(vocab) + 1) ** 1.3
    weights /= weights.sum()
    draws = rng.choice(len(vocab), size=12_000, p=weights)
    toks = [vocab[i] for i in draws]
    # plant boundary tokens: N grows by the planted copies too, so
    # compute the final N first and place counts around N/k
    extra_above = extra_below = None
    n0 = len(toks)
    # solve c*k > n for the planted counts with n = n0 + c_a + c_b
    c_b = (n0 // (_HH_K - 2)) // 1  # below after accounting, adjusted next
    c_a = c_b + 40
    n = n0 + c_a + c_b
    while not (c_a * _HH_K > n):
        c_a += 10
        n = n0 + c_a + c_b
    while c_b * _HH_K > n:
        c_b -= 10
        n = n0 + c_a + c_b
    extra_above = ["edgeabove"] * c_a
    extra_below = ["edgebelow"] * c_b
    toks = toks + extra_above + extra_below
    rng.shuffle(toks)
    # spread across many docs so multiple batches (and summaries) exist
    docs = [
        {"doc_id": f"d{j}", "text": " ".join(toks[j::60])} for j in range(60)
    ]
    got = q_heavy_hitters(_write_docs(tmp_path, docs))
    want = _brute_heavy_hitters([d["text"] for d in docs], _HH_K)
    assert list(zip(got["tok"], got["cnt"])) == want
    toks_out = set(got["tok"])
    assert "edgeabove" in toks_out and "edgebelow" not in toks_out


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_no_heavy_token(tmp_path):
    """Uniform vocabulary wider than k -> empty result, schema stable."""
    from pdf_ocr_comparison_tool_ray.pipelines.queries import q_heavy_hitters

    words = [f"unif{i:03d}" for i in range(200)]
    docs = [{"doc_id": "d0", "text": " ".join(words * 3)}]
    got = q_heavy_hitters(_write_docs(tmp_path, docs))
    assert len(got) == 0
    assert list(got.columns) == ["tok", "cnt"]


@pytest.mark.usefixtures("ray_session")
def test_containment_asymmetric(tmp_path):
    """A short query fully quoted inside a long document must reach
    containment 1.0 even though symmetric Jaccard is tiny — and the
    whole result must equal a brute-force reference (query selection,
    intersection counts, threshold, self-exclusion)."""
    import hashlib

    from pdf_ocr_comparison_tool_ray.pipelines.queries import (
        _CONT_NQ,
        _CONT_TAU,
        _word_bigram_shingles,
        q_containment_search,
    )

    filler = " ".join(f"f{i}" for i in range(40))
    quote = "alpha beta gamma delta epsilon"
    rows = [
        {"doc_id": i, "text": t}
        for i, t in enumerate(
            [
                quote,                         # short doc
                f"{filler} {quote} {filler}",  # long doc quoting it
                filler,                        # unrelated long doc
                "alpha beta zeta",             # partial overlap
                " ".join(f"g{i}" for i in range(10)),
            ]
        )
    ]
    got = q_containment_search(_write_docs(tmp_path, rows))
    texts = {r["doc_id"]: r["text"] for r in rows}
    qids = sorted(
        texts, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d)
    )[:_CONT_NQ]
    want = []
    for qid in qids:
        q = _word_bigram_shingles(texts[qid])
        if not q:
            continue
        for did, t in texts.items():
            if did == qid:
                continue
            i = len(q & _word_bigram_shingles(t))
            if i / len(q) >= _CONT_TAU:
                want.append((qid, did, i, len(q), i / len(q)))
    want.sort(key=lambda r: (r[0], -r[4], r[1]))
    assert [tuple(r) for r in got.itertuples(index=False)] == want
    # the asymmetric case itself, independent of which docs md5 picked:
    q0 = _word_bigram_shingles(quote)
    d1 = _word_bigram_shingles(texts[1])
    assert len(q0 & d1) == len(q0)                 # containment 1.0
    jacc = len(q0 & d1) / len(q0 | d1)
    assert jacc < 0.1                              # symmetric Jaccard tiny


@pytest.mark.usefixtures("ray_session")
def test_kcenter_matches_brute_greedy(tmp_path):
    """Selection order and radii equal a from-scratch greedy
    farthest-point traversal on the same quantized grid, on a planted
    set with an obvious far outlier (must be picked second)."""
    import numpy as np

    from pdf_ocr_comparison_tool_ray.pipelines.queries import (
        _KC_K,
        q_kcenter_select,
    )
    from pdf_ocr_comparison_tool_ray.stages.kmeans import OFFSET, QSCALE

    rng = np.random.default_rng(3)
    base = rng.normal(0, 0.05, size=(30, 8)).astype(np.float32)
    base[7] += 0.9          # far outlier -> second pick
    base[19] -= 0.7         # opposite pole -> early pick
    rows = pd.DataFrame(
        {
            "vec_id": np.arange(30, dtype=np.int64),
            "embedding": [v for v in base],
            "label": np.zeros(30, dtype=np.int32),
        }
    )
    rows.to_parquet(tmp_path / "embeddings.parquet")
    got = q_kcenter_select(str(tmp_path))

    Q = np.floor((base.astype(np.float64) + OFFSET) * QSCALE).astype(np.int64)
    centers = [0]
    mind2 = ((Q - Q[0][None, :]) ** 2).sum(axis=1)
    want = [(1, 0, 0)]
    for rk in range(2, _KC_K + 1):
        order = np.lexsort((np.arange(len(Q)), -mind2))
        v = int(order[0])
        want.append((rk, v, int(mind2[v])))
        centers.append(v)
        mind2 = np.minimum(mind2, ((Q - Q[v][None, :]) ** 2).sum(axis=1))
    assert [tuple(r) for r in got.itertuples(index=False)] == want
    assert got["vec_id"].iloc[1] == 7
    # coverage radii are non-increasing after the seed row
    radii = got["mind2"].to_numpy()[1:]
    assert (np.diff(radii) <= 0).all()


def test_aho_corasick_counts_match_str_count():
    """AC all-occurrence counts equal non-overlapping str.count for
    border-free terms — including terms nested inside other terms
    (fail-link output chains) and adjacent/point-touching matches."""
    from pdf_ocr_comparison_tool_ray.stages.dictmatch import AhoCorasick

    terms = ["ab", "abcd", "cd", "xyz", "q"]
    ac = AhoCorasick(terms)
    texts = [
        "abcd abcd",          # 'ab', 'cd' nested inside every 'abcd'
        "ababab cdcd",        # repeated, touching
        "zzz",                # nothing
        "xyzabcdq",           # all at once
        "",
    ]
    for t in texts:
        got = ac.count(t)
        for term in terms:
            assert got.get(term, 0) == t.count(term), (term, t)


def test_aho_corasick_rejects_bordered_term():
    from pdf_ocr_comparison_tool_ray.stages.dictmatch import AhoCorasick

    with pytest.raises(AssertionError):
        AhoCorasick(["aa"])   # border 'a' -> self-overlapping
    with pytest.raises(AssertionError):
        AhoCorasick(["abab"])


@pytest.mark.usefixtures("ray_session")
def test_dict_match_planted(tmp_path):
    """End-to-end per-term doc/occurrence totals vs brute str.count,
    including the absent-term zero row."""
    from pdf_ocr_comparison_tool_ray.pipelines.queries import (
        _DICT_TERMS,
        q_dict_match,
    )

    rows = [
        {"doc_id": 0, "text": "hash join then merge then hash join"},
        {"doc_id": 1, "text": "customer order customer"},
        {"doc_id": 2, "text": "nothing relevant here"},
        {"doc_id": 3, "text": "stream stream stream"},
    ]
    got = q_dict_match(_write_docs(tmp_path, rows)).set_index("term")
    for term in _DICT_TERMS:
        n_docs = sum(1 for r in rows if term in r["text"])
        n_occ = sum(r["text"].count(term) for r in rows)
        assert got.loc[term, "n_docs"] == n_docs, term
        assert got.loc[term, "n_occur"] == n_occ, term
    # nested counting: every 'hash join' also counts one 'join'
    assert got.loc["join", "n_occur"] >= got.loc["hash join", "n_occur"]
    assert got.loc["quantum flux", "n_occur"] == 0


def test_lev_le1_equals_full_dp():
    """The O(n) d<=1 check equals full Levenshtein on every pair of a
    small closed vocabulary (incl. transpositions = 2 -> None, equal
    strings -> 0, end insertions, length gap 2 -> None)."""
    from pdf_ocr_comparison_tool_ray.pipelines.queries import _lev_le1

    def full_lev(a, b):
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[n]

    words = ["", "a", "b", "ab", "ba", "abc", "abd", "abcd", "acbd",
             "xabc", "abcx", "aabc", "abcc", "zzzz"]
    for a in words:
        for b in words:
            d = full_lev(a, b)
            got = _lev_le1(a, b)
            assert got == (d if d <= 1 else None), (a, b, d, got)


@pytest.mark.usefixtures("ray_session")
def test_edit_distance_join_planted(tmp_path):
    """FastSS-blocked join equals the brute-force lev<=1 pair set on
    planted names (substitution / insertion / deletion / distance-2
    decoys / duplicate-key pairs through multiple shared variants)."""
    from pdf_ocr_comparison_tool_ray.pipelines.queries import (
        _lev_le1,
        q_edit_distance_join,
    )

    names = [
        "alpha001", "alpha002",   # substitution
        "alpha01",                # deletion of one char
        "alphaX001",              # insertion
        "beta", "betb", "bet",    # small cluster
        "gamma", "gXmmX",         # distance 2 decoy
    ]
    df = pd.DataFrame(
        {"c_custkey": range(len(names)), "c_name": names,
         "c_nationkey": 0}
    )
    df.to_parquet(tmp_path / "customer.parquet")
    got = q_edit_distance_join(str(tmp_path)).to_pandas()
    got_set = {
        (r.custkey_a, r.custkey_b, r.lev)
        for r in got.itertuples(index=False)
    }
    want = set()
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            d = _lev_le1(names[i], names[j])
            if d is not None:
                want.add((i, j, d))
    assert got_set == want
    assert (0, 1, 1) in want and (0, 2, 1) in want
    assert not any(a == 7 or b == 7 for a, b, _ in want if 8 in (a, b))


def _kn_model(texts):
    """Independent KN count tables from scratch."""
    from collections import Counter

    bc = Counter()
    for t in texts:
        ws = t.split()
        bc.update(zip(ws, ws[1:]))
    c1 = Counter()
    n1f = Counter()
    n1b = Counter()
    for (a, b), c in bc.items():
        c1[a] += c
        n1f[a] += 1
        n1b[b] += 1
    return bc, c1, n1f, n1b, len(bc)


def _kn_p(a, b, model, d):
    bc, c1, n1f, n1b, nt = model
    return max(bc[(a, b)] - d, 0.0) / c1[a] + d * n1f[a] / c1[a] * (
        n1b[b] / nt
    )


@pytest.mark.usefixtures("ray_session")
def test_kneser_ney_matches_reference(tmp_path):
    """Per-doc avg NLL equals an independent from-scratch KN scorer,
    on a corpus where KN and raw MLE disagree (the 'San Francisco'
    case: 'francisco' frequent but single-context)."""
    import math

    from pdf_ocr_comparison_tool_ray.pipelines.queries import (
        _KN_D,
        q_kneser_ney_logprob,
    )

    rows = [
        {"doc_id": 1, "text": "san francisco san francisco san francisco"},
        {"doc_id": 2, "text": "new york new jersey new deal old york"},
        {"doc_id": 3, "text": "one"},  # < 2 tokens: dropped
        {"doc_id": 4, "text": "san deal old francisco"},
    ]
    got = (
        q_kneser_ney_logprob(_write_docs(tmp_path, rows))
        .to_pandas()
        .set_index("doc_id")
    )
    model = _kn_model([r["text"] for r in rows])
    assert 3 not in got.index
    for r in rows:
        ws = r["text"].split()
        if len(ws) < 2:
            continue
        nll = -sum(
            math.log(_kn_p(a, b, model, _KN_D)) for a, b in zip(ws, ws[1:])
        ) / (len(ws) - 1)
        assert got.loc[r["doc_id"], "avg_nll"] == pytest.approx(
            nll, abs=2e-9
        )
        assert got.loc[r["doc_id"], "n_bigrams"] == len(ws) - 1
    # continuation counting beats raw frequency: despite 'francisco'
    # being as frequent as 'deal', its single training context gives it
    # a LOWER continuation probability
    _, _, _, n1b, nt = model
    assert n1b["francisco"] / nt < n1b["deal"] / nt or n1b[
        "francisco"
    ] <= n1b["deal"]


def test_kneser_ney_normalizes():
    """sum_w2 P(w2|w1) == 1 for every context — the interpolation
    identity (c1 - D*N1f)/c1 + D*N1f/c1 * sum(Pcont) with
    sum(Pcont) == 1."""
    import math

    from pdf_ocr_comparison_tool_ray.pipelines.queries import _KN_D

    texts = [
        "a b a c a b b c d a",
        "c d c a b d d a",
    ]
    model = _kn_model(texts)
    bc, c1, n1f, n1b, nt = model
    vocab = set(n1b) | set(c1)
    for ctx in c1:
        total = sum(_kn_p(ctx, w, model, _KN_D) for w in vocab)
        assert math.isclose(total, 1.0, rel_tol=1e-12)


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
