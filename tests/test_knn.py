"""Similarity search: brute-force exactness vs numpy oracle, IVF recall."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from pdf_ocr_comparison_tool_ray.stages.knn import knn_cosine, knn_cosine_ivf


def _corpus(n=300, dim=16, seed=4):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim))
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)})


def _oracle_topk(df, q_ids, q_mat, k):
    vecs = np.stack(df["embedding"].to_numpy())
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    sims = vn @ qn.T
    out = {}
    for qi, q in enumerate(q_ids):
        order = sorted(
            zip(sims[:, qi], -df["vec_id"].to_numpy()), key=lambda t: (-t[0], t[1])
        )
        out[q] = [int(-v) for _, v in order[:k]]
    return out


@pytest.mark.usefixtures("ray_session")
def test_brute_force_matches_numpy_oracle():
    df = _corpus()
    q_ids = [0, 5, 7]
    q_mat = np.stack(df[df["vec_id"].isin(q_ids)].sort_values("vec_id")["embedding"])
    ds = ray.data.from_pandas(df).repartition(6)  # force partial/combine path
    got = knn_cosine(ds, q_ids, q_mat, k=8).to_pandas()
    oracle = _oracle_topk(df, q_ids, q_mat, 8)
    for q in q_ids:
        g = got[got["query_id"] == q].sort_values("rank")
        assert g["vec_id"].tolist() == oracle[q]
        assert g["rank"].tolist() == list(range(1, 9))
    # self-similarity must rank first
    for q in q_ids:
        assert got[(got["query_id"] == q) & (got["rank"] == 1)]["vec_id"].iloc[0] == q


@pytest.mark.usefixtures("ray_session")
def test_ivf_recall_against_brute_force():
    df = _corpus(n=400, seed=11)
    q_ids = [1, 2]
    q_mat = np.stack(df[df["vec_id"].isin(q_ids)].sort_values("vec_id")["embedding"])
    ds = ray.data.from_pandas(df)
    brute = _oracle_topk(df, q_ids, q_mat, 10)
    ivf = knn_cosine_ivf(ds, q_ids, q_mat, k=10).to_pandas()
    for q in q_ids:
        got = set(ivf[ivf["query_id"] == q]["vec_id"])
        # IVF is approximate: require >=60% recall of the exact top-10 and
        # the trivially-correct self hit
        assert len(got & set(brute[q])) >= 6
        assert q in got


@pytest.mark.usefixtures("ray_session")
def test_embedding_lsh_multi_table_recall():
    """Planted near-identical vectors must be recovered by multi-table
    LSH with high recall at a realistic threshold; multi-table output is
    a superset of single-table, with pairs deduped across tables."""
    import numpy as np
    import pandas as pd

    from pdf_ocr_comparison_tool_ray.stages.dedup import embedding_dup_pairs

    rng = np.random.default_rng(17)
    base = rng.normal(size=(40, 16))
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(40)]
    # plant 10 near-duplicates: tiny perturbations of vectors 0..9
    for i in range(10):
        rows.append(
            {"vec_id": 100 + i, "embedding": (base[i] + rng.normal(scale=0.01, size=16)).tolist()}
        )
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)

    multi = embedding_dup_pairs(ds, threshold=0.95, n_planes=6, n_tables=8).to_pandas()
    found = {(a, b) for a, b in zip(multi["vec_a"], multi["vec_b"])}
    planted = {(i, 100 + i) for i in range(10)}
    assert len(planted & found) >= 8  # >= 80% recall on planted dups
    assert len(found) == len(set(found))  # cross-table dedup held

    single = embedding_dup_pairs(ds, threshold=0.95, n_planes=6, n_tables=1).to_pandas()
    single_pairs = {(a, b) for a, b in zip(single["vec_a"], single["vec_b"])}
    assert single_pairs <= found  # multi-table is a superset
