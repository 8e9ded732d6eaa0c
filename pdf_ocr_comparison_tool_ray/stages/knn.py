"""Similarity search over an embedding column.

* ``knn_cosine`` — brute-force cosine top-k: the query matrix is tiny
  and broadcast once via ``ray.put``; every batch computes a numpy
  matmul against it and emits only its LOCAL top-k per query (the
  combiner), then a small ``groupby(query_id)`` reduces partials to the
  global top-k.  The full similarity matrix never materializes and no
  full-data shuffle happens — only ``O(num_queries * k * num_batches)``
  partial rows move.
* ``knn_cosine_ivf`` — the scale path: coarse k-means-style centroids
  (sampled, deterministic) assign every vector to a cell; queries probe
  only the ``nprobe`` nearest cells, so per-batch work drops by
  ~``ncells/nprobe``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _topk_frame(q_id_arr, out_qi, out_v, out_s, id_dtype) -> pd.DataFrame:
    """dtype-stable partial frame: empty batches / no-probe batches must
    emit the SAME schema as full ones (object-typed empty columns would
    otherwise diverge block schemas before the groupby)."""
    return pd.DataFrame(
        {
            "query_id": q_id_arr[np.asarray(out_qi, dtype=np.int64)],
            "vec_id": np.asarray(out_v, dtype=id_dtype),
            "cosine": np.asarray(out_s, dtype=np.float64),
        }
    )


class _BatchTopK:
    """Per-batch partial top-k against the broadcast query matrix."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref)
        self.q_id_arr = np.asarray(q["query_id"])
        self.q_unit = _unit(np.asarray(q["matrix"], dtype=np.float64))
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy()
        if len(ids) == 0:
            return _topk_frame(self.q_id_arr, [], [], [], ids.dtype)
        vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        sims = _unit(vecs) @ self.q_unit.T  # (n, nq)
        out_qi, out_v, out_s = [], [], []
        k = min(self.k, len(ids))
        for qi in range(len(self.q_id_arr)):
            col = sims[:, qi]
            part = np.argpartition(-col, k - 1)[:k]
            for i in part:
                out_qi.append(qi)
                out_v.append(ids[i])
                out_s.append(col[i])
        return _topk_frame(self.q_id_arr, out_qi, out_v, out_s, ids.dtype)


def _reduce_topk(group: pd.DataFrame, k: int) -> pd.DataFrame:
    g = group.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g


def knn_cosine(ds, query_ids, query_matrix, k: int = 10, batch_size: int = 4096):
    """-> (query_id, vec_id, cosine, rank) global top-k per query.

    Ties broken by vec_id ascending (deterministic, SQL-mirrorable).
    """
    queries_ref = ray.put({"query_id": list(query_ids), "matrix": query_matrix})
    partial = ds.map_batches(
        _BatchTopK,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, 4),
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k},
    )
    return partial.groupby("query_id").map_groups(
        lambda g: _reduce_topk(g, k), batch_format="pandas"
    )


def train_centroids(ds, ncells: int = 16, sample_n: int = 2048, iters: int = 5,
                    seed: int = 13) -> np.ndarray:
    """Deterministic mini k-means over a driver-side sample (IVF coarse quantizer)."""
    sample = ds.limit(sample_n).to_pandas()
    vecs = _unit(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    rng = np.random.RandomState(seed)
    centroids = vecs[rng.choice(len(vecs), size=min(ncells, len(vecs)), replace=False)]
    for _ in range(iters):
        assign = (vecs @ centroids.T).argmax(axis=1)
        for c in range(len(centroids)):
            members = vecs[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _unit(centroids)
    return centroids


class _IVFBatchTopK:
    """Probe-limited partial top-k: only vectors in probed cells are scored."""

    def __init__(self, queries_ref, centroids_ref, k: int, nprobe: int):
        q = ray.get(queries_ref)
        self.q_id_arr = np.asarray(q["query_id"])
        self.q_unit = _unit(np.asarray(q["matrix"], dtype=np.float64))
        self.centroids = ray.get(centroids_ref)
        self.k = k
        # per query: set of probed cells
        sims = self.q_unit @ self.centroids.T
        order = np.argsort(-sims, axis=1)[:, :nprobe]
        self.probed = [set(row.tolist()) for row in order]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy()
        if len(ids) == 0:
            return _topk_frame(self.q_id_arr, [], [], [], ids.dtype)
        vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        unit = _unit(vecs)
        cells = (unit @ self.centroids.T).argmax(axis=1)
        out_qi, out_v, out_s = [], [], []
        for qi in range(len(self.q_id_arr)):
            mask = np.isin(cells, list(self.probed[qi]))
            if not mask.any():
                continue
            sub_ids = ids[mask]
            col = unit[mask] @ self.q_unit[qi]
            k = min(self.k, len(sub_ids))
            part = np.argpartition(-col, k - 1)[:k]
            for i in part:
                out_qi.append(qi)
                out_v.append(sub_ids[i])
                out_s.append(col[i])
        return _topk_frame(self.q_id_arr, out_qi, out_v, out_s, ids.dtype)


def knn_cosine_ivf(ds, query_ids, query_matrix, k: int = 10, ncells: int = 16,
                   nprobe: int = 4, batch_size: int = 4096):
    """Approximate top-k via IVF cell probing (the 100-TB-scale path)."""
    centroids = train_centroids(ds, ncells=ncells)
    queries_ref = ray.put({"query_id": list(query_ids), "matrix": query_matrix})
    centroids_ref = ray.put(centroids)
    partial = ds.map_batches(
        _IVFBatchTopK,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, 4),
        fn_constructor_kwargs={
            "queries_ref": queries_ref,
            "centroids_ref": centroids_ref,
            "k": k,
            "nprobe": nprobe,
        },
    )
    return partial.groupby("query_id").map_groups(
        lambda g: _reduce_topk(g, k), batch_format="pandas"
    )
