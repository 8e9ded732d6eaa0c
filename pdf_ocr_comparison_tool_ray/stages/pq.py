"""Product-quantization ANN (Jegou, Douze, Schmid 2011) in fixed point.

Completes the similarity-search ladder (brute -> IVF -> hyperplane-LSH
-> PQ): embeddings are chopped into ``M`` subspaces, each subspace gets
a ``K``-code codebook from Lloyd rounds, every vector compresses to
``M`` one-byte codes, and queries scan those codes with an
asymmetric-distance (ADC) lookup table — the memory-bound regime where
a 64-float vector becomes 4 bytes and the scan touches codes only.

Exactness: the same fixed-point trick as stages/kmeans.py — quantize
once via exact IEEE ops (power-of-two scale + offset, everything
non-negative so numpy floor-division and SQL truncating ``//`` agree),
then fit / encode / ADC wholly in int64.  Integer sums are
order-independent, so the unrolled SQL oracle replays every Lloyd
round, the code assignment, and the ADC top-k bit-for-bit.

Scale shape (zero shuffle end to end):
* codebook fit — ONE pass per Lloyd round: each batch emits bounded
  (sub, code) partial sums for ALL subspaces at once (M x K x dsub
  ints), the driver reduces O(M*K*dsub) state, centroids re-broadcast
  via ray.put;
* encode + ADC scan — FUSED into one map-only pass: codes never hit
  the object store as a table; each batch emits only its local top-k
  per query (bounded n_blocks x nq x k rows, the knn combiner shape);
* the (nq x M x K) ADC lookup table is built once per worker from the
  broadcast (queries, codebooks) pair, not per batch.

At deploy, persist (vec_id, codes) as the compressed index (M bytes a
vector) and re-run only the ADC scan per query batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .broadcast import broadcast_get
from .kmeans import OFFSET, QSCALE


def quantize_vecs(x: np.ndarray) -> np.ndarray:
    """float (n, d) -> int64, the exact-IEEE fixed-point grid."""
    return np.floor((np.asarray(x, dtype=np.float64) + OFFSET) * QSCALE).astype(
        np.int64
    )


def _quantize_batch(t: pa.Table) -> pa.Table:
    q = quantize_vecs(np.array(t["embedding"].to_pylist(), dtype=np.float64))
    return pa.table(
        {
            "vec_id": t["vec_id"],
            "q": pa.array(q.tolist(), type=pa.list_(pa.int64())),
        }
    )


def _assign_codes(X: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """X (n, M, dsub) x cb (M, K, dsub) int64 -> codes (n, M); ties to
    the smallest code id (argmin picks the first minimum)."""
    diff = X[:, :, None, :] - cb[None, :, :, :]
    d2 = np.einsum("nmkd,nmkd->nmk", diff, diff)
    return d2.argmin(axis=2)


def fit_codebooks(qds, m_subs: int, k_codes: int, iters: int) -> np.ndarray:
    """Lloyd-fit all M codebooks in ``iters`` passes over ``qds``
    (vec_id, q list<int64>).  Init = the K smallest vec_ids' subvectors
    (the stages/kmeans.py convention); an empty code keeps its centroid.
    Returns (M, K, dsub) int64."""
    seed = (
        qds.map_batches(
            lambda t, _k=k_codes: t.sort_by("vec_id").slice(0, _k),
            batch_format="pyarrow",
        )
        .to_pandas()
        .nsmallest(k_codes, "vec_id")
        .sort_values("vec_id")
    )
    init = np.array(seed["q"].tolist(), dtype=np.int64)  # (K, D)
    dsub = init.shape[1] // m_subs
    cb = init.reshape(k_codes, m_subs, dsub).transpose(1, 0, 2).copy()

    for _ in range(iters):
        ref = ray.put(cb)

        def partial(t: pa.Table, _ref=ref, _m=m_subs, _k=k_codes) -> pd.DataFrame:
            C = broadcast_get(_ref)
            X = np.array(t["q"].to_pylist(), dtype=np.int64)
            Xs = X.reshape(len(X), _m, -1)
            codes = _assign_codes(Xs, C)  # (n, M)
            d = Xs.shape[2]
            sums = np.zeros((_m * _k, d), dtype=np.int64)
            cnts = np.zeros(_m * _k, dtype=np.int64)
            for m in range(_m):
                flat = m * _k + codes[:, m]
                np.add.at(sums, flat, Xs[:, m, :])
                cnts += np.bincount(flat, minlength=_m * _k)
            idx = np.arange(_m * _k)
            return pd.DataFrame(
                {
                    "sub": pd.Series(idx // _k, dtype="int64"),
                    "cid": pd.Series(idx % _k, dtype="int64"),
                    "s": list(sums),
                    "cnt": pd.Series(cnts, dtype="int64"),
                }
            )

        parts = qds.map_batches(partial, batch_format="pyarrow").to_pandas()
        new = cb.copy()
        for (m, cid), rows in parts.groupby(["sub", "cid"]):
            cnt = int(rows["cnt"].sum())
            if cnt:
                s = np.sum(np.stack(rows["s"].to_list()), axis=0, dtype=np.int64)
                new[int(m), int(cid)] = s // cnt
        cb = new
    return cb


def _reduce_topk_asc(df: pd.DataFrame, k: int) -> pd.DataFrame:
    df = df.sort_values(
        ["query_id", "adc_dist", "vec_id"], kind="mergesort"
    )
    df = df.groupby("query_id", sort=False).head(k).reset_index(drop=True)
    df["rk"] = (df.groupby("query_id", sort=False).cumcount() + 1).astype(
        np.int64
    )
    return df[["query_id", "vec_id", "rk", "adc_dist"]]


def pq_ann(
    ds,
    query_ids,
    query_matrix,
    m_subs: int = 4,
    k_codes: int = 8,
    iters: int = 1,
    k_top: int = 10,
    batch_size: int = 4096,
):
    """-> (query_id, vec_id, rk, adc_dist) global ADC top-k per query.

    ``ds``: (vec_id, embedding list<float>); ``query_matrix`` raw floats
    (nq, D).  All distances are exact int64 on the fixed-point grid, so
    ordering — and the SQL replay — is deterministic (ties by vec_id).
    """
    qds = ds.map_batches(_quantize_batch, batch_format="pyarrow").materialize()
    cb = fit_codebooks(qds, m_subs, k_codes, iters)

    qq = quantize_vecs(np.asarray(query_matrix, dtype=np.float64))
    state_ref = ray.put(
        {"query_id": list(query_ids), "qq": qq, "cb": cb}
    )

    def build(state):
        q_id_arr = np.asarray(state["query_id"])
        qqm = state["qq"].reshape(len(q_id_arr), m_subs, -1)  # (nq, M, dsub)
        C = state["cb"]  # (M, K, dsub)
        diff = qqm[:, :, None, :] - C[None, :, :, :]
        table = np.einsum("qmkd,qmkd->qmk", diff, diff)  # (nq, M, K)
        return q_id_arr, C, table

    def scan(t: pa.Table) -> pd.DataFrame:
        q_id_arr, C, table = broadcast_get(state_ref, build=build)
        ids = np.asarray(t["vec_id"].to_pandas(), dtype=np.int64)
        if len(ids) == 0:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=q_id_arr.dtype),
                    "vec_id": pd.Series([], dtype="int64"),
                    "adc_dist": pd.Series([], dtype="int64"),
                }
            )
        X = np.array(t["q"].to_pylist(), dtype=np.int64)
        Xs = X.reshape(len(X), m_subs, -1)
        codes = _assign_codes(Xs, C)  # (n, M)
        dist = np.zeros((len(q_id_arr), len(ids)), dtype=np.int64)
        for m in range(m_subs):
            dist += table[:, m, :][:, codes[:, m]]  # (nq, n)
        kk = min(k_top, len(ids))
        out_q, out_v, out_d = [], [], []
        for qi in range(len(q_id_arr)):
            row = dist[qi]
            # ADC distances tie in bulk (same code cell => identical
            # distance), so the LOCAL top-k must already break ties by
            # vec_id or a batch could evict the globally-ranked row
            part = np.lexsort((ids, row))[:kk]
            out_q.extend([q_id_arr[qi]] * kk)
            out_v.extend(ids[part].tolist())
            out_d.extend(row[part].tolist())
        return pd.DataFrame(
            {
                "query_id": pd.Series(out_q, dtype=q_id_arr.dtype),
                "vec_id": pd.Series(out_v, dtype="int64"),
                "adc_dist": pd.Series(out_d, dtype="int64"),
            }
        )

    partial = qds.map_batches(
        scan, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()  # bounded: n_blocks * nq * k rows
    return ray.data.from_pandas(_reduce_topk_asc(partial, k_top))
