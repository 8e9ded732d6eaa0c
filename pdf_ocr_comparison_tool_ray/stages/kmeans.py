"""Fixed-point Lloyd k-means over an embedding column.

semdedup (stages/dedup.py) pins ZERO Lloyd iterations because float
mean-summation order is engine-dependent (NOTES.md) — a real iterative
k-means could never pass an exact value-hash oracle.  This operator
removes the float from the loop instead of the loop from the operator:

- QUANTIZE once: q = floor((x + OFFSET) * QSCALE) as int64.  The input
  floats are float32 (<= 24 significant bits), OFFSET and QSCALE are
  powers of two, so the add and multiply are EXACT in IEEE double and
  both engines floor the identical value.  The offset keeps every
  quantity non-negative end to end (DuckDB ``//`` truncates toward
  zero, numpy floors — they only agree on non-negatives), and adding a
  constant to every coordinate changes no distance.
- ITERATE in int64: squared L2 distances, argmin with smallest-cluster
  tie-break, centroid update sum // count — sums of ints are
  order-independent, so Ray and the unrolled SQL replay agree
  bit-for-bit after any number of Lloyd rounds.
- Quantization moves each coordinate < 1/QSCALE — immaterial against
  k-means' own local-optimum variance, and determinism is what a
  reproducible curation pipeline actually needs.

Scale shape: the canonical map-reduce k-means — centroids broadcast via
ray.put (K x D ints), each batch emits one (K x D sums + K counts)
partial, the driver reduces K x D integers per round (O(1) state), and
NO shuffle exists anywhere.  The assignment pass streams.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

QSCALE = 1 << 20
OFFSET = 16.0  # covers |x| < 16; embeddings here are |x| < 1


def _quantize_batch(t: pa.Table) -> pa.Table:
    x = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    q = np.floor((x + OFFSET) * QSCALE).astype(np.int64)
    return pa.table(
        {
            "vec_id": t["vec_id"],
            "q": pa.array(q.tolist(), type=pa.list_(pa.int64())),
        }
    )


def _assign(X: np.ndarray, cents: np.ndarray):
    """(n,d) x (k,d) int64 -> (cluster, dist2); ties to the smallest
    cluster id (argmin picks the first minimum)."""
    diff = X[:, None, :] - cents[None, :, :]
    d2 = np.einsum("nkd,nkd->nk", diff, diff)
    cid = d2.argmin(axis=1)
    return cid, d2[np.arange(len(X)), cid]


def kmeans_fixedpoint(ds, k: int = 4, iters: int = 2):
    """``ds``: (vec_id, embedding list<float>).  Init = the K smallest
    vec_ids' vectors; ``iters`` full Lloyd rounds (assign + update, an
    empty cluster keeps its centroid); returns the FINAL assignment
    (vec_id, cluster:int64, dist2:int64) against the updated centroids.
    """
    qds = ds.map_batches(_quantize_batch, batch_format="pyarrow").materialize()

    seed = qds.map_batches(
        lambda t, _k=k: t.sort_by("vec_id").slice(0, _k),
        batch_format="pyarrow",
    ).to_pandas().nsmallest(k, "vec_id")
    cents = np.array(seed.sort_values("vec_id")["q"].tolist(), dtype=np.int64)

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(t: pa.Table, _ref=ref, _k=k) -> pd.DataFrame:
            from .broadcast import broadcast_get

            C = broadcast_get(_ref)
            X = np.array(t["q"].to_pylist(), dtype=np.int64)
            cid, _ = _assign(X, C)
            sums = np.zeros((_k, X.shape[1]), dtype=np.int64)
            np.add.at(sums, cid, X)
            cnt = np.bincount(cid, minlength=_k).astype(np.int64)
            return pd.DataFrame(
                {
                    "cid": pd.Series(range(_k), dtype="int64"),
                    "s": list(sums),
                    "cnt": pd.Series(cnt, dtype="int64"),
                }
            )

        parts = qds.map_batches(partial, batch_format="pyarrow").to_pandas()
        new = cents.copy()
        for cid in range(k):
            rows = parts[parts["cid"] == cid]
            cnt = int(rows["cnt"].sum())
            if cnt:
                s = np.sum(np.stack(rows["s"].to_list()), axis=0, dtype=np.int64)
                new[cid] = s // cnt
        cents = new

    ref = ray.put(cents)

    def assign_final(t: pa.Table, _ref=ref) -> pd.DataFrame:
        from .broadcast import broadcast_get

        C = broadcast_get(_ref)
        X = np.array(t["q"].to_pylist(), dtype=np.int64)
        cid, d2 = _assign(X, C)
        return pd.DataFrame(
            {
                "vec_id": t["vec_id"].to_pandas().astype("int64"),
                "cluster": pd.Series(cid, dtype="int64"),
                "dist2": pd.Series(d2, dtype="int64"),
            }
        )

    return qds.map_batches(assign_final, batch_format="pyarrow")
