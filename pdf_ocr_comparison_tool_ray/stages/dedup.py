"""Deduplication suite: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference only has exact-hash dedup (D1, ``content_matcher.py:30-35,
179, 191-194``); the near-dup family is the standard large-scale
training-data extension, built on the sketch functions in
``functions/fingerprint.py``.

Scale notes baked into each shape:
* exact: batch-local pre-dedup THEN the ``groupby(text_hash)`` shuffle —
  the shuffle only moves one row per (hash, batch), not every row;
* MinHash-LSH: signatures are computed batch-vectorized, the shuffle key
  is (band_id, band_hash) so only small (key, doc_id, signature) rows
  move; candidate verification uses the mergeable signature estimate,
  no second pass over the texts;
* embedding near-dup: random-hyperplane bucket key -> groupby -> numpy
  blockwise cosine within buckets only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.fingerprint import (
    lsh_bands,
    minhash_signature,
    shingles,
    simhash64,
)
from ..functions.textnorm import text_hash_many
from ..functions.tokenize import tokenize
from .bucketed import bucketed_drop_duplicates, bucketed_map_groups


# ---------------------------------------------------------------------------
# Exact dedup (D1)
# ---------------------------------------------------------------------------
def add_text_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    hashes = text_hash_many(batch[text_col].to_pylist())
    return batch.append_column("text_hash", pa.array(hashes))


def _batch_local_first(batch: pa.Table) -> pa.Table:
    """Keep the min-doc_id row per hash within a batch (combiner)."""
    df = batch.select(["doc_id", "text_hash"]).to_pandas()
    agg = df.groupby("text_hash", as_index=False).agg(
        doc_id=("doc_id", "min"), dup_count=("doc_id", "size")
    )
    return pa.Table.from_pandas(agg[["text_hash", "doc_id", "dup_count"]],
                                preserve_index=False)


def _merge_hash_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
    out = bucket.groupby("text_hash", as_index=False).agg(
        doc_id=("doc_id", "min"), dup_count=("dup_count", "sum")
    )
    out["dup_count"] = out["dup_count"].astype("int64")
    return out


def exact_dedup(ds, text_col: str = "text"):
    """-> one row per distinct normalized text: (text_hash, doc_id=min, dup_count)."""
    hashed = ds.map_batches(
        lambda b: _batch_local_first(add_text_hash(b, text_col)),
        batch_format="pyarrow",
    )
    return bucketed_map_groups(hashed, "text_hash", _merge_hash_bucket, n_buckets=64)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------
NUM_PERM = 64
NUM_BANDS = 16


def _minhash_batch(batch: pa.Table, text_col: str, ngram: int) -> pa.Table:
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch[text_col].to_pylist()
    out_doc, out_band, out_bhash, out_sig = [], [], [], []
    for doc_id, text in zip(doc_ids, texts):
        sig = minhash_signature(shingles(tokenize(text), ngram), NUM_PERM)
        for band_id, band_hash in enumerate(lsh_bands(sig, NUM_BANDS)):
            out_doc.append(doc_id)
            out_band.append(band_id)
            out_bhash.append(band_hash)
            out_sig.append(sig.tolist())
    return pa.table(
        {
            "doc_id": out_doc,
            "band_id": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(out_bhash, type=pa.int64()),
            "signature": pa.array(out_sig, type=pa.list_(pa.uint64())),
        }
    )


def _bucket_pairs(group: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Candidate pairs within one LSH bucket, verified by signature Jaccard."""
    rows = group.sort_values("doc_id").drop_duplicates("doc_id")
    ids = rows["doc_id"].tolist()
    sigs = rows["signature"].tolist()
    a_ids, b_ids, est = [], [], []
    for i in range(len(ids)):
        si = np.asarray(sigs[i], dtype=np.uint64)
        for j in range(i + 1, len(ids)):
            sj = np.asarray(sigs[j], dtype=np.uint64)
            jac = float(np.mean(si == sj))
            if jac >= threshold:
                a_ids.append(ids[i])
                b_ids.append(ids[j])
                est.append(jac)
    return pd.DataFrame({"doc_a": a_ids, "doc_b": b_ids, "est_jaccard": est})


def minhash_lsh_pairs(ds, text_col: str = "text", ngram: int = 3,
                      threshold: float = 0.7):
    """-> near-dup candidate pairs (doc_a, doc_b, est_jaccard), deduped.

    Both wide steps are hash-bucketed (``stages/bucketed.py``): the LSH
    bucket count and the candidate-pair count each far exceed the worker
    count, so one Ray group per bucket/pair would pay Python-per-group
    overhead on billions of groups at corpus scale.
    """
    banded = ds.map_batches(
        lambda b: _minhash_batch(b, text_col, ngram), batch_format="pyarrow"
    )

    def pairs_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        outs = [
            _bucket_pairs(g, threshold)
            for _, g in bucket.groupby(["band_id", "band_hash"], sort=False)
        ]
        return pd.concat(outs, ignore_index=True)

    pairs = bucketed_map_groups(
        banded, ["band_id", "band_hash"], pairs_bucket, n_buckets=64
    )
    # the same pair can surface from several bands with an identical
    # signature estimate -> vectorized dedup on (doc_a, doc_b)
    return bucketed_drop_duplicates(pairs, ["doc_a", "doc_b"], n_buckets=64)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------
def _simhash_batch(batch: pa.Table, text_col: str) -> pa.Table:
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch[text_col].to_pylist()
    hashes = [simhash64(tokenize(t)) for t in texts]
    out_doc, out_band, out_key, out_hash = [], [], [], []
    for doc_id, h in zip(doc_ids, hashes):
        for band in range(4):  # 4 x 16-bit bands; hamming<=3 dups share >=1 band
            out_doc.append(doc_id)
            out_band.append(band)
            out_key.append((h >> (band * 16)) & 0xFFFF)
            out_hash.append(h - (1 << 63))  # store as signed int64
    return pa.table(
        {
            "doc_id": out_doc,
            "band_id": pa.array(out_band, type=pa.int32()),
            "band_key": pa.array(out_key, type=pa.int64()),
            "simhash": pa.array(out_hash, type=pa.int64()),
        }
    )


def _simhash_pairs(group: pd.DataFrame, max_hamming: int) -> pd.DataFrame:
    rows = group.sort_values("doc_id").drop_duplicates("doc_id")
    ids = rows["doc_id"].tolist()
    hs = [int(h) + (1 << 63) for h in rows["simhash"].tolist()]
    a_ids, b_ids, dist = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin(hs[i] ^ hs[j]).count("1")
            if d <= max_hamming:
                a_ids.append(ids[i])
                b_ids.append(ids[j])
                dist.append(d)
    return pd.DataFrame({"doc_a": a_ids, "doc_b": b_ids, "hamming": dist})


def simhash_pairs(ds, text_col: str = "text", max_hamming: int = 3):
    """-> near-dup pairs by SimHash banding (doc_a, doc_b, hamming)."""
    banded = ds.map_batches(lambda b: _simhash_batch(b, text_col), batch_format="pyarrow")

    def pairs_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        outs = [
            _simhash_pairs(g, max_hamming)
            for _, g in bucket.groupby(["band_id", "band_key"], sort=False)
        ]
        return pd.concat(outs, ignore_index=True)

    pairs = bucketed_map_groups(
        banded, ["band_id", "band_key"], pairs_bucket, n_buckets=64
    )
    return bucketed_drop_duplicates(pairs, ["doc_a", "doc_b"], n_buckets=64)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs (bounded candidate scope)
# ---------------------------------------------------------------------------
def _jaccard_group(group: pd.DataFrame, ngram: int, threshold: float) -> pd.DataFrame:
    rows = group.sort_values("doc_id")
    ids = rows["doc_id"].tolist()
    sets = [frozenset(shingles(tokenize(t), ngram)) for t in rows["text"].tolist()]
    a_ids, b_ids, jac = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            u = len(sets[i] | sets[j])
            s = (len(sets[i] & sets[j]) / u) if u else 0.0
            if s >= threshold:
                a_ids.append(ids[i])
                b_ids.append(ids[j])
                jac.append(s)
    return pd.DataFrame({"doc_a": a_ids, "doc_b": b_ids, "jaccard": jac})


def ngram_jaccard_pairs(ds, group_col: str, ngram: int = 2, threshold: float = 0.5):
    """Exact pairwise n-gram Jaccard within each ``group_col`` partition.

    The grouping bounds the O(n^2) comparison scope (the caller picks a
    blocking key — source, language, LSH bucket...).
    """
    return ds.groupby(group_col).map_groups(
        lambda g: _jaccard_group(g, ngram, threshold), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (random-hyperplane LSH buckets)
# ---------------------------------------------------------------------------
def _hyperplane_bucket_batch(batch: pd.DataFrame, planes: np.ndarray) -> pd.DataFrame:
    """Emit one row per (vector, table); bucket = (table_id << n_planes) | bits.

    ``planes`` has shape (n_tables, n_planes, dim) — the standard
    multi-table LSH construction: a true near-dup pair only needs to
    collide in ONE table, so recall ≈ 1 - (1 - p^k)^L instead of p^k.
    """
    vecs = np.stack(batch["embedding"].to_numpy())
    n_tables, n_planes, _ = planes.shape
    frames = []
    for t in range(n_tables):
        bits = (vecs @ planes[t].T) > 0  # (n, n_planes)
        keys = np.zeros(len(batch), dtype=np.int64)
        for b in range(n_planes):
            keys |= bits[:, b].astype(np.int64) << b
        keys |= np.int64(t) << n_planes
        frames.append(
            pd.DataFrame(
                {
                    "vec_id": batch["vec_id"],
                    "bucket": keys,
                    "embedding": batch["embedding"],
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def _cosine_pairs_group(group: pd.DataFrame, threshold: float) -> pd.DataFrame:
    rows = group.sort_values("vec_id")
    ids = rows["vec_id"].tolist()
    vecs = np.stack(rows["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = vecs / norms
    sims = unit @ unit.T
    a_ids, b_ids, out_sim = [], [], []
    n = len(ids)
    ii, jj = np.triu_indices(n, k=1)
    mask = sims[ii, jj] >= threshold
    for i, j in zip(ii[mask], jj[mask]):
        a_ids.append(ids[i])
        b_ids.append(ids[j])
        out_sim.append(float(sims[i, j]))
    return pd.DataFrame({"vec_a": a_ids, "vec_b": b_ids, "cosine": out_sim})


def embedding_dup_pairs(ds, threshold: float = 0.95, n_planes: int = 8,
                        n_tables: int = 1, dim: int | None = None,
                        seed: int = 11):
    """Near-dup embedding pairs via hyperplane-LSH bucketing + in-bucket
    cosine.

    ``n_tables`` independent plane sets trade compute for recall (a pair
    needs one collision across tables); a pair surfacing from several
    tables is deduped vectorized, so semantics stay set-of-pairs.  Work
    scales linearly in tables — rows replicate, never all-pairs.
    """
    sample = ds.take(1)
    d = dim or len(sample[0]["embedding"])
    planes = np.random.RandomState(seed).normal(size=(n_tables, n_planes, d))
    bucketed = ds.map_batches(
        lambda b: _hyperplane_bucket_batch(b, planes), batch_format="pandas"
    )

    def pairs_bucket(chunk: pd.DataFrame) -> pd.DataFrame:
        outs = [
            _cosine_pairs_group(g, threshold)
            for _, g in chunk.groupby("bucket", sort=False)
        ]
        return pd.concat(outs, ignore_index=True)

    pairs = bucketed_map_groups(bucketed, "bucket", pairs_bucket, n_buckets=32)
    if n_tables == 1:
        return pairs  # no cross-table duplicates possible
    return bucketed_drop_duplicates(pairs, ["vec_a", "vec_b"], n_buckets=32)
