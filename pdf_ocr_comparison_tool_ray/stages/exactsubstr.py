"""ExactSubstr-style substring dedup (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better").

Semantics (exact, not the ``repeated_ngrams`` hashed-window
approximation): a character position is REMOVED iff it is covered by at
least one length-``k`` window whose exact text occurs two or more times
anywhere in the corpus (other documents or elsewhere in the same one).
The reference paper builds one giant suffix array; the Ray-Data-native
plan gets the identical cover set from fixed-``k`` windows — a span
duplicated at length >= k is exactly a run of duplicated k-windows — so
the whole operator is three co-partition shuffles, no global index:

1. ``window_hashes``  — map_batches: per doc, a vectorized double
   rolling hash (two independent polynomial hashes mod 2^64 -> 128-bit
   composite; collision odds ~ n^2 / 2^128) over all byte windows.
2. bucket by h1       — windows whose (h1, h2) count >= 2 emit their
   (doc_id, pos); everything else dies in the bucket.
3. bucket by doc_id   — duplicated positions merge into maximal
   intervals per doc (tiny: one row per doc).
4. join intervals back to the text (bucketed equi join on doc_id) and
   cut the covered bytes out.

At 100 TB the shuffled window table is the dominant cost: 20 bytes/row
x ~1 row/char.  That is the same asymptotic bill the suffix array pays
(5-8 bytes/char plus the sort), paid here in streaming co-partition
form with no single-node index build.  ASCII corpora only are asserted
(byte positions == char positions keeps the SQL oracle honest).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

_B1 = np.uint64(1000003)
_B2 = np.uint64(998244353)


def _window_hashes(text_bytes: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Two vectorized polynomial rolling hashes (uint64 wraparound) over
    every length-``k`` window.  Horner over k steps: k vector ops, no
    per-window Python."""
    n = len(text_bytes) - k + 1
    h1 = np.zeros(n, dtype=np.uint64)
    h2 = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        col = text_bytes[j : j + n].astype(np.uint64)
        h1 = h1 * _B1 + col
        h2 = h2 * _B2 + col
    return h1, h2


def window_hash_batch(batch: pa.Table, k: int) -> pd.DataFrame:
    """(doc_id, text) rows -> (h1, h2, doc_id, pos) window rows.
    Docs shorter than ``k`` emit nothing (nothing can be covered).

    The whole batch hashes in ONE pass: texts concatenate with a
    k-byte 0xFF separator (impossible in ASCII, so no cross-doc window
    can alias a real one), the rolling hash runs over the joined byte
    array (2k vector ops per BATCH instead of per DOC — the per-doc
    version was overhead-dominated at ~250-byte docs), and each doc
    slices its own window range back out."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    sep = b"\xff" * k
    blobs, keep_docs = [], []
    for did, text in zip(doc_ids, texts):
        if not text.isascii():
            raise ValueError("exactsubstr_dedup assumes ASCII corpora")
        blobs.append(text.encode())
        keep_docs.append(did)
    empty = pd.DataFrame(
        {
            "h1": pd.Series([], dtype="uint64"),
            "h2": pd.Series([], dtype="uint64"),
            "doc_id": pd.Series([], dtype="int64"),
            "pos": pd.Series([], dtype="int64"),
        }
    )
    if not blobs:
        return empty
    joined = np.frombuffer(sep.join(blobs), dtype=np.uint8)
    if len(joined) < k:
        return empty
    h1_all, h2_all = _window_hashes(joined, k)
    lens = np.array([len(b) for b in blobs], dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(lens + k)[:-1]))
    n_win = np.maximum(lens - k + 1, 0)
    idx = np.concatenate(
        [np.arange(o, o + n) for o, n in zip(offs, n_win)]
    ).astype(np.int64)
    if len(idx) == 0:
        return empty
    return pd.DataFrame(
        {
            "h1": h1_all[idx],
            "h2": h2_all[idx],
            "doc_id": np.repeat(
                np.asarray(keep_docs, dtype=np.int64), n_win
            ),
            "pos": np.concatenate(
                [np.arange(n, dtype=np.int64) for n in n_win]
            ),
        }
    )


def dup_positions_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """One h1-bucket: keep (doc_id, pos) of windows whose (h1, h2)
    occurs >= 2 times corpus-wide (all equal h1 co-locate here).
    transform('size') prefilter — no per-group Python."""
    sizes = df.groupby(["h1", "h2"])["pos"].transform("size")
    kept = df.loc[sizes >= 2, ["doc_id", "pos"]]
    return kept.astype({"doc_id": "int64", "pos": "int64"})


def intervals_bucket(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """One doc_id-bucket of duplicated positions -> one row per doc with
    its merged cover intervals (JSON-packed starts/ends: tiny, and
    sidesteps pandas->Arrow list-dtype traps on empty blocks)."""
    import json as _json

    rows_doc, rows_iv = [], []
    if len(df) == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "cover": pd.Series([], dtype="object"),
            }
        )
    for did, g in df.groupby("doc_id", sort=False):
        pos = np.sort(g["pos"].to_numpy())
        new_run = np.empty(len(pos), dtype=bool)
        new_run[0] = True
        # a window at p extends cover to p+k; a gap starts when the next
        # duplicated window begins past the previous window's end
        np.greater(pos[1:], pos[:-1] + k, out=new_run[1:])
        starts = pos[new_run]
        run_id = np.cumsum(new_run) - 1
        ends = np.zeros(len(starts), dtype=np.int64)
        np.maximum.at(ends, run_id, pos + k)
        rows_doc.append(int(did))
        rows_iv.append(
            _json.dumps([starts.tolist(), ends.tolist()])
        )
    return pd.DataFrame(
        {
            "doc_id": pd.Series(rows_doc, dtype="int64"),
            "cover": pd.Series(rows_iv, dtype="object"),
        }
    )


def cut_covered(batch: pd.DataFrame, k: int) -> pd.DataFrame:
    """(doc_id, text, cover?) -> (doc_id, removed_chars, kept_md5).
    Docs with no duplicated window keep everything."""
    import json as _json

    out_doc, out_removed, out_md5 = [], [], []
    covers = batch["cover"] if "cover" in batch else [None] * len(batch)
    for did, text, cover in zip(batch["doc_id"], batch["text"], covers):
        b = np.frombuffer(text.encode(), dtype=np.uint8)
        mask = np.zeros(len(b), dtype=bool)
        if isinstance(cover, str) and cover:
            starts, ends = _json.loads(cover)
            for s, e in zip(starts, ends):
                mask[s : min(e, len(b))] = True
        kept = b[~mask].tobytes().decode()
        out_doc.append(int(did))
        out_removed.append(int(mask.sum()))
        out_md5.append(hashlib.md5(kept.encode()).hexdigest())
    return pd.DataFrame(
        {
            "doc_id": pd.Series(out_doc, dtype="int64"),
            "removed_chars": pd.Series(out_removed, dtype="int64"),
            "kept_md5": pd.Series(out_md5, dtype="object"),
        }
    )


def exactsubstr_dedup(
    docs: ray.data.Dataset, k: int = 48, n_buckets: int = 64
) -> ray.data.Dataset:
    """docs(doc_id:int64, text:string) -> (doc_id, removed_chars,
    kept_md5): every char covered by a length-``k`` window that occurs
    >= 2 times in the corpus is removed."""
    from .bucketed import bucketed_equi_join, bucketed_map_groups

    windows = docs.map_batches(
        lambda b: window_hash_batch(b, k), batch_format="pyarrow"
    )
    dup_pos = bucketed_map_groups(
        windows, "h1", dup_positions_bucket, n_buckets=n_buckets
    )
    covers = bucketed_map_groups(
        dup_pos, "doc_id", lambda df: intervals_bucket(df, k),
        n_buckets=n_buckets,
    )
    joined = bucketed_equi_join(
        docs, covers, on="doc_id", how="left", n_buckets=n_buckets
    )
    return joined.map_batches(
        lambda b: cut_covered(b, k), batch_format="pandas"
    )
