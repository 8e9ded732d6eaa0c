"""ExactSubstr-style substring dedup (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better").

Semantics (exact, not the ``repeated_ngrams`` hashed-window
approximation): a character position is REMOVED iff it is covered by at
least one length-``k`` window whose exact text occurs two or more times
anywhere in the corpus (other documents or elsewhere in the same one).
The reference paper builds one giant suffix array; the Ray-Data-native
plan gets the identical cover set from fixed-``k`` windows — a span
duplicated at length >= k is exactly a run of duplicated k-windows — so
no global index is ever built.  Two size-routed plans share stage 1:

1. ``window_key_counts`` — map_batches: per block, a vectorized double
   rolling hash (two independent polynomial hashes mod 2^64 -> 128-bit
   composite; collision odds ~ n^2 / 2^128) over all byte windows,
   pre-aggregated to unique ``(h1, h2, cnt)`` partials (16 bytes/key on
   the wire, and within-block repeats collapse before the shuffle).
2. bucket by h1 — keys whose global count >= 2 survive: the corpus-wide
   duplicated-window set ``D``.

BROADCAST route (``|D| <= broadcast_cap``, the common regime — most
corpora duplicate a small fraction of their windows): ``ray.put`` the
sorted ``D`` once, then ONE more map pass over the docs re-hashes each
doc's windows, tests pair membership against ``D`` (vectorized
searchsorted), merges covers and cuts — locally, no further shuffle.
Total: one 16-byte/char key shuffle + two hashing passes over the text.

CO-PARTITION route (``|D|`` above the cap — heavily duplicated corpora
where ``D`` would not fit a worker heap): the original three-shuffle
plan.  Windows re-emit with their ``(doc_id, pos)``, duplicated
positions co-partition by h1 against ``D``, merge into per-doc
intervals, and a bucketed equi join brings the intervals back to the
text.  36 bytes/char shuffled, no broadcast state.

At 100 TB the stage-1 key shuffle is the dominant bill either way: ~1
row/char, the same asymptotic cost the suffix array pays (5-8
bytes/char plus the sort), paid here in streaming co-partition form.
ASCII corpora only are asserted (byte positions == char positions keeps
the SQL oracle honest).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

_B1 = np.uint64(1000003)
_B2 = np.uint64(998244353)

_EMPTY_U64 = np.zeros(0, dtype=np.uint64)


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


def _batch_window_arrays(batch: pa.Table, k: int):
    """(doc_id, text) batch -> (doc_ids, blobs, h1, h2, n_win): window
    hashes for every doc, concatenated in doc order.

    The whole batch hashes in ONE pass: texts concatenate with a k-byte
    0xFF separator (impossible in ASCII, so no cross-doc window can
    alias a real one), the rolling hash runs over the joined byte array
    (2k vector ops per BATCH instead of per DOC — the per-doc version
    was overhead-dominated at ~250-byte docs), and each doc slices its
    own window range back out.  Docs shorter than ``k`` contribute zero
    windows (``n_win[i] == 0``) but stay in ``doc_ids``/``blobs``."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    sep = b"\xff" * k
    blobs = []
    for text in texts:
        if not text.isascii():
            raise ValueError("exactsubstr_dedup assumes ASCII corpora")
        blobs.append(text.encode())
    lens = np.array([len(b) for b in blobs], dtype=np.int64)
    n_win = np.maximum(lens - k + 1, 0) if len(blobs) else np.zeros(0, np.int64)
    if not blobs or int(n_win.sum()) == 0:
        return doc_ids, blobs, _EMPTY_U64, _EMPTY_U64, n_win
    joined = np.frombuffer(sep.join(blobs), dtype=np.uint8)
    h1_all, h2_all = _window_hashes(joined, k)
    offs = np.concatenate(([0], np.cumsum(lens + k)[:-1]))
    idx = np.concatenate(
        [np.arange(o, o + n) for o, n in zip(offs, n_win)]
    ).astype(np.int64)
    return doc_ids, blobs, h1_all[idx], h2_all[idx], n_win


def window_hash_batch(batch: pa.Table, k: int) -> pd.DataFrame:
    """(doc_id, text) rows -> (h1, h2, doc_id, pos) window rows — the
    CO-PARTITION route's full emit."""
    doc_ids, _, h1, h2, n_win = _batch_window_arrays(batch, k)
    if len(h1) == 0:
        return pd.DataFrame(
            {
                "h1": pd.Series([], dtype="uint64"),
                "h2": pd.Series([], dtype="uint64"),
                "doc_id": pd.Series([], dtype="int64"),
                "pos": pd.Series([], dtype="int64"),
            }
        )
    return pd.DataFrame(
        {
            "h1": h1,
            "h2": h2,
            "doc_id": np.repeat(np.asarray(doc_ids, dtype=np.int64), n_win),
            "pos": np.concatenate(
                [np.arange(n, dtype=np.int64) for n in n_win]
            ),
        }
    )


def window_key_counts(batch: pa.Table, k: int) -> pd.DataFrame:
    """(doc_id, text) rows -> per-block pre-aggregated (h1, h2, cnt)
    window-key partials — stage 1 of both routes.  16 bytes/key on the
    wire (vs 36 for the full window row), within-block repeats collapse
    before the shuffle."""
    _, _, h1, h2, _ = _batch_window_arrays(batch, k)
    if len(h1) == 0:
        return pd.DataFrame(
            {
                "h1": pd.Series([], dtype="uint64"),
                "h2": pd.Series([], dtype="uint64"),
                "cnt": pd.Series([], dtype="int64"),
            }
        )
    pairs = np.empty(len(h1), dtype=[("h1", "<u8"), ("h2", "<u8")])
    pairs["h1"] = h1
    pairs["h2"] = h2
    uniq, cnt = np.unique(pairs, return_counts=True)
    return pd.DataFrame(
        {
            "h1": uniq["h1"],
            "h2": uniq["h2"],
            "cnt": cnt.astype(np.int64),
        }
    )


def dup_keys_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """One h1-bucket of (h1, h2, cnt) partials: keys whose global count
    >= 2 (all equal h1 co-locate here)."""
    g = df.groupby(["h1", "h2"], as_index=False)["cnt"].sum()
    kept = g.loc[g["cnt"] >= 2, ["h1", "h2"]]
    return kept.astype({"h1": "uint64", "h2": "uint64"})


def cut_with_dup_keys(batch: pa.Table, k: int, ref) -> pd.DataFrame:
    """BROADCAST route stage 2: re-hash each doc's windows, test pair
    membership against the sorted dup-key set ``D`` (one vectorized
    searchsorted on h1, then an h2 equality check; the rare h1-collision
    runs fall back to a bounded scan), merge covers via a diff array and
    cut — all local, no shuffle."""
    from .broadcast import broadcast_get

    d1, d2 = broadcast_get(ref)
    doc_ids, blobs, h1, h2, n_win = _batch_window_arrays(batch, k)
    is_dup = np.zeros(len(h1), dtype=bool)
    if len(h1) and len(d1):
        li = np.searchsorted(d1, h1, side="left")
        ri = np.searchsorted(d1, h1, side="right")
        one = (ri - li) == 1
        is_dup[one] = d2[li[one]] == h2[one]
        for i in np.nonzero((ri - li) > 1)[0]:
            is_dup[i] = h2[i] in d2[li[i] : ri[i]]
    out_doc, out_removed, out_md5 = [], [], []
    w0 = 0
    for did, blob, nw in zip(doc_ids, blobs, n_win):
        nw = int(nw)
        nb = len(blob)
        dpos = np.nonzero(is_dup[w0 : w0 + nw])[0]
        w0 += nw
        if len(dpos):
            # +1 at each dup window start, -1 at its (clamped) end; the
            # running sum > 0 is exactly the covered mask
            diff = np.zeros(nb + 1, dtype=np.int64)
            np.add.at(diff, dpos, 1)
            np.add.at(diff, np.minimum(dpos + k, nb), -1)
            mask = np.cumsum(diff[:-1]) > 0
            kept = np.frombuffer(blob, dtype=np.uint8)[~mask].tobytes().decode()
            removed = int(mask.sum())
        else:
            kept = blob.decode()
            removed = 0
        out_doc.append(int(did))
        out_removed.append(removed)
        out_md5.append(hashlib.md5(kept.encode()).hexdigest())
    return pd.DataFrame(
        {
            "doc_id": pd.Series(out_doc, dtype="int64"),
            "removed_chars": pd.Series(out_removed, dtype="int64"),
            "kept_md5": pd.Series(out_md5, dtype="object"),
        }
    )


def dup_positions_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """CO-PARTITION route, one h1-bucket: keep (doc_id, pos) of windows
    whose (h1, h2) occurs >= 2 times corpus-wide (all equal h1 co-locate
    here).  transform('size') prefilter — no per-group Python."""
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
    docs: ray.data.Dataset,
    k: int = 48,
    n_buckets: int = 64,
    broadcast_cap: int = 2_000_000,
) -> ray.data.Dataset:
    """docs(doc_id:int64, text:string) -> (doc_id, removed_chars,
    kept_md5): every char covered by a length-``k`` window that occurs
    >= 2 times in the corpus is removed.  Size-routed (module doc): the
    duplicated-key set broadcasts when it fits (one shuffle total), else
    the full co-partition plan runs (three shuffles, no broadcast
    state)."""
    from .bucketed import bucketed_equi_join, bucketed_map_groups

    partials = docs.map_batches(
        lambda b: window_key_counts(b, k), batch_format="pyarrow"
    )
    dup = bucketed_map_groups(
        partials, "h1", dup_keys_bucket, n_buckets=n_buckets
    ).materialize()
    n_dup = dup.count()

    if n_dup <= broadcast_cap:
        if n_dup == 0:
            d1, d2 = _EMPTY_U64, _EMPTY_U64
        else:
            ddf = dup.to_pandas()  # bounded by broadcast_cap
            h1v = ddf["h1"].to_numpy()
            h2v = ddf["h2"].to_numpy()
            order = np.lexsort((h2v, h1v))
            d1 = np.ascontiguousarray(h1v[order])
            d2 = np.ascontiguousarray(h2v[order])
        ref = ray.put((d1, d2))
        return docs.map_batches(
            lambda b: cut_with_dup_keys(b, k, ref), batch_format="pyarrow"
        )

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
