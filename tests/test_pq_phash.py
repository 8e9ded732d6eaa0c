"""Product-quantization ANN + perceptual-hash image dedup.

PQ is pinned against an independent pure-numpy reference that follows
the Jegou-2011 spec directly (quantize, per-subspace Lloyd, encode,
ADC table scan); phash against hand-constructed images with controlled
hamming distances and a byte-different / perceptually-identical pair
that exact byte hashing provably cannot find.
"""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from pdf_ocr_comparison_tool_ray.stages.kmeans import OFFSET, QSCALE
from pdf_ocr_comparison_tool_ray.stages.multimodal import (
    ImageAHasher,
    encode_image,
)
from pdf_ocr_comparison_tool_ray.stages.pq import pq_ann, quantize_vecs


# ---------------------------------------------------------------------------
# independent PQ reference (no shared code with stages/pq.py internals)
# ---------------------------------------------------------------------------
def _ref_pq(vec_ids, X, query_ids, Q, m, k, iters, k_top):
    Xq = np.floor((X.astype(np.float64) + OFFSET) * QSCALE).astype(np.int64)
    Qq = np.floor((Q.astype(np.float64) + OFFSET) * QSCALE).astype(np.int64)
    order = np.argsort(vec_ids)[:k]
    dsub = Xq.shape[1] // m
    # (M, K, dsub) init from the k smallest vec_ids
    cb = Xq[order].reshape(k, m, dsub).transpose(1, 0, 2).copy()

    def assign(A):
        As = A.reshape(len(A), m, dsub)
        codes = np.empty((len(A), m), dtype=np.int64)
        for mm in range(m):
            d2 = ((As[:, mm, None, :] - cb[None, mm]) ** 2).sum(axis=2)
            codes[:, mm] = d2.argmin(axis=1)
        return codes

    for _ in range(iters):
        codes = assign(Xq)
        new = cb.copy()
        for mm in range(m):
            for c in range(k):
                members = Xq.reshape(len(Xq), m, dsub)[codes[:, mm] == c, mm]
                if len(members):
                    new[mm, c] = members.sum(axis=0, dtype=np.int64) // len(members)
        cb = new
    codes = assign(Xq)
    rows = []
    for qi, qid in enumerate(query_ids):
        qs = Qq[qi].reshape(m, dsub)
        tab = ((qs[:, None, :] - cb) ** 2).sum(axis=2)  # (M, K)
        dist = np.array(
            [int(sum(tab[mm, codes[i, mm]] for mm in range(m))) for i in range(len(Xq))]
        )
        order2 = sorted(range(len(Xq)), key=lambda i: (dist[i], vec_ids[i]))
        for rk, i in enumerate(order2[:k_top], 1):
            rows.append((qid, vec_ids[i], rk, int(dist[i])))
    return rows


@pytest.mark.usefixtures("ray_session")
def test_pq_matches_reference_across_blocks():
    rng = np.random.default_rng(41)
    n, d = 60, 8
    X = rng.normal(0, 0.3, (n, d)).astype(np.float32).astype(np.float64)
    ids = np.arange(100, 100 + n, dtype=np.int64)
    ds = ray.data.from_pandas(
        pd.DataFrame({"vec_id": ids, "embedding": list(X)})
    ).repartition(5)  # multiple blocks => fit partials actually merge
    q_ids, Q = ids[:3].tolist(), X[:3]
    got = (
        pq_ann(ds, q_ids, Q, m_subs=2, k_codes=3, iters=2, k_top=5)
        .to_pandas()
        .itertuples(index=False)
    )
    want = _ref_pq(ids, X, q_ids, Q, m=2, k=3, iters=2, k_top=5)
    assert [tuple(r) for r in got] == want


@pytest.mark.usefixtures("ray_session")
def test_pq_empty_code_keeps_centroid_and_recalls_planted_clusters():
    # two tight planted clusters far apart; k_codes exceeds the natural
    # cluster count so some codes go empty during Lloyd and must keep
    # their init centroids (no crash, no drift)
    rng = np.random.default_rng(7)
    a = 0.4 + rng.normal(0, 1e-3, (12, 8))
    b = -0.4 + rng.normal(0, 1e-3, (12, 8))
    X = np.vstack([a, b]).astype(np.float32).astype(np.float64)
    ids = np.arange(24, dtype=np.int64)
    ds = ray.data.from_pandas(
        pd.DataFrame({"vec_id": ids, "embedding": list(X)})
    ).repartition(3)
    out = (
        pq_ann(ds, [0], X[:1], m_subs=2, k_codes=6, iters=2, k_top=12)
        .to_pandas()
    )
    # all 12 nearest neighbours of a cluster-a query are cluster a
    assert set(out["vec_id"]) == set(range(12))
    # ADC distances to the same code cell are identical by construction
    assert (out["adc_dist"] >= 0).all()


def test_quantize_is_exact_ieee_grid():
    x = np.array([[-0.31, 0.0, 0.2954]], dtype=np.float32).astype(np.float64)
    q = quantize_vecs(x)
    assert (q == np.floor((x + OFFSET) * QSCALE)).all()
    assert q.dtype == np.int64


# ---------------------------------------------------------------------------
# phash: controlled images
# ---------------------------------------------------------------------------
def _img_from_cells(cells_255, extra=None):
    """16x16x3 image whose 8x8-SAMPLED cells (even rows/cols) are 255 at
    the given cell indices and 0 elsewhere; unsampled pixels zero."""
    arr = np.zeros((16, 16, 3), dtype=np.uint8)
    for cell in cells_255:
        r, c = divmod(cell, 8)
        arr[2 * r, 2 * c] = 255
    if extra:
        for (i, j, ch), v in extra.items():
            arr[i, j, ch] = v
    return arr


def _pairs(media_rows, max_hamming=3):
    from pdf_ocr_comparison_tool_ray.stages.dedup import image_phash_pairs

    t = pa.table(
        {
            "media_id": pa.array([r[0] for r in media_rows]),
            "media_type": pa.array(["image"] * len(media_rows)),
            "payload": pa.array([r[1] for r in media_rows], type=pa.binary()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(2)
    df = image_phash_pairs(ds, max_hamming=max_hamming).to_pandas()
    return {
        (a, b): h
        for a, b, h in zip(df["img_a"], df["img_b"], df["hamming"])
    }


@pytest.mark.usefixtures("ray_session")
def test_phash_finds_byte_different_perceptually_identical_pair():
    base = _img_from_cells(range(32))
    # perturb an OFF-GRID pixel: bytes differ, perception (the 8x8
    # subsample) does not
    variant = base.copy()
    variant[1, 1, 0] = 200
    p_base, p_var = encode_image(base), encode_image(variant)
    assert hashlib.md5(p_base).hexdigest() != hashlib.md5(p_var).hexdigest()
    got = _pairs([("a", p_base), ("b", p_var)])
    assert got == {("a", "b"): 0}


@pytest.mark.usefixtures("ray_session")
def test_phash_hamming_threshold_and_pair_dedup():
    base = _img_from_cells(range(32))  # mean = 32*255//64 = 127
    one_flip = _img_from_cells(range(31))  # cell 31 flips; mean 123
    # 8 flips confined to bits 63..48 (cells 0..15 = hash blocks 4-5):
    # blocks 0-3 are untouched, so block-triple tables still produce
    # the candidate — but hamming 8 > 3 must be dropped by the verify
    eight_flips = _img_from_cells(range(8, 32))
    dup = _img_from_cells(range(32))  # identical: collides in ALL 4 bands
    got = _pairs(
        [
            ("w", encode_image(base)),
            ("x", encode_image(one_flip)),
            ("y", encode_image(eight_flips)),
            ("z", encode_image(dup)),
        ]
    )
    assert got[("w", "x")] == 1
    assert got[("w", "z")] == 0
    assert ("w", "y") not in got  # candidate, but over the threshold
    # pair dedup: all-band collision (w,z) reports exactly once — the
    # dict build above would not lose dupes silently, so check the raw
    # frame too
    from pdf_ocr_comparison_tool_ray.stages.dedup import image_phash_pairs

    t = pa.table(
        {
            "media_id": pa.array(["w", "z"]),
            "media_type": pa.array(["image", "image"]),
            "payload": pa.array(
                [encode_image(base), encode_image(dup)], type=pa.binary()
            ),
        }
    )
    df = image_phash_pairs(ray.data.from_arrow(t)).to_pandas()
    assert len(df) == 1


@pytest.mark.usefixtures("ray_session")
def test_phash_recall_matches_bruteforce_on_random_images():
    # exact-recall property of the block-triple keying: EVERY pair with
    # hamming <= 3 must be reported, pinned against an all-pairs brute
    # force over random images (plus controlled <=3-bit flips)
    rng = np.random.default_rng(19)
    imgs = {}
    for i in range(12):
        imgs[f"r{i:02d}"] = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    # flips at sampled cells of r00: hamming 1..3 variants
    base = _img_from_cells(range(32))
    imgs["v0"] = base
    for nf, nm in ((1, "v1"), (2, "v2"), (3, "v3")):
        imgs[nm] = _img_from_cells(range(32 - nf))
    hasher = ImageAHasher()
    hs = {k: hasher.hash_one(v) for k, v in imgs.items()}
    want = {
        (a, b): bin(hs[a] ^ hs[b]).count("1")
        for a in imgs
        for b in imgs
        if a < b and bin(hs[a] ^ hs[b]).count("1") <= 3
    }
    got = _pairs([(k, encode_image(v)) for k, v in imgs.items()])
    assert got == want
    assert len(want) >= 3  # the planted variants must be in there


def test_ahash_grayscale_and_rgb_agree_on_gray_images():
    hasher = ImageAHasher()
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (16, 16, 1), dtype=np.uint8)
    rgb = np.repeat(g, 3, axis=2)
    # (299+587+114)*v // 1000 == v, so a gray RGB image hashes like its
    # single-channel form (the preprocessed-payload path)
    assert hasher.hash_one(g) == hasher.hash_one(rgb)
