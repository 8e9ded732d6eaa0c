"""Multimodal binary-column stages: codec round-trip, actor-pool plumbing,
determinism, frame sampling and resize output layout."""

import numpy as np
import pyarrow as pa
import ray.data

from pdf_ocr_comparison_tool_ray.stages.multimodal import (
    ImageResizer,
    MediaFeaturizer,
    _decode_payload,
    encode_audio,
    encode_image,
    encode_video,
    featurize_media,
    sample_video_frames,
    synth_media_table,
)


def test_fake_codec_round_trip():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    kind, arr, meta = _decode_payload(encode_image(img))
    assert kind == "image" and np.array_equal(arr, img)
    assert meta == {"height": 2, "width": 3, "channels": 3}

    pcm = np.arange(100, dtype=np.uint8)
    kind, arr, meta = _decode_payload(encode_audio(pcm, 16000))
    assert kind == "audio" and np.array_equal(arr, pcm)
    assert meta["sample_rate"] == 16000

    vid = np.arange(4 * 2 * 2, dtype=np.uint8).reshape(4, 2, 2)
    kind, arr, meta = _decode_payload(encode_video(vid))
    assert kind == "video" and np.array_equal(arr, vid) and meta["n_frames"] == 4


def test_synth_media_schema_and_determinism():
    t1, t2 = synth_media_table(30, seed=9), synth_media_table(30, seed=9)
    assert t1.equals(t2)
    assert t1.schema.field("payload").type == pa.binary()
    assert set(t1["media_type"].to_pylist()) == {"image", "audio", "video"}


def test_featurize_actor_pool(ray_session):
    media = ray.data.from_arrow(synth_media_table(48, seed=3))
    out = featurize_media(media, concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 48
    assert all(len(f) == MediaFeaturizer.N_BINS for f in out["features"])
    # image histograms are normalized to <=1; deterministic across runs
    out2 = featurize_media(
        ray.data.from_arrow(synth_media_table(48, seed=3)), concurrency=2, batch_size=8
    ).to_pandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    assert all(np.allclose(x, y) for x, y in zip(a["features"], b["features"]))


def test_resize_only_touches_images():
    t = synth_media_table(12, seed=5)
    out = ImageResizer(out_h=8, out_w=8)(t)
    for kind, payload, w, h in zip(
        out["media_type"].to_pylist(),
        out["payload"].to_pylist(),
        out["width"].to_pylist(),
        out["height"].to_pylist(),
    ):
        if kind == "image":
            k, arr, _ = _decode_payload(payload)
            assert arr.shape == (8, 8, 3) and (w, h) == (8, 8)
        else:
            assert (w, h) == (0, 0)  # untouched passthrough


def test_frame_sampler_explodes_video(ray_session):
    media = ray.data.from_arrow(synth_media_table(30, seed=11))
    frames = sample_video_frames(media, stride=2, concurrency=2).to_pandas()
    # only video rows contribute; every emitted row is a decodable image
    n_expected = 0
    t = synth_media_table(30, seed=11)
    for kind, payload in zip(t["media_type"].to_pylist(), t["payload"].to_pylist()):
        if kind == "video":
            _, arr, _ = _decode_payload(payload)
            n_expected += len(range(0, arr.shape[0], 2))
    assert len(frames) == n_expected
    k, arr, _ = _decode_payload(frames["payload"].iloc[0])
    assert k == "image" and arr.ndim == 3
    assert (frames["frame_idx"] % 2 == 0).all()


def test_frame_sample_then_featurize_chain(ray_session):
    """Video frame-sample explode feeds the featurizer directly (both
    actor-pool stages share the payload contract)."""
    from pdf_ocr_comparison_tool_ray.stages.multimodal import (
        featurize_media,
        sample_video_frames,
    )

    media = ray.data.from_arrow(synth_media_table(24, seed=2))
    frames = sample_video_frames(media, stride=3, concurrency=2)
    feats = featurize_media(frames, concurrency=2, batch_size=8).to_pandas()
    assert len(feats) > 0
    assert (feats["media_type"] == "image").all()
    assert all(len(f) == MediaFeaturizer.N_BINS for f in feats["features"])
