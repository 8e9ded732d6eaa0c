"""Online dedup gate: set-level law, cross-dataset continuation,
single-winner under concurrent contention, checkpoint round-trip."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from pdf_ocr_comparison_tool_ray.stages.streaming_dedup import (
    DedupGate,
    streaming_dedup,
)


@pytest.mark.usefixtures("ray_session")
def test_streaming_dedup_set_law():
    df = pd.DataFrame(
        {
            "doc_id": range(300),
            "text": [f"t{i % 70}" for i in range(300)],  # 70 distinct
        }
    )
    ds = ray.data.from_pandas(df).repartition(8)
    out, gate = streaming_dedup(ds, key_col="text")
    kept = out.to_pandas()
    assert len(kept) == 70
    assert sorted(kept["text"].unique()) == sorted(df["text"].unique())
    assert gate.n_seen() == 70
    # a second pass over the SAME data through the SAME gate admits nothing
    out2, _ = streaming_dedup(ds, key_col="text", gate=gate)
    assert out2.count() == 0
    # a new dataset with 10 new keys through the same gate admits exactly 10
    df3 = pd.DataFrame({"doc_id": [0] * 20, "text": [f"new{i % 10}" for i in range(20)]})
    out3, _ = streaming_dedup(ray.data.from_pandas(df3), key_col="text", gate=gate)
    assert out3.count() == 10


@pytest.mark.usefixtures("ray_session")
def test_streaming_dedup_single_winner_under_contention():
    # many concurrent tasks all claiming the SAME key: exactly one wins
    gate = DedupGate(n_shards=4)
    masks = [gate.admit_mask(["hot"] * 5) for _ in range(8)]
    total_admits = sum(int(np.sum(m)) for m in masks)
    assert total_admits == 1
    # within one call, a repeated key admits once
    m = gate.admit_mask(["a", "a", "b"])
    assert m.tolist() == [True, False, True]


@pytest.mark.usefixtures("ray_session")
def test_streaming_dedup_checkpoint_roundtrip():
    gate = DedupGate(n_shards=4)
    gate.admit_mask([f"k{i}" for i in range(50)])
    snaps = gate.snapshots()
    # a FRESH gate restored from the snapshots rejects all 50 old keys
    gate2 = DedupGate(n_shards=4)
    gate2.restore(snaps)
    assert gate2.n_seen() == 50
    m = gate2.admit_mask([f"k{i}" for i in range(50)] + ["brand-new"])
    assert int(np.sum(m)) == 1 and bool(m[-1])
    # wrong shard count is an error, not silent misplacement
    with pytest.raises(ValueError):
        DedupGate(n_shards=2).restore(snaps)


@pytest.mark.usefixtures("ray_session")
def test_streaming_dedup_output_reconsumable():
    # ADVICE round-4: the returned dataset must not be single-consumption.
    df = pd.DataFrame(
        {"doc_id": range(100), "text": [f"t{i % 25}" for i in range(100)]}
    )
    ds = ray.data.from_pandas(df).repartition(4)
    out, _ = streaming_dedup(ds, key_col="text", n_shards=4)
    assert out.count() == 25
    assert out.count() == 25  # second consumption: same rows, not zero
    assert len(out.to_pandas()) == 25


@pytest.mark.usefixtures("ray_session")
def test_streaming_dedup_retry_token_replay():
    from pdf_ocr_comparison_tool_ray.stages.streaming_dedup import DedupShard

    shard = DedupShard.remote()
    first = ray.get(shard.check_and_add.remote([1, 2, 3], "tok-A"))
    assert first == [True, True, True]
    # a RETRY of the same task (same token) replays, not re-adjudicates
    replay = ray.get(shard.check_and_add.remote([1, 2, 3], "tok-A"))
    assert replay == [True, True, True]
    # a different call with overlapping keys still dedups
    other = ray.get(shard.check_and_add.remote([3, 4], "tok-B"))
    assert other == [False, True]
    # tokenless (driver-side) calls never replay
    a = ray.get(shard.check_and_add.remote([9], None))
    b = ray.get(shard.check_and_add.remote([9], None))
    assert a == [True] and b == [False]
