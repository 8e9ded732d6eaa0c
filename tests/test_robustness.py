"""Edge-case robustness: block-split detection in the shuffle-free
reassembly, empty-block schema stability in union/groupby stages,
checkpoint fingerprint sensitivity, deep Count-Min rows."""

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from pdf_ocr_comparison_tool_ray.functions.hll import (
    _cm_hashes,
    cm_add_many,
    cm_estimate,
    cm_init,
)
from pdf_ocr_comparison_tool_ray.stages.reassemble import reassemble_batch_local

_SPAN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
        ("route", pa.string()),
        ("score", pa.float64()),
    ]
)


def _span_rows(doc_id, offsets):
    return [
        {
            "doc_id": doc_id,
            "kind": "text",
            "text": f"t{o}",
            "media_ref": "",
            "offset": o,
            "route": "native",
            "score": 1.0,
        }
        for o in offsets
    ]


def test_local_reassembly_guard_detects_split_document():
    """A block holding only the tail fragment of a document (offsets not
    starting at 0 — what dynamic block splitting produces) must raise."""
    tail = pa.Table.from_pylist(_span_rows("d1", [3, 4, 5]), schema=_SPAN_SCHEMA)
    with pytest.raises(ValueError, match="split across blocks"):
        reassemble_batch_local(tail, expect_dense_offsets=True)


def test_local_reassembly_guard_detects_gap():
    gap = pa.Table.from_pylist(_span_rows("d1", [0, 1, 3]), schema=_SPAN_SCHEMA)
    with pytest.raises(ValueError, match="split across blocks"):
        reassemble_batch_local(gap, expect_dense_offsets=True)


def test_local_reassembly_guard_passes_dense_docs():
    ok = pa.Table.from_pylist(
        _span_rows("d1", [2, 0, 1]) + _span_rows("d0", [1, 0]), schema=_SPAN_SCHEMA
    )
    out = reassemble_batch_local(ok, expect_dense_offsets=True)
    df = out.to_pandas()
    assert df[df["doc_id"] == "d1"]["seq"].tolist() == [0, 1, 2]
    # guard off: same rows accepted with arbitrary offsets
    loose = pa.Table.from_pylist(_span_rows("d1", [10, 99]), schema=_SPAN_SCHEMA)
    assert len(reassemble_batch_local(loose)) == 2


@pytest.mark.usefixtures("ray_session")
def test_classify_cascade_homogeneous_blocks():
    """Blocks where the filter leaves NO confident (or no doubtful) rows
    must still union cleanly — null-typed empty columns would break the
    block-schema equality requirement."""
    from pdf_ocr_comparison_tool_ray.config import DOCUMENT_TYPES_EN
    from pdf_ocr_comparison_tool_ray.stages.classify_cascade import classify_cascade

    kw = next(iter(DOCUMENT_TYPES_EN.values()))["keywords"][0]
    # many small blocks: some all-confident (keyword-rich), some all-doubtful
    rows = [{"doc_id": i, "text": (kw + " ") * 30} for i in range(8)]
    rows += [{"doc_id": 100 + i, "text": "zz qq ww"} for i in range(8)]
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(8)
    out = classify_cascade(ds, doc_types=DOCUMENT_TYPES_EN).to_pandas()
    assert len(out) == 16
    assert set(out["classifier"]) == {"rule", "llm"}


def test_nest_batch_empty_block():
    from pdf_ocr_comparison_tool_ray.pipelines.sinks import _nest_batch

    empty = pa.schema(
        [
            ("doc_id", pa.string()),
            ("seq", pa.int32()),
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("route", pa.string()),
            ("score", pa.float64()),
        ]
    ).empty_table()
    out = _nest_batch(empty)
    assert len(out) == 0
    assert out.schema.field("spans").type.value_type.field("offset").type == pa.int32()


def test_input_fingerprint_same_second_rewrite(tmp_path):
    from pdf_ocr_comparison_tool_ray.state.checkpoint import input_fingerprint

    f = tmp_path / "in.parquet"
    f.write_bytes(b"x" * 64)
    st = os.stat(f)
    fp1 = input_fingerprint(str(f))
    # same byte size, same whole second, different nanoseconds
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    fp2 = input_fingerprint(str(f))
    assert fp1 != fp2


def test_completed_partitions_missing_fp_is_stale(tmp_path):
    import json

    from pdf_ocr_comparison_tool_ray.state.checkpoint import completed_partitions

    out = tmp_path / "out"
    (out / "_manifest").mkdir(parents=True)
    (out / "part-00000.parquet").write_bytes(b"pq")
    (out / "_manifest" / "p0.json").write_text(
        json.dumps({"partition": 0, "file": "part-00000.parquet"})
    )
    # no fingerprint requested -> data file present counts as done
    assert completed_partitions(str(out)) == [0]
    # fingerprint requested but manifest has none -> cannot verify, stale
    assert completed_partitions(str(out), input_fp="abc") == []


def test_cm_deep_rows_are_independent():
    """depth > 4 rows must not all collapse to column 0."""
    width = 512
    cols = np.array([_cm_hashes(f"v{i}", 6, width)[4:] for i in range(50)])
    assert (cols != 0).any()
    assert len({tuple(c) for c in cols}) > 40  # distinct values hash apart
    sk = cm_init(depth=6, width=width)
    cm_add_many(sk, [f"v{i % 7}" for i in range(70)])
    for i in range(7):
        assert cm_estimate(sk, f"v{i}") >= 10  # upper-bound property holds


@pytest.mark.usefixtures("ray_session")
def test_bucketed_equi_join_inner_left_and_collisions():
    from pdf_ocr_comparison_tool_ray.stages.bucketed import bucketed_equi_join

    left = ray.data.from_pandas(
        pd.DataFrame({"k": [1, 2, 3, 4], "v": [10, 20, 30, 40], "tag": list("abcd")})
    ).repartition(3)
    right = ray.data.from_pandas(
        pd.DataFrame({"k": [2, 2, 3, 9], "v": [200, 201, 300, 900], "w": [5, 6, 7, 8]})
    ).repartition(2)

    inner = (
        bucketed_equi_join(left, right, on="k", how="inner", n_buckets=4)
        .to_pandas()
        .sort_values(["k", "v_r"])
        .reset_index(drop=True)
    )
    # k=2 joins twice, k=3 once; right 'v' collides -> suffixed
    assert inner["k"].tolist() == [2, 2, 3]
    assert inner["v"].tolist() == [20, 20, 30]
    assert inner["v_r"].tolist() == [200, 201, 300]
    assert inner["w"].tolist() == [5, 6, 7]

    outer = (
        bucketed_equi_join(left, right, on="k", how="left", n_buckets=4)
        .to_pandas()
        .sort_values(["k", "v_r"])
        .reset_index(drop=True)
    )
    assert len(outer) == 5  # 1,4 unmatched + the three inner rows
    unmatched = outer[outer["w"].isna()]
    assert sorted(unmatched["k"].tolist()) == [1, 4]


@pytest.mark.usefixtures("ray_session")
def test_bucketed_equi_join_outer_modes():
    from pdf_ocr_comparison_tool_ray.stages.bucketed import bucketed_equi_join

    left = ray.data.from_pandas(pd.DataFrame({"k": [1, 2], "a": [10, 20]}))
    right = ray.data.from_pandas(pd.DataFrame({"k": [2, 3], "b": [200, 300]}))
    full = (
        bucketed_equi_join(left, right, on="k", how="outer", n_buckets=4)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert full["k"].tolist() == [1, 2, 3]
    assert full.loc[full["k"] == 3, "a"].isna().all()
    assert full.loc[full["k"] == 1, "b"].isna().all()
    rj = (
        bucketed_equi_join(left, right, on="k", how="right", n_buckets=4)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert rj["k"].tolist() == [2, 3]


@pytest.mark.usefixtures("ray_session")
def test_bucketed_map_groups_property():
    """The bucket-wise co-partition must equal a plain per-key
    groupby-apply for any per-key computation, regardless of block
    layout or bucket count (hypothesis over random frames)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pdf_ocr_comparison_tool_ray.stages.bucketed import bucketed_map_groups

    @st.composite
    def frames(draw):
        n = draw(st.integers(1, 60))
        keys = draw(st.lists(st.integers(0, 9), min_size=n, max_size=n))
        vals = draw(st.lists(st.integers(-100, 100), min_size=n, max_size=n))
        return pd.DataFrame({"k": keys, "v": vals})

    def per_key(df):
        out = df.groupby("k", as_index=False).agg(
            s=("v", "sum"), mn=("v", "min"), n=("v", "size")
        )
        out["n"] = out["n"].astype("int64")
        return out

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(frames(), st.integers(1, 7), st.integers(1, 5))
    def check(df, n_buckets, n_blocks):
        ds = ray.data.from_pandas(df).repartition(n_blocks)
        got = (
            bucketed_map_groups(ds, "k", per_key, n_buckets=n_buckets)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want = per_key(df).sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    check()


@pytest.mark.usefixtures("ray_session")
def test_broadcast_hash_join_matches_bucketed():
    """The broadcast map-side join and the co-partition join must agree
    on inner and left semantics (they are the two physical plans for the
    same logical join)."""
    from pdf_ocr_comparison_tool_ray.stages.broadcast import broadcast_hash_join
    from pdf_ocr_comparison_tool_ray.stages.bucketed import bucketed_equi_join

    large = ray.data.from_pandas(
        pd.DataFrame({"k": [1, 2, 2, 3, 9], "v": [10, 20, 21, 30, 90]})
    ).repartition(3)
    small = pd.DataFrame({"k": [1, 2, 4], "name": ["a", "b", "d"], "v": [7, 8, 9]})

    def norm(ds):
        df = ds.to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    for how in ("inner", "left"):
        b = norm(broadcast_hash_join(large, small, on="k", how=how))
        c = norm(
            bucketed_equi_join(
                large, ray.data.from_pandas(small), on="k", how=how, n_buckets=4
            )
        )
        assert set(b.columns) == set(c.columns) == {"k", "v", "name", "v_r"}
        assert len(b) == len(c)
        pd.testing.assert_frame_equal(b[sorted(b.columns)], c[sorted(c.columns)],
                                      check_dtype=False)

    with pytest.raises(ValueError, match="inner/left"):
        broadcast_hash_join(large, small, on="k", how="outer")


@pytest.mark.usefixtures("ray_session")
def test_bucketed_equi_join_semi_anti():
    """semi/anti: left rows filtered by right-key existence; left schema
    and dtypes untouched (no null-fill promotion), duplicate right keys
    do NOT duplicate left rows, duplicate left rows all survive."""
    import numpy as np

    from pdf_ocr_comparison_tool_ray.stages.bucketed import bucketed_equi_join

    rng = np.random.RandomState(3)
    ldf = pd.DataFrame(
        {
            "k": rng.randint(0, 20, size=60),
            "v": np.arange(60, dtype=np.int64),
            "big": (1 << 60) + np.arange(60, dtype=np.int64),  # >2^53
        }
    )
    rdf = pd.DataFrame({"k": [1, 1, 3, 5, 7, 9, 11, 13, 42]})
    left = ray.data.from_pandas(ldf).repartition(3)
    right = ray.data.from_pandas(rdf).repartition(2)

    for how in ("semi", "anti"):
        got = (
            bucketed_equi_join(left, right, on="k", how=how, n_buckets=4)
            .to_pandas()
            .sort_values("v")
            .reset_index(drop=True)
        )
        member = ldf["k"].isin(rdf["k"])
        want = (
            ldf[member if how == "semi" else ~member]
            .sort_values("v")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[want.columns], want), how
        assert got["big"].dtype == np.int64  # no float64 round-trip

    with pytest.raises(ValueError, match="semi/anti"):
        bucketed_equi_join(left, right, on="k", how="cross")


@pytest.mark.usefixtures("ray_session")
def test_semi_anti_join_tolerates_empty_blocks():
    """Repartitioning past the row count creates EMPTY blocks; the
    semi/anti taggers must keep explicit arrow types so those blocks'
    schemas match (an untyped pa.array([]) infers type null)."""
    from pdf_ocr_comparison_tool_ray.stages.bucketed import bucketed_equi_join

    left = ray.data.from_pandas(
        pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]})
    ).repartition(8)
    right = ray.data.from_pandas(pd.DataFrame({"k": [2, 9]})).repartition(6)

    semi = bucketed_equi_join(left, right, on="k", how="semi").to_pandas()
    anti = bucketed_equi_join(left, right, on="k", how="anti").to_pandas()
    assert sorted(semi["k"]) == [2] and sorted(anti["k"]) == [1, 3]
    assert semi["v"].dtype == anti["v"].dtype == "int64"


@pytest.mark.usefixtures("ray_session")
def test_bucketed_join_empty_side_behavior():
    """A fully-empty Dataset reports schema() None; the join must not
    AttributeError (review finding).  semi/anti degrade gracefully —
    their output schema is the left's alone; the merge forms raise a
    descriptive error because the joined columns are unconstructable."""
    from pdf_ocr_comparison_tool_ray.stages.bucketed import bucketed_equi_join

    left = ray.data.from_pandas(
        pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]})
    )
    # an empty dataset whose schema Ray has dropped
    empty = ray.data.from_pandas(
        pd.DataFrame({"k": [99], "v": [0]})
    ).filter(lambda r: False).materialize()
    assert empty.schema() is None or empty.count() == 0

    anti = bucketed_equi_join(left, empty, on="k", how="anti").to_pandas()
    assert sorted(anti["k"].tolist()) == [1, 2, 3]
    semi = bucketed_equi_join(left, empty, on="k", how="semi").to_pandas()
    assert len(semi) == 0
    if empty.schema() is None:
        with pytest.raises(ValueError, match="empty Dataset"):
            bucketed_equi_join(left, empty, on="k", how="left")
