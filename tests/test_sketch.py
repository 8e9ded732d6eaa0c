"""HLL sketch: error bounds vs exact, exact mergeability, Ray stages."""

import numpy as np
import pandas as pd
import pytest
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_ocr_comparison_tool_ray.functions.hll import (
    hll_add_many,
    hll_count,
    hll_init,
    hll_merge,
)
from pdf_ocr_comparison_tool_ray.stages.sketch import approx_distinct, approx_distinct_by


def test_hll_error_bound():
    for n in (100, 1000, 20000):
        regs = hll_add_many(hll_init(12), (f"v{i}" for i in range(n)))
        est = hll_count(regs)
        assert abs(est - n) / n < 0.08, (n, est)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(0, 500), max_size=200), st.lists(st.integers(0, 500), max_size=200))
def test_hll_merge_equals_union(a, b):
    ra = hll_add_many(hll_init(8), a)
    rb = hll_add_many(hll_init(8), b)
    runion = hll_add_many(hll_init(8), a + b)
    assert np.array_equal(hll_merge(ra, rb), runion)


@pytest.mark.usefixtures("ray_session")
def test_approx_distinct_dataset():
    n = 5000
    df = pd.DataFrame({"doc_id": [f"d{i % 1200}" for i in range(n)]})
    ds = ray.data.from_pandas(df).repartition(8)
    est = approx_distinct(ds, "doc_id", p=12)
    assert abs(est - 1200) / 1200 < 0.08


@pytest.mark.usefixtures("ray_session")
def test_approx_distinct_by_key():
    rows = []
    truth = {"a": 400, "b": 37, "c": 1}
    for k, n in truth.items():
        rows += [{"k": k, "v": f"{k}{i % n}"} for i in range(n * 3)]
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(5)
    out = approx_distinct_by(ds, "k", "v", p=12).to_pandas().set_index("k")
    for k, n in truth.items():
        est = out.loc[k, "approx_distinct"]
        assert abs(est - n) / n < 0.1, (k, n, est)


def test_cm_point_estimates_upper_bound():
    from pdf_ocr_comparison_tool_ray.functions.hll import (
        cm_add_many,
        cm_estimate,
        cm_init,
        cm_merge,
    )

    truth = {"a": 500, "b": 100, "c": 7}
    vals = [k for k, n in truth.items() for _ in range(n)]
    half = len(vals) // 2
    s1 = cm_add_many(cm_init(), vals[:half])
    s2 = cm_add_many(cm_init(), vals[half:])
    merged = cm_merge(s1, s2)
    for k, n in truth.items():
        est = cm_estimate(merged, k)
        assert est >= n                      # CM never underestimates
        assert est <= n + len(vals) * 0.02   # and error is bounded


@pytest.mark.usefixtures("ray_session")
def test_approx_topk_recovers_heavy_hitters():
    import random

    from pdf_ocr_comparison_tool_ray.stages.sketch import approx_topk

    rng = random.Random(5)
    vals = []
    heavy = {f"hh{i}": 300 - 20 * i for i in range(5)}
    for k, n in heavy.items():
        vals += [k] * n
    vals += [f"tail{rng.randrange(2000)}" for _ in range(3000)]
    rng.shuffle(vals)
    ds = ray.data.from_pandas(pd.DataFrame({"tok": vals})).repartition(6)
    top = approx_topk(ds, "tok", k=5)
    assert set(top["tok"]) == set(heavy)
    for _, r in top.iterrows():
        assert r["approx_count"] >= heavy[r["tok"]]
