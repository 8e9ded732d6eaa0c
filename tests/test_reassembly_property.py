"""Property tests for the invariant-bearing reassembly (SURVEY §7.6):
adversarial offset patterns — huge gaps, reversed arrival order, docs
split across blocks — must still yield the exact ordered sequence on the
groupby(doc_id) shuffle path, and the doc-local fast path must agree
whenever its locality precondition holds."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pdf_ocr_comparison_tool_ray.pipelines.extraction import (
    reassemble,
    reassemble_local,
)

_KINDS = ["text", "html", "pdf", "scan"]


@st.composite
def span_corpus(draw):
    """Random extracted-span rows: per doc, unique offsets drawn from an
    adversarial range (gaps, no zero start, up to 2**30)."""
    n_docs = draw(st.integers(1, 8))
    rows = []
    for d in range(n_docs):
        n_spans = draw(st.integers(1, 12))
        offsets = draw(
            st.lists(
                st.integers(0, 2**30), min_size=n_spans, max_size=n_spans, unique=True
            )
        )
        for off in offsets:
            rows.append(
                {
                    "doc_id": f"doc{d:03d}",
                    "kind": draw(st.sampled_from(_KINDS)),
                    "text": draw(st.text(max_size=8)),
                    "media_ref": "",
                    "offset": off,
                    "route": "native",
                    "score": 1.0,
                }
            )
    # adversarial arrival order
    perm = draw(st.permutations(range(len(rows))))
    return [rows[i] for i in perm]


def _oracle(rows):
    df = pd.DataFrame(rows).sort_values(
        ["doc_id", "offset", "kind", "media_ref"], kind="mergesort"
    )
    df["seq"] = df.groupby("doc_id").cumcount()
    return (
        df[["doc_id", "seq", "kind", "text", "media_ref", "route", "score"]]
        .sort_values(["doc_id", "seq"])
        .reset_index(drop=True)
    )


def _to_table(rows):
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("doc_id", pa.string()),
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
                ("route", pa.string()),
                ("score", pa.float64()),
            ]
        ),
    )


def _norm(ds):
    return (
        ds.to_pandas()
        .sort_values(["doc_id", "seq"])
        .reset_index(drop=True)
        .astype({"seq": "int64"})
    )


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(span_corpus())
def test_shuffle_reassembly_matches_oracle(rows):
    table = _to_table(rows)
    # scatter rows across many tiny blocks: docs straddle block boundaries
    ds = ray.data.from_arrow(table).repartition(max(2, len(rows) // 3))
    got = _norm(reassemble(ds))
    pd.testing.assert_frame_equal(got, _oracle(rows), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(span_corpus())
def test_local_reassembly_matches_oracle_when_doc_local(rows):
    # precondition of the fast path: all of a doc's spans in one block —
    # build one block per whole corpus (trivially doc-local)
    ds = ray.data.from_arrow(_to_table(rows))
    got = _norm(reassemble_local(ds))
    pd.testing.assert_frame_equal(got, _oracle(rows), check_dtype=False)
