"""Sinks: categorized partitioned write round-trip, full-text framing."""

import glob
import os
import tempfile

import pandas as pd
import pytest
import ray.data

from pdf_ocr_comparison_tool_ray.pipelines.compare import enrich_spans
from pdf_ocr_comparison_tool_ray.pipelines.extraction import interleave, run_extraction
from pdf_ocr_comparison_tool_ray.pipelines.sinks import render_full_text, write_categorized
from pdf_ocr_comparison_tool_ray.synth import make_corpus


def _extracted(n=20, seed=5):
    docs = make_corpus(n, seed=seed, skew_docs=0)
    flat = ray.data.from_pandas(pd.DataFrame(docs)[["doc_id", "text"]])
    return run_extraction(interleave(flat), ocr_concurrency=2)


@pytest.mark.usefixtures("ray_session")
def test_write_categorized_round_trip():
    out = _extracted()
    # enrich expects offset column naming
    spans = out.map_batches(
        lambda t: t.rename_columns(
            ["doc_id", "offset", "kind", "text", "media_ref", "route", "score"]
        ),
        batch_format="pyarrow",
    )
    enriched = enrich_spans(spans)
    n_rows = enriched.count()
    with tempfile.TemporaryDirectory() as d:
        write_categorized(enriched, d)
        # hive layout: one dir per main_type
        parts = sorted(
            os.path.basename(p) for p in glob.glob(os.path.join(d, "main_type=*"))
        )
        assert parts, "no partition directories written"
        back = ray.data.read_parquet(d).to_pandas()
        assert len(back) == n_rows
        # every doc has exactly one main_type
        per_doc = back.groupby("doc_id")["main_type"].nunique()
        assert (per_doc == 1).all()


@pytest.mark.usefixtures("ray_session")
def test_render_full_text_framing():
    out = _extracted(n=6, seed=9)
    rendered = render_full_text(out).to_pandas().set_index("doc_id")
    spans = out.to_pandas().sort_values(["doc_id", "seq"])
    for doc_id, g in spans.groupby("doc_id"):
        expected = "\n".join(
            f"=== 第{int(s)+1}页 ===\n{t}" for s, t in zip(g["seq"], g["text"])
        )
        assert rendered.loc[doc_id, "full_text"] == expected
        assert rendered.loc[doc_id, "n_spans"] == len(g)
