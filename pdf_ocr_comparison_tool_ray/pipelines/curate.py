"""Checkpoint-resumable corpus curation — the training-data pipeline as
ONE resumable cluster job: quality gate -> repetition filter -> global
exact dedup (first-wins) -> partitioned parquet corpus.

Same resume contract as the extraction job (state/checkpoint.py):
partition = md5(doc_id) mod P, one atomically-written parquet + manifest
entry per partition, re-submission skips partitions whose manifest
matches the input fingerprint.

Resume-correctness subtlety: the first-wins dedup is a GLOBAL decision
(min doc_id per normalized text hash), so completed partitions are
dropped only at the WRITE stage — the gate + dedup always run over the
full corpus.  Decisions are pure functions of the input, so a resumed
run writes byte-identical partitions to a fresh one (pinned by the CLI
contract test).  The extra gate/dedup recompute on resume is the price
of global correctness; at deploy, a weight-threshold DSIR select or a
persisted dedup-keys sideline removes it if resume dominates.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.quality import quality_ok, quality_signals, repetition_signals
from ..functions.textnorm import text_hash_many
from ..stages.bucketed import bucketed_drop_duplicates
from ..state.checkpoint import (
    completed_partitions,
    input_fingerprint,
    partition_of,
    write_partition_atomic,
)

# the exposed doc_repetition_stats threshold (queries._REPETITIVE_TOP2_FRAC)
REPETITIVE_TOP2_FRAC = 0.08


def curation_gate(batch: pa.Table) -> pa.Table:
    """Map-only keep/drop + annotate: quality rules (Gopher-style) and
    the repetition filter; survivors carry their normalized text hash
    for the dedup stage."""
    keep_rows = []
    for did, text, lang, source in zip(
        batch["doc_id"].to_pylist(),
        batch["text"].to_pylist(),
        batch["lang"].to_pylist(),
        batch["source"].to_pylist(),
    ):
        sig = quality_signals(text)
        if not quality_ok(sig):
            continue
        rep = repetition_signals(text)
        if rep["top2_char_frac"] > REPETITIVE_TOP2_FRAC:
            continue
        keep_rows.append((did, lang, source, int(rep["n_words"]), text))
    # explicit schema: a fully-filtered batch must not emit null-typed
    # columns (block-schema equality at the dedup shuffle)
    return pa.Table.from_pydict(
        {
            "doc_id": [r[0] for r in keep_rows],
            "lang": [r[1] for r in keep_rows],
            "source": [r[2] for r in keep_rows],
            "n_words": [r[3] for r in keep_rows],
            "text": [r[4] for r in keep_rows],
            "text_hash": text_hash_many([r[4] for r in keep_rows]),
        },
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_words", pa.int64()),
                ("text", pa.string()),
                ("text_hash", pa.string()),
            ]
        ),
    )


def _make_curate_writer(out_dir: str, input_path: str, input_fp: str):
    def write_partition(group: pd.DataFrame) -> pd.DataFrame:
        t0 = time.perf_counter()
        part = int(group["partition"].iloc[0])
        g = group.sort_values("doc_id").reset_index(drop=True)
        out_cols = ["doc_id", "lang", "source", "n_words", "text", "text_hash"]
        table = pa.Table.from_pandas(g[out_cols], preserve_index=False)
        n_docs = int(len(g))
        write_partition_atomic(
            out_dir,
            part,
            table,
            {
                "n_docs": n_docs,
                "n_words": int(g["n_words"].sum()),
                "wall_sec": round(time.perf_counter() - t0, 4),
                "input_path": input_path,
                "input_fp": input_fp,
            },
        )
        return pd.DataFrame(
            [{"partition": part, "n_docs": n_docs,
              "n_words": int(g["n_words"].sum())}]
        )

    return write_partition


def run_curation_checkpointed(
    input_path: str,
    out_dir: str,
    num_partitions: int = 16,
    n_buckets: Optional[int] = None,
) -> pd.DataFrame:
    """Run (or resume) the curation job; returns THIS run's
    per-partition metrics (already-completed partitions are skipped)."""
    os.makedirs(out_dir, exist_ok=True)
    input_fp = input_fingerprint(input_path)
    done = frozenset(completed_partitions(out_dir, input_fp))
    if len(done) == num_partitions:
        return pd.DataFrame(columns=["partition", "n_docs", "n_words"])

    ds = ray.data.read_parquet(
        input_path, columns=["doc_id", "text", "lang", "source"]
    )
    gated = ds.map_batches(curation_gate, batch_format="pyarrow")
    # global first-wins dedup BEFORE the resume filter (see module doc)
    kept = bucketed_drop_duplicates(
        gated, "text_hash", sort_within=["doc_id"],
        n_buckets=n_buckets or max(num_partitions, 16),
    )
    np_ = num_partitions

    def add_partition_drop_done(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["partition"] = (
            batch["doc_id"].astype(str)
            .map(lambda d: partition_of(d, np_))
            .astype("int32")
        )
        return batch.loc[~batch["partition"].isin(done)]

    partitioned = kept.map_batches(
        add_partition_drop_done, batch_format="pandas"
    )
    stats = partitioned.groupby("partition").map_groups(
        _make_curate_writer(out_dir, input_path, input_fp),
        batch_format="pandas",
    )
    return stats.to_pandas().sort_values("partition").reset_index(drop=True)
