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
contract test).

Fast resume via the dedup-keys sideline: each partition write also
lands an atomic keys-only file (``_dedup_keys/k{part}-{input_fp}.
parquet`` — just the kept doc_ids, ~16 bytes/doc).  When every missing
partition still has its keys file, resume skips the global gate+dedup
entirely: one pruned corpus scan filtered to the missing partitions'
kept ids, gate-only recompute of those docs (the gate is a pure per-doc
function), write.  Measured at 1.28M docs / 2 of 64 partitions lost:
48.0 s full-recompute resume -> keys-sideline resume is one filtered
scan + 1/32 of the gate.  The keys file survives unless it is lost with
the partition, in which case the full gate+dedup path runs (both paths
byte-identical to a fresh run, pinned by the CLI test).  At deploy the
missing-id set ships to tasks once via the function closure; it is
bounded by the missing fraction of the corpus — if resume after a mass
failure dominates, route the filter through a bucketed semi-join on
doc_id instead.
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Optional, Tuple

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..functions.quality import quality_ok, quality_signals, repetition_signals
from ..functions.textnorm import text_hash_many
from ..stages.bucketed import bucketed_drop_duplicates
from ..state.checkpoint import (
    check_num_partitions,
    completed_partitions,
    input_fingerprint,
    partitions_of_series,
    stamp_empty_partition,
    write_partition_atomic,
    zero_partition_extra,
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


def _keys_dir(out_dir: str) -> Path:
    return Path(out_dir) / "_dedup_keys"


def _keys_file(out_dir: str, part: int, input_fp: str) -> Path:
    return _keys_dir(out_dir) / f"k{part:05d}-{input_fp}.parquet"


def _write_keys_sideline(
    out_dir: str, part: int, doc_ids: pd.Series, input_fp: str
) -> None:
    """Atomic keys-only sideline for fast resume (module doc).  Written
    BEFORE the data file: keys are a pure function of the input, so a
    crash at any point leaves only valid (or absent) sidelines."""
    kdir = _keys_dir(out_dir)
    kdir.mkdir(parents=True, exist_ok=True)
    final = _keys_file(out_dir, part, input_fp)
    tmp = kdir / f".tmp-k{part:05d}-{os.getpid()}"
    pq.write_table(
        pa.table({"doc_id": pa.array(doc_ids, type=pa.int64())}), tmp
    )
    os.replace(tmp, final)


def _make_curate_writer(
    out_dir: str, input_path: str, input_fp: str, num_partitions: int
):
    def write_partition(group: pd.DataFrame) -> pd.DataFrame:
        t0 = time.perf_counter()
        part = int(group["partition"].iloc[0])
        g = group.sort_values("doc_id").reset_index(drop=True)
        out_cols = ["doc_id", "lang", "source", "n_words", "text", "text_hash"]
        table = pa.Table.from_pandas(g[out_cols], preserve_index=False)
        n_docs = int(len(g))
        _write_keys_sideline(out_dir, part, g["doc_id"], input_fp)
        write_partition_atomic(
            out_dir,
            part,
            table,
            {
                "n_docs": n_docs,
                "n_words": int(g["n_words"].sum()),
                "input_path": input_path,
                "input_fp": input_fp,
                "num_partitions": num_partitions,
            },
            t0=t0,
        )
        return pd.DataFrame(
            [{"partition": part, "n_docs": n_docs,
              "n_words": int(g["n_words"].sum())}]
        )

    return write_partition


def _write_stage(
    kept: ray.data.Dataset,
    done: frozenset,
    num_partitions: int,
    out_dir: str,
    input_path: str,
    input_fp: str,
) -> pd.DataFrame:
    """Shared tail of both resume paths: partition assignment, drop of
    already-completed partitions, atomic per-partition write.  After the
    writes land, any partition that produced ZERO rows gets a
    manifest-only completion stamp plus an EMPTY keys sideline (the
    writer UDF never sees empty groups; without the stamp an empty
    partition blocks the noop and fast-resume paths forever)."""
    np_ = num_partitions

    def add_partition_drop_done(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["partition"] = partitions_of_series(batch["doc_id"], np_)
        return batch.loc[~batch["partition"].isin(done)]

    partitioned = kept.map_batches(
        add_partition_drop_done, batch_format="pandas"
    )
    stats = partitioned.groupby("partition").map_groups(
        _make_curate_writer(out_dir, input_path, input_fp, num_partitions),
        batch_format="pandas",
    )
    cols = ["partition", "n_docs", "n_words"]
    df = stats.to_pandas()
    if not len(df.columns):
        # zero groups lose the pandas schema through to_pandas
        df = pd.DataFrame(columns=cols)
    else:
        df = df.sort_values("partition").reset_index(drop=True)
    written = set(int(p) for p in df["partition"]) if len(df) else set()
    for p in range(num_partitions):
        if p in done or p in written:
            continue
        _write_keys_sideline(
            out_dir, p, pd.Series([], dtype="int64"), input_fp
        )
        stamp_empty_partition(
            out_dir,
            p,
            zero_partition_extra(
                ("n_docs", "n_words"),
                input_path=input_path,
                input_fp=input_fp,
                num_partitions=num_partitions,
            ),
        )
    return df


def run_curation_checkpointed(
    input_path: str,
    out_dir: str,
    num_partitions: int = 16,
    n_buckets: Optional[int] = None,
) -> Tuple[pd.DataFrame, str]:
    """Run (or resume) the curation job; returns (THIS run's
    per-partition metrics — already-completed partitions are skipped —
    and the resume mode: 'fresh' | 'keys-sideline' | 'full-recompute' |
    'noop')."""
    from ..state.progress import write_job_stamp

    os.makedirs(out_dir, exist_ok=True)
    check_num_partitions(out_dir, num_partitions)
    input_fp = input_fingerprint(input_path)
    done = frozenset(completed_partitions(out_dir, input_fp))
    write_job_stamp(
        out_dir,
        job="curate",
        partitions_total=num_partitions,
        input_path=input_path,
        input_fp=input_fp,
        partitions_resumed=len(done),
    )
    empty = pd.DataFrame(columns=["partition", "n_docs", "n_words"])
    if len(done) == num_partitions:
        return empty, "noop"

    missing = [p for p in range(num_partitions) if p not in done]
    key_files = [_keys_file(out_dir, p, input_fp) for p in missing]
    if done and all(f.exists() for f in key_files):
        # FAST PATH (module doc): every missing partition still has its
        # dedup-keys sideline, so the global gate+dedup decisions are
        # known — filter the scan to those ids and gate-only recompute.
        missing_ids = pa.array(
            sorted(
                int(x)
                for f in key_files
                for x in pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
            ),
            type=pa.int64(),
        )
        if len(missing_ids) == 0:
            # the lost partitions were legitimately empty (their keys
            # files prove it) — restamp their completion markers
            for p in missing:
                stamp_empty_partition(
                    out_dir,
                    p,
                    zero_partition_extra(
                        ("n_docs", "n_words"),
                        input_path=input_path,
                        input_fp=input_fp,
                        num_partitions=num_partitions,
                    ),
                )
            return empty, "keys-sideline"
        ds = ray.data.read_parquet(
            input_path, columns=["doc_id", "text", "lang", "source"]
        )

        def keep_missing(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch["doc_id"], value_set=missing_ids))

        kept = ds.map_batches(
            keep_missing, batch_format="pyarrow"
        ).map_batches(curation_gate, batch_format="pyarrow")
        stats = _write_stage(
            kept, done, num_partitions, out_dir, input_path, input_fp
        )
        return stats, "keys-sideline"

    ds = ray.data.read_parquet(
        input_path, columns=["doc_id", "text", "lang", "source"]
    )
    gated = ds.map_batches(curation_gate, batch_format="pyarrow")
    # global first-wins dedup BEFORE the resume filter (see module doc)
    kept = bucketed_drop_duplicates(
        gated, "text_hash", sort_within=["doc_id"],
        n_buckets=n_buckets or max(num_partitions, 16),
    )
    stats = _write_stage(
        kept, done, num_partitions, out_dir, input_path, input_fp
    )
    return stats, "full-recompute" if done else "fresh"
