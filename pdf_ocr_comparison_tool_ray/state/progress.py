"""Per-partition progress surface — the cluster-native analog of the
reference's per-file progress callbacks (``run_ocr.py:391-414``,
``main.py:112-121``).

The reference pushes a Python callback per finished file into the
GUI/API process.  A multi-node batch job has no single process to call
back into — and a per-batch RPC to a progress actor would put an
all-workers hot spot on the data path — so progress is DERIVED from the
per-partition manifest entries the checkpoint writers already land
atomically (``state/checkpoint.py``):

* the job stamps ``_job.json`` at start (partitions total, input
  fingerprint, this run's start timestamp, partitions already complete
  from a previous run);
* every completed partition's manifest entry carries a completion
  ``ts`` (stamped centrally by ``write_partition_atomic``);
* ANY process that can see the output directory (at deploy: the shared
  filesystem / object store the partitions land on) computes progress
  by scanning the manifest — zero cost on the pipeline, works mid-run,
  after a crash, and from a different node than the driver.

``python jobs/progress.py <out_dir> [--watch N]`` is the CLI watcher.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Optional


def _stamp_path(out_dir: str) -> Path:
    return Path(out_dir) / "_job.json"


def write_job_stamp(
    out_dir: str,
    *,
    job: str,
    partitions_total: int,
    input_path: str,
    input_fp: str,
    partitions_resumed: int = 0,
    extra: Optional[dict] = None,
) -> dict:
    """Atomically stamp ``_job.json`` at run start.  Each run (fresh or
    resume) overwrites the stamp with its OWN start time: the watcher
    rates only partitions completed after ``started_ts``, so a resumed
    run's throughput is not diluted by the previous run's work."""
    os.makedirs(out_dir, exist_ok=True)
    stamp = {
        "job": job,
        "partitions_total": int(partitions_total),
        "partitions_resumed": int(partitions_resumed),
        "input_path": input_path,
        "input_fp": input_fp,
        "started_ts": round(time.time(), 3),
        **(extra or {}),
    }
    tmp = Path(out_dir) / f".tmp-_job.json-{os.getpid()}"
    tmp.write_text(json.dumps(stamp))
    os.replace(tmp, _stamp_path(out_dir))
    return stamp


def read_job_stamp(out_dir: str) -> Optional[dict]:
    p = _stamp_path(out_dir)
    if not p.is_file():
        return None
    try:
        return json.loads(p.read_text())
    except (ValueError, OSError):
        return None


def _scan_manifest(out_dir: str, input_fp: Optional[str]) -> list:
    mdir = Path(out_dir) / "_manifest"
    if not mdir.is_dir():
        return []
    entries = []
    for f in sorted(mdir.glob("p*.json")):
        try:
            entry = json.loads(f.read_text())
            if not entry.get("empty"):
                # empty partitions stamp a manifest with no data file
                # (file: null) — mirror completed_partitions' rule or
                # the watcher crashes on them / never reports complete
                if not (Path(out_dir) / entry["file"]).is_file():
                    continue
            if input_fp is not None and entry.get("input_fp") != input_fp:
                continue
            entries.append(entry)
        except (ValueError, KeyError, TypeError, OSError):
            continue
    return entries


def job_progress(out_dir: str, now: Optional[float] = None) -> dict:
    """One progress snapshot from the filesystem alone.

    Counts and sums come from every valid manifest entry (filtered to
    the stamped input fingerprint when a ``_job.json`` exists); rate and
    ETA come from entries completed after THIS run's ``started_ts``.
    Without a stamp (e.g. an output dir written by an older job) the
    completed counts are still reported, with total/ETA unknown.
    """
    now = time.time() if now is None else now
    stamp = read_job_stamp(out_dir)
    input_fp = stamp["input_fp"] if stamp else None
    entries = _scan_manifest(out_dir, input_fp)

    docs_done = sum(int(e.get("n_docs", 0)) for e in entries)
    out = {
        "job": stamp["job"] if stamp else None,
        "output": out_dir,
        "partitions_done": len(entries),
        "partitions_total": stamp["partitions_total"] if stamp else None,
        "docs_done": docs_done,
        "complete": None,
        "pct": None,
        "elapsed_sec": None,
        "partitions_per_sec": None,
        "docs_per_sec": None,
        "eta_sec": None,
    }
    for field in ("n_spans", "n_words"):
        if any(field in e for e in entries):
            out[field.replace("n_", "") + "_done"] = sum(
                int(e.get(field, 0)) for e in entries
            )
    if stamp is None:
        return out

    total = int(stamp["partitions_total"])
    out["complete"] = len(entries) >= total
    out["pct"] = round(100.0 * len(entries) / total, 2) if total else 100.0

    started = float(stamp["started_ts"])
    elapsed = max(now - started, 1e-9)
    out["elapsed_sec"] = round(elapsed, 3)
    this_run = [e for e in entries if float(e.get("ts", 0)) >= started]
    if this_run:
        out["partitions_per_sec"] = round(len(this_run) / elapsed, 4)
        out["docs_per_sec"] = round(
            sum(int(e.get("n_docs", 0)) for e in this_run) / elapsed, 2
        )
        remaining = max(total - len(entries), 0)
        out["eta_sec"] = round(remaining * elapsed / len(this_run), 3)
    return out
