"""Per-stage profile of the headline extraction pipeline.

Runs the flagship pipeline at a configurable scale and prints one line
per Ray Data operator with wall seconds, total remote CPU seconds and
task count (parsed from ``ds.stats()``) — the regression harness for
"wall-time dominated by useful compute".

Usage: python scripts/profile_headline.py [replication] [num_cpus]
"""

from __future__ import annotations

import json
import re
import sys
import time

sys.path.insert(0, ".")

REPLICATION = int(sys.argv[1]) if len(sys.argv) > 1 else 32
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
SF_DIR = "/root/testdata/sf0.1"

_OP_RE = re.compile(
    r"Operator (\d+) (.+?): (?:(\d+) tasks executed, )?(\d+) blocks produced in ([0-9.]+)s"
)
_WALL_RE = re.compile(r"Remote wall time:.* ([0-9.]+)(ms|s|us) total")


def parse_stats(stats: str):
    ops = []
    current = None
    for line in stats.splitlines():
        m = _OP_RE.search(line)
        if m:
            current = {
                "op": m.group(2),
                "tasks": int(m.group(3) or 0),
                "blocks": int(m.group(4)),
                "wall_sec": float(m.group(5)),
                "cpu_sec": 0.0,
            }
            ops.append(current)
            continue
        w = _WALL_RE.search(line)
        if w and current is not None:
            val = float(w.group(1))
            unit = w.group(2)
            val *= {"s": 1.0, "ms": 1e-3, "us": 1e-6}[unit]
            current["cpu_sec"] += val
    return ops


def main() -> None:
    import pandas as pd
    import ray
    import ray.data

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pdf_ocr_comparison_tool_ray.pipelines.extraction import (
        interleave,
        run_extraction,
    )

    ds = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=NUM_CPUS * 4,
    )

    def rep(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for r in range(REPLICATION):
            b = batch.copy()
            b["doc_id"] = b["doc_id"].astype(str) + f"_r{r}"
            out.append(b)
        return pd.concat(out, ignore_index=True)

    flat = ds.map_batches(rep, batch_format="pandas", batch_size=None)
    t0 = time.perf_counter()
    out = run_extraction(
        interleave(flat),
        ocr_concurrency=max(2, NUM_CPUS - 2),
        batch_size=None,
    ).materialize()
    wall = time.perf_counter() - t0
    n = out.count()
    ops = parse_stats(out.stats())
    for op in ops:
        print(json.dumps(op))
    print(
        json.dumps(
            {
                "op": "TOTAL",
                "wall_sec": round(wall, 2),
                "spans": n,
                "num_cpus": NUM_CPUS,
                "replication": REPLICATION,
                "useful_cpu_utilization": round(
                    sum(o["cpu_sec"] for o in ops) / (wall * NUM_CPUS), 3
                ),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
