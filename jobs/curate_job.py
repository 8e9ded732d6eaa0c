"""Cluster job entrypoint for corpus curation (the training-data
pipeline as one resumable job): quality gate -> repetition filter ->
global exact dedup -> partitioned parquet corpus.

Submit to a fixed-size Ray cluster:

    ray job submit --working-dir . -- \
        python jobs/curate_job.py \
        --input /data/documents.parquet --output /data/curated \
        --partitions 4096

Same checkpoint contract as jobs/extract_job.py: re-submitting after a
failure skips partitions whose manifest entry matches the input
fingerprint.  When the missing partitions' dedup-keys sidelines survive
(`_dedup_keys/`), resume is a filtered gate-only recompute of just
those partitions; otherwise the gate + global dedup recompute (either
way resumed output is byte-identical to a fresh run — see
pipelines/curate.py).  Prints a one-line JSON run summary including
`resume_mode` (fresh | keys-sideline | full-recompute | noop).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents parquet")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--partitions", type=int, default=64,
                    help="output partitions (the resume unit)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pdf_ocr_comparison_tool_ray.pipelines.curate import (
        run_curation_checkpointed,
    )
    from pdf_ocr_comparison_tool_ray.state.checkpoint import (
        completed_partitions,
        input_fingerprint,
    )

    fp = input_fingerprint(args.input)
    already = completed_partitions(args.output, fp)

    t0 = time.perf_counter()
    stats, resume_mode = run_curation_checkpointed(
        args.input, args.output, num_partitions=args.partitions
    )
    print(
        json.dumps(
            {
                "job": "curate",
                "input": args.input,
                "input_fp": fp,
                "output": args.output,
                "partitions_total": args.partitions,
                "partitions_skipped_resume": len(already),
                "resume_mode": resume_mode,
                "partitions_processed": int(len(stats)),
                "n_docs_kept": int(stats["n_docs"].sum()) if len(stats) else 0,
                "n_words_kept": int(stats["n_words"].sum()) if len(stats) else 0,
                "wall_sec": round(time.perf_counter() - t0, 3),
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
