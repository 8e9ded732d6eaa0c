"""Watch a running (or finished) checkpointed job's progress.

    python jobs/progress.py <output_dir> [--watch SECS] [--max-polls N]

Cluster-native analog of the reference's per-file progress callbacks
(``run_ocr.py:391-414``, ``main.py:112-121``): progress is derived from
the per-partition manifest the job's writers land atomically, so this
watcher runs in ANY process that can see the output directory — on the
driver node, another cluster node, or a laptop mounting the shared
filesystem — with zero cost on the pipeline itself.  No Ray session is
needed or created.

Prints one JSON line per poll.  ``--watch 0`` (default) polls once.
Exits 0 when the job is complete, 3 if still incomplete when polling
stops (so shell loops can distinguish).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_ocr_comparison_tool_ray.state.progress import job_progress  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("output", help="job output directory (the one with _manifest/)")
    ap.add_argument("--watch", type=float, default=0.0,
                    help="poll every SECS; 0 = single poll")
    ap.add_argument("--max-polls", type=int, default=0,
                    help="stop after N polls even if incomplete; 0 = no cap")
    args = ap.parse_args()

    polls = 0
    while True:
        snap = job_progress(args.output)
        print(json.dumps(snap), flush=True)
        polls += 1
        if snap["complete"]:
            return 0
        if args.watch <= 0 or (args.max_polls and polls >= args.max_polls):
            return 3
        time.sleep(args.watch)


if __name__ == "__main__":
    raise SystemExit(main())
