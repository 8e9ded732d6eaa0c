"""Stage-level profiler for the headline pipeline: run from /root/repo.

Usage: python scripts/profile_headline.py [NCPU] [REPLICATION]
Env: BLOCKS_PER_CPU (default 4), POOL (actor pool size), EXTRACT_ONLY=1,
PUSH_SHUFFLE=1.  Prints wall time + ds.stats() per operator — the tool the
round-1 parallelism/shuffle findings came from (see BASELINE.md).
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import ray

NCPU = int(sys.argv[1]) if len(sys.argv) > 1 else 8
REP = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ray.init(address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
ctx = DataContext.get_current()
ctx.enable_progress_bars = False
import os
if os.environ.get("PUSH_SHUFFLE"):
    ctx.use_push_based_shuffle = True

import pandas as pd
import ray.data
from pdf_ocr_comparison_tool_ray.pipelines.extraction import interleave, run_extraction

SF = "/root/testdata/sf0.1"
ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"],
                           override_num_blocks=int(os.environ.get("BLOCKS_PER_CPU","4")) * NCPU)

def rep(batch):
    out = []
    for r in range(REP):
        b = batch.copy()
        b["doc_id"] = b["doc_id"].astype(str) + f"_r{r}"
        out.append(b)
    return pd.concat(out, ignore_index=True)

flat = ds.map_batches(rep, batch_format="pandas", batch_size=None)
n = flat.count()
t0 = time.perf_counter()
import os as _os
if _os.environ.get("EXTRACT_ONLY"):
    from pdf_ocr_comparison_tool_ray.pipelines.extraction import extract_spans
    out = extract_spans(interleave(flat), ocr_concurrency=int(os.environ.get("POOL", str(max(2, NCPU - 2)))), batch_size=None)
else:
    out = run_extraction(interleave(flat), ocr_concurrency=int(os.environ.get("POOL", str(max(2, NCPU - 2)))), batch_size=None)
mat = out.materialize()
dt = time.perf_counter() - t0
print(f"NCPU={NCPU} REP={REP} docs={n} sec={dt:.2f} docs/s={n/dt:.0f}")
print(mat.stats())
ray.shutdown()
