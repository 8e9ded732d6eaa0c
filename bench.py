"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ...}

Headline = flagship interleaved-extraction pipeline (interleave ->
explode -> hybrid-routing extract -> groupby(doc_id) reassembly) over
$GRAFT_SF_DIR documents, replicated GRAFT_BENCH_REPLICATION times
(deterministic doc_id suffixes) so the corpus is large enough to
saturate the actor pool.

--scaling: run the headline twice in fresh processes at num_cpus=8 and
num_cpus=32 on the same input and print throughput at both plus the
scaling efficiency (speedup / cpu-ratio).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATION = int(os.environ.get("GRAFT_BENCH_REPLICATION", "8"))
HEADLINE_ONLY = os.environ.get("GRAFT_BENCH_ONLY", "") == "extract"


def _replicated_flat(sf_dir: str, replication: int):
    """documents flat table replicated with deterministic doc_id suffixes."""
    import pandas as pd
    import ray.data

    # block count chosen at the read IS the pipeline parallelism: every
    # downstream map uses batch-per-block, so no bundling caps task count.
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        override_num_blocks=NUM_CPUS * 2,
    )

    def rep(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for r in range(replication):
            b = batch.copy()
            b["doc_id"] = b["doc_id"].astype(str) + f"_r{r}"
            out.append(b)
        return pd.concat(out, ignore_index=True)

    return ds.map_batches(rep, batch_format="pandas", batch_size=None)


def run_headline() -> dict:
    import ray

    from pdf_ocr_comparison_tool_ray.pipelines.extraction import (
        interleave,
        run_extraction,
    )

    # warm page cache (untimed)
    import ray.data

    ray.data.read_parquet(f"{SF_DIR}/documents.parquet").count()

    flat = _replicated_flat(SF_DIR, REPLICATION)
    n_docs = flat.count()
    t0 = time.perf_counter()
    out = run_extraction(
        interleave(flat),
        # fixed-size pool: an autoscaling (1,N) pool ramps up too slowly to
        # saturate a short run; at 100 TB either works, sized to the node
        ocr_concurrency=max(2, NUM_CPUS - 2),
        batch_size=None,  # batch == block; read block count sets parallelism
    )
    n_spans = out.count()
    dt = time.perf_counter() - t0
    return {"sec": dt, "n_docs": n_docs, "n_spans": n_spans,
            "docs_per_sec": n_docs / dt}


def run_queries() -> dict:
    from pdf_ocr_comparison_tool_ray.pipelines.queries import SQL_QUERIES

    import ray.data

    picks = [
        "keyword_topk",
        "exact_dedup",
        "classify_documents",
        "lineitem_agg",
        "nation_revenue",
        "events_daily",
        "sessionize_events",
        "knn_cosine",
    ]
    times = {}
    for name in picks:
        fn, _ = SQL_QUERIES[name]
        t0 = time.perf_counter()
        res = fn(SF_DIR)
        if isinstance(res, ray.data.Dataset):
            res.count()
        times[name] = round(time.perf_counter() - t0, 3)
    return times


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    head = run_headline()
    queries = {} if HEADLINE_ONLY else run_queries()
    print(
        json.dumps(
            {
                "metric": "interleaved-extraction end-to-end wall time "
                          "(docs_per_sec = headline throughput)",
                "value": round(head["sec"], 3),
                "unit": "sec",
                "queries": queries,
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                "n_docs": head["n_docs"],
                "n_spans": head["n_spans"],
                "docs_per_sec": round(head["docs_per_sec"], 2),
            }
        )
    )
    ray.shutdown()


def scaling() -> None:
    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_ONLY="extract",
            GRAFT_SF_DIR=SF_DIR,
            # larger corpus for the scaling A/B so fixed costs (driver
            # planning, pool spin-up, the single read task) amortize --
            # the regime that actually represents the 100 TB target
            GRAFT_BENCH_REPLICATION=os.environ.get(
                "GRAFT_BENCH_REPLICATION", "128"
            ),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    # best-of-2 per leg: single-box wall times vary +/-30% run to run
    # (VM noise); throughput noise is one-sided, so min(sec) is the
    # stable estimator
    r_lo = min(run(lo), run(lo), key=lambda r: r["value"])
    r_hi = min(run(hi), run(hi), key=lambda r: r["value"])
    speedup = r_lo["value"] / r_hi["value"]
    eff = speedup / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "N->4N scaling of the extraction headline",
                "cpus_lo": lo,
                "cpus_hi": hi,
                "sec_lo": r_lo["value"],
                "sec_hi": r_hi["value"],
                "docs_per_sec_lo": r_lo["docs_per_sec"],
                "docs_per_sec_hi": r_hi["docs_per_sec"],
                "speedup": round(speedup, 3),
                "scaling_efficiency": round(eff, 3),
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
