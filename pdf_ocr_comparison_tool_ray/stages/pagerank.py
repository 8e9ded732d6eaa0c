"""Fixed-point PageRank as iterated bucketed joins.

Power iteration over an edge table is the canonical "iterative
distributed joins" workload (Page et al. 1998; the Pregel/GraphX
formulation): per round every node's rank is split across its
out-edges, contributions regroup by destination, and dangling mass
(out-degree-0 nodes) teleports uniformly.

Why FIXED-POINT: float PageRank sums contributions in engine-dependent
order, so a Ray run and a SQL replay diverge in the last ulps and an
exact value-hash oracle can never pass (the same reason semdedup pins
zero Lloyd iterations — see NOTES.md).  Here ranks are int64 in units
of 1/SCALE and every step is integer add / floor-divide, which is
associative-commutative EXACTLY, so any summation order in any engine
produces bit-identical ranks.  Quantization bias per round is < 1
unit/node from each floor (~2^-40 of total mass) — immaterial against
the usual 1e-6 convergence tolerance, and reproducibility is worth far
more to a data-curation pipeline than the last float bit.

Scale shape (the 100 TB story):
- ranks NEVER sit on the driver: the rank table is a Dataset
  co-partitioned with the edge table via ``bucketed_equi_join``; each
  round moves each edge and each rank row exactly once
  (join-on-src shuffle + contrib groupby-dst shuffle + left join back
  onto the node universe).
- the only driver scalars are N (node count) and the dangling-mass
  sum — O(1) bytes.
- each round's rank table is materialized: it feeds both the dangling
  sum and the next join (fan-out pin), and at deploy scale that
  materialization IS the per-iteration checkpoint a resumable run
  restarts from.
- skew: a celebrity node's IN-edges land in one contrib bucket; the
  local pre-aggregation inside each map task (groupby-dst partial sums)
  caps what crosses the shuffle at distinct-dst-per-block, the same
  combiner discipline as the tf-idf df counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .bucketed import bucketed_equi_join

DEFAULT_SCALE = 1 << 40

# Size routing (the repo-wide convention): the integer recurrence is
# identical on both plans — sums of int64 are associative, so the two
# routes are BIT-IDENTICAL, not merely close.  At or below the cap the
# edge list pulls driver-side once and iterates vectorized (np.add.at
# over index arrays) — at 2M edges that is ~32 MB and each iteration is
# microseconds, where the bucketed plan pays ~10 shuffle rounds of task
# overhead.  Above the cap (the open-web graph) everything stays
# co-partitioned and only O(1) scalars touch the driver.
PAGERANK_DRIVER_EDGES_MAX = 2_000_000


def _partial_sum_by(ds, key: str, val: str, n_buckets: int):
    """Local combine + one bucketed shuffle: SUM(val) GROUP BY key."""
    from .bucketed import bucketed_map_groups

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(key, as_index=False)[val].sum()
        out[val] = out[val].astype("int64")
        return out

    partial = ds.map_batches(
        lambda b: combine(b.to_pandas()), batch_format="pyarrow"
    )
    return bucketed_map_groups(partial, key, combine, n_buckets=n_buckets)


def _pagerank_driver(
    edges, nodes, iters, damping_num, damping_den, scale
):
    """Small-graph route: identical integer recurrence, vectorized on
    index arrays driver-side (see PAGERANK_DRIVER_EDGES_MAX)."""
    import ray.data as _rd

    node_arr = nodes.to_pandas()["node"].to_numpy()
    e_df = edges.to_pandas()
    idx = {v: i for i, v in enumerate(node_arr)}
    src = np.fromiter((idx[v] for v in e_df["src"]), dtype=np.int64)
    dst = np.fromiter((idx[v] for v in e_df["dst"]), dtype=np.int64)
    n = len(node_arr)
    outdeg = np.bincount(src, minlength=n).astype(np.int64)
    r = np.full(n, scale // n, dtype=np.int64)
    base = ((damping_den - damping_num) * (scale // n)) // damping_den
    for _ in range(iters):
        dangling = int(r[outdeg == 0].sum())
        share = r[src] // outdeg[src]
        contrib = np.zeros(n, dtype=np.int64)
        np.add.at(contrib, dst, share)
        r = base + (damping_num * (contrib + dangling // n)) // damping_den
    return _rd.from_pandas(
        pd.DataFrame(
            {
                "node": node_arr,
                "rank_fp": pd.Series(r, dtype="int64"),
                "rank": pd.Series(r, dtype="float64") / float(scale),
            }
        )
    )


def pagerank_fixedpoint(
    edges,
    nodes,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = DEFAULT_SCALE,
    n_buckets: int = 64,
):
    """PageRank over ``edges`` (src:string, dst:string — DISTINCT
    directed edges) on the node universe ``nodes`` (node:string —
    includes isolated nodes, which receive teleport-only rank).

    Per round, with integer ``//`` everywhere:
        share(src)   = r[src] // outdeg[src]
        contrib(dst) = sum of share over in-edges
        dangling     = sum of r over outdeg==0 nodes
        r'[v] = ((den-num) * (scale//N)) // den
              + (num * (contrib[v] + dangling//N)) // den

    Returns (node, rank_fp:int64, rank:float64) where rank is the pure
    function rank_fp/scale (bit-exact in any engine).
    """
    if edges.count() <= PAGERANK_DRIVER_EDGES_MAX:
        return _pagerank_driver(
            edges, nodes, iters, damping_num, damping_den, scale
        )
    deg = _partial_sum_by(
        edges.map_batches(
            lambda t: pa.table(
                {
                    "node": t["src"],
                    "outdeg": pa.array([1] * len(t), type=pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        "node",
        "outdeg",
        n_buckets,
    )
    base_nodes = bucketed_equi_join(
        nodes, deg, on="node", how="left", n_buckets=n_buckets
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "node": df["node"],
                "outdeg": df["outdeg"].fillna(0).astype("int64"),
            }
        ),
        batch_format="pandas",
    ).materialize()  # node universe: consumed every round (fan-out pin)

    n = base_nodes.count()
    r0 = scale // n
    base = ((damping_den - damping_num) * r0) // damping_den

    r = base_nodes.map_batches(
        lambda df: df.assign(rank_fp=pd.Series([r0] * len(df), dtype="int64")),
        batch_format="pandas",
    ).materialize()

    for _ in range(iters):
        dangling = int(
            r.map_batches(
                lambda df: pd.DataFrame(
                    {
                        "d": pd.Series(
                            [int(df.loc[df["outdeg"] == 0, "rank_fp"].sum())],
                            dtype="int64",
                        )
                    }
                ),
                batch_format="pandas",
            ).sum("d")
            or 0
        )
        shares = bucketed_equi_join(
            edges,
            r.map_batches(
                lambda df: df.rename(columns={"node": "src"}),
                batch_format="pandas",
            ),
            on="src",
            how="inner",
            n_buckets=n_buckets,
        ).map_batches(
            lambda df: pd.DataFrame(
                {
                    "node": df["dst"],
                    "contrib": (df["rank_fp"] // df["outdeg"]).astype("int64"),
                }
            ),
            batch_format="pandas",
        )
        contrib = _partial_sum_by(shares, "node", "contrib", n_buckets)
        tele = dangling // n
        r = bucketed_equi_join(
            base_nodes, contrib, on="node", how="left", n_buckets=n_buckets
        ).map_batches(
            lambda df, _b=base, _t=tele: pd.DataFrame(
                {
                    "node": df["node"],
                    "outdeg": df["outdeg"].astype("int64"),
                    "rank_fp": (
                        _b
                        + (
                            damping_num
                            * (
                                df["contrib"].fillna(0).astype("int64")
                                + _t
                            )
                        )
                        // damping_den
                    ).astype("int64"),
                }
            ),
            batch_format="pandas",
        ).materialize()  # per-iteration checkpoint + 2-consumer pin

    return r.map_batches(
        lambda df: pd.DataFrame(
            {
                "node": df["node"],
                "rank_fp": df["rank_fp"].astype("int64"),
                "rank": df["rank_fp"].astype("float64") / float(scale),
            }
        ),
        batch_format="pandas",
    )
