"""Fixed-point HITS (hubs & authorities) over a DIRECTED edge table.

Kleinberg 1999, on the directed (not symmetrized) graph: per round
    auth'(v) = sum of hub(u) over edges u->v
    hub'(u)  = sum of auth'(v) over edges u->v
each followed by L1 renormalization to total mass ``scale``.  On the
bipartite trade graph this is the natural complement of PageRank:
sources (customers) accumulate hub mass, sinks (suppliers) authority
mass, and nodes outside the edge set go to zero.

Same exactness discipline as stages/pagerank.py: scores are int64 in
units of 1/scale, sums are integer (order-independent in any engine),
and normalization is ``x * scale // total`` — one floor per node per
round.  The SQL replay is therefore bit-identical, not approximately
equal.

Size-routed like pagerank: below the edge cap the graph iterates
vectorized driver-side; above it both score tables stay co-partitioned
with the edges (join-on-src / join-on-dst bucketed shuffles with local
combiners), totals are the only driver scalars, and each round's
materialized table is the checkpoint surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .bucketed import bucketed_equi_join, bucketed_map_groups
from .pagerank import DEFAULT_SCALE

HITS_DRIVER_EDGES_MAX = 2_000_000


def _l1_normalize(v, scale: int, total: int | None = None):
    """x -> x * scale // total, elementwise, through PYTHON ints: the
    intermediate x*scale overflows int64 (the SQL replay widens to
    HUGEINT the same way), and the result is back under ``scale`` so it
    re-fits int64 exactly."""
    t = int(v.sum()) if total is None else total
    if not t:
        return np.asarray(v, dtype=np.int64)
    return np.fromiter(
        ((int(x) * scale) // t for x in v), dtype=np.int64, count=len(v)
    )


def _hits_driver(edges, nodes, iters, scale):
    import ray.data as _rd

    node_arr = nodes.to_pandas()["node"].to_numpy()
    e_df = edges.to_pandas()
    idx = {v: i for i, v in enumerate(node_arr)}
    src = np.fromiter((idx[v] for v in e_df["src"]), dtype=np.int64)
    dst = np.fromiter((idx[v] for v in e_df["dst"]), dtype=np.int64)
    n = len(node_arr)
    hub = np.full(n, scale // n, dtype=np.int64)
    auth = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        auth = np.zeros(n, dtype=np.int64)
        np.add.at(auth, dst, hub[src])
        auth = _l1_normalize(auth, scale)
        hub = np.zeros(n, dtype=np.int64)
        np.add.at(hub, src, auth[dst])
        hub = _l1_normalize(hub, scale)
    return _rd.from_pandas(
        pd.DataFrame(
            {
                "node": node_arr,
                "hub_fp": pd.Series(hub, dtype="int64"),
                "auth_fp": pd.Series(auth, dtype="int64"),
            }
        )
    )


def _propagate(edges, scores, from_col, to_col, val, out, n_buckets):
    """sum of ``val`` over edges grouped by ``to_col`` (one bucketed
    join + a combiner-then-bucket partial sum), as (node, ``out``)."""
    joined = bucketed_equi_join(
        edges,
        scores.map_batches(
            lambda df, _f=from_col, _v=val: pd.DataFrame(
                {_f: df["node"], _v: df[_v]}
            ),
            batch_format="pandas",
        ),
        on=from_col,
        how="inner",
        n_buckets=n_buckets,
    ).map_batches(
        lambda df, _t=to_col, _v=val, _o=out: df.groupby(_t, as_index=False)[
            _v
        ]
        .sum()
        .rename(columns={_t: "node", _v: _o}),
        batch_format="pandas",
    )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("node", as_index=False)[out].sum()
        g[out] = g[out].astype("int64")
        return g

    return bucketed_map_groups(joined, "node", combine, n_buckets=n_buckets)


def hits_fixedpoint(
    edges,
    nodes,
    iters: int = 3,
    scale: int = DEFAULT_SCALE,
    n_buckets: int = 64,
):
    """Returns (node, hub_fp:int64, auth_fp:int64) after ``iters``
    rounds; ``edges`` directed (src, dst), ``nodes`` the universe."""
    if edges.count() <= HITS_DRIVER_EDGES_MAX:
        return _hits_driver(edges, nodes, iters, scale)

    base = nodes.materialize()
    n = base.count()
    scores = base.map_batches(
        lambda df, _h=scale // n: pd.DataFrame(
            {
                "node": df["node"],
                "hub_fp": pd.Series([_h] * len(df), dtype="int64"),
                "auth_fp": pd.Series([0] * len(df), dtype="int64"),
            }
        ),
        batch_format="pandas",
    ).materialize()

    def _attach(col, tab):
        """left-join a propagated column back onto the node universe,
        normalize to ``scale`` total mass."""
        tab = tab.materialize()  # consumed by the total AND the join
        total = int(tab.sum(col + "_new") or 0)
        joined = bucketed_equi_join(
            scores, tab, on="node", how="left", n_buckets=n_buckets
        )

        def fin(df: pd.DataFrame, _c=col, _t=total) -> pd.DataFrame:
            v = df[_c + "_new"].fillna(0).astype("int64")
            out = df[["node", "hub_fp", "auth_fp"]].copy()
            out[_c] = _l1_normalize(v.to_numpy(), scale, _t)
            return out

        return joined.map_batches(fin, batch_format="pandas").materialize()

    for _ in range(iters):
        a = _propagate(edges, scores, "src", "dst", "hub_fp", "auth_fp_new", n_buckets)
        scores = _attach("auth_fp", a)
        h = _propagate(edges, scores, "dst", "src", "auth_fp", "hub_fp_new", n_buckets)
        scores = _attach("hub_fp", h)
    return scores
