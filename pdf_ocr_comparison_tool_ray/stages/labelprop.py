"""Synchronous label propagation (community detection) as iterated
bucketed joins.

Raghavan et al. 2007, made fully deterministic: every node starts
labeled with its own key; each round a node adopts the most frequent
label among its IN-neighbors, ties broken by the lexicographically
smallest label, and a node with no in-edges keeps its label.  A fixed
round count (synchronous sweep) replaces the paper's convergence test
so the output is a pure function of the graph — label counts and string
comparisons only, no floats, so the SQL replay is exactly equal.

Scale shape mirrors stages/pagerank.py: the label table stays
co-partitioned with the edge table (join-on-src shuffle, then a
(dst,label) count whose winner is picked inside the dst bucket, then a
left join back onto the node universe); per-round materialization is
the checkpoint surface.  Below PAGERANK-style edge cap the whole graph
iterates vectorized driver-side — bit-identical result, none of the
per-task overhead.
"""

from __future__ import annotations

import pandas as pd

from .bucketed import bucketed_equi_join, bucketed_map_groups

LABELPROP_DRIVER_EDGES_MAX = 2_000_000


def _labelprop_driver(edges, nodes, iters):
    import ray.data as _rd

    node_arr = nodes.to_pandas()["node"]
    e = edges.to_pandas()
    lab = pd.Series(node_arr.values, index=node_arr.values, dtype="object")
    for _ in range(iters):
        t = pd.DataFrame(
            {"dst": e["dst"].values, "label": lab.loc[e["src"]].values}
        )
        cnt = t.groupby(["dst", "label"]).size().reset_index(name="c")
        cnt = cnt.sort_values(
            ["dst", "c", "label"], ascending=[True, False, True]
        )
        win = cnt.drop_duplicates("dst").set_index("dst")["label"]
        new = lab.copy()
        new.loc[win.index] = win.values
        lab = new
    return _rd.from_pandas(
        pd.DataFrame(
            {
                "node": pd.Series(lab.index, dtype="object"),
                "label": pd.Series(lab.values, dtype="object"),
            }
        )
    )


def label_propagation(edges, nodes, iters: int = 3, n_buckets: int = 64):
    """``edges`` (src:string, dst:string — DISTINCT directed edges),
    ``nodes`` (node:string — the universe, isolated nodes keep their own
    label).  Returns (node:string, label:string) after ``iters``
    synchronous rounds."""
    if edges.count() <= LABELPROP_DRIVER_EDGES_MAX:
        return _labelprop_driver(edges, nodes, iters)

    labels = nodes.map_batches(
        lambda df: pd.DataFrame({"node": df["node"], "label": df["node"]}),
        batch_format="pandas",
    ).materialize()

    for _ in range(iters):
        incoming = bucketed_equi_join(
            edges,
            labels.map_batches(
                lambda df: df.rename(columns={"node": "src"}),
                batch_format="pandas",
            ),
            on="src",
            how="inner",
            n_buckets=n_buckets,
        ).map_batches(
            # local combiner: a hot (dst,label) pair crosses the shuffle
            # as one count row per block, not one row per edge
            lambda df: df.groupby(["dst", "label"], as_index=False)
            .size()
            .rename(columns={"size": "c"}),
            batch_format="pandas",
        )

        def winner(bucket: pd.DataFrame) -> pd.DataFrame:
            g = bucket.groupby(["dst", "label"], as_index=False)["c"].sum()
            g = g.sort_values(
                ["dst", "c", "label"], ascending=[True, False, True]
            )
            w = g.drop_duplicates("dst")
            return pd.DataFrame(
                {"node": w["dst"], "new_label": w["label"]}
            ).reset_index(drop=True)

        winners = bucketed_map_groups(incoming, "dst", winner, n_buckets=n_buckets)
        labels = bucketed_equi_join(
            labels, winners, on="node", how="left", n_buckets=n_buckets
        ).map_batches(
            lambda df: pd.DataFrame(
                {
                    "node": df["node"],
                    "label": df["new_label"].fillna(df["label"]),
                }
            ),
            batch_format="pandas",
        ).materialize()  # per-round checkpoint + next-round fan-out pin

    return labels
