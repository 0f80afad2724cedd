"""Iterative PageRank over the entity graph (the iterative-numeric-
algorithm class the reference's analysis layer gestures at via networkx;
here expressed Ray-Data-first and EXACTLY SQL-oracle-able).

Determinism trick: FIXED-POINT INTEGER arithmetic. Ranks are scaled to
``SCALE = 10^12`` integers; every operation is integer multiply/floor-div
(edge contribution = ``pr * 85 // (100 * outdeg)``), so results are
bit-exact under ANY summation order — float PageRank would hash-diverge
from a SQL oracle on reduction order alone. A fixed iteration count makes
the unrolled-CTE oracle exact (same pattern as the label-propagation
oracle). Dangling-node mass is dropped (documented; the oracle mirrors).

Partition axis: ``group_id`` (the reference's explicit graph partition) —
one vectorized task per group, same shape as community detection; for a
group exceeding one task, the label-propagation-style bucketed iteration
in ``canonicalize.connected_components_distributed`` is the template.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

SCALE = 10**12
DAMPING_NUM, DAMPING_DEN = 85, 100  # 0.85
DEFAULT_ITERS = 10


def pagerank_group(g: pd.DataFrame, n_iters: int = DEFAULT_ITERS) -> pd.DataFrame:
    """One group's distinct (source_uuid, target_uuid) edges → (group_id,
    node, pr) after ``n_iters`` fixed-point iterations."""
    gid = g["group_id"].iloc[0]
    pairs = g[["source_uuid", "target_uuid"]].drop_duplicates()
    nodes = sorted(set(pairs["source_uuid"]) | set(pairs["target_uuid"]))
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    src = pairs["source_uuid"].map(idx).to_numpy()
    dst = pairs["target_uuid"].map(idx).to_numpy()
    outdeg = np.zeros(n, np.int64)
    np.add.at(outdeg, src, 1)
    base = (SCALE * (DAMPING_DEN - DAMPING_NUM)) // (DAMPING_DEN * n)
    pr = np.full(n, SCALE // n, np.int64)
    for _ in range(n_iters):
        contrib = (pr[src] * DAMPING_NUM) // (DAMPING_DEN * outdeg[src])
        new = np.full(n, base, np.int64)
        np.add.at(new, dst, contrib)
        pr = new
    return pd.DataFrame({"group_id": gid, "node": nodes, "pr": pr})


def pagerank(edges: "ray.data.Dataset", n_iters: int = DEFAULT_ITERS) -> "ray.data.Dataset":
    """Per-group PageRank over an edges Dataset with (group_id,
    source_uuid, target_uuid) columns."""
    proj = edges.select_columns(["group_id", "source_uuid", "target_uuid"])

    def apply_pagerank(df: pd.DataFrame, _n: int = n_iters) -> pd.DataFrame:
        # plain named function: map_groups rejects partial/unnamed callables
        return pagerank_group(df, _n)

    return proj.groupby("group_id").map_groups(apply_pagerank, batch_format="pandas")
