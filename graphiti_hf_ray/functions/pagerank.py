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
``pagerank`` runs one vectorized task per group (right when every group's
node set fits a task); ``pagerank_distributed`` is the whole-corpus scale
path: NO per-group materialization — each iteration is two bucketed
shuffles (ranks ⋈ edges on the source node with in-bucket combiner
pre-sums, then a contributions-reduce re-joined to the static node table),
and the fixed-point arithmetic makes the two paths BIT-IDENTICAL
(parity-tested), so the same SQL oracle covers both.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

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


_SIDE_EDGE, _SIDE_RANK, _SIDE_NODE, _SIDE_CONTRIB = 0, 1, 2, 3


def pagerank_distributed(
    edges: "ray.data.Dataset", n_iters: int = DEFAULT_ITERS, num_buckets: int | None = None
) -> "ray.data.Dataset":
    """Whole-corpus PageRank: identical semantics and BIT-IDENTICAL output
    to ``pagerank`` (fixed-point ints are order-free), but no group ever
    materializes in one task — a single group's graph may exceed any
    worker.

    Shape per iteration (×``n_iters``):
      shuffle A keyed (group, src-node): distinct edges meet current ranks;
        per-edge contribution ``pr*85 // (100*outdeg)`` is computed
        vectorized and PRE-SUMMED per (group, target) inside the bucket
        (combiner — the exchange to shuffle B carries one partial row per
        (bucket, target), not one per edge);
      shuffle B keyed (group, node): contribution partials meet the STATIC
        node table (outdeg, per-group base) → new rank = base + Σ contrib.
    Static setup: one distinct-edges shuffle, one outdeg reduce, one node
    distinct; per-group node counts (#groups-sized — tenants, not corpus)
    broadcast for the base/init terms. Each round materializes (bounded
    lineage, object-store-backed)."""
    from ..stages.shuffle import bucketed_group_apply

    proj = edges.select_columns(["group_id", "source_uuid", "target_uuid"])
    ed = bucketed_group_apply(
        proj, ["group_id", "source_uuid", "target_uuid"], lambda df: df.drop_duplicates()
    ).materialize()

    # outdeg per (group, src): per-batch partial counts → bucketed sum
    def deg_partial(t: pa.Table) -> pa.Table:
        df = (
            t.to_pandas()
            .groupby(["group_id", "source_uuid"], as_index=False)
            .size()
            .rename(columns={"size": "deg", "source_uuid": "node"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    degs = bucketed_group_apply(
        ed.map_batches(deg_partial, batch_format="pyarrow"),
        ["group_id", "node"],
        lambda df: df.groupby(["group_id", "node"], as_index=False)["deg"].sum(),
        num_buckets=num_buckets,
    )

    # distinct nodes (src ∪ dst)
    def node_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        both = pd.concat(
            [
                df[["group_id", "source_uuid"]].rename(columns={"source_uuid": "node"}),
                df[["group_id", "target_uuid"]].rename(columns={"target_uuid": "node"}),
            ],
            ignore_index=True,
        ).drop_duplicates()
        return pa.Table.from_pandas(both, preserve_index=False)

    nodes = bucketed_group_apply(
        ed.map_batches(node_partial, batch_format="pyarrow"),
        ["group_id", "node"],
        lambda df: df.drop_duplicates(),
        num_buckets=num_buckets,
    ).materialize()

    # per-group node counts: partials → driver dict (#groups-sized)
    def count_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("group_id", as_index=False).size()
        return pa.Table.from_pandas(df, preserve_index=False)

    cnt = (
        nodes.map_batches(count_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("group_id")["size"]
        .sum()
        .to_dict()
    )
    ng_ref = ray.put(cnt)

    # static node table: (group_id, node, deg, base) + initial pr; one
    # bucketed merge of nodes with outdegs (sinks get deg 0, never read)
    def static_merge(df: pd.DataFrame) -> pd.DataFrame:
        ng = ray.get(ng_ref)
        n_rows = df[df["_side"] == _SIDE_NODE][["group_id", "node"]]
        d_rows = df[df["_side"] == _SIDE_RANK][["group_id", "node", "deg"]]
        out = n_rows.merge(d_rows, on=["group_id", "node"], how="left")
        out["deg"] = out["deg"].fillna(0).astype("int64")
        n_g = out["group_id"].map(ng).astype("int64")
        out["base"] = (SCALE * (DAMPING_DEN - DAMPING_NUM)) // (DAMPING_DEN * n_g)
        out["pr"] = SCALE // n_g
        return out[["group_id", "node", "deg", "base", "pr"]]

    def tag(side: int, cols: dict):
        def f(t: pa.Table) -> pa.Table:
            out = {k: t.column(v) for k, v in cols.items()}
            n = t.num_rows
            base = {"group_id": out["group_id"], "node": out["node"]}
            base["deg"] = out.get("deg", pa.nulls(n, pa.int64()))
            base["dst"] = out.get("dst", pa.nulls(n, pa.string()))
            base["pr"] = out.get("pr", pa.nulls(n, pa.int64()))
            base["base"] = out.get("base", pa.nulls(n, pa.int64()))
            base["c"] = out.get("c", pa.nulls(n, pa.int64()))
            base["_side"] = pa.array([side] * n, pa.int8())
            return pa.table(base)

        return f

    nodes_t = nodes.map_batches(tag(_SIDE_NODE, {"group_id": "group_id", "node": "node"}), batch_format="pyarrow")
    degs_t = degs.map_batches(
        tag(_SIDE_RANK, {"group_id": "group_id", "node": "node", "deg": "deg"}), batch_format="pyarrow"
    )
    static = bucketed_group_apply(
        nodes_t.union(degs_t), ["group_id", "node"], static_merge, num_buckets=num_buckets
    ).materialize()

    edges_t = ed.map_batches(
        tag(_SIDE_EDGE, {"group_id": "group_id", "node": "source_uuid", "dst": "target_uuid"}),
        batch_format="pyarrow",
    ).materialize()

    def contrib_bucket(df: pd.DataFrame) -> pd.DataFrame:
        r = df[df["_side"] == _SIDE_RANK][["group_id", "node", "deg", "pr"]]
        e = df[df["_side"] == _SIDE_EDGE][["group_id", "node", "dst"]]
        m = e.merge(r, on=["group_id", "node"])
        if m.empty:
            return pd.DataFrame(
                {"group_id": pd.Series([], dtype=str), "node": pd.Series([], dtype=str), "c": pd.Series([], dtype="int64")}
            )
        m["c"] = (m["pr"].to_numpy() * DAMPING_NUM) // (DAMPING_DEN * m["deg"].to_numpy())
        # combiner: one partial row per (group, target) leaves this bucket
        out = m.groupby(["group_id", "dst"], as_index=False)["c"].sum().rename(columns={"dst": "node"})
        return out

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        n_rows = df[df["_side"] == _SIDE_NODE][["group_id", "node", "deg", "base"]]
        s = (
            df[df["_side"] == _SIDE_CONTRIB]
            .groupby(["group_id", "node"], as_index=False)["c"]
            .sum()
        )
        out = n_rows.merge(s, on=["group_id", "node"], how="left")
        out["pr"] = out["base"] + out["c"].fillna(0).astype("int64")
        return out[["group_id", "node", "deg", "base", "pr"]]

    ranks = static
    for _ in range(n_iters):
        ranks_t = ranks.map_batches(
            tag(_SIDE_RANK, {"group_id": "group_id", "node": "node", "deg": "deg", "pr": "pr"}),
            batch_format="pyarrow",
        )
        contribs = bucketed_group_apply(
            edges_t.union(ranks_t), ["group_id", "node"], contrib_bucket, num_buckets=num_buckets
        )
        contribs_t = contribs.map_batches(
            tag(_SIDE_CONTRIB, {"group_id": "group_id", "node": "node", "c": "c"}),
            batch_format="pyarrow",
        )
        statics_t = ranks.map_batches(
            tag(_SIDE_NODE, {"group_id": "group_id", "node": "node", "deg": "deg", "base": "base"}),
            batch_format="pyarrow",
        )
        ranks = bucketed_group_apply(
            statics_t.union(contribs_t), ["group_id", "node"], rank_bucket, num_buckets=num_buckets
        ).materialize()

    def final(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "group_id": t.column("group_id"),
                "node": t.column("node"),
                "pr": t.column("pr").cast(pa.int64()),
            }
        )

    return ranks.map_batches(final, batch_format="pyarrow")
