"""Graph traversal over the edges table (SURVEY.md §2.9 BFS; reference
graph_traversal.py:172-560, search_utils.py:480-602 with
MAX_SEARCH_DEPTH = 3, search_utils.py:71).

Index-free iterative frontier expansion: each hop broadcasts the frontier
uuid set (``ray.put``) and filters the edges Dataset with a vectorized
``pc.is_in`` — a map-only pass per hop, no shuffle. The reference instead
builds driver-resident adjacency dicts from a full table scan
(graph_traversal.py:104-120); the broadcast-filter form is the same
contract without holding the graph in one process.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

MAX_SEARCH_DEPTH = 3


def bfs_reachable(
    edges: "ray.data.Dataset",
    origin_uuids: list[str],
    max_depth: int = MAX_SEARCH_DEPTH,
    directed: bool = True,
    at_time=None,
) -> pd.DataFrame:
    """Nodes reachable from ``origin_uuids`` in ≤ max_depth hops.

    Returns (uuid, depth) with the minimum hop count; origins excluded.
    ``at_time`` applies the TS5 point-in-time filter per hop (traversal
    filter parity: graph_traversal.py:159-170)."""
    if at_time is not None:
        from ..functions.temporal import point_in_time

        edges = point_in_time(edges, at_time)
    edges = edges.select_columns(["source_uuid", "target_uuid"]).materialize()

    visited: dict[str, int] = {u: 0 for u in origin_uuids}
    frontier = set(origin_uuids)
    for depth in range(1, max_depth + 1):
        fref = ray.put(sorted(frontier))

        def hop(t: pa.Table) -> pa.Table:
            fr = pa.array(ray.get(fref), pa.string())
            out_cols = []
            m = pc.is_in(t.column("source_uuid"), value_set=fr)
            out_cols.append(t.filter(m).column("target_uuid"))
            if not directed:
                m2 = pc.is_in(t.column("target_uuid"), value_set=fr)
                out_cols.append(t.filter(m2).column("source_uuid"))
            joined = pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in out_cols])
            return pa.table({"uuid": pc.unique(joined)})

        nxt = set()
        for b in edges.map_batches(hop, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
            nxt.update(b.column("uuid").to_pylist())
        frontier = {u for u in nxt if u not in visited}
        if not frontier:
            break
        for u in frontier:
            visited[u] = depth
    rows = [(u, d) for u, d in sorted(visited.items()) if d > 0]
    return pd.DataFrame({"uuid": [r[0] for r in rows], "depth": [r[1] for r in rows]})


def extract_subgraph(
    edges: "ray.data.Dataset",
    seed_uuids: list[str],
    max_depth: int = MAX_SEARCH_DEPTH,
    directed: bool = False,
    at_time=None,
) -> "ray.data.Dataset":
    """Induced subgraph around the seeds (graph_traversal.py:413-470
    get_subgraph parity): nodes within ``max_depth`` hops, plus every edge
    whose BOTH endpoints are in that node set. One BFS (broadcast-frontier)
    then one map-only filter pass — the edge table streams, only the node
    id set is broadcast."""
    reach = bfs_reachable(edges, seed_uuids, max_depth=max_depth, directed=directed, at_time=at_time)
    keep = sorted(set(seed_uuids) | set(reach["uuid"]))
    kref = ray.put(keep)

    def induced(t: pa.Table) -> pa.Table:
        ks = pa.array(ray.get(kref), pa.string())
        m = pc.and_(
            pc.is_in(t.column("source_uuid"), value_set=ks),
            pc.is_in(t.column("target_uuid"), value_set=ks),
        )
        return t.filter(m)

    return edges.map_batches(induced, batch_format="pyarrow")


def find_paths(
    edges: "ray.data.Dataset",
    src_uuid: str,
    dst_uuid: str,
    max_depth: int = MAX_SEARCH_DEPTH,
    directed: bool = True,
) -> list[list[str]]:
    """ALL shortest paths src → dst up to ``max_depth`` hops
    (graph_traversal.py:268-340 find_paths, limited to shortest length —
    the reference's DFS enumeration is unbounded on dense graphs). BFS
    layers with per-layer parent sets (each hop emits (parent, child)
    pairs via one broadcast-filter pass), then a driver-side backtrack over
    the layer-sized parent map."""
    edges = edges.select_columns(["source_uuid", "target_uuid"]).materialize()
    parents: dict[str, set[str]] = {}
    layer_of: dict[str, int] = {src_uuid: 0}
    frontier = {src_uuid}
    found_depth = None
    for depth in range(1, max_depth + 1):
        fref = ray.put(sorted(frontier))

        def hop_pairs(t: pa.Table) -> pa.Table:
            fr = pa.array(ray.get(fref), pa.string())
            outs = []
            m = pc.is_in(t.column("source_uuid"), value_set=fr)
            hit = t.filter(m)
            outs.append(pa.table({"parent": hit.column("source_uuid"), "child": hit.column("target_uuid")}))
            if not directed:
                m2 = pc.is_in(t.column("target_uuid"), value_set=fr)
                hit2 = t.filter(m2)
                outs.append(pa.table({"parent": hit2.column("target_uuid"), "child": hit2.column("source_uuid")}))
            return pa.concat_tables(outs)

        nxt: set[str] = set()
        for b in edges.map_batches(hop_pairs, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
            for p, c in zip(b.column("parent").to_pylist(), b.column("child").to_pylist()):
                if c in layer_of and layer_of[c] <= depth - 1:
                    continue  # already reached at an earlier layer
                parents.setdefault(c, set()).add(p)
                nxt.add(c)
        for c in nxt:
            layer_of.setdefault(c, depth)
        if dst_uuid in nxt:
            found_depth = depth
            break
        frontier = nxt
        if not frontier:
            return []
    if found_depth is None:
        return []

    paths: list[list[str]] = []

    def backtrack(node: str, acc: list[str]) -> None:
        if node == src_uuid:
            paths.append([src_uuid, *reversed(acc)])
            return
        for p in sorted(parents.get(node, ())):
            if layer_of.get(p, 10**9) == layer_of[node] - 1:
                backtrack(p, acc + [node])

    backtrack(dst_uuid, [])
    return sorted(paths)


def node_distances(
    edges: "ray.data.Dataset", center_uuid: str, max_depth: int = MAX_SEARCH_DEPTH
) -> dict[str, int]:
    """Shortest-path hop distance from center (undirected) — the
    node_distance reranker's input (search_utils.py:1885-1936)."""
    df = bfs_reachable(edges, [center_uuid], max_depth=max_depth, directed=False)
    out = dict(zip(df["uuid"], df["depth"]))
    out[center_uuid] = 0
    return out
