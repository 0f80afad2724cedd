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


def node_distances(
    edges: "ray.data.Dataset", center_uuid: str, max_depth: int = MAX_SEARCH_DEPTH
) -> dict[str, int]:
    """Shortest-path hop distance from center (undirected) — the
    node_distance reranker's input (search_utils.py:1885-1936)."""
    df = bfs_reachable(edges, [center_uuid], max_depth=max_depth, directed=False)
    out = dict(zip(df["uuid"], df["depth"]))
    out[center_uuid] = 0
    return out
