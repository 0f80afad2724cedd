"""Community detection + summarization (SURVEY.md A5/A6; reference
graphiti_core/utils/maintenance/community_operations.py:86-211 label
propagation + hierarchical summaries; HF variants
graphiti_hf/analytics/community_detector.py:164-397).

Graph partitioning: ``group_id`` is the reference's explicit graph
partition (nodes.py:94), so community detection runs per group inside
``groupby(group_id).map_groups`` — each group's subgraph fits in one task
(the reference holds the whole graph in the driver; per-group is the
distributed generalization). Deterministic algorithm: connected components
with lexicographic-min member uuid as the community id (the fixpoint of the
reference's label-propagation when labels are initialized to uuids), then a
deterministic template summary in place of the LLM tree-reduce (A6).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray

from ..ids import md5_id
from ..schemas import EMBED_DIM
from .canonicalize import UnionFind
from .embed import embed_many


def communities_per_group(g: pd.DataFrame) -> pd.DataFrame:
    """One group's entity edges → (group_id, community_uuid, member_uuid,
    member_name) membership rows."""
    uf = UnionFind()
    names: dict[str, str] = {}
    for s, t, sn, tn in zip(g["source_uuid"], g["target_uuid"], g["source_name"], g["target_name"]):
        uf.union(s, t)
        names[s] = sn
        names[t] = tn
    gid = g["group_id"].iloc[0]
    rows = sorted((uf.find(u), u) for u in names)
    return pd.DataFrame(
        {
            "group_id": gid,
            "community_uuid": [md5_id(f"com:{gid}:{root}") for root, _ in rows],
            "member_uuid": [u for _, u in rows],
            "member_name": [names[u] for _, u in rows],
        }
    )


def detect_communities(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Membership dataset via per-group components. The per-group subgraph
    is vocabulary-sized (distinct canonical entities), NOT corpus-sized —
    safe to hold in one task; for groups beyond that, swap in
    ``canonicalize.connected_components_distributed`` keyed by group."""
    proj = edges.select_columns(["group_id", "source_uuid", "target_uuid", "source_name", "target_name"])
    return proj.groupby("group_id").map_groups(communities_per_group, batch_format="pandas")


def build_community_tables(membership: pd.DataFrame, run_ts_us: int) -> tuple[pa.Table, pa.Table]:
    """Membership → (communities table, HAS_MEMBER community-edge table).

    Summary = deterministic reduce over member names (alphabetical, capped)
    standing in for the reference's pairwise LLM summary tree
    (community_operations.py:170-211)."""
    groups = membership.groupby(["group_id", "community_uuid"], sort=True)
    c_uuid, c_name, c_group, c_summary = [], [], [], []
    e_uuid, e_group, e_src, e_tgt = [], [], [], []
    for (gid, cu), m in groups:
        members = sorted(set(zip(m["member_uuid"], m["member_name"])))
        top = [n for _, n in members[:5]]
        c_uuid.append(cu)
        c_group.append(gid)
        c_name.append(f"Community {cu[:8]}")
        c_summary.append(f"Community of {len(members)} entities: " + ", ".join(top))
        for mu, _ in members:
            e_uuid.append(md5_id(f"hm:{cu}:{mu}"))
            e_group.append(gid)
            e_src.append(cu)
            e_tgt.append(mu)
    n = len(c_uuid)
    embs = embed_many(c_summary)
    communities = pa.table(
        {
            "uuid": pa.array(c_uuid, pa.string()),
            "name": pa.array(c_name, pa.string()),
            "group_id": pa.array(c_group, pa.string()),
            "created_at": pa.array([run_ts_us] * n, pa.timestamp("us")),
            "name_embedding": pa.FixedSizeListArray.from_arrays(pa.array(embs.ravel(), pa.float32()), EMBED_DIM),
            "summary": pa.array(c_summary, pa.string()),
        }
    )
    community_edges = pa.table(
        {
            "uuid": pa.array(e_uuid, pa.string()),
            "group_id": pa.array(e_group, pa.string()),
            "source_node_uuid": pa.array(e_src, pa.string()),
            "target_node_uuid": pa.array(e_tgt, pa.string()),
            "created_at": pa.array([run_ts_us] * len(e_uuid), pa.timestamp("us")),
        }
    )
    return communities, community_edges
