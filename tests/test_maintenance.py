"""Maintenance ops: pagination, episode window, snapshot, duplicate-of
audit, remove_episode, add_triplet, type registry, distributed CC,
join-based rewrite."""

from __future__ import annotations

import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from graphiti_hf_ray import io as gio
from graphiti_hf_ray.pipelines.kg import DEFAULT_RUN_TS_US, build_graph
from graphiti_hf_ray.pipelines.maintenance import (
    add_triplet,
    build_duplicate_of_edges,
    episode_window,
    filter_existing_duplicate_of,
    graph_snapshot,
    paginate_by_uuid,
    remove_episode,
)
from graphiti_hf_ray.state.types import default_registry


@pytest.fixture(scope="module")
def graph_dir(ray_session, pages_parquet, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("maint"))
    build_graph([pages_parquet], out, num_shards=4)
    return out


def test_paginate_by_uuid(ray_session, graph_dir):
    edges = gio.read_table_dir(graph_dir, "edges").to_pandas()
    all_uuids = sorted(edges["uuid"], reverse=True)
    page1 = paginate_by_uuid(rd.read_parquet(f"{graph_dir}/edges"), None, 10)
    assert list(page1["uuid"]) == all_uuids[:10]
    cursor = page1["uuid"].iloc[-1]
    page2 = paginate_by_uuid(rd.read_parquet(f"{graph_dir}/edges"), cursor, 10)
    assert list(page2["uuid"]) == [u for u in all_uuids if u < cursor][:10]


def test_episode_window(ray_session, graph_dir):
    eps = gio.read_table_dir(graph_dir, "episodes").to_pandas()
    out = episode_window(rd.read_parquet(f"{graph_dir}/episodes")).to_pandas()
    # pandas oracle: rank within group by (valid_at, uuid), n_prev = min(rank, 3)
    eps = eps.sort_values(["group_id", "valid_at", "uuid"], kind="mergesort")
    eps["rank"] = eps.groupby("group_id").cumcount()
    exp = dict(zip(eps["uuid"], eps["rank"].clip(upper=3)))
    got = dict(zip(out["uuid"], out["n_prev"]))
    assert got == exp


def test_graph_snapshot(ray_session, graph_dir):
    edges = gio.read_table_dir(graph_dir, "edges").to_pandas()
    t = edges["valid_at"].median()
    snap = graph_snapshot(graph_dir, t)
    exp = edges[(edges["valid_at"] <= t) & (edges["invalid_at"].isna() | (edges["invalid_at"] > t))]
    assert set(snap["edges"]["uuid"]) == set(exp["uuid"])
    touched = set(exp["source_uuid"]) | set(exp["target_uuid"])
    assert set(snap["nodes"]["uuid"]) == touched


def test_duplicate_of_edges_and_antijoin(ray_session, graph_dir):
    dup = gio.read_table_dir(graph_dir, "duplicate_edges").to_pandas()
    assert (dup["name"] == "IS_DUPLICATE_OF").all()
    assert len(dup) > 0
    # every alias maps to an existing canonical node
    nodes = set(gio.read_table_dir(graph_dir, "nodes").to_pandas()["uuid"])
    assert set(dup["target_uuid"]) <= nodes
    # anti-join drops all known pairs, keeps a fresh one
    existing = gio.read_table_dir(graph_dir, "duplicate_edges")
    known = rd.from_pandas(dup[["source_uuid", "target_uuid"]])
    fresh = rd.from_pandas(
        pd.DataFrame({"source_uuid": ["brand-new"], "target_uuid": ["also-new"]})
    )
    assert filter_existing_duplicate_of(known, existing).count() == 0
    assert filter_existing_duplicate_of(fresh, existing).count() == 1


def test_remove_episode(ray_session, graph_dir, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("rm"))
    shutil.copytree(graph_dir, work, dirs_exist_ok=True)
    edges = gio.read_table_dir(work, "edges").to_pandas()
    # pick an episode that created at least one edge (first provenance slot)
    victim = edges["episodes"].iloc[0].split(",")[0]
    removed = remove_episode(work, victim)
    assert removed["episodes"] == 1
    assert removed["edges"] >= 1
    after = gio.read_table_dir(work, "edges").to_pandas()
    assert not any(e.split(",")[0] == victim for e in after["episodes"])
    eps_after = gio.read_table_dir(work, "episodes").to_pandas()
    assert victim not in set(eps_after["uuid"])
    men_after = gio.read_table_dir(work, "episodic_edges").to_pandas()
    assert victim not in set(men_after["source_node_uuid"])


def test_add_triplet_idempotent(ray_session, graph_dir, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("addt"))
    shutil.copytree(graph_dir, work, dirs_exist_ok=True)
    r1 = add_triplet(work, "g0", ("Person", "Ada Lovelace"), "ADVISES", ("Organization", "Globex Industries"),
                     "Ada Lovelace advises Globex Industries.", 1704067200_000_000, DEFAULT_RUN_TS_US)
    assert r1["status"] == "inserted"
    r2 = add_triplet(work, "g0", ("Person", "Ada Lovelace"), "ADVISES", ("Organization", "Globex Industries"),
                     "Ada Lovelace advises Globex Industries.", 1704067200_000_000, DEFAULT_RUN_TS_US)
    assert r2["status"] == "exists" and r2["edge_uuid"] == r1["edge_uuid"]
    after = gio.read_table_dir(work, "edges").to_pandas()
    assert (after["uuid"] == r1["edge_uuid"]).sum() == 1


def test_type_registry_edge_type_map():
    r = default_registry()
    assert r.check_edge_legal("Person", "Organization", "WORKS_AT")
    assert not r.check_edge_legal("Person", "Organization", "MOVED_TO")
    assert r.check_edge_legal("Person", "Place", "MOVED_TO")
    # unmapped signature → open world
    assert r.check_edge_legal("Document", "Place", "ANYTHING")
    errs = r.entity_types["Company"].validate({"industry": "tech", "founded_year": "not-an-int"})
    assert any("founded_year" in e for e in errs)
    assert r.entity_types["Company"].validate({"industry": "tech", "founded_year": 1999}) == []


def test_connected_components_distributed_matches_driver(ray_session):
    from graphiti_hf_ray.stages.canonicalize import components_driver, connected_components_distributed

    pairs = pd.DataFrame(
        {"a": ["a", "b", "x", "m", "m2"], "b": ["b", "c", "y", "m2", "m3"]}
    )
    driver = components_driver(zip(pairs["a"], pairs["b"]))
    dist = connected_components_distributed(rd.from_pandas(pairs)).to_pandas()
    dist_map = dict(zip(dist["node"], dist["root"]))
    assert dist_map == driver


def test_canonicalize_forced_distributed_paths(ray_session, pages_parquet, monkeypatch):
    """Force the scale paths (distributed pair scoring + distributed CC) by
    zeroing the driver-path thresholds: the canonical map must be identical
    to the default driver-path output."""
    import graphiti_hf_ray.stages.canonicalize as C
    from graphiti_hf_ray.extract.html import extract_text_batch
    from graphiti_hf_ray.extract.triples import TripleExtractor
    from graphiti_hf_ray.stages.episodes import make_episode_batch

    pg = pq.read_table(pages_parquet)
    ep = make_episode_batch(extract_text_batch(pg), DEFAULT_RUN_TS_US)
    tr = TripleExtractor()(ep)
    triples = rd.from_arrow(tr)
    base = C.canonicalize(triples).sort_values(["group_id", "label", "surface"]).reset_index(drop=True)
    monkeypatch.setattr(C, "DRIVER_PAIRS_MAX_MENTIONS", 0)
    monkeypatch.setattr(C, "DRIVER_CC_MAX_PAIRS", 0)
    forced = C.canonicalize(triples).sort_values(["group_id", "label", "surface"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(base, forced)


def test_rewrite_via_join_matches_broadcast(ray_session, pages_parquet):
    """The large-map hash-join rewrite path returns the same canonical
    triples as the broadcast-dict path."""
    import pyarrow as pa

    from graphiti_hf_ray.extract.html import extract_text_batch
    from graphiti_hf_ray.extract.triples import TripleExtractor
    from graphiti_hf_ray.stages.canonicalize import canonicalize
    from graphiti_hf_ray.stages.edges import CanonicalRewrite, canon_map_dict, rewrite_via_join
    from graphiti_hf_ray.stages.episodes import make_episode_batch

    pg = pq.read_table(pages_parquet)
    ep = make_episode_batch(extract_text_batch(pg), DEFAULT_RUN_TS_US)
    tr = TripleExtractor()(ep).select(
        ["episode_uuid", "group_id", "valid_at", "subj_surface", "subj_label", "pred",
         "obj_surface", "obj_label", "fact"]
    )
    triples = rd.from_arrow(tr)
    cmap = canonicalize(triples)
    broadcast = CanonicalRewrite(canon_map_dict(cmap))(tr).to_pandas()
    canon_ds = rd.from_pandas(cmap)
    joined = rewrite_via_join(triples, canon_ds).to_pandas()
    key = ["episode_uuid", "src_uuid", "pred", "obj_uuid"]
    a = set(map(tuple, broadcast[key].values))
    b = set(map(tuple, joined[key].values))
    assert a == b
