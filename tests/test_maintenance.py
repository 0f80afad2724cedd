"""Maintenance ops: pagination, episode window, snapshot, duplicate-of
audit, remove_episode, add_triplet, type registry, distributed CC,
join-based rewrite."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow as pa
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
    men = gio.read_table_dir(work, "episodic_edges").to_pandas()
    # pick an episode that CREATED at least one edge (explicit provenance)
    victim = edges["created_by"].iloc[0]
    expect_orphans = set(men.loc[men["source_node_uuid"] == victim, "target_node_uuid"]) - set(
        men.loc[men["source_node_uuid"] != victim, "target_node_uuid"]
    )
    removed = remove_episode(work, victim)
    assert removed["episodes"] == 1
    assert removed["edges"] >= 1
    assert removed["nodes"] == len(expect_orphans)
    after = gio.read_table_dir(work, "edges").to_pandas()
    assert victim not in set(after["created_by"])
    eps_after = gio.read_table_dir(work, "episodes").to_pandas()
    assert victim not in set(eps_after["uuid"])
    men_after = gio.read_table_dir(work, "episodic_edges").to_pandas()
    assert victim not in set(men_after["source_node_uuid"])
    nodes_after = gio.read_table_dir(work, "nodes").to_pandas()
    assert not (expect_orphans & set(nodes_after["uuid"]))
    # manifests reflect the mutation (resume logic trusts these counts)
    metrics = gio.job_metrics(work)
    assert metrics["tables"]["episodes"]["rows"] == len(eps_after)
    assert metrics["tables"]["edges"]["rows"] == len(after)


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


def test_builtin_type_catalog_parity():
    """Built-ins mirror custom_types.py:212-375: the five reference entity
    types + edge types with their field validator rules."""
    from graphiti_hf_ray.state.types import BUILTIN_EDGE_TYPES, BUILTIN_ENTITY_TYPES

    r = default_registry()
    assert set(BUILTIN_ENTITY_TYPES) <= set(r.entity_types)
    assert set(BUILTIN_EDGE_TYPES) <= set(r.edge_types)
    # validator rules (reference custom_types.py:217,240,246)
    assert r.entity_types["Person"].validate({"age": -1}) != []
    assert r.entity_types["Person"].validate({"age": 30}) == []
    assert r.entity_types["Company"].validate({"founded_year": 1500}) != []
    assert r.entity_types["Company"].validate({"employee_count": -5}) != []
    assert r.edge_types["WORKS_AT"].validate({"role": 7}) != []
    assert r.edge_types["WORKS_AT"].validate({"role": "engineer"}) == []


def test_extractor_enforces_edge_type_map(pages_parquet):
    """A registry that forbids a pattern's signature drops those triples at
    extraction (graphiti.py:398 edge_type_map semantics)."""
    from graphiti_hf_ray.extract.html import extract_text_batch
    from graphiti_hf_ray.extract.triples import TripleExtractor
    from graphiti_hf_ray.stages.episodes import make_episode_batch
    from graphiti_hf_ray.state.types import TypeRegistry, EdgeType

    pg = pq.read_table(pages_parquet)
    ep = make_episode_batch(extract_text_batch(pg), DEFAULT_RUN_TS_US)
    base = TripleExtractor()(ep)
    assert "WORKS_AT" in set(base.column("pred").to_pylist())
    strict = TypeRegistry()
    strict.register_edge_type(EdgeType("IS_CEO_OF"), [("Person", "Organization")])
    # (Person, Organization) now maps ONLY to IS_CEO_OF → WORKS_AT/FOUNDED illegal
    out = TripleExtractor(registry=strict)(ep)
    preds = set(out.column("pred").to_pylist())
    assert "WORKS_AT" not in preds and "FOUNDED" not in preds
    assert "IS_CEO_OF" in preds


def test_connected_components_distributed_matches_driver(ray_session):
    from graphiti_hf_ray.stages.canonicalize import components_driver, connected_components_distributed

    pairs = pd.DataFrame(
        {"a": ["a", "b", "x", "m", "m2"], "b": ["b", "c", "y", "m2", "m3"]}
    )
    driver = components_driver(zip(pairs["a"], pairs["b"]))
    dist = connected_components_distributed(rd.from_pandas(pairs)).to_pandas()
    dist_map = dict(zip(dist["node"], dist["root"]))
    assert dist_map == driver


def test_reads_skip_stale_tmp_dirs(ray_session, graph_dir, tmp_path_factory):
    """A SIGKILLed writer's leftover .tmp-* dir (partial/duplicate part
    files) must not leak rows into reads or metrics."""
    import os

    import shutil as _sh

    work = str(tmp_path_factory.mktemp("tmpskip"))
    _sh.copytree(graph_dir, work, dirs_exist_ok=True)
    clean = gio.read_table_dir(work, "edges")
    # simulate an aborted distributed write: tmp dir with a duplicate part
    stale = os.path.join(work, "edges", ".tmp-dist-dead")
    os.makedirs(stale)
    pq.write_table(clean, os.path.join(stale, "part-0.parquet"))
    with open(os.path.join(stale, gio.MANIFEST), "w") as f:
        f.write('{"rows": 999999, "complete": true}')
    after = gio.read_table_dir(work, "edges")
    assert after.num_rows == clean.num_rows
    metrics = gio.job_metrics(work)
    assert metrics["tables"]["edges"]["rows"] != 999999


def test_branches_immutable_under_mutation(ray_session, graph_dir, tmp_path_factory):
    """TS9: a branch snapshot (hardlinked parts) is unaffected by later
    in-place mutations of main (remove_episode, add_triplet)."""
    import shutil as _sh

    work = str(tmp_path_factory.mktemp("branch"))
    _sh.copytree(graph_dir, work, dirs_exist_ok=True)
    before = gio.read_table_dir(work, "edges").to_pandas()
    man = gio.create_branch(work, "v1")
    assert man["files"] > 0
    assert [b["name"] for b in gio.list_branches(work)] == ["v1"]
    # mutate main: remove an episode AND add a triplet
    victim = before["created_by"].iloc[0]
    remove_episode(work, victim)
    add_triplet(work, "g0", ("Person", "Branch Test"), "WORKS_AT", ("Organization", "Branch Org"),
                "Branch Test works at Branch Org.", 1704067200_000_000, DEFAULT_RUN_TS_US)
    main_after = gio.read_table_dir(work, "edges").to_pandas()
    assert len(main_after) != len(before) or set(main_after["uuid"]) != set(before["uuid"])
    # branch still reads the pre-mutation state
    branch = gio.read_table_dir(gio.branch_dir(work, "v1"), "edges").to_pandas()
    assert sorted(branch["uuid"]) == sorted(before["uuid"])
    # metrics ignore the _branches subtree
    metrics = gio.job_metrics(work)
    assert "_branches" not in metrics["tables"]
    with pytest.raises(FileExistsError):
        gio.create_branch(work, "v1")
    gio.delete_branch(work, "v1")
    assert gio.list_branches(work) == []


def test_delta_apply_and_rollback(ray_session, graph_dir, tmp_path_factory):
    """apply_delta journals a rollback pre-image; rollback_delta restores
    the exact prior edge set (incremental_updater.py:405-565 parity)."""
    import shutil as _sh

    from graphiti_hf_ray.pipelines.deltas import (
        DeltaOp, apply_delta, apply_delta_chunked, journal_entries, rollback_delta,
        validate_delta,
    )

    work = str(tmp_path_factory.mktemp("delta"))
    _sh.copytree(graph_dir, work, dirs_exist_ok=True)
    before = gio.read_table_dir(work, "edges")
    victim = before.column("uuid").to_pylist()[0]
    add_rows = before.slice(1, 1).set_column(
        before.schema.get_field_index("uuid"), "uuid", pa.array(["new-edge-uuid"])
    )
    ops = [
        DeltaOp("add_edge", rows=add_rows),
        DeltaOp("delete_edge", uuids=[victim]),
        DeltaOp("update_edge_attrs", uuids=[before.column("uuid").to_pylist()[2]],
                attributes='{"k": 1}'),
    ]
    assert validate_delta(work, ops) == []
    r = apply_delta(work, ops, "d1")
    assert r["status"] == "applied" and r["applied"] == 3
    mid = gio.read_table_dir(work, "edges").to_pandas()
    assert "new-edge-uuid" in set(mid["uuid"]) and victim not in set(mid["uuid"])
    assert (mid.loc[mid["uuid"] == before.column("uuid").to_pylist()[2], "attributes"] == '{"k": 1}').all()
    # validation catches bad deltas
    assert validate_delta(work, [DeltaOp("delete_edge", uuids=["nope"])]) != []
    assert validate_delta(work, [DeltaOp("add_edge", rows=add_rows)]) != []  # dup uuid

    rb = rollback_delta(work, "d1")
    assert rb["status"] == "rolled_back"
    after = gio.read_table_dir(work, "edges").to_pandas().sort_values("uuid").reset_index(drop=True)
    orig = before.to_pandas().sort_values("uuid").reset_index(drop=True)
    assert list(after["uuid"]) == list(orig["uuid"])
    assert list(after["attributes"]) == list(orig["attributes"])
    assert journal_entries(work)[0]["status"] == "rolled_back"
    # chunked application journals one entry per chunk
    many = [DeltaOp("update_edge_attrs", uuids=[u], attributes='{"x":1}')
            for u in orig["uuid"].head(4)]
    rc = apply_delta_chunked(work, many, "d2", chunk_size=2)
    assert rc["total_chunks"] == 2 and rc["applied"] == 4
    assert len(journal_entries(work)) == 3


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


def test_canonicalize_distributed_matches_driver(ray_session, pages_parquet):
    """The zero-driver-materialization canonical map equals the default
    (driver-side) canonicalize output row for row."""
    import graphiti_hf_ray.stages.canonicalize as C
    from graphiti_hf_ray.extract.html import extract_text_batch
    from graphiti_hf_ray.extract.triples import TripleExtractor
    from graphiti_hf_ray.stages.episodes import make_episode_batch

    pg = pq.read_table(pages_parquet)
    ep = make_episode_batch(extract_text_batch(pg), DEFAULT_RUN_TS_US)
    tr = TripleExtractor()(ep)
    triples = rd.from_arrow(tr)
    key = ["group_id", "label", "surface"]
    base = C.canonicalize(triples).sort_values(key).reset_index(drop=True)
    dist = (
        C.canonicalize_distributed(triples)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, dist[base.columns.tolist()], check_dtype=False)


def test_canonicalize_distributed_all_singletons(ray_session):
    """Regression: when NO duplicate pairs exist, the CC side of the
    root-attach union is empty, so every co-group bucket carries only
    mention rows and the `_root` column is absent from the group block —
    the pre-fix code indexed it and crashed (first seen at sf0.1, where
    some buckets were single-sided even with a non-empty CC set). All
    surfaces must come back as their own canonical."""
    import graphiti_hf_ray.stages.canonicalize as C

    # single-token, mutually non-matching names → zero blocking pairs
    names = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    tbl = pa.table(
        {
            "episode_uuid": pa.array([f"e{i}" for i in range(len(names))]),
            "group_id": pa.array(["g"] * len(names)),
            "valid_at": pa.array([1_700_000_000_000_000] * len(names), pa.timestamp("us")),
            "subj_surface": pa.array(names),
            "subj_label": pa.array(["Person"] * len(names)),
            "pred": pa.array(["KNOWS"] * len(names)),
            "obj_surface": pa.array(list(reversed(names))),
            "obj_label": pa.array(["Person"] * len(names)),
            "fact": pa.array(["f"] * len(names)),
        }
    )
    triples = rd.from_arrow(tbl)
    out = C.canonicalize_distributed(triples).to_pandas()
    assert sorted(out["surface"]) == sorted(names)
    assert (out["surface"] == out["canon_name"]).all()
    base = C.canonicalize(triples).sort_values(["surface"]).reset_index(drop=True)
    dist = out.sort_values(["surface"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(base, dist[base.columns.tolist()], check_dtype=False)


def test_fused_merge_invalidate_matches_unfused(ray_session, pages_parquet):
    """merge_and_invalidate (one shuffle) == dedup_edges →
    invalidate_functional (two shuffles): the fusion claim, verified."""
    from graphiti_hf_ray.extract.html import extract_text_batch
    from graphiti_hf_ray.extract.triples import TripleExtractor
    from graphiti_hf_ray.stages.canonicalize import canonicalize
    from graphiti_hf_ray.stages.edges import (
        CanonicalRewrite, canon_map_dict, dedup_edges, invalidate_functional,
        merge_and_invalidate,
    )
    from graphiti_hf_ray.stages.episodes import make_episode_batch

    pg = pq.read_table(pages_parquet)
    ep = make_episode_batch(extract_text_batch(pg), DEFAULT_RUN_TS_US)
    tr = TripleExtractor()(ep)
    cmap = canonicalize(rd.from_arrow(tr))
    rewritten_tbl = CanonicalRewrite(canon_map_dict(cmap))(tr)
    cols = ["uuid", "source_uuid", "name", "target_uuid", "valid_at", "invalid_at",
            "episodes", "created_by", "n_occurrences"]
    fused = (
        merge_and_invalidate(rd.from_arrow(rewritten_tbl)).to_pandas()[cols]
        .sort_values("uuid").reset_index(drop=True)
    )
    unfused = (
        invalidate_functional(dedup_edges(rd.from_arrow(rewritten_tbl))).to_pandas()[cols]
        .sort_values("uuid").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fused, unfused, check_dtype=False)


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


def test_branch_merge_with_conflicts(ray_session, graph_dir, tmp_path_factory):
    import os

    """TS9 branch merge: create → diverge → merge detects the conflicting
    uuid, re-adds the branch-only row, and resolves per strategy."""
    import glob as _glob
    import shutil as _sh

    import pyarrow as _pa
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    from graphiti_hf_ray.pipelines.branches import merge_branch

    work = str(tmp_path_factory.mktemp("merge"))
    _sh.copytree(graph_dir, work, dirs_exist_ok=True)
    _sh.rmtree(os.path.join(work, gio.BRANCHES_DIR), ignore_errors=True)
    gio.create_branch(work, "feat")

    # diverge MAIN (Arrow-level, schema preserved): change one fact, drop
    # one other edge entirely
    parts = sorted(_glob.glob(os.path.join(work, "edges", "**", "*.parquet"), recursive=True))
    tbl = _pa.concat_tables([_pq.read_table(p) for p in parts])
    uuids = tbl.column("uuid").to_pylist()
    changed_uuid, dropped_uuid = uuids[0], uuids[1]
    facts = tbl.column("fact").to_pylist()
    facts[0] = "CHANGED FACT."
    tbl = tbl.set_column(tbl.schema.get_field_index("fact"), "fact", _pa.array(facts, _pa.string()))
    tbl = tbl.filter(_pc.not_equal(tbl.column("uuid"), _pa.scalar(dropped_uuid)))
    _sh.rmtree(os.path.join(work, "edges"))
    gio.write_shard_atomic(tbl, os.path.join(work, "edges", "shard=0000"), "mutated")

    # manual strategy: conflict unresolved, target (main) keeps its change,
    # branch-only row is re-added
    res = merge_branch(work, "feat", None, strategy="manual", tables=("edges",))
    r = res["tables"]["edges"]
    assert r["n_conflicts"] == 1 and r["n_resolved"] == 0 and r["n_added"] == 1
    assert list(r["conflicts"]["uuid"]) == [changed_uuid]
    merged = gio.read_table_dir(work, "edges").to_pandas()
    assert dropped_uuid in set(merged["uuid"])  # branch-only row restored
    assert merged.loc[merged["uuid"] == changed_uuid, "fact"].iloc[0] == "CHANGED FACT."
    assert merged["uuid"].is_unique

    # source_wins: the branch's original fact overwrites main's change
    res2 = merge_branch(work, "feat", None, strategy="source_wins", tables=("edges",))
    r2 = res2["tables"]["edges"]
    assert r2["n_conflicts"] == 1 and r2["n_resolved"] == 1
    merged2 = gio.read_table_dir(work, "edges").to_pandas()
    assert merged2.loc[merged2["uuid"] == changed_uuid, "fact"].iloc[0] != "CHANGED FACT."
    assert merged2["uuid"].is_unique
    # sibling branch unaffected by the merge swaps
    branch = gio.read_table_dir(gio.branch_dir(work, "feat"), "edges").to_pandas()
    assert "CHANGED FACT." not in set(branch["fact"])


def _write_reference_fixture(src: str) -> None:
    """One reference-layout graph (nodes/edges/episodes single-file splits,
    JSON-string lists, timestamp[s], 384-dim variable embeddings) shared by
    the migration-reader and export-round-trip tests."""
    import json as _json
    import os

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    ts_s = _pa.array([1704067200, 1704070800], _pa.timestamp("s"))
    _pq.write_table(
        _pa.table(
            {
                "uuid": ["n1", "n2"],
                "name": ["Ada Lovelace", "Acme Corporation"],
                "group_id": ["g0", "g0"],
                "labels": [_json.dumps(["Person"]), _json.dumps(["Organization"])],
                "created_at": ts_s,
                "name_embedding": _pa.array([[0.1] * 384, [0.2] * 384], _pa.list_(_pa.float32())),
                "summary": ["Person entity: Ada Lovelace", "Organization entity: Acme Corporation"],
                "attributes": ["{}", "{}"],
            }
        ),
        os.path.join(src, "nodes.parquet"),
    )
    _pq.write_table(
        _pa.table(
            {
                "uuid": ["e1", "e2"],
                "source_uuid": ["n1", "n2"],
                "target_uuid": ["n2", "n1"],
                "name": ["WORKS_AT", "FOUNDED"],
                "fact": [
                    "Ada Lovelace works at Acme Corporation.",
                    "Acme Corporation was founded by Ada Lovelace.",
                ],
                "group_id": ["g0", "g0"],
                "created_at": ts_s,
                "fact_embedding": _pa.array(
                    [[0.5] * 384, [0.25] * 384], _pa.list_(_pa.float32())
                ),
                "episodes": [_json.dumps(["epB", "epA"]), _json.dumps(["epA"])],
                "expired_at": _pa.nulls(2, _pa.timestamp("s")),
                "valid_at": ts_s,
                "invalid_at": _pa.nulls(2, _pa.timestamp("s")),
                "attributes": ["{}", "{}"],
            }
        ),
        os.path.join(src, "edges.parquet"),
    )
    _pq.write_table(
        _pa.table(
            {
                "uuid": ["epA"],
                "name": ["https://x.example/1"],
                "content": ["Ada Lovelace works at Acme Corporation."],
                "source": ["text"],
                "source_description": ["crawl"],
                "group_id": ["g0"],
                "created_at": ts_s.slice(0, 1),
                "valid_at": ts_s.slice(0, 1),
                # NON-sorted on purpose: the export round trip must
                # reproduce this stored order, not a re-sorted set
                "entity_edges": [_json.dumps(["e2", "e1"])],
            }
        ),
        os.path.join(src, "episodes.parquet"),
    )


def test_migration_reader_reference_layout(ray_session, tmp_path_factory):
    """S5: reference HF-datasets layout (JSON-string lists, timestamp[s],
    variable-dim embeddings, no endpoint names) converts into this
    engine's table layout — lists real, timestamps us, created_by =
    episodes[0], endpoint names joined from nodes, vectors re-embedded or
    carried through byte-exact."""
    import os

    import numpy as np

    from graphiti_hf_ray.migration import migrate_reference_layout
    from graphiti_hf_ray.schemas import EMBED_DIM

    src = str(tmp_path_factory.mktemp("ref_layout"))
    _write_reference_fixture(src)

    out = str(tmp_path_factory.mktemp("migrated"))
    stats = migrate_reference_layout(src, out, reembed=True)
    assert stats == {"nodes": 2, "edges": 2, "episodes": 1}
    nodes = gio.read_table_dir(out, "nodes").to_pandas()
    assert sorted(nodes["labels"].map(tuple)) == [("Organization",), ("Person",)]
    assert all(len(v) == EMBED_DIM for v in nodes["name_embedding"])
    edges = gio.read_table_dir(out, "edges").to_pandas().set_index("uuid")
    r = edges.loc["e1"]
    assert r["source_name"] == "Ada Lovelace" and r["target_name"] == "Acme Corporation"
    assert r["episodes"] == "epA,epB" and r["created_by"] == "epB"  # episodes[0] of source order
    assert r["n_occurrences"] == 2
    assert str(edges["valid_at"].dtype) == "datetime64[us]" and pd.isna(r["invalid_at"])
    # engine read-side ops accept the migrated table directly
    from graphiti_hf_ray.functions.temporal import point_in_time
    import ray.data as rd2

    snap = point_in_time(
        gio.read_table_dir_ds(out, "edges", columns=["uuid", "valid_at", "invalid_at"]),
        pd.Timestamp("2024-06-01"),
    ).to_pandas()
    assert sorted(snap["uuid"]) == ["e1", "e2"]

    # reembed=False carries the 384-dim source vectors byte-exact
    out2 = str(tmp_path_factory.mktemp("migrated2"))
    migrate_reference_layout(src, out2, reembed=False)
    e2 = gio.read_table_dir(out2, "edges").to_pandas().set_index("uuid")
    v = np.asarray(e2.loc["e1", "fact_embedding"], np.float32)
    assert v.shape == (384,) and np.allclose(v, 0.5)


def test_export_reference_layout_roundtrip_random(ray_session, tmp_path_factory):
    """Property form of the round trip: RANDOM consistent reference
    graphs (unicode names, null timestamps, multi-episode provenance,
    multi-edge entity_edges in non-sorted order) survive migrate →
    export value-identically. Generator constraints = the engine's
    documented lossy set: provenance tails are written sorted (the
    engine stores a sorted csv) and entity_edges is the exact inverse
    of edge provenance (a consistent reference graph)."""
    import json as _json
    import random

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from graphiti_hf_ray.migration import export_reference_layout, migrate_reference_layout

    rng = random.Random(11)
    names = ["Ada Lovelace", "Acme Corporation", "über GmbH", "数字会社", "N. O'Neil-Smith"]

    for trial in range(3):
        n_nodes = rng.randint(2, 5)
        n_eps = rng.randint(1, 4)
        n_edges = rng.randint(1, 6)
        node_ids = [f"n{trial}_{i}" for i in range(n_nodes)]
        ep_ids = [f"ep{trial}_{i}" for i in range(n_eps)]
        ts = lambda: rng.choice([1704067200, 1704070800, 1710000000, None])  # noqa: E731

        edges = []
        for j in range(n_edges):
            cb = rng.choice(ep_ids)
            extra = sorted(rng.sample(ep_ids, rng.randint(0, n_eps - 1)))
            eps = [cb] + [e for e in extra if e != cb]
            edges.append(
                {
                    "uuid": f"e{trial}_{j}",
                    "source_uuid": rng.choice(node_ids),
                    "target_uuid": rng.choice(node_ids),
                    "name": rng.choice(["WORKS_AT", "FOUNDED", "LIVES_IN"]),
                    "fact": f"fact {j} — «{rng.choice(names)}»",
                    "episodes": eps,
                    "valid_at": ts(),
                    "expired_at": ts(),
                    "invalid_at": ts(),
                }
            )
        # consistent inverse, stored in a shuffled (non-sorted) order
        inv = {e: [] for e in ep_ids}
        for ed in edges:
            for e in ed["episodes"]:
                inv[e].append(ed["uuid"])
        for e in inv:
            rng.shuffle(inv[e])

        src = str(tmp_path_factory.mktemp(f"prop_src{trial}"))
        ts_arr = lambda vals: _pa.array(vals, _pa.timestamp("s"))  # noqa: E731
        _pq.write_table(
            _pa.table(
                {
                    "uuid": node_ids,
                    "name": [rng.choice(names) for _ in node_ids],
                    "group_id": ["g0"] * n_nodes,
                    "labels": [_json.dumps(rng.sample(["Person", "Organization", "Place"], 2)) for _ in node_ids],
                    "created_at": ts_arr([1704067200] * n_nodes),
                    "name_embedding": _pa.array([[rng.random()] * 8 for _ in node_ids], _pa.list_(_pa.float32())),
                    "summary": [f"s{i}" for i in range(n_nodes)],
                    "attributes": ['{"k": "v"}'] * n_nodes,
                }
            ),
            os.path.join(src, "nodes.parquet"),
        )
        _pq.write_table(
            _pa.table(
                {
                    "uuid": [e["uuid"] for e in edges],
                    "source_uuid": [e["source_uuid"] for e in edges],
                    "target_uuid": [e["target_uuid"] for e in edges],
                    "name": [e["name"] for e in edges],
                    "fact": [e["fact"] for e in edges],
                    "group_id": ["g0"] * n_edges,
                    "created_at": ts_arr([1704067200] * n_edges),
                    "fact_embedding": _pa.array([[rng.random()] * 8 for _ in edges], _pa.list_(_pa.float32())),
                    "episodes": [_json.dumps(e["episodes"]) for e in edges],
                    "expired_at": ts_arr([e["expired_at"] for e in edges]),
                    "valid_at": ts_arr([e["valid_at"] for e in edges]),
                    "invalid_at": ts_arr([e["invalid_at"] for e in edges]),
                    "attributes": ["{}"] * n_edges,
                }
            ),
            os.path.join(src, "edges.parquet"),
        )
        _pq.write_table(
            _pa.table(
                {
                    "uuid": ep_ids,
                    "name": [f"https://x.example/{i}" for i in range(n_eps)],
                    "content": [f"content {i} — {rng.choice(names)}" for i in range(n_eps)],
                    "source": ["text"] * n_eps,
                    "source_description": ["crawl"] * n_eps,
                    "group_id": ["g0"] * n_eps,
                    "created_at": ts_arr([1704067200] * n_eps),
                    "valid_at": ts_arr([1704067200] * n_eps),
                    "entity_edges": [_json.dumps(inv[e]) for e in ep_ids],
                }
            ),
            os.path.join(src, "episodes.parquet"),
        )

        mid = str(tmp_path_factory.mktemp(f"prop_mid{trial}"))
        migrate_reference_layout(src, mid, reembed=False)
        exp = str(tmp_path_factory.mktemp(f"prop_exp{trial}"))
        export_reference_layout(mid, exp)
        for split in ("nodes", "edges", "episodes"):
            orig = _pq.read_table(os.path.join(src, f"{split}.parquet")).sort_by("uuid")
            got = _pq.read_table(os.path.join(exp, f"{split}.parquet")).sort_by("uuid")
            assert got.schema.names == orig.schema.names, (trial, split)
            for c in orig.schema.names:
                a, b = orig.column(c).combine_chunks(), got.column(c).combine_chunks()
                assert a.type == b.type, (trial, split, c)
                assert a.equals(b), (trial, split, c, a.to_pylist(), b.to_pylist())


def test_export_reference_layout_roundtrip(ray_session, tmp_path_factory):
    """The exporter closes the S5 round trip: reference layout → migrate
    (vectors carried byte-exact) → export → the original single-file
    splits, value-identical per column (episodes[0]=created_by order,
    timestamp[s], JSON-string lists, variable-dim embeddings; derived
    entity_edges reproduces the stored lists)."""
    import os

    import pyarrow.parquet as _pq

    from graphiti_hf_ray.migration import export_reference_layout, migrate_reference_layout

    src = str(tmp_path_factory.mktemp("rt_src"))
    _write_reference_fixture(src)
    mid = str(tmp_path_factory.mktemp("rt_mid"))
    migrate_reference_layout(src, mid, reembed=False)
    exp = str(tmp_path_factory.mktemp("rt_exp"))
    stats = export_reference_layout(mid, exp)
    assert stats == {"nodes": 2, "edges": 2, "episodes": 1}

    for split in ("nodes", "edges", "episodes"):
        orig = _pq.read_table(os.path.join(src, f"{split}.parquet")).sort_by("uuid")
        got = _pq.read_table(os.path.join(exp, f"{split}.parquet")).sort_by("uuid")
        assert got.schema.names == orig.schema.names, split
        for c in orig.schema.names:
            a, b = orig.column(c).combine_chunks(), got.column(c).combine_chunks()
            assert a.type == b.type, (split, c)
            assert a.equals(b), (split, c)


def test_write_single_parquet_empty_split(ray_session, tmp_path_factory):
    """A fully-empty split still writes a schema-bearing zero-row file
    (Ray can drop the dataset-level schema when every block is empty, so
    the writer captures it from the 0-row batches)."""
    from graphiti_hf_ray.migration import _write_single_parquet

    t = pa.table({"uuid": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    d = str(tmp_path_factory.mktemp("empty_split"))
    path = os.path.join(d, "edges.parquet")
    rows = _write_single_parquet(rd.from_arrow(t), path)
    assert rows == 0
    got = pq.read_table(path)
    assert got.num_rows == 0 and got.schema.names == ["uuid", "n"]


def test_export_reference_layout_from_build(ray_session, graph_dir):
    """Exporting a graph this engine BUILT yields reference-shape splits:
    row counts match the partitioned tables, every edge's episodes JSON
    decodes with created_by in slot 0 (the reference's deletion key), and
    entity_edges is the exact inverse of the edges' provenance."""
    import json as _json
    import os
    import tempfile

    import pyarrow.parquet as _pq

    from graphiti_hf_ray.migration import export_reference_layout

    with tempfile.TemporaryDirectory() as exp:
        stats = export_reference_layout(graph_dir, exp)
        edges_t = _pq.read_table(os.path.join(exp, "edges.parquet"))
        eps_t = _pq.read_table(os.path.join(exp, "episodes.parquet"))
        assert stats["edges"] == edges_t.num_rows == gio.read_table_dir(graph_dir, "edges").num_rows
        assert stats["episodes"] == eps_t.num_rows > 0

        want: dict[str, set] = {}
        engine_edges = gio.read_table_dir(graph_dir, "edges").to_pandas().set_index("uuid")
        for uuid, eps_json in zip(
            edges_t.column("uuid").to_pylist(), edges_t.column("episodes").to_pylist()
        ):
            lst = _json.loads(eps_json)
            assert lst and lst[0] == engine_edges.loc[uuid, "created_by"]
            for ep in lst:
                want.setdefault(ep, set()).add(uuid)
        for ep_uuid, ee_json in zip(
            eps_t.column("uuid").to_pylist(), eps_t.column("entity_edges").to_pylist()
        ):
            assert set(_json.loads(ee_json)) == want.get(ep_uuid, set())


def test_branch_merge_identical_branches_noop(ray_session, graph_dir, tmp_path_factory):
    """Merging a just-created (undiverged) branch: zero conflicts, zero
    additions, main unchanged."""
    import shutil as _sh

    from graphiti_hf_ray.pipelines.branches import merge_branch

    work = str(tmp_path_factory.mktemp("noop"))
    _sh.copytree(graph_dir, work, dirs_exist_ok=True)
    _sh.rmtree(os.path.join(work, gio.BRANCHES_DIR), ignore_errors=True)
    before = gio.read_table_dir(work, "edges").to_pandas().sort_values("uuid").reset_index(drop=True)
    gio.create_branch(work, "same")
    res = merge_branch(work, "same", None, tables=("edges",))
    r = res["tables"]["edges"]
    assert r["n_conflicts"] == 0 and r["n_added"] == 0
    after = gio.read_table_dir(work, "edges").to_pandas().sort_values("uuid").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)


def test_merge_recovers_stranded_swap(ray_session, graph_dir, tmp_path_factory):
    """ADVICE r3: the merge swap has a crash window where the target table
    dir is absent — a new merge must recover (restore or complete the swap)
    instead of failing on the missing directory."""
    from graphiti_hf_ray.pipelines.branches import _recover_stranded_merge, merge_branch

    work = str(tmp_path_factory.mktemp("recover"))
    shutil.copytree(graph_dir, work, dirs_exist_ok=True)
    shutil.rmtree(os.path.join(work, gio.BRANCHES_DIR), ignore_errors=True)
    gio.create_branch(work, "feat")
    before = gio.read_table_dir(work, "edges").to_pandas()

    # crash state A: old renamed to .merge-old, tmp never written → restore
    old = os.path.join(work, "edges")
    trash = os.path.join(work, "edges.merge-old")
    os.rename(old, trash)
    _recover_stranded_merge(work, "edges")
    assert os.path.isdir(old) and not os.path.isdir(trash)
    restored = gio.read_table_dir(work, "edges").to_pandas()
    assert len(restored) == len(before)

    # crash state B: tmp fully written, old moved aside, second rename lost
    # → a fresh merge completes the swap and then runs normally
    tmp_new = os.path.join(work, "edges.merge-tmp")
    shutil.copytree(old, tmp_new)
    os.rename(old, trash)
    res = merge_branch(work, "feat", None, strategy="manual", tables=("edges",))
    assert res["success"]
    assert os.path.isdir(old) and not os.path.isdir(trash) and not os.path.isdir(tmp_new)
    merged = gio.read_table_dir(work, "edges").to_pandas()
    assert merged["uuid"].is_unique and len(merged) == len(before)

    # crash state C: swap completed but trash cleanup lost → dropped on entry
    shutil.copytree(old, trash)
    _recover_stranded_merge(work, "edges")
    assert os.path.isdir(old) and not os.path.isdir(trash)


def _diverged_worktree(graph_dir, tmp_path_factory, name):
    """Copy the built graph, branch it, then mutate MAIN: change one fact,
    drop another edge. Returns (work, changed_uuid, dropped_uuid).
    Deterministic, so two calls diverge identically."""
    import glob as _glob

    import pyarrow.compute as _pc

    work = str(tmp_path_factory.mktemp(name))
    shutil.copytree(graph_dir, work, dirs_exist_ok=True)
    shutil.rmtree(os.path.join(work, gio.BRANCHES_DIR), ignore_errors=True)
    gio.create_branch(work, "feat")
    parts = sorted(_glob.glob(os.path.join(work, "edges", "**", "*.parquet"), recursive=True))
    tbl = pa.concat_tables([pq.read_table(p) for p in parts])
    order = _pc.sort_indices(tbl.column("uuid"))
    tbl = tbl.take(order)
    uuids = tbl.column("uuid").to_pylist()
    changed_uuid, dropped_uuid = uuids[0], uuids[1]
    facts = tbl.column("fact").to_pylist()
    facts[0] = "CHANGED FACT."
    tbl = tbl.set_column(tbl.schema.get_field_index("fact"), "fact", pa.array(facts, pa.string()))
    tbl = tbl.filter(_pc.not_equal(tbl.column("uuid"), pa.scalar(dropped_uuid)))
    shutil.rmtree(os.path.join(work, "edges"))
    gio.write_shard_atomic(tbl, os.path.join(work, "edges", "shard=0000"), "mutated")
    return work, changed_uuid, dropped_uuid


def test_branch_merge_distributed_join_parity(
    ray_session, graph_dir, tmp_path_factory, monkeypatch
):
    """Forcing the divergence gate to 0 routes the merge apply through the
    distributed semi/anti join (no broadcast sets); the merged table, the
    counts, and the conflict report must be identical to the broadcast
    path. The edges table carries the fact_embedding list column, so this
    also exercises semi_join's pickled-binary ride."""
    import numpy as np

    from graphiti_hf_ray.pipelines.branches import merge_branch

    work_a, changed_uuid, _ = _diverged_worktree(graph_dir, tmp_path_factory, "mrg_bcast")
    work_b, changed_b, _ = _diverged_worktree(graph_dir, tmp_path_factory, "mrg_dist")
    assert changed_uuid == changed_b  # identical divergence

    res_a = merge_branch(work_a, "feat", None, strategy="source_wins", tables=("edges",))
    monkeypatch.setenv("GRAFT_MERGE_BROADCAST_MAX", "0")
    res_b = merge_branch(work_b, "feat", None, strategy="source_wins", tables=("edges",))
    monkeypatch.delenv("GRAFT_MERGE_BROADCAST_MAX")

    ra, rb = res_a["tables"]["edges"], res_b["tables"]["edges"]
    for k in ("rows", "n_added", "n_conflicts", "n_resolved"):
        assert ra[k] == rb[k], k
    assert not rb["conflicts_truncated"]
    assert sorted(ra["conflicts"]["uuid"]) == sorted(rb["conflicts"]["uuid"])

    ma = gio.read_table_dir(work_a, "edges").to_pandas().sort_values("uuid").reset_index(drop=True)
    mb = gio.read_table_dir(work_b, "edges").to_pandas().sort_values("uuid").reset_index(drop=True)
    assert list(ma.columns) == list(mb.columns)
    for c in ma.columns:
        if c == "fact_embedding":
            assert np.allclose(np.stack(ma[c].to_numpy()), np.stack(mb[c].to_numpy()))
        else:
            assert ma[c].equals(mb[c]), c
    # the distributed path resolved the conflict to the source side too
    assert mb.loc[mb["uuid"] == changed_uuid, "fact"].iloc[0] != "CHANGED FACT."


def test_semi_join_anti_and_nested_ride(ray_session):
    """semi_join keeps exactly the matching keys (anti inverts), preserves
    nested list columns byte-exactly through the pandas bucket shuffle, and
    restores the input dtypes."""
    import numpy as np

    from graphiti_hf_ray.functions.joins import semi_join

    data = rd.from_arrow(
        pa.table(
            {
                "uuid": [f"u{i}" for i in range(20)],
                "n": pa.array(list(range(20)), pa.int64()),
                "vec": pa.array([[float(i), float(i + 1)] for i in range(20)], pa.list_(pa.float32())),
            }
        )
    )
    keys = rd.from_arrow(pa.table({"uuid": ["u3", "u7", "u19", "zzz-absent"]}))

    kept = semi_join(data, keys, "uuid").to_pandas().sort_values("uuid").reset_index(drop=True)
    assert list(kept["uuid"]) == ["u19", "u3", "u7"]
    assert kept["n"].dtype == "int64"
    assert np.allclose(np.stack(kept["vec"].to_numpy()), [[19.0, 20.0], [3.0, 4.0], [7.0, 8.0]])

    dropped = semi_join(data, keys, "uuid", anti=True).to_pandas()
    assert len(dropped) == 17 and not set(dropped["uuid"]) & {"u3", "u7", "u19"}
