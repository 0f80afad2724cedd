"""S6 serving endpoints: the reference's graph_service route surface
(server/graph_service/routers/ingest.py:51-105 + retrieve.py:17-57)
rebuilt on stdlib HTTP over the engine's batch operators. Tests drive the
REAL HTTP server (urllib against loopback) end to end: enqueue-ingest →
incremental build → search/read → delete → clear."""

from __future__ import annotations

import json
import urllib.request

import pytest


def _call(port, method, path, body=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"},
        method=method,
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def service(ray_session, tmp_path_factory):
    from graphiti_hf_ray.serve import serve

    out = str(tmp_path_factory.mktemp("served_graph"))
    server, svc = serve(out, port=8329)
    yield 8329, svc
    server.shutdown()


def test_ingest_then_search_roundtrip(service):
    port, svc = service
    msgs = [
        {
            "content": "Ada Lovelace works at Acme Corporation.",
            "role": "alice",
            "role_type": "user",
            "timestamp": "2024-02-01T00:00:00",
        },
        {
            "content": "Grace Hopper moved to Oslo.",
            "role": "bob",
            "role_type": "user",
            "timestamp": "2024-03-01T00:00:00",
        },
    ]
    code, res = _call(port, "POST", "/messages", {"group_id": "chat1", "messages": msgs})
    assert code == 202 and res["success"]
    svc.flush()  # deterministic test hook; the queue drains in background

    # hybrid search finds the ingested fact, FactResult shape
    code, res = _call(
        port, "POST", "/search", {"query": "works at Acme", "group_ids": ["chat1"], "max_facts": 5}
    )
    assert code == 200
    facts = res["facts"]
    assert any("works at Acme Corporation" in f["fact"] for f in facts)
    f0 = facts[0]
    assert set(f0) == {"uuid", "name", "fact", "valid_at", "invalid_at", "created_at", "expired_at"}
    assert f0["valid_at"].endswith("+00:00")

    # GET /entity-edge/{uuid}
    code, edge = _call(port, "GET", f"/entity-edge/{f0['uuid']}")
    assert code == 200 and edge["uuid"] == f0["uuid"]
    code, _ = _call(port, "GET", "/entity-edge/nope")
    assert code == 404

    # GET /episodes/{group_id}?last_n=1 → the LATEST episode (Grace's)
    code, eps = _call(port, "GET", "/episodes/chat1?last_n=1")
    assert code == 200 and len(eps) == 1
    assert "Grace Hopper moved to Oslo" in eps[0]["content"]

    # POST /get-memory composes the query from messages (retrieve.py:60-63)
    code, mem = _call(
        port, "POST", "/get-memory",
        {
            "group_id": "chat1",
            "messages": [{"role": "alice", "role_type": "user", "content": "who works at Acme?"}],
        },
    )
    assert code == 200 and any("Acme" in f["fact"] for f in mem["facts"])


def test_ingest_idempotent_and_incremental(service):
    """Re-posting the same messages appends nothing (content-fingerprinted
    shards + deterministic ids); a new message extends the graph."""
    port, svc = service
    base = {
        "content": "Ada Lovelace works at Acme Corporation.",
        "role": "alice",
        "role_type": "user",
        "timestamp": "2024-02-01T00:00:00",
    }
    _call(port, "POST", "/messages", {"group_id": "chat1", "messages": [base]})
    svc.flush()
    code, res = _call(port, "POST", "/search", {"query": "Acme", "group_ids": ["chat1"]})
    n_before = len(res["facts"])
    _call(
        port, "POST", "/messages",
        {
            "group_id": "chat1",
            "messages": [
                {
                    "content": "Alan Turing founded Initech Systems.",
                    "role": "carol",
                    "role_type": "user",
                    "timestamp": "2024-04-01T00:00:00",
                }
            ],
        },
    )
    svc.flush()
    code, res2 = _call(port, "POST", "/search", {"query": "founded Initech", "group_ids": ["chat1"]})
    assert any("founded Initech Systems" in f["fact"] for f in res2["facts"])
    code, res3 = _call(port, "POST", "/search", {"query": "Acme", "group_ids": ["chat1"]})
    assert len(res3["facts"]) == n_before  # idempotent re-ingest added nothing


def test_entity_node_delete_and_clear(service):
    port, svc = service
    code, node = _call(
        port, "POST", "/entity-node",
        {"group_id": "chat1", "name": "Manual Entity", "summary": "hand-added"},
    )
    assert code == 201 and node["status"] == "created"
    code, again = _call(
        port, "POST", "/entity-node", {"group_id": "chat1", "name": "Manual Entity"}
    )
    assert again["status"] == "exists"  # deterministic id upsert

    # delete one edge
    code, res = _call(port, "POST", "/search", {"query": "Oslo", "group_ids": ["chat1"]})
    target = next(f["uuid"] for f in res["facts"] if "Oslo" in f["fact"])
    code, d = _call(port, "DELETE", f"/entity-edge/{target}")
    assert code == 200 and d["rows_removed"] == 1
    code, _ = _call(port, "GET", f"/entity-edge/{target}")
    assert code == 404

    # delete an episode by uuid (removes its rows + orphan cleanup)
    code, eps = _call(port, "GET", "/episodes/chat1?last_n=1")
    code, d = _call(port, "DELETE", f"/episode/{eps[0]['uuid']}")
    assert code == 200 and d["success"]

    # clear wipes everything
    code, c = _call(port, "POST", "/clear")
    assert code == 200 and c["success"]
    code, res = _call(port, "POST", "/search", {"query": "Acme"})
    assert code == 500 or res["facts"] == []  # graph gone


def test_delete_episode_purges_triples_log_and_spool(ray_session, tmp_path_factory):
    """remove_episode must filter the TRIPLES log too: the link phase
    re-derives MENTIONS/edges from every manifested shard, so a victim
    left in the log resurrected as dangling episodic_edges on the next
    ingest (regression). Delete also removes the spool file, so
    delete -> re-add with the same caller uuid and NEW content works;
    a changed-body re-add WITHOUT a delete is rejected, not silently
    discarded."""
    import pytest

    from graphiti_hf_ray import io as gio
    from graphiti_hf_ray.serve import GraphService

    out = str(tmp_path_factory.mktemp("svc_del"))
    svc = GraphService(out)
    ua = svc.add_episode("g", "epA", "Ada Lovelace works at Acme Corporation.")["uuid"]
    svc.add_episode("g", "epB", "Grace Hopper moved to Oslo.")
    svc.delete_episode(ua)
    # changed body under a NEW name (new uuid) is fine; the deleted
    # episode must NOT resurrect through the re-derive
    svc.add_episode("g", "epC", "Alan Turing works at Bletchley Park.")
    eps = gio.read_table_dir(out, "episodes").column("uuid").to_pylist()
    men = gio.read_table_dir(out, "episodic_edges").column("source_node_uuid").to_pylist()
    assert ua not in eps
    assert ua not in men                                   # the regression
    # changed-body re-add of a LIVE episode: explicit rejection
    uc = svc.add_episode("g", "epD", "Marie Curie works at Sorbonne.", uuid="fixed-u")["uuid"]
    with pytest.raises(ValueError, match="different"):
        svc.add_episode("g", "epD", "Marie Curie moved to Paris.", uuid="fixed-u")
    # identical re-add stays idempotent
    assert svc.add_episode("g", "epD", "Marie Curie works at Sorbonne.", uuid="fixed-u")["uuid"] == uc
    # delete -> re-add with the same uuid and new content goes through
    svc.delete_episode(uc)
    r = svc.add_episode("g", "epD", "Marie Curie moved to Paris.", uuid="fixed-u")
    assert r["uuid"] == uc
    facts = gio.read_table_dir(out, "edges").column("fact").to_pylist()
    assert any("moved to Paris" in f for f in facts)
    assert not any("works at Sorbonne" in f for f in facts)


def test_add_episode_uuid_prefix_no_collision(ray_session, tmp_path_factory):
    """Two caller uuids sharing a 16-char prefix are DIFFERENT episodes:
    the spool filename digests the full key (regression: the truncated
    key raised a false 'different content' error for the second add)."""
    from graphiti_hf_ray import io as gio
    from graphiti_hf_ray.serve import GraphService

    out = str(tmp_path_factory.mktemp("svc_prefix"))
    svc = GraphService(out)
    ua = svc.add_episode("g", "e1", "Ada Lovelace works at Acme Corporation.",
                         uuid="session-2024-06-01-a")["uuid"]
    ub = svc.add_episode("g", "e2", "Grace Hopper moved to Oslo.",
                         uuid="session-2024-06-01-b")["uuid"]
    assert ua != ub
    eps = gio.read_table_dir(out, "episodes").column("uuid").to_pylist()
    assert ua in eps and ub in eps


def test_spool_migration_from_legacy_names(ray_session, tmp_path_factory):
    """A service restarted over an out_dir with legacy 16-char-prefix
    spool names must still SEE those episodes: migration renames to the
    md5-of-full-key scheme, so a changed-body re-add raises instead of
    silently double-ingesting (regression)."""
    import os

    import pytest

    from graphiti_hf_ray.ids import md5_id
    from graphiti_hf_ray.serve import GraphService

    out = str(tmp_path_factory.mktemp("svc_migrate"))
    svc = GraphService(out)
    key = "session-2024-06-01-a"
    svc.add_episode("g", "e1", "Ada Lovelace works at Acme Corporation.", uuid=key)
    # simulate the pre-upgrade on-disk state: rename to the legacy scheme
    new_name = f"episode-{md5_id('spool:' + key)}.parquet"
    legacy = os.path.join(svc.spool_dir, f"episode-{key[:16]}.parquet")
    os.replace(os.path.join(svc.spool_dir, new_name), legacy)
    svc2 = GraphService(out)                      # restart migrates
    assert new_name in os.listdir(svc2.spool_dir)
    assert not os.path.exists(legacy)
    with pytest.raises(ValueError, match="different"):
        svc2.add_episode("g", "e1", "Ada Lovelace moved to London.", uuid=key)


def test_service_injected_extractor_factory(ray_session, tmp_path_factory):
    """A deployment-pinned extractor factory (GraphService(extractor_
    factory=...)) reaches the incremental build: every ingested episode
    is extracted by the injected callable, not the default extractor."""
    from graphiti_hf_ray import io as gio
    from graphiti_hf_ray.serve import GraphService

    marker = "SERVICE_INJECTED"

    class MarkerExtractor:
        def __call__(self, ep):
            import pyarrow as pa

            from graphiti_hf_ray.extract.triples import TRIPLES_SCHEMA

            n = ep.num_rows
            return pa.table(
                {
                    "episode_uuid": ep.column("uuid"),
                    "group_id": ep.column("group_id"),
                    "valid_at": ep.column("valid_at"),
                    "subj_surface": pa.array(["S"] * n),
                    "subj_label": pa.array(["Entity"] * n),
                    "pred": pa.array([marker] * n),
                    "obj_surface": pa.array(["O"] * n),
                    "obj_label": pa.array(["Entity"] * n),
                    "fact": pa.array(["S O"] * n),
                    "sent_idx": pa.array([0] * n, pa.int32()),
                },
                schema=TRIPLES_SCHEMA,
            )

    out = str(tmp_path_factory.mktemp("svc_injected"))
    svc = GraphService(out, extractor_factory=MarkerExtractor)
    svc.add_episode("g", "e1", "Ada Lovelace works at Acme Corporation.")
    tr = gio.read_table_dir(out, "triples").to_pandas()
    assert len(tr) == 1 and (tr["pred"] == marker).all()
