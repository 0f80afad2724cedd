"""Migration reader (SURVEY.md §2 S5): reference HF-datasets layout →
this engine's partitioned tables.

The reference persists four splits as pandas-backed parquet with
JSON-string list columns, second-resolution timestamps and variable-dim
embeddings (huggingface_driver.py:245-319; populated by migration.py:45-235
via re-ingestion). This reader converts that layout IN PLACE of a
re-ingestion — a distributed one-pass map per table plus one hash join:

- ``labels`` / ``entity_edges`` JSON-array strings → list<string>;
  ``episodes`` JSON-array string → this engine's sorted-csv provenance;
- ``timestamp[s]`` → ``timestamp[us]``;
- ``created_by`` (absent in the reference layout) ← ``episodes[0]`` — the
  reference keys episode deletion on the FIRST provenance entry
  (graphiti.py:1097), which is exactly this engine's created_by contract;
- ``n_occurrences`` (absent) ← ``len(episodes)`` — a lower bound on the
  true occurrence count, documented per row is impossible to recover;
- edge ``source_name``/``target_name`` (absent) ← resolved from the nodes
  table via a partitioned hash join (both sides streamed);
- embeddings: ``reembed=True`` (default) re-embeds name/fact with this
  engine's deterministic embedder so every vector matches ``EMBED_DIM``;
  ``reembed=False`` carries the source vectors through unchanged (any
  uniform dim works for the streaming cosine ops, but persisted sidecar
  indices assume one dim per column).

Outputs are written with ``io.write_table_distributed`` (atomic tmp+rename
+ manifest), so a killed migration resumes per table.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from . import io as gio
from .schemas import EMBED_DIM


def _json_list(s) -> list[str]:
    if s is None or s == "":
        return []
    try:
        v = json.loads(s)
        return [str(x) for x in v] if isinstance(v, list) else [str(v)]
    except (json.JSONDecodeError, TypeError):
        return [str(s)]


def _ts_us(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.cast(pa.timestamp("us"))


def _convert_nodes(t: pa.Table, reembed: bool) -> pa.Table:
    from .stages.embed import embed_many

    names = t.column("name").to_pylist()
    labels = [_json_list(s) for s in t.column("labels").to_pylist()]
    if reembed:
        embs = embed_many(names)
        emb_arr = pa.FixedSizeListArray.from_arrays(pa.array(embs.ravel(), pa.float32()), EMBED_DIM)
    else:
        emb_arr = t.column("name_embedding")
    return pa.table(
        {
            "uuid": t.column("uuid"),
            "name": t.column("name"),
            "group_id": t.column("group_id"),
            "labels": pa.array(labels, pa.list_(pa.string())),
            "created_at": _ts_us(t.column("created_at")),
            "name_embedding": emb_arr,
            "summary": t.column("summary"),
            "attributes": t.column("attributes"),
        }
    )


def _convert_edges(t: pa.Table, reembed: bool) -> pa.Table:
    """Embedding-free conversion; the fact embedding joins the table AFTER
    the endpoint-name hash joins (list columns do not survive the pandas
    bucket shuffle — when carrying source vectors they ride as a binary
    column and decode in the final map)."""
    import numpy as np

    eps = [_json_list(s) for s in t.column("episodes").to_pylist()]
    created_by = [e[0] if e else "" for e in eps]  # graphiti.py:1097 contract
    episodes_csv = [",".join(sorted(set(e))) for e in eps]
    cols = {
        "uuid": t.column("uuid"),
        "source_uuid": t.column("source_uuid"),
        "target_uuid": t.column("target_uuid"),
        "name": t.column("name"),
        "fact": t.column("fact"),
        "group_id": t.column("group_id"),
        "created_at": _ts_us(t.column("created_at")),
        "episodes": pa.array(episodes_csv, pa.string()),
        "created_by": pa.array(created_by, pa.string()),
        "expired_at": _ts_us(t.column("expired_at")),
        "valid_at": _ts_us(t.column("valid_at")),
        "invalid_at": _ts_us(t.column("invalid_at")),
        "attributes": t.column("attributes"),
        "n_occurrences": pa.array([max(1, len(e)) for e in eps], pa.int64()),
    }
    if not reembed:
        cols["fact_embedding_bin"] = pa.array(
            [np.asarray(v, np.float32).tobytes() for v in t.column("fact_embedding").to_pylist()],
            pa.binary(),
        )
    return pa.table(cols)


def _convert_episodes(t: pa.Table) -> pa.Table:
    ee = [_json_list(s) for s in t.column("entity_edges").to_pylist()]
    return pa.table(
        {
            "uuid": t.column("uuid"),
            "name": t.column("name"),
            "content": t.column("content"),
            "source": t.column("source"),
            "source_description": t.column("source_description"),
            "group_id": t.column("group_id"),
            "created_at": _ts_us(t.column("created_at")),
            "valid_at": _ts_us(t.column("valid_at")),
            "entity_edges": pa.array(ee, pa.list_(pa.string())),
        }
    )


def _convert_communities(t: pa.Table, reembed: bool) -> pa.Table:
    from .stages.embed import embed_many

    if reembed:
        embs = embed_many(t.column("summary").to_pylist())
        emb_arr = pa.FixedSizeListArray.from_arrays(pa.array(embs.ravel(), pa.float32()), EMBED_DIM)
    else:
        emb_arr = t.column("name_embedding")
    return pa.table(
        {
            "uuid": t.column("uuid"),
            "name": t.column("name"),
            "group_id": t.column("group_id"),
            "created_at": _ts_us(t.column("created_at")),
            "name_embedding": emb_arr,
            "summary": t.column("summary"),
        }
    )


def migrate_reference_layout(
    src_dir: str, out_dir: str, reembed: bool = True
) -> dict:
    """Convert a reference-layout directory (``nodes.parquet``,
    ``edges.parquet``, ``episodes.parquet``, optional
    ``communities.parquet``) into this engine's partitioned table layout
    under ``out_dir``. Returns per-table row counts."""
    from .functions.joins import hash_join

    fp = "migrate:" + src_dir
    stats: dict[str, int] = {}

    nodes_src = rd.read_parquet(os.path.join(src_dir, "nodes.parquet"))
    nodes = nodes_src.map_batches(
        lambda t, _r=reembed: _convert_nodes(t, _r), batch_format="pyarrow"
    )
    stats["nodes"] = gio.write_table_distributed(nodes, os.path.join(out_dir, "nodes"), fp)

    edges_src = rd.read_parquet(os.path.join(src_dir, "edges.parquet"))
    edges = edges_src.map_batches(
        lambda t, _r=reembed: _convert_edges(t, _r), batch_format="pyarrow"
    )
    # endpoint names: two partitioned hash joins against the converted
    # nodes (the reference layout stores uuids only)
    names = gio.read_table_dir_ds(out_dir, "nodes", columns=["uuid", "name"])

    def side(uuid_col: str, name_col: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({uuid_col: t.column("uuid"), name_col: t.column("name")})

        return f

    sn = names.map_batches(side("s_uuid", "source_name"), batch_format="pyarrow")
    tn = names.map_batches(side("t_uuid", "target_name"), batch_format="pyarrow")
    joined = hash_join(edges, sn, "source_uuid", "s_uuid", how="left")
    joined = hash_join(joined, tn, "target_uuid", "t_uuid", how="left")

    def finish_edges(t: pa.Table, _r=reembed) -> pa.Table:
        import numpy as np

        from .stages.embed import embed_many

        if _r:
            embs = embed_many(t.column("fact").to_pylist())
            emb_arr = pa.FixedSizeListArray.from_arrays(
                pa.array(embs.ravel(), pa.float32()), EMBED_DIM
            )
        else:
            vecs = [
                np.frombuffer(b, np.float32).tolist() if b else []
                for b in t.column("fact_embedding_bin").to_pylist()
            ]
            emb_arr = pa.array(vecs, pa.list_(pa.float32()))
        cols = [
            "uuid", "source_uuid", "source_name", "target_uuid", "target_name",
            "name", "fact", "group_id", "created_at", "episodes", "created_by",
            "expired_at", "valid_at", "invalid_at", "attributes", "n_occurrences",
        ]
        out = {c: t.column(c) for c in cols}
        out["fact_embedding"] = emb_arr
        return pa.table(out)

    stats["edges"] = gio.write_table_distributed(
        joined.map_batches(finish_edges, batch_format="pyarrow"), os.path.join(out_dir, "edges"), fp
    )

    episodes_src = rd.read_parquet(os.path.join(src_dir, "episodes.parquet"))
    episodes = episodes_src.map_batches(_convert_episodes, batch_format="pyarrow")
    stats["episodes"] = gio.write_table_distributed(
        episodes, os.path.join(out_dir, "episodes"), fp
    )

    com_path = os.path.join(src_dir, "communities.parquet")
    if os.path.exists(com_path):
        com = rd.read_parquet(com_path).map_batches(
            lambda t, _r=reembed: _convert_communities(t, _r), batch_format="pyarrow"
        )
        stats["communities"] = gio.write_table_distributed(
            com, os.path.join(out_dir, "communities"), fp
        )
    return stats


# ---------------------------------------------------------------------------
# Exporter: this engine's tables → reference HF-datasets layout (the inverse
# of migrate_reference_layout, so a user can hand a graph built here back to
# the reference stack — huggingface_driver.py:245-319 expects exactly these
# single-file splits).
# ---------------------------------------------------------------------------


def _split_has_parquet(root: str) -> bool:
    """True iff the table dir holds at least one COMPLETED part file — a
    killed write leaves only ``.tmp-`` dirs, which must read as absent
    (read_table_dir_ds would raise on such a dir)."""
    for dirpath, dirnames, filenames in os.walk(root):
        gio._prune_tmp(dirnames)
        if any(fn.endswith(".parquet") for fn in filenames):
            return True
    return False


def _write_single_parquet(ds: "rd.Dataset", path: str) -> int:
    """Stream a Dataset into ONE parquet file — the reference layout IS
    single-file-per-split (HF datasets), so this is the one place a single
    output file is the contract, not a scale bug. Driver heap stays
    O(batch) via iter_batches; atomic tmp + os.replace."""
    import pyarrow.parquet as pq

    import contextlib

    tmp = path + ".tmp-export"
    writer = None
    schema = None
    rows = 0
    try:
        for b in ds.iter_batches(batch_format="pyarrow"):
            if schema is None:
                schema = b.schema  # 0-row batches still carry the schema
            if b.num_rows == 0:
                continue
            if writer is None:
                writer = pq.ParquetWriter(tmp, b.schema)
            writer.write_table(b)
            rows += b.num_rows
        if writer is None:  # fully empty split: keep the schema if we can
            if schema is None:
                # Ray drops the schema when every block has zero rows
                # (functions/joins.py contract); ds.schema() may be None too.
                s = ds.schema()
                schema = s.base_schema if s is not None else pa.schema([])
            writer = pq.ParquetWriter(tmp, schema)
        writer.close()
        writer = None
        os.replace(tmp, path)
    except BaseException:
        if writer is not None:
            with contextlib.suppress(Exception):
                writer.close()
        if os.path.exists(tmp):
            os.remove(tmp)
        raise
    return rows


def _ts_s(col) -> pa.ChunkedArray:
    """timestamp[us] → the reference's timestamp[s] (sub-second truncated —
    the reference layout cannot carry it)."""
    return col.cast(pa.timestamp("s"), safe=False)


def _var_list(col) -> pa.ChunkedArray:
    """fixed_size_list<float32, DIM> → the reference's variable list<float32>."""
    return col.cast(pa.list_(pa.float32()))


def _export_nodes(t: pa.Table) -> pa.Table:
    return pa.table(
        {
            "uuid": t.column("uuid"),
            "name": t.column("name"),
            "group_id": t.column("group_id"),
            "labels": pa.array(
                [json.dumps(l) for l in t.column("labels").to_pylist()], pa.string()
            ),
            "created_at": _ts_s(t.column("created_at")),
            "name_embedding": _var_list(t.column("name_embedding")),
            "summary": t.column("summary"),
            "attributes": t.column("attributes"),
        }
    )


def _export_edges(t: pa.Table) -> pa.Table:
    """Inverse of _convert_edges: sorted-csv provenance → JSON array with
    created_by FIRST (the reference keys episode deletion on episodes[0],
    graphiti.py:1097 — created_by must round-trip into that slot);
    engine-only columns (source/target_name, created_by, n_occurrences)
    are dropped, as the reference derives or lacks them."""
    csvs = t.column("episodes").to_pylist()
    cbs = t.column("created_by").to_pylist()

    def ordered(csv: str, cb: str) -> str:
        items = [e for e in (csv or "").split(",") if e]
        if cb and cb in items:
            items = [cb] + [e for e in items if e != cb]
        return json.dumps(items)

    return pa.table(
        {
            "uuid": t.column("uuid"),
            "source_uuid": t.column("source_uuid"),
            "target_uuid": t.column("target_uuid"),
            "name": t.column("name"),
            "fact": t.column("fact"),
            "group_id": t.column("group_id"),
            "created_at": _ts_s(t.column("created_at")),
            "fact_embedding": _var_list(t.column("fact_embedding")),
            "episodes": pa.array([ordered(c, cb or "") for c, cb in zip(csvs, cbs)], pa.string()),
            "expired_at": _ts_s(t.column("expired_at")),
            "valid_at": _ts_s(t.column("valid_at")),
            "invalid_at": _ts_s(t.column("invalid_at")),
            "attributes": t.column("attributes"),
        }
    )


def export_reference_layout(src_dir: str, out_dir: str) -> dict:
    """Convert a graph in this engine's partitioned layout back into the
    reference HF-datasets layout (``nodes.parquet`` / ``edges.parquet`` /
    ``episodes.parquet`` / ``communities.parquet`` if present) under
    ``out_dir`` — the inverse of ``migrate_reference_layout``, closing the
    round trip. Lossy by design where the reference has no slot:
    ``n_occurrences`` and endpoint names are dropped (the reference
    re-derives names from uuids), sub-second timestamps truncate to the
    reference's timestamp[s], and edge-provenance ORDER beyond the
    ``created_by`` head slot does not survive (this engine stores
    provenance as a sorted csv, so ``episodes[1:]`` comes back sorted).

    ``entity_edges`` is DERIVED by inverting the edges' provenance lists
    (episode ∈ edge.episodes ⇒ edge ∈ episode.entity_edges); the stored
    ``entity_edges`` column (populated by migration, empty on native
    builds) supplies the output ORDER where its ids agree with the
    derived set, so a migrate → export round trip reproduces the original
    byte-for-byte while native builds get a deterministic sorted list.
    The edge-side inversion input is narrow (two uuid columns); the final
    hash join does re-bucket the full episodes table, content included —
    size the export's shuffle budget for the text payload.
    Returns per-split row counts."""
    from .functions.joins import hash_join
    from .stages.shuffle import bucketed_group_apply

    os.makedirs(out_dir, exist_ok=True)
    stats: dict[str, int] = {}

    nodes = gio.read_table_dir_ds(src_dir, "nodes").map_batches(
        _export_nodes, batch_format="pyarrow"
    )
    stats["nodes"] = _write_single_parquet(nodes, os.path.join(out_dir, "nodes.parquet"))

    edges = gio.read_table_dir_ds(src_dir, "edges").map_batches(
        _export_edges, batch_format="pyarrow"
    )
    stats["edges"] = _write_single_parquet(edges, os.path.join(out_dir, "edges.parquet"))

    # entity_edges inversion: explode (edge, episodes-csv) → narrow
    # (episode_uuid, edge_uuid) pairs → one bucketed exchange per episode
    prov = gio.read_table_dir_ds(src_dir, "edges", columns=["uuid", "episodes"])

    def explode(t: pa.Table) -> pa.Table:
        eps: list[str] = []
        eus: list[str] = []
        for edge, csv in zip(t.column("uuid").to_pylist(), t.column("episodes").to_pylist()):
            for e in (csv or "").split(","):
                if e:
                    eps.append(e)
                    eus.append(edge)
        return pa.table(
            {"episode_uuid": pa.array(eps, pa.string()), "edge_uuid": pa.array(eus, pa.string())}
        )

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("episode_uuid", sort=False)["edge_uuid"].apply(
            lambda s: json.dumps(sorted(set(s)))
        )
        return pd.DataFrame({"episode_uuid": g.index, "entity_edges_json": g.values})

    inv = bucketed_group_apply(
        prov.map_batches(explode, batch_format="pyarrow"), ["episode_uuid"], collect
    )

    eps_ds = gio.read_table_dir_ds(src_dir, "episodes")

    def stringify_ee(t: pa.Table) -> pa.Table:
        # list<string> does not survive the pandas bucket shuffle inside
        # hash_join — ride the stored order through as a JSON string
        js = [
            json.dumps([str(x) for x in (l or [])])
            for l in t.column("entity_edges").to_pylist()
        ]
        t = t.drop_columns(["entity_edges"])
        return t.append_column("stored_ee_json", pa.array(js, pa.string()))

    joined = hash_join(
        eps_ds.map_batches(stringify_ee, batch_format="pyarrow"),
        inv,
        "uuid",
        "episode_uuid",
        how="left",
        right_types={"episode_uuid": pa.string(), "entity_edges_json": pa.string()},
    )

    def _merge_ee(stored_js: str, derived_js: str) -> str:
        derived = set(json.loads(derived_js) if derived_js else [])
        stored = json.loads(stored_js) if stored_js else []
        out = [x for x in stored if x in derived]
        seen = set(out)
        out += sorted(x for x in derived if x not in seen)
        return json.dumps(out)

    def finish_episodes(t: pa.Table) -> pa.Table:
        ee = [
            _merge_ee(s, d)
            for s, d in zip(
                t.column("stored_ee_json").to_pylist(),
                t.column("entity_edges_json").to_pylist(),
            )
        ]
        return pa.table(
            {
                "uuid": t.column("uuid"),
                "name": t.column("name"),
                "content": t.column("content"),
                "source": t.column("source"),
                "source_description": t.column("source_description"),
                "group_id": t.column("group_id"),
                "created_at": _ts_s(t.column("created_at")),
                "valid_at": _ts_s(t.column("valid_at")),
                "entity_edges": pa.array(ee, pa.string()),
            }
        )

    stats["episodes"] = _write_single_parquet(
        joined.map_batches(finish_episodes, batch_format="pyarrow"),
        os.path.join(out_dir, "episodes.parquet"),
    )

    com_root = os.path.join(src_dir, "communities")
    if _split_has_parquet(com_root):

        def export_com(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "uuid": t.column("uuid"),
                    "name": t.column("name"),
                    "group_id": t.column("group_id"),
                    "created_at": _ts_s(t.column("created_at")),
                    "name_embedding": _var_list(t.column("name_embedding")),
                    "summary": t.column("summary"),
                }
            )

        com = gio.read_table_dir_ds(src_dir, "communities").map_batches(
            export_com, batch_format="pyarrow"
        )
        stats["communities"] = _write_single_parquet(
            com, os.path.join(out_dir, "communities.parquet")
        )
    return stats
