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
