"""Typed attribute hydration (SURVEY.md §2 M4/M5).

The reference extracts per-label Pydantic attributes from episode content
after canonicalization (node_operations.py:302-391 ``extract_attributes``;
edge attribute hydration edge_operations.py:482-501) via an LLM call. The
rebuild replaces the LLM with deterministic rule-based extractors over the
canonical graph — the same surface (attributes land in the ``attributes``
JSON column of the built-in catalog types, ``state/types.py``):

- ``Person.location``     ← object name of the entity's LATEST ``MOVED_TO``
  edge (max ``valid_at``; tie → lexicographically smallest place name).
- ``WORKS_AT.start_date`` ← date of the edge's earliest observed occurrence
  (the merged edge's ``valid_at`` is already min-over-occurrences).

Shuffle shape: one partitioned hash join (MOVED_TO edges → place names,
both sides streamed) + one bucketed argmax reduce with per-batch partials
— no driver materialization, no full-width scans (callers pass pruned
column sets). Custom extractors register per label/predicate the same way
the reference's Pydantic models do.
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _pick_latest(df: pd.DataFrame) -> pd.DataFrame:
    """Associative reducer: per (group_id, source_uuid) keep the row with
    max valid_at, tie → min place. Used both as the per-batch partial and
    the per-bucket merge (idempotent under re-application)."""
    df = df.sort_values(
        ["group_id", "source_uuid", "valid_at", "place"],
        ascending=[True, True, False, True],
        kind="mergesort",
    )
    return df.drop_duplicates(["group_id", "source_uuid"])[
        ["group_id", "source_uuid", "valid_at", "place"]
    ]


def latest_moved_to(edges: "ray.data.Dataset", nodes: "ray.data.Dataset") -> "ray.data.Dataset":
    """(group_id, source_uuid, place): each entity's latest MOVED_TO target
    name. ``edges`` needs columns (group_id, source_uuid, target_uuid, name,
    valid_at); ``nodes`` needs (uuid, name)."""
    from ..functions.joins import hash_join
    from ..stages.shuffle import bucketed_group_apply

    def mv(t: pa.Table) -> pa.Table:
        m = t.filter(pc.equal(t.column("name"), pa.scalar("MOVED_TO")))
        return pa.table(
            {
                "group_id": m.column("group_id"),
                "source_uuid": m.column("source_uuid"),
                "target_uuid": m.column("target_uuid"),
                "valid_at": m.column("valid_at"),
            }
        )

    def place_side(t: pa.Table) -> pa.Table:
        return pa.table({"p_uuid": t.column("uuid"), "place": t.column("name")})

    import ray.data as rd

    # typed empty seeds keep the dataset schema known even when the filter
    # matches zero rows — Ray reports a None schema for a fully-empty map
    # output, which the join's null-padding cannot work from
    moved_seed = rd.from_arrow(
        pa.table(
            {
                "group_id": pa.array([], pa.string()),
                "source_uuid": pa.array([], pa.string()),
                "target_uuid": pa.array([], pa.string()),
                "valid_at": pa.array([], pa.timestamp("us")),
            }
        )
    )
    place_seed = rd.from_arrow(
        pa.table({"p_uuid": pa.array([], pa.string()), "place": pa.array([], pa.string())})
    )
    moved = moved_seed.union(edges.map_batches(mv, batch_format="pyarrow"))
    places = place_seed.union(nodes.map_batches(place_side, batch_format="pyarrow"))
    joined = hash_join(
        moved, places, "target_uuid", "p_uuid",
        left_types={
            "group_id": pa.string(), "source_uuid": pa.string(),
            "target_uuid": pa.string(), "valid_at": pa.timestamp("us"),
        },
        right_types={"p_uuid": pa.string(), "place": pa.string()},
    )

    partial = joined.map_batches(
        lambda df: _pick_latest(df), batch_format="pandas"
    )
    latest = bucketed_group_apply(partial, ["group_id", "source_uuid"], _pick_latest)
    return latest.select_columns(["group_id", "source_uuid", "place"])


def typed_attribute_rows(
    edges: "ray.data.Dataset", nodes: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Narrow hydration view: one row per extracted attribute object —
    (kind 'node'|'edge', group_id, uuid, attributes JSON). The driver query
    shape; ``hydrate_node_attributes`` merges the same objects into the
    full nodes table."""

    def node_rows(t: pa.Table) -> pa.Table:
        places = t.column("place").to_pylist()
        attrs = [json.dumps({"location": p}) for p in places]
        return pa.table(
            {
                "kind": pa.array(["node"] * t.num_rows, pa.string()),
                "group_id": t.column("group_id"),
                "uuid": t.column("source_uuid"),
                "attributes": pa.array(attrs, pa.string()),
            }
        )

    def edge_rows(t: pa.Table) -> pa.Table:
        m = t.filter(pc.equal(t.column("name"), pa.scalar("WORKS_AT")))
        dates = pd.Series(m.column("valid_at").to_pandas()).dt.strftime("%Y-%m-%d")
        attrs = [json.dumps({"start_date": d}) for d in dates]
        return pa.table(
            {
                "kind": pa.array(["edge"] * m.num_rows, pa.string()),
                "group_id": m.column("group_id"),
                "uuid": m.column("uuid"),
                "attributes": pa.array(attrs, pa.string()),
            }
        )

    node_part = latest_moved_to(edges, nodes).map_batches(node_rows, batch_format="pyarrow")
    edge_part = edges.map_batches(edge_rows, batch_format="pyarrow")
    return node_part.union(edge_part)


def hydrate_node_attributes(
    nodes: "ray.data.Dataset", edges: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Full nodes table with the ``attributes`` JSON column populated from
    content-derived rules (node_operations.py:302-391 surface). Existing
    attribute objects are merged, extracted keys win.

    The ``labels`` list column is csv-serialized around the join shuffle
    (list-typed object columns don't survive the pandas bucket bodies, and
    shuffling scalars is cheaper anyway); label names contain no commas by
    the type-registry grammar."""
    from ..functions.joins import hash_join

    latest = latest_moved_to(edges, nodes).map_batches(
        lambda t: pa.table({"l_uuid": t.column("source_uuid"), "place": t.column("place")}),
        batch_format="pyarrow",
    )

    def pack(t: pa.Table) -> pa.Table:
        csv = [",".join(ls or []) for ls in t.column("labels").to_pylist()]
        return t.drop_columns(["labels"]).append_column("_labels_csv", pa.array(csv, pa.string()))

    joined = hash_join(
        nodes.map_batches(pack, batch_format="pyarrow"), latest, "uuid", "l_uuid", how="left",
        right_types={"l_uuid": pa.string(), "place": pa.string()},
    )

    def fill(t: pa.Table) -> pa.Table:
        attrs = t.column("attributes").to_pylist()
        places = t.column("place").to_pylist()
        labels = [(s.split(",") if s else []) for s in t.column("_labels_csv").to_pylist()]
        out = []
        for a, p, ls in zip(attrs, places, labels):
            obj = json.loads(a) if a else {}
            if p is not None and "Person" in ls:
                obj["location"] = p
            out.append(json.dumps(obj, sort_keys=True))
        idx = t.schema.get_field_index("attributes")
        t = t.set_column(idx, "attributes", pa.array(out, pa.string()))
        t = t.append_column("labels", pa.array(labels, pa.list_(pa.string())))
        return t.drop_columns(["place", "_labels_csv"])

    return joined.map_batches(fill, batch_format="pyarrow")


def hydrate_edge_attributes(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Edges table with typed attributes populated (edge_operations.py:
    482-501 surface): WORKS_AT rows get {"start_date": <valid_at date>}."""

    def fill(t: pa.Table) -> pa.Table:
        names = t.column("name").to_pylist()
        valid = pd.Series(t.column("valid_at").to_pandas())
        dates = valid.dt.strftime("%Y-%m-%d")
        attrs = t.column("attributes").to_pylist()
        out = []
        for nm, a, d in zip(names, attrs, dates):
            obj = json.loads(a) if a else {}
            if nm == "WORKS_AT" and isinstance(d, str):
                obj["start_date"] = d
            out.append(json.dumps(obj, sort_keys=True))
        idx = t.schema.get_field_index("attributes")
        return t.set_column(idx, "attributes", pa.array(out, pa.string()))

    return edges.map_batches(fill, batch_format="pyarrow")
