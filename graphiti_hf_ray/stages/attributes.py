"""Typed attribute hydration (SURVEY.md §2 M4/M5).

The reference extracts per-label Pydantic attributes from episode content
after canonicalization (node_operations.py:302-391 ``extract_attributes``;
edge attribute hydration edge_operations.py:482-501) via an LLM call. The
rebuild replaces the LLM with deterministic rule-based extractors over the
canonical graph — the same surface (attributes land in the ``attributes``
JSON column of the built-in catalog types, ``state/types.py``), declared
as a RULE TABLE covering the built-in catalog (reference built-ins
custom_types.py:212-375):

- ``Person.location``          ← object of the LATEST ``MOVED_TO`` edge
- ``Person.employer``          ← object of the latest ``WORKS_AT`` edge
- ``Person.project``           ← object of the latest ``COLLABORATES_ON`` edge
- ``Organization.founded_by``  ← subject of the latest ``FOUNDED`` edge
- ``Organization.ceo``         ← subject of the latest ``IS_CEO_OF`` edge
- ``Project.lead``             ← subject of the latest ``COLLABORATES_ON`` edge
- ``Document.author``          ← object of the latest ``AUTHORED_BY`` edge
- ``Event.organizer``          ← subject of the latest ``PARTICIPATES_IN`` edge
- ``WORKS_AT.start_date``      ← date the merged edge first became true
- ``FOUNDED.year``             ← year the merged edge first became true
- ``AUTHORED_BY.publication_date`` ← date the merged edge first became true

11 rules across 5 entity types + 3 edge types — one per built-in catalog
type (custom_types.py:212-375), all riding the same fused shuffle.

"Latest" = max ``valid_at`` over the entity's merged edges of that
predicate (merged valid_at is already min-over-occurrences), tie → the
lexicographically smallest counterpart name.

Shuffle shape — shared by ALL node rules, adding a rule costs nothing:
edges explode into (key_uuid, attr, value_uuid) rows per matching rule in
one ``map_batches`` pass, ONE partitioned hash join resolves value names,
ONE bucketed argmax reduce (with per-batch partials) picks each latest
value. No driver materialization, no full-width scans (callers pass pruned
column sets).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray


@dataclass(frozen=True)
class NodeAttrRule:
    attr: str          # attribute key written into the JSON object
    pred: str          # edge predicate the rule reads
    keyed_on: str      # 'source' | 'target': which endpoint gets the attr
    require_label: str # only nodes carrying this label are hydrated


NODE_ATTR_RULES: tuple[NodeAttrRule, ...] = (
    NodeAttrRule("location", "MOVED_TO", "source", "Person"),
    NodeAttrRule("employer", "WORKS_AT", "source", "Person"),
    NodeAttrRule("founded_by", "FOUNDED", "target", "Organization"),
    NodeAttrRule("ceo", "IS_CEO_OF", "target", "Organization"),
    NodeAttrRule("project", "COLLABORATES_ON", "source", "Person"),
    NodeAttrRule("lead", "COLLABORATES_ON", "target", "Project"),
    NodeAttrRule("author", "AUTHORED_BY", "source", "Document"),
    NodeAttrRule("organizer", "PARTICIPATES_IN", "target", "Event"),
)

_RULE_LABEL = {r.attr: r.require_label for r in NODE_ATTR_RULES}

# edge rules: predicate → (attr key, vectorized valid_at formatter)
EDGE_ATTR_RULES: dict[str, tuple[str, str]] = {
    # fmt is a strftime pattern; 'year' values are written as JSON ints
    "WORKS_AT": ("start_date", "%Y-%m-%d"),
    "FOUNDED": ("year", "%Y"),
    "AUTHORED_BY": ("publication_date", "%Y-%m-%d"),
}
_INT_EDGE_ATTRS = frozenset({"year"})


def _pick_latest(df: pd.DataFrame) -> pd.DataFrame:
    """Associative reducer: per (group_id, key_uuid, attr) keep the row with
    max valid_at, tie → min value name. Used both as the per-batch partial
    and the per-bucket merge (idempotent under re-application)."""
    df = df.sort_values(
        ["group_id", "key_uuid", "attr", "valid_at", "value"],
        ascending=[True, True, True, False, True],
        kind="mergesort",
    )
    return df.drop_duplicates(["group_id", "key_uuid", "attr"])[
        ["group_id", "key_uuid", "attr", "valid_at", "value"]
    ]


def node_attr_values(edges: "ray.data.Dataset", nodes: "ray.data.Dataset") -> "ray.data.Dataset":
    """(group_id, key_uuid, attr, value): every node-attribute rule's chosen
    value, computed in one fused pass. ``edges`` needs columns (group_id,
    source_uuid, target_uuid, name, valid_at); ``nodes`` needs (uuid, name)."""
    from ..functions.joins import hash_join
    from ..stages.shuffle import bucketed_group_apply

    def explode(t: pa.Table) -> pa.Table:
        outs = []
        for rule in NODE_ATTR_RULES:
            m = t.filter(pc.equal(t.column("name"), pa.scalar(rule.pred)))
            key_col, val_col = (
                ("source_uuid", "target_uuid") if rule.keyed_on == "source" else ("target_uuid", "source_uuid")
            )
            outs.append(
                pa.table(
                    {
                        "group_id": m.column("group_id"),
                        "key_uuid": m.column(key_col),
                        "attr": pa.array([rule.attr] * m.num_rows, pa.string()),
                        "value_uuid": m.column(val_col),
                        "valid_at": m.column("valid_at"),
                    }
                )
            )
        return pa.concat_tables(outs)

    import ray.data as rd

    # typed empty seeds keep the dataset schema known even when the filters
    # match zero rows — Ray reports a None schema for a fully-empty map
    # output, which the join's null-padding cannot work from
    seed = rd.from_arrow(
        pa.table(
            {
                "group_id": pa.array([], pa.string()),
                "key_uuid": pa.array([], pa.string()),
                "attr": pa.array([], pa.string()),
                "value_uuid": pa.array([], pa.string()),
                "valid_at": pa.array([], pa.timestamp("us")),
            }
        )
    )
    name_seed = rd.from_arrow(
        pa.table({"n_uuid": pa.array([], pa.string()), "value": pa.array([], pa.string())})
    )
    exploded = seed.union(edges.map_batches(explode, batch_format="pyarrow"))
    names = name_seed.union(
        nodes.map_batches(
            lambda t: pa.table({"n_uuid": t.column("uuid"), "value": t.column("name")}),
            batch_format="pyarrow",
        )
    )
    joined = hash_join(
        exploded, names, "value_uuid", "n_uuid",
        left_types={
            "group_id": pa.string(), "key_uuid": pa.string(), "attr": pa.string(),
            "value_uuid": pa.string(), "valid_at": pa.timestamp("us"),
        },
        right_types={"n_uuid": pa.string(), "value": pa.string()},
    )
    partial = joined.map_batches(lambda df: _pick_latest(df), batch_format="pandas")
    latest = bucketed_group_apply(partial, ["group_id", "key_uuid", "attr"], _pick_latest)
    return latest.select_columns(["group_id", "key_uuid", "attr", "value"])


def _edge_attr_table(t: pa.Table) -> pa.Table:
    """Edge-rule rows for one batch: (group_id, uuid, attributes JSON)."""
    parts = []
    for pred, (attr, fmt) in EDGE_ATTR_RULES.items():
        m = t.filter(pc.equal(t.column("name"), pa.scalar(pred)))
        vals = pd.Series(m.column("valid_at").to_pandas()).dt.strftime(fmt)
        if attr in _INT_EDGE_ATTRS:
            attrs = [json.dumps({attr: int(v)}) for v in vals]
        else:
            attrs = [json.dumps({attr: v}) for v in vals]
        parts.append(
            pa.table(
                {
                    "group_id": m.column("group_id"),
                    "uuid": m.column("uuid"),
                    "attributes": pa.array(attrs, pa.string()),
                }
            )
        )
    return pa.concat_tables(parts)


def typed_attribute_rows(
    edges: "ray.data.Dataset", nodes: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Narrow hydration view: one row per extracted attribute object —
    (kind 'node'|'edge', group_id, uuid, attributes JSON with that single
    key). The driver query shape; ``hydrate_node_attributes`` merges the
    same objects into the full nodes table."""

    def node_rows(t: pa.Table) -> pa.Table:
        attrs = [
            json.dumps({a: v})
            for a, v in zip(t.column("attr").to_pylist(), t.column("value").to_pylist())
        ]
        return pa.table(
            {
                "kind": pa.array(["node"] * t.num_rows, pa.string()),
                "group_id": t.column("group_id"),
                "uuid": t.column("key_uuid"),
                "attributes": pa.array(attrs, pa.string()),
            }
        )

    def edge_rows(t: pa.Table) -> pa.Table:
        e = _edge_attr_table(t)
        return pa.table(
            {
                "kind": pa.array(["edge"] * e.num_rows, pa.string()),
                "group_id": e.column("group_id"),
                "uuid": e.column("uuid"),
                "attributes": e.column("attributes"),
            }
        )

    node_part = node_attr_values(edges, nodes).map_batches(node_rows, batch_format="pyarrow")
    edge_part = edges.map_batches(edge_rows, batch_format="pyarrow")
    return node_part.union(edge_part)


def hydrate_node_attributes(
    nodes: "ray.data.Dataset", edges: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Full nodes table with the ``attributes`` JSON column populated from
    content-derived rules (node_operations.py:302-391 surface). Existing
    attribute objects are merged, extracted keys win; each rule only fires
    for nodes carrying its required label.

    The ``labels`` list column is csv-serialized around the join shuffle
    (list-typed object columns don't survive the pandas bucket bodies, and
    shuffling scalars is cheaper anyway); label names contain no commas by
    the type-registry grammar. Per-node attr/value pairs are packed into a
    single JSON string the same way for the join."""
    from ..functions.joins import hash_join
    from ..stages.shuffle import bucketed_group_apply

    def pack_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["group_id", "key_uuid"], sort=False)[["attr", "value"]]
            .apply(lambda g: json.dumps(dict(zip(g["attr"], g["value"])), sort_keys=True))
            .reset_index(name="_pairs")
        )
        return out[["key_uuid", "_pairs"]]

    pairs = bucketed_group_apply(
        node_attr_values(edges, nodes), ["group_id", "key_uuid"], pack_pairs
    )

    def pack(t: pa.Table) -> pa.Table:
        csv = [",".join(ls or []) for ls in t.column("labels").to_pylist()]
        return t.drop_columns(["labels"]).append_column("_labels_csv", pa.array(csv, pa.string()))

    joined = hash_join(
        nodes.map_batches(pack, batch_format="pyarrow"), pairs, "uuid", "key_uuid", how="left",
        right_types={"key_uuid": pa.string(), "_pairs": pa.string()},
    )

    def fill(t: pa.Table) -> pa.Table:
        attrs = t.column("attributes").to_pylist()
        pair_strs = t.column("_pairs").to_pylist()
        labels = [(s.split(",") if s else []) for s in t.column("_labels_csv").to_pylist()]
        out = []
        for a, ps, ls in zip(attrs, pair_strs, labels):
            obj = json.loads(a) if a else {}
            if ps:
                for attr, val in json.loads(ps).items():
                    if _RULE_LABEL[attr] in ls:
                        obj[attr] = val
            out.append(json.dumps(obj, sort_keys=True))
        idx = t.schema.get_field_index("attributes")
        t = t.set_column(idx, "attributes", pa.array(out, pa.string()))
        t = t.append_column("labels", pa.array(labels, pa.list_(pa.string())))
        return t.drop_columns(["_pairs", "_labels_csv"])

    return joined.map_batches(fill, batch_format="pyarrow")


def hydrate_edge_attributes(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Edges table with typed attributes populated (edge_operations.py:
    482-501 surface): every EDGE_ATTR_RULES predicate gets its derived
    key merged into the existing attributes object."""

    def fill(t: pa.Table) -> pa.Table:
        names = t.column("name").to_pylist()
        valid = pd.Series(t.column("valid_at").to_pandas())
        attrs = t.column("attributes").to_pylist()
        fmt_cache = {
            pred: valid.dt.strftime(fmt) for pred, (_, fmt) in EDGE_ATTR_RULES.items()
        }
        out = []
        for i, (nm, a) in enumerate(zip(names, attrs)):
            obj = json.loads(a) if a else {}
            rule = EDGE_ATTR_RULES.get(nm)
            if rule is not None:
                attr, _ = rule
                v = fmt_cache[nm].iloc[i]
                if isinstance(v, str):
                    obj[attr] = int(v) if attr in _INT_EDGE_ATTRS else v
            out.append(json.dumps(obj, sort_keys=True))
        idx = t.schema.get_field_index("attributes")
        return t.set_column(idx, "attributes", pa.array(out, pa.string()))

    return edges.map_batches(fill, batch_format="pyarrow")
