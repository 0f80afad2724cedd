"""Edge pointer rewrite, dedup-upsert and bi-temporal invalidation
(SURVEY.md J2 + D3 + A3 + TS1-TS4) — shuffle #2.

- **Rewrite (J2)**: map triple endpoints through the canonical map
  (``resolve_edge_pointers``, bulk_utils.py:476-483). Small map → broadcast
  via ``ray.put`` once, dict lookup per batch inside ``map_batches`` (no
  shuffle). Large map → hash-join path (``rewrite_via_join``).
- **Dedup merge (D3/A3)**: ``groupby((group_id, src_uuid, pred, obj_uuid))``
  → one EntityEdge per canonical triple: ``valid_at = min`` over
  occurrences, ``fact`` from the earliest (valid_at, episode) occurrence,
  ``episodes`` = sorted union of provenance episode uuids (the reference's
  "keep existing, append episode uuid" upsert, edge_operations.py:468-475 +
  deduplicator.py:631-667, made order-independent and idempotent).
- **Invalidation (TS2-TS4)**: for *functional* predicates (one subject per
  object at a time, e.g. IS_CEO_OF), ``groupby((group_id, pred, obj_uuid))``
  and sweep in deterministic order (valid_at, then src_uuid): each edge's
  ``invalid_at`` = the next edge's ``valid_at`` ("more recent info wins",
  edge_operations.py:381-411 + 513-527), ``expired_at`` = run time
  (TS2, edge_operations.py:510-511). Non-functional predicates pass through
  untouched (non-overlapping facts are left alone).

Determinism: the sweep order (valid_at, src_uuid) is fixed so results are
reproducible under any partitioning (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..ids import md5_id, relation_uuid
from .canonicalize import SEP

FUNCTIONAL_PREDS = frozenset({"IS_CEO_OF"})


class CanonicalRewrite:
    """map_batches stage: triples batch → endpoints rewritten to canonical
    (uuid, name). ``map_ref`` is a ``ray.put`` ObjectRef of the dict
    {(group, label, surface) key → (canon_name, canon_uuid)} — fetched once
    per worker, zero-copy from the local object store thereafter."""

    def __init__(self, map_ref):
        self._map = ray.get(map_ref) if not isinstance(map_ref, dict) else map_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self._map
        g = batch.column("group_id").to_pylist()
        sl = batch.column("subj_label").to_pylist()
        ss = batch.column("subj_surface").to_pylist()
        ol = batch.column("obj_label").to_pylist()
        os_ = batch.column("obj_surface").to_pylist()
        src_u, src_n, dst_u, dst_n = [], [], [], []
        for gi, a, b, c, d in zip(g, sl, ss, ol, os_):
            cn, cu = m.get(f"{gi}{SEP}{a}{SEP}{b}", (b, None))
            src_n.append(cn)
            src_u.append(cu if cu else md5_id(f"ent:{gi}:{a}:{b}"))
            cn, cu = m.get(f"{gi}{SEP}{c}{SEP}{d}", (d, None))
            dst_n.append(cn)
            dst_u.append(cu if cu else md5_id(f"ent:{gi}:{c}:{d}"))
        out = batch.drop_columns(["subj_surface", "obj_surface"])
        out = out.append_column("src_uuid", pa.array(src_u, pa.string()))
        out = out.append_column("src_name", pa.array(src_n, pa.string()))
        out = out.append_column("obj_uuid", pa.array(dst_u, pa.string()))
        out = out.append_column("obj_name", pa.array(dst_n, pa.string()))
        return out


def canon_map_dict(canon_map: pd.DataFrame) -> dict[str, tuple[str, str]]:
    return {
        f"{g}{SEP}{l}{SEP}{s}": (cn, cu)
        for g, l, s, cn, cu in zip(
            canon_map["group_id"], canon_map["label"], canon_map["surface"],
            canon_map["canon_name"], canon_map["canon_uuid"],
        )
    }


def rewrite_via_join(triples: "ray.data.Dataset", canon_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Hash-join rewrite path for canonical maps too big to broadcast.

    Tags triples and map rows with the mention key, co-groups with one
    ``groupby(key)`` per endpoint, and emits rewritten rows — two shuffles,
    no driver materialization. Used when |map| ≳ 10⁷ (SURVEY.md §7.4
    "Canonical-map size")."""

    def tag_map(t: pa.Table) -> pa.Table:
        keys = [
            f"{g}{SEP}{l}{SEP}{s}"
            for g, l, s in zip(
                t.column("group_id").to_pylist(), t.column("label").to_pylist(), t.column("surface").to_pylist()
            )
        ]
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "canon_name": t.column("canon_name"),
                "canon_uuid": t.column("canon_uuid"),
            }
        )

    map_tagged = canon_ds.map_batches(tag_map, batch_format="pyarrow")

    def join_side(side: str):
        surf_col = f"{side}_surface"
        lab_col = f"{side}_label"

        def tag_triples(t: pa.Table) -> pa.Table:
            keys = [
                f"{g}{SEP}{l}{SEP}{s}"
                for g, l, s in zip(
                    t.column("group_id").to_pylist(), t.column(lab_col).to_pylist(), t.column(surf_col).to_pylist()
                )
            ]
            return t.append_column("key", pa.array(keys, pa.string()))

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            is_map = g["canon_uuid"].notna()
            rows = g[~is_map].copy()
            if rows.empty:
                return rows.drop(columns=["key"])
            if is_map.any():
                rows[f"{side}_name"] = g.loc[is_map, "canon_name"].iloc[0]
                rows[f"{side}_uuid"] = g.loc[is_map, "canon_uuid"].iloc[0]
            else:
                rows[f"{side}_name"] = rows[surf_col]
                rows[f"{side}_uuid"] = [
                    md5_id(f"ent:{gi}:{l}:{s}")
                    for gi, l, s in zip(rows["group_id"], rows[lab_col], rows[surf_col])
                ]
            return rows.drop(columns=["key"])

        return tag_triples, merge

    out = triples
    for side in ("subj", "obj"):
        tag_triples, merge = join_side(side)
        tagged = out.map_batches(tag_triples, batch_format="pyarrow")
        # union with map rows (schema-aligned via pandas concat inside groups)
        combined = tagged.union(map_tagged)
        out = combined.groupby("key").map_groups(merge, batch_format="pandas")
    ren = {"subj_uuid": "src_uuid", "subj_name": "src_name"}
    return out.map_batches(
        lambda t: t.rename_columns([ren.get(c, c) for c in t.column_names]).drop_columns(
            ["subj_surface", "obj_surface"]
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# dedup merge + invalidation
# ---------------------------------------------------------------------------

def merge_edge_group(g: pd.DataFrame) -> pd.DataFrame:
    """One canonical triple's occurrences → one EntityEdge row."""
    g = g.sort_values(["valid_at", "episode_uuid"], kind="mergesort")
    first = g.iloc[0]
    episodes = sorted(set(g["episode_uuid"]))
    valid_at = pd.Timestamp(g["valid_at"].iloc[0]).as_unit("us")
    va_us = int(pd.Timestamp(valid_at).value // 1000)
    uuid = relation_uuid(first["group_id"], first["src_uuid"], first["pred"], first["obj_uuid"], va_us)
    return pd.DataFrame(
        {
            "uuid": [uuid],
            "source_uuid": [first["src_uuid"]],
            "source_name": [first["src_name"]],
            "target_uuid": [first["obj_uuid"]],
            "target_name": [first["obj_name"]],
            "name": [first["pred"]],
            "fact": [first["fact"]],
            "group_id": [first["group_id"]],
            "valid_at": [valid_at],
            "episodes": [",".join(episodes)],
            "n_occurrences": [len(g)],
        }
    )


def dedup_edges(rewritten: "ray.data.Dataset") -> "ray.data.Dataset":
    """groupby((group_id, src, pred, obj)) → merged edges (shuffle #2)."""
    return rewritten.groupby(["group_id", "src_uuid", "pred", "obj_uuid"]).map_groups(
        merge_edge_group, batch_format="pandas"
    )


def invalidate_group(g: pd.DataFrame) -> pd.DataFrame:
    """Temporal sweep within (group_id, pred, obj): newer subject wins.

    Deterministic order (valid_at, source_uuid); invalid_at = next
    valid_at (TS3/TS4), expired_at set by caller-injected run_ts (TS2)."""
    g = g.sort_values(["valid_at", "source_uuid"], kind="mergesort").reset_index(drop=True)
    g["invalid_at"] = g["valid_at"].shift(-1).astype("datetime64[us]")
    return g


def invalidate_functional(merged: "ray.data.Dataset", functional_preds=FUNCTIONAL_PREDS) -> "ray.data.Dataset":
    fn = list(functional_preds)

    def is_fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t.column("name"), value_set=pa.array(fn)))

    def not_fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.invert(pc.is_in(t.column("name"), value_set=pa.array(fn)))
        out = t.filter(mask)
        return out.append_column("invalid_at", pa.nulls(out.num_rows, pa.timestamp("us")))

    functional = merged.map_batches(is_fn, batch_format="pyarrow")
    passthrough = merged.map_batches(not_fn, batch_format="pyarrow")
    swept = functional.groupby(["group_id", "name", "target_uuid"]).map_groups(
        invalidate_group, batch_format="pandas"
    )
    return swept.union(passthrough)


def finalize_edges(edges_ds: "ray.data.Dataset", run_ts_us: int) -> "ray.data.Dataset":
    """Add created_at / expired_at / attributes, final column order."""

    def fin(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = t.num_rows
        created = pa.array([run_ts_us] * n, pa.timestamp("us"))
        inv = t.column("invalid_at") if "invalid_at" in t.column_names else pa.nulls(n, pa.timestamp("us"))
        inv = inv.combine_chunks() if isinstance(inv, pa.ChunkedArray) else inv
        inv = inv.cast(pa.timestamp("us"))
        expired = pc.if_else(pc.is_valid(inv), created, pa.nulls(n, pa.timestamp("us")))
        cols = {
            "uuid": t.column("uuid"),
            "source_uuid": t.column("source_uuid"),
            "source_name": t.column("source_name"),
            "target_uuid": t.column("target_uuid"),
            "target_name": t.column("target_name"),
            "name": t.column("name"),
            "fact": t.column("fact"),
            "group_id": t.column("group_id"),
            "created_at": created,
            "episodes": t.column("episodes"),
            "expired_at": expired,
            "valid_at": t.column("valid_at").combine_chunks().cast(pa.timestamp("us")) if isinstance(t.column("valid_at"), pa.ChunkedArray) else t.column("valid_at").cast(pa.timestamp("us")),
            "invalid_at": inv,
            "attributes": pa.array(["{}"] * n, pa.string()),
            "n_occurrences": t.column("n_occurrences"),
        }
        return pa.table(cols)

    return edges_ds.map_batches(fin, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MENTIONS episodic edges (graphiti_core/utils/maintenance/edge_operations.py:48-65)
# ---------------------------------------------------------------------------

def mentions_partial(batch: pa.Table) -> pa.Table:
    """Rewritten-triples batch → partial-distinct (episode, entity) pairs."""
    df = batch.to_pandas()
    a = df[["episode_uuid", "group_id", "src_uuid"]].rename(columns={"src_uuid": "entity_uuid"})
    b = df[["episode_uuid", "group_id", "obj_uuid"]].rename(columns={"obj_uuid": "entity_uuid"})
    both = pd.concat([a, b], ignore_index=True).drop_duplicates(["episode_uuid", "entity_uuid"])
    return pa.Table.from_pandas(both, preserve_index=False)


def mentions_edges(rewritten: "ray.data.Dataset", run_ts_us: int) -> "ray.data.Dataset":
    partial = rewritten.map_batches(mentions_partial, batch_format="pyarrow")

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        r = g.iloc[0]
        return pd.DataFrame(
            {
                "uuid": [md5_id(f"men:{r['episode_uuid']}:{r['entity_uuid']}")],
                "group_id": [r["group_id"]],
                "source_node_uuid": [r["episode_uuid"]],
                "target_node_uuid": [r["entity_uuid"]],
                "created_at": [pd.Timestamp(run_ts_us, unit="us")],
            }
        )

    return partial.groupby(["episode_uuid", "entity_uuid"]).map_groups(emit, batch_format="pandas")
