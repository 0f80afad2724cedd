"""Temporal operators over an event/edge stream (SURVEY.md §2.8 / A7 / TS5-7).

The edges table's valid_at/invalid_at/expired_at columns ARE the temporal
index (no side structure — SURVEY.md ST6); these operators are Arrow
filters and groupby shuffles:

- ``point_in_time``    — TS5: valid_at <= t AND (invalid_at IS NULL OR > t)
- ``bucket_aggregate`` — A7: count/sum per (key, time bucket), partial
  per-batch pre-aggregation before the groupby
- ``interval_sweep``   — TS4 analog on any (key…, ts) stream: within each
  key group sorted by ts, valid_until = next ts (SQL LEAD mirror)
- ``detect_overlaps``  — A9: overlapping-validity conflict detection
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray


def point_in_time(ds: "ray.data.Dataset", t, valid_col: str = "valid_at", invalid_col: str = "invalid_at") -> "ray.data.Dataset":
    """TS5 filter (graphiti_hf temporal_manager.py:310-314 semantics)."""
    ts = pa.scalar(t, pa.timestamp("us"))

    def f(b: pa.Table) -> pa.Table:
        # Kleene logic: TRUE OR NULL must be TRUE (plain pc.or_ yields NULL
        # when invalid_at is null, silently dropping every open interval)
        ok = pc.and_kleene(
            pc.less_equal(b.column(valid_col), ts),
            pc.or_kleene(pc.is_null(b.column(invalid_col)), pc.greater(b.column(invalid_col), ts)),
        )
        return b.filter(ok)

    return ds.map_batches(f, batch_format="pyarrow")


def bucket_aggregate(
    events: "ray.data.Dataset",
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 86400,
) -> "ray.data.Dataset":
    """count + sum(value) per (key, epoch-bucket); partial aggregation inside
    map_batches first so the groupby shuffles one row per (key, bucket,
    input-block) instead of one per event."""

    def partial(b: pa.Table) -> pa.Table:
        df = b.select([key_col, ts_col, value_col]).to_pandas()
        df["bucket"] = (df[ts_col].astype("int64") // 1_000_000) // bucket_seconds
        g = df.groupby([key_col, "bucket"], as_index=False).agg(
            n=(value_col, "size"), total=(value_col, "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby([key_col, "bucket"], as_index=False, sort=False).agg(
            n=("n", "sum"), total=("total", "sum")
        )
        out["total"] = out["total"].round(6)
        return out

    from ..stages.shuffle import bucketed_group_apply

    return bucketed_group_apply(
        events.map_batches(partial, batch_format="pyarrow"), [key_col, "bucket"], merge
    )


def interval_sweep(
    events: "ray.data.Dataset", key_cols: list[str], ts_col: str = "ts", id_col: str = "event_id"
) -> "ray.data.Dataset":
    """TS4-shaped sweep: per key group ordered by (ts, id), each row's
    ``valid_until`` = next row's ts (NULL for the latest) — 'more recent
    info wins' (edge_operations.py:381-411)."""

    def sweep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col, id_col], kind="mergesort").reset_index(drop=True)
        df["valid_until"] = df.groupby(key_cols, sort=False)[ts_col].shift(-1)
        return df

    from ..stages.shuffle import bucketed_group_apply

    return bucketed_group_apply(events, key_cols, sweep)


def detect_overlaps(
    edges: "ray.data.Dataset",
    key_cols: list[str],
    valid_col: str = "valid_at",
    invalid_col: str = "invalid_at",
    id_col: str | None = None,
) -> "ray.data.Dataset":
    """A9 conflict detection (temporal_manager.py:713-772 shape): within
    each key group, a row CONFLICTS when its start precedes the running max
    end of all earlier intervals (sweep-line; vectorized cummax per group).
    NULL invalid = open interval = +inf. Returns one row per key:
    (key…, n_overlaps, n_edges)."""

    def check(df: pd.DataFrame) -> pd.DataFrame:
        sort_cols = [*key_cols, valid_col] + ([id_col] if id_col else [])
        df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        end = df[invalid_col].fillna(pd.Timestamp.max)
        run_max_prev = end.groupby([df[k] for k in key_cols], sort=False).transform(
            lambda s: s.cummax().shift(1)
        )
        conflict = run_max_prev.notna() & (df[valid_col] < run_max_prev)
        df = df.assign(_c=conflict.astype(int))
        return df.groupby(key_cols, as_index=False, sort=False).agg(
            n_overlaps=("_c", "sum"), n_edges=("_c", "size")
        )

    from ..stages.shuffle import bucketed_group_apply

    return bucketed_group_apply(edges, key_cols, check)
