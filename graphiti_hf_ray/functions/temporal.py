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


def rolling_window_aggregate(
    events: "ray.data.Dataset",
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 86400,
    window_buckets: int = 7,
) -> "ray.data.Dataset":
    """Sliding-window aggregate: per (key, bucket), the event count over
    the trailing ``window_buckets`` buckets (calendar window — missing
    buckets contribute zero). Two-level shape: the tumbling
    ``bucket_aggregate`` pre-reduces the stream to one row per (key,
    bucket), then one bucketed shuffle per key computes every trailing
    window with a vectorized prefix-sum + searchsorted — no per-window
    rescan, no window explosion in the shuffle."""
    import numpy as np

    daily = bucket_aggregate(events, key_col, ts_col, value_col, bucket_seconds)

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby(key_col, sort=False):
            g = g.sort_values("bucket", kind="mergesort").reset_index(drop=True)
            b = g["bucket"].to_numpy()
            cum = g["n"].to_numpy().cumsum()
            lo = np.searchsorted(b, b - window_buckets + 1, side="left")
            prev = np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0)
            g["n_window"] = cum - prev
            outs.append(g[[key_col, "bucket", "n_window"]])
        if not outs:
            return pd.DataFrame({key_col: [], "bucket": [], "n_window": []})
        return pd.concat(outs, ignore_index=True)

    from ..stages.shuffle import bucketed_group_apply

    return bucketed_group_apply(daily, [key_col], roll)


RESOLUTION_STRATEGIES = ("first_wins", "last_wins", "merge", "invalidate", "manual")


def resolve_conflicts(
    edges: "ray.data.Dataset",
    key_cols: list[str],
    strategy: str = "last_wins",
    valid_col: str = "valid_at",
    invalid_col: str = "invalid_at",
    id_col: str = "uuid",
) -> "ray.data.Dataset":
    """TS7 parameterized conflict resolution (temporal_manager.py:1032-1113
    strategies FIRST_WINS/LAST_WINS/MERGE/INVALIDATE/MANUAL over overlap
    clusters).

    Within each key group, rows are sorted by (valid_at, id) and overlap
    CLUSTERS are found sweep-line style (a row joins the open cluster when
    its start precedes the running max end; NULL invalid = open = +inf) —
    the gaps-and-islands shape, vectorized per hash bucket. Then per
    cluster:

    - ``first_wins``  — keep the earliest (valid_at, id) row, invalidate
                        the rest (temporal_manager.py:1786-1806)
    - ``last_wins``   — keep the latest, invalidate the rest (:1808-1828)
    - ``merge``       — keep the earliest row as carrier, widen it to the
                        cluster's [min start, max end] (open if any end is
                        open), mark the rest merged (:1830-1852 +
                        _merge_temporal_records)
    - ``invalidate``  — invalidate every row of a multi-row cluster
                        (:1854-1868)
    - ``manual``      — no mutation; flag multi-row clusters for attention
                        (:1870-1884)

    Output = input columns + (cluster, n_cluster, status) where status ∈
    {kept, invalidated, merged, flagged}; singleton clusters are always
    ``kept``. For ``merge`` the kept row's interval is widened in place.
    """
    if strategy not in RESOLUTION_STRATEGIES:
        raise ValueError(f"unknown strategy {strategy!r} (have {RESOLUTION_STRATEGIES})")

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([*key_cols, valid_col, id_col], kind="mergesort").reset_index(drop=True)
        end = df[invalid_col].fillna(pd.Timestamp.max)
        gb = [df[k] for k in key_cols]
        run_max_prev = end.groupby(gb, sort=False).transform(lambda s: s.cummax().shift(1))
        new_cluster = (run_max_prev.isna() | (df[valid_col] >= run_max_prev)).astype(int)
        df["cluster"] = new_cluster.groupby(gb, sort=False).cumsum()
        cg = df.groupby([*key_cols, "cluster"], sort=False)
        df["n_cluster"] = cg[id_col].transform("size")
        pos = cg.cumcount()
        multi = df["n_cluster"] > 1
        first = pos == 0
        last = pos == df["n_cluster"] - 1
        status = pd.Series("kept", index=df.index)
        if strategy == "first_wins":
            status[multi & ~first] = "invalidated"
        elif strategy == "last_wins":
            status[multi & ~last] = "invalidated"
        elif strategy == "invalidate":
            status[multi] = "invalidated"
        elif strategy == "manual":
            status[multi] = "flagged"
        elif strategy == "merge":
            status[multi & ~first] = "merged"
            # widen the carrier row to the cluster envelope
            env_start = cg[valid_col].transform("min")
            has_open = cg[invalid_col].transform(lambda s: s.isna().any())
            env_end = cg[invalid_col].transform("max")
            carrier = multi & first
            df.loc[carrier, valid_col] = env_start[carrier]
            df.loc[carrier, invalid_col] = env_end[carrier].where(~has_open[carrier], pd.NaT)
        df["status"] = status
        return df

    from ..stages.shuffle import bucketed_group_apply

    return bucketed_group_apply(edges, key_cols, resolve)


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
