"""Bucketed shuffle helpers.

``Dataset.groupby(key).map_groups(fn)`` invokes ``fn`` once per DISTINCT
key — fine for hundreds of groups, catastrophic for millions of tiny ones
(a Python call + 1-row DataFrame each). The scalable shape is to shuffle by
a HASH BUCKET of the key (``num_buckets`` ≈ a small multiple of cluster
CPUs) and run a vectorized pandas groupby over each bucket:

    bucketed_group_apply(ds, ["k1", "k2"], fn_bucket)

where ``fn_bucket(df)`` sees every row of every key hashing into that
bucket and is free to use ``df.groupby([...]).agg`` (C speed) internally.
The bucket hash is ``pd.util.hash_pandas_object`` with the default fixed
key — deterministic across processes and runs.

Skew note: a single hot KEY still lands in one bucket, but the per-bucket
work is a vectorized aggregation, so a hot key costs O(rows) vector work
rather than O(rows) Python calls. For hot keys inside associative
aggregations, pre-reduce per input block first (partial aggregation), then
bucket the partials — the pattern used throughout pipelines/.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def default_num_buckets() -> int:
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(8, cpus * 4)


def add_bucket_column(keys: list[str], num_buckets: int):
    """Returns a pyarrow map_batches fn adding a deterministic ``_bucket``
    int32 column = hash(keys) % num_buckets."""

    def f(t: pa.Table) -> pa.Table:
        df = t.select(keys).to_pandas()
        h = pd.util.hash_pandas_object(df, index=False)  # vectorized row hash, fixed key
        out = t.append_column("_bucket", pa.array((h % num_buckets).astype("int32"), pa.int32()))
        # drop pandas schema metadata: unhashable dicts in the schema break
        # Ray's block-schema dedup (log noise) during the sort exchange
        return out.replace_schema_metadata(None)

    return f


def salted_group_aggregate(
    ds: "ray.data.Dataset",
    keys: list[str],
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    merge_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_salts: int = 16,
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Two-round SALTED aggregation for head-key skew (SURVEY.md §4):

    round 1: shuffle by (keys…, _salt) where _salt = row_hash % num_salts —
             a hot key's rows split across ``num_salts`` sub-buckets, each
             reduced independently by ``partial_fn`` (must emit one partial
             row per key per salt, associative w.r.t. ``merge_fn``);
    round 2: shuffle the partials by (keys…) alone — at most ``num_salts``
             rows per key reach the final ``merge_fn``.

    Use when a single key's rows exceed one task's memory or when the
    per-bucket reduction is itself expensive; plain ``bucketed_group_apply``
    with a vectorized body is cheaper for keys that fit."""

    def add_salt(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(t.select(keys).to_pandas(), index=False)
        # row-position jitter decorrelates the salt from the key hash
        salt = ((h.values + np.arange(len(h), dtype=np.uint64)) % num_salts).astype("int32")
        return t.append_column("_salt", pa.array(salt, pa.int32())).replace_schema_metadata(None)

    salted = ds.map_batches(add_salt, batch_format="pyarrow")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return partial_fn(df.drop(columns=["_salt"]))

    partials = bucketed_group_apply(salted, [*keys, "_salt"], partial, num_buckets=num_buckets)
    return bucketed_group_apply(partials, keys, merge_fn, num_buckets=num_buckets)


def bucketed_group_apply(
    ds: "ray.data.Dataset",
    keys: list[str],
    fn_bucket: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Hash-partition ``ds`` by ``keys`` into ``num_buckets`` buckets and
    apply ``fn_bucket`` (vectorized, sees whole bucket incl. the ``_bucket``
    column dropped) once per bucket. All rows of one key meet in exactly
    one bucket — same co-location guarantee as groupby(key), ~1000× fewer
    Python invocations."""
    nb = num_buckets or default_num_buckets()
    withb = ds.map_batches(add_bucket_column(keys, nb), batch_format="pyarrow")
    if num_buckets is not None:
        # Bound the sort width: the groupby shuffle creates O(in_blocks ×
        # out_blocks) exchange objects, and chained bucketed applies over
        # SMALL data (each sort emits ~input-many blocks, unions add)
        # otherwise compound near-empty block counts quadratically — a
        # streaming split/merge (no exchange) pins the sort at nb
        # partitions. Only callers that KNOW their data is narrow (e.g.
        # the vocabulary-sized canonicalization chain) pass num_buckets;
        # full-stream shuffles skip the extra pass — their input block
        # counts are already read-bounded at ~2×cpus.
        withb = withb.repartition(nb, shuffle=False)

    def apply(g: pd.DataFrame) -> pd.DataFrame:
        return fn_bucket(g.drop(columns=["_bucket"]))

    return withb.groupby("_bucket").map_groups(apply, batch_format="pandas")
