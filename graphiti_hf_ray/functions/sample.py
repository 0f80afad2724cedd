"""Deterministic sampling + mergeable sketches (training-data ops).

The reference has no sampling operators (SURVEY.md §2.6); a web-scale
pipeline needs them. Everything here is hash-deterministic (no RNG, no
seed state): the same row always lands in the same sample, so samples are
stable across reruns/partitionings and SQL-reproducible.

- ``hash_sample``   — keep rows where md5(salt:key) < threshold (rate =
  threshold/16^32); a per-row Bernoulli sample that needs no coordination.
- ``stratified_hash_sample`` — same, with a per-stratum rate map.
- ``kmv_synopsis``  — K-minimum-values distinct-count sketch: per-batch
  partial k-smallest hashes merged to a global k-set (mergeable sketch
  pattern — ray_guide.md 'Aggregation at scale'); estimator
  (k-1)/frac(kth). Exact result is SQL ``ORDER BY md5 LIMIT k``.
"""

from __future__ import annotations

import hashlib
import heapq

import pandas as pd
import pyarrow as pa

import ray


def _hexhash(salt: str, v) -> str:
    return hashlib.md5(f"{salt}:{v}".encode()).hexdigest()


def hash_sample(ds: "ray.data.Dataset", key_col: str, rate: float, salt: str = "s") -> "ray.data.Dataset":
    """Deterministic sample of ~rate fraction keyed on ``key_col``."""
    threshold = format(int(rate * 16**8), "08x")  # compare on first 8 hex chars

    def f(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pylist()
        mask = pa.array([_hexhash(salt, k)[:8] < threshold for k in keys])
        return t.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_hash_sample(
    ds: "ray.data.Dataset", key_col: str, stratum_col: str, rates: dict[str, float], salt: str = "s"
) -> "ray.data.Dataset":
    thresholds = {s: format(int(r * 16**8), "08x") for s, r in rates.items()}
    ref = ray.put(thresholds)

    def f(t: pa.Table) -> pa.Table:
        th = ray.get(ref)
        keys = t.column(key_col).to_pylist()
        strata = t.column(stratum_col).to_pylist()
        mask = pa.array(
            [s in th and _hexhash(salt, k)[:8] < th[s] for k, s in zip(keys, strata)]
        )
        return t.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def kmv_synopsis(ds: "ray.data.Dataset", value_col: str, k: int = 32, salt: str = "k") -> tuple[list[str], float]:
    """Distributed KMV sketch: returns (k smallest hashes sorted, distinct
    estimate). Shuffle cost: k hashes per input block, nothing else."""

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column(value_col).to_pylist()
        hs = heapq.nsmallest(k, {_hexhash(salt, v) for v in vals})
        return pa.table({"h": pa.array(hs, pa.string())})

    rows = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    synopsis = sorted(set(rows["h"]))[:k]
    if len(synopsis) < k:
        return synopsis, float(len(synopsis))
    frac = int(synopsis[-1], 16) / 16**32
    return synopsis, (k - 1) / frac
