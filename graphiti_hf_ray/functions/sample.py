"""Deterministic sampling + mergeable sketches (training-data ops).

The reference has no sampling operators (SURVEY.md §2.6); a web-scale
pipeline needs them. Everything here is hash-deterministic (no RNG, no
seed state): the same row always lands in the same sample, so samples are
stable across reruns/partitionings and SQL-reproducible.

- ``hash_sample``   — keep rows where md5(salt:key) < threshold (rate =
  threshold/16^32); a per-row Bernoulli sample that needs no coordination.
- ``stratified_hash_sample`` — same, with a per-stratum rate map.
- ``mixture_sample`` — per-stratum weights that may EXCEED 1: floor(w)
  full repeats (tagged with an epoch column) + a hash-thresholded
  fractional epoch. The upsampling half of static domain reweighting.
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


def _rate_threshold(rate: float) -> str:
    """rate ∈ [0, 1] → the 8-hex-char lexicographic threshold. Capped at
    16^8 - 1: float rounding can push rate*16^8 to exactly 2^32, whose
    9-char encoding would lexicographically keep ~1/16 of rows instead of
    ~all (a rate within 2^-33 of 1.0 keeps all but hash 'ffffffff')."""
    return format(min(int(rate * 16**8), 16**8 - 1), "08x")


def hash_sample(ds: "ray.data.Dataset", key_col: str, rate: float, salt: str = "s") -> "ray.data.Dataset":
    """Deterministic sample of ~rate fraction keyed on ``key_col``."""
    threshold = _rate_threshold(rate)  # compare on first 8 hex chars

    def f(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pylist()
        mask = pa.array([_hexhash(salt, k)[:8] < threshold for k in keys])
        return t.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_hash_sample(
    ds: "ray.data.Dataset", key_col: str, stratum_col: str, rates: dict[str, float], salt: str = "s"
) -> "ray.data.Dataset":
    thresholds = {s: _rate_threshold(r) for s, r in rates.items()}
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


def token_budget_sample(
    ds: "ray.data.Dataset",
    key_col: str,
    stratum_col: str,
    token_col: str,
    budgets: dict[str, int],
    salt: str = "s",
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Per-stratum TOKEN-budget mixture sampling — the "give me N tokens
    of each language/domain" step of training-set construction (vs
    ``stratified_hash_sample``'s per-ROW rates).

    Within each stratum, rows are taken in deterministic hash order
    (md5(salt:key), key tie-break) while the INCLUSIVE running sum of
    ``token_col`` stays ≤ the stratum's budget; the first overflowing row
    ends the stratum's prefix (greedy prefix, not skip-and-continue — the
    kept set is a pure function of the input, SQL-expressible as a window
    cumsum). Strata absent from ``budgets`` are dropped.

    Shuffle shape: ONE bucketed exchange on the stratum key; each bucket
    runs a vectorized sort + per-stratum cumsum. A single stratum's rows
    co-locate (the same guarantee every groupby needs), so a hot stratum
    costs O(rows log rows) vector work in one task — for strata too large
    for that, pre-aggregate a (stratum, hash-prefix) token histogram and
    derive a hash threshold instead (the rate-based ops above)."""
    from ..stages.shuffle import bucketed_group_apply

    bref = ray.put(dict(budgets))

    def prefix(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(bref)
        df = df[df[stratum_col].isin(b)].copy()
        if df.empty:
            return df
        df["_h"] = [_hexhash(salt, k) for k in df[key_col]]
        df = df.sort_values(["_h", key_col], kind="mergesort")
        run = df.groupby(stratum_col, sort=False)[token_col].cumsum()
        cap = df[stratum_col].map(b)
        return df.loc[run <= cap].drop(columns=["_h"])

    return bucketed_group_apply(ds, [stratum_col], prefix, num_buckets=num_buckets)


def mixture_sample(
    ds: "ray.data.Dataset",
    key_col: str,
    stratum_col: str,
    weights: dict[str, float],
    salt: str = "m",
    epoch_col: str = "epoch",
) -> "ray.data.Dataset":
    """Weighted corpus mixture with UPsampling — the static domain
    reweighting step (Pile/DoReMi-style) where a stratum's weight may
    exceed 1. Each row of stratum ``s`` with weight ``w`` is emitted
    ``floor(w)`` times (``epoch_col`` = 0..floor-1) plus once more in the
    fractional epoch (``epoch_col`` = floor(w)) iff md5(salt:key) lands
    under frac(w) — the same deterministic threshold encoding as
    ``hash_sample``, so reruns and repartitionings emit the identical
    multiset. Strata absent from ``weights`` are dropped (weight 0).

    Pure streaming map, NO exchange: upsampling multiplies bytes at the
    point of emission, never through a shuffle. Downstream stages that
    dedup or shuffle must include ``epoch_col`` in their key (e.g. pack
    on (doc_id, epoch)) or the repeats collapse right back out.
    ``stratified_hash_sample`` is the pure-downsampling special case
    (all weights < 1, no epoch column needed)."""
    import numpy as np

    floors = {s: int(w) for s, w in weights.items()}
    fracs = {
        s: _rate_threshold(w - int(w)) for s, w in weights.items()
    }
    ref = ray.put((floors, fracs))

    def f(t: pa.Table) -> pa.Table:
        fl, fr = ray.get(ref)
        keys = t.column(key_col).to_pylist()
        strata = t.column(stratum_col).to_pylist()
        cnt = np.array(
            [
                fl[s] + (1 if _hexhash(salt, k)[:8] < fr[s] else 0) if s in fl else 0
                for k, s in zip(keys, strata)
            ],
            dtype=np.int64,
        )
        idx = np.repeat(np.arange(len(cnt)), cnt)
        epochs = np.arange(int(cnt.sum())) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        out = t.take(pa.array(idx, pa.int64()))
        return out.append_column(epoch_col, pa.array(epochs, pa.int64()))

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
