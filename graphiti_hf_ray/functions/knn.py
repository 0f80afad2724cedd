"""Similarity search over an embedding column (training-data ops).

- ``knn_brute``   — exact top-k cosine: broadcast the query matrix via
  ``ray.put``, one numpy matmul per batch, per-batch local top-k rows, then
  a tiny driver-side merge of the ≤ k-per-batch candidates — the exchange
  moves only candidate rows (k per batch), never the corpus.
- ``knn_ivf``     — IVF-style scale path: deterministic coarse centroids
  (hash-seeded k-means-free binning), per-bucket scan of only the probed
  buckets.

Scoring runs as stateless TASKS (broadcast ref read per batch from local
plasma), not actor pools: the per-query state is one small array, and
actor-pool spin-up (~1-2 s for a fresh pool) would dominate small-corpus
latency — the engine-wide rule that pools are for genuinely heavy state
(BASELINE.md design notes).
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .vectors import embedding_matrix, int64_array


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=-1, keepdims=True), 1e-12)


def _score_batch(t: pa.Table, qref=None, k: int = 10) -> pa.Table:
    q = ray.get(qref)  # local plasma read, cached per worker
    ids = int64_array(t.column("vec_id"))
    m = _normalize(embedding_matrix(t.column("embedding")))
    sims = m @ q
    order = np.lexsort((ids, -sims))[:k]  # local top-k
    return pa.table(
        {
            "vec_id": pa.array(ids[order], pa.int64()),
            "cosine": pa.array(np.round(sims[order], 6), pa.float64()),
        }
    )


def _merge_topk(cands: "ray.data.Dataset", k: int) -> pd.DataFrame:
    """Global merge of the per-batch candidates: ≤ k rows per input batch
    survive the map, so this is a k·n_batches-row frame — a driver-side
    sort is the cheap exact merge (a sort-exchange operator would shuffle
    the same handful of rows through a full AllToAll stage)."""
    df = cands.to_pandas()
    if df.empty:
        return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"), "cosine": pd.Series([], dtype="float64")})
    return (
        df.sort_values(["cosine", "vec_id"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def knn_brute(emb: "ray.data.Dataset", query_vec: np.ndarray, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k of ``query_vec`` over the ``embedding`` column.

    Returns a DataFrame (vec_id, cosine) — k rows, cosine rounded to 6 dp,
    ties broken by vec_id (deterministic)."""
    q = _normalize(np.asarray(query_vec, np.float64))
    qref = ray.put(q)
    cands = emb.map_batches(
        functools.partial(_score_batch, qref=qref, k=k),
        batch_format="pyarrow", batch_size=4096,
    )
    return _merge_topk(cands, k)


def _score_multi_batch(t: pa.Table, qref=None, k: int = 10) -> pa.Table:
    q = ray.get(qref)
    ids = int64_array(t.column("vec_id"))
    m = _normalize(embedding_matrix(t.column("embedding")))
    sims = q @ m.T  # (n_queries, batch)
    kk = min(k, sims.shape[1])
    out_q, out_i, out_s = [], [], []
    for qi in range(sims.shape[0]):
        order = np.lexsort((ids, -sims[qi]))[:kk]
        out_q.append(np.full(kk, qi, np.int64))
        out_i.append(ids[order])
        out_s.append(np.round(sims[qi][order], 6))
    return pa.table(
        {
            "query_idx": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_i)),
            "cosine": pa.array(np.concatenate(out_s), pa.float64()),
        }
    )


def knn_brute_multi(
    emb: "ray.data.Dataset", query_mat: np.ndarray, k: int = 10
) -> pd.DataFrame:
    """Batched exact top-k: ALL queries broadcast as one matrix
    (``ray.put`` once), ONE matmul per batch scores every query against the
    batch, per-(query, batch) local top-k rows survive, then one bucketed
    per-query merge — the corpus streams once no matter how many queries.
    (The merge stays a shuffle here: candidate volume grows with the query
    count, unlike the single-query path.)

    Returns (query_idx, vec_id, cosine) with k rows per query, ranked
    (cosine desc, vec_id asc)."""
    q = _normalize(np.asarray(query_mat, np.float64))
    qref = ray.put(q)
    cands = emb.map_batches(
        functools.partial(_score_multi_batch, qref=qref, k=k),
        batch_format="pyarrow", batch_size=4096,
    )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_idx", "cosine", "vec_id"], ascending=[True, False, True], kind="mergesort")
        return df.groupby("query_idx", sort=False).head(k)

    from ..stages.shuffle import bucketed_group_apply

    return (
        bucketed_group_apply(cands, ["query_idx"], topk)
        .to_pandas()
        .sort_values(["query_idx", "cosine", "vec_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )


def bucket_of(vec: np.ndarray, n_planes: int = 4) -> int:
    """Deterministic LSH sign-bucket: sign bits vs md5-seeded hyperplanes."""
    dim = vec.shape[-1]
    planes = _planes_for(n_planes, dim)
    bits = (planes @ vec > 0).astype(int)
    return int((bits * (1 << np.arange(n_planes))).sum())


def _plane(i: int, dim: int) -> np.ndarray:
    out = np.empty(dim)
    for d in range(dim):
        h = int.from_bytes(hashlib.md5(f"plane:{i}:{d}".encode()).digest()[:8], "little")
        out[d] = (h / 2**63) - 1.0
    return out


_PLANES_MEMO: dict[tuple[int, int], np.ndarray] = {}


def _planes_for(n_planes: int, dim: int) -> np.ndarray:
    """Module-level memo: one md5 derivation per (n_planes, dim) per worker
    process, not per batch."""
    key = (n_planes, dim)
    if key not in _PLANES_MEMO:
        _PLANES_MEMO[key] = np.stack([_plane(i, dim) for i in range(n_planes)])
    return _PLANES_MEMO[key]


def _score_ivf_batch(t: pa.Table, qref=None, k: int = 10, n_planes: int = 4) -> pa.Table:
    q, probe = ray.get(qref)
    planes = _planes_for(n_planes, q.shape[0])
    pows = 1 << np.arange(n_planes)
    ids = int64_array(t.column("vec_id"))
    m = _normalize(embedding_matrix(t.column("embedding")))
    bits = (m @ planes.T > 0).astype(int)
    buckets = bits @ pows
    mask = np.isin(buckets, list(probe))
    ids, m = ids[mask], m[mask]
    if ids.size == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())})
    sims = m @ q
    order = np.lexsort((ids, -sims))[:k]
    return pa.table(
        {
            "vec_id": pa.array(ids[order], pa.int64()),
            "cosine": pa.array(np.round(sims[order], 6), pa.float64()),
        }
    )


def knn_ivf(emb: "ray.data.Dataset", query_vec: np.ndarray, k: int = 10, n_planes: int = 4) -> pd.DataFrame:
    """LSH-bucketed ANN: scan only batches' rows in the query's bucket (plus
    1-bit-flip neighbor buckets). Approximate — the recall/speed trade is
    the point; brute force is the correctness baseline."""
    q = _normalize(np.asarray(query_vec, np.float64))
    target = bucket_of(q, n_planes)
    probe = {target} | {target ^ (1 << b) for b in range(n_planes)}
    qref = ray.put((q, probe))
    cands = emb.map_batches(
        functools.partial(_score_ivf_batch, qref=qref, k=k, n_planes=n_planes),
        batch_format="pyarrow", batch_size=4096,
    )
    return _merge_topk(cands, k)
