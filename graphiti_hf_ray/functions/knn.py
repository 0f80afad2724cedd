"""Similarity search over an embedding column (training-data ops).

- ``knn_brute``   — exact top-k cosine: broadcast the query matrix via
  ``ray.put``, one numpy matmul per batch, per-batch local top-k rows, then
  a single tiny global ``sort().limit(k)`` — the shuffle moves only
  candidate rows (k per batch), never the corpus.
- ``knn_ivf``     — IVF-style scale path: deterministic coarse centroids
  (hash-seeded k-means-free binning), per-bucket scan of only the probed
  buckets.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=-1, keepdims=True), 1e-12)


def knn_brute(emb: "ray.data.Dataset", query_vec: np.ndarray, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k of ``query_vec`` over the ``embedding`` column.

    Returns a DataFrame (vec_id, cosine) — k rows, cosine rounded to 6 dp,
    ties broken by vec_id (deterministic)."""
    q = _normalize(np.asarray(query_vec, np.float64))
    qref = ray.put(q)

    class Score:
        def __init__(self, qref, k):
            self.q = ray.get(qref)
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t.column("vec_id").to_pylist(), np.int64)
            m = _normalize(np.stack([np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()]))
            sims = m @ self.q
            order = np.lexsort((ids, -sims))[: self.k]  # local top-k
            return pa.table(
                {
                    "vec_id": pa.array(ids[order], pa.int64()),
                    "cosine": pa.array(np.round(sims[order], 6), pa.float64()),
                }
            )

    cands = emb.map_batches(Score, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4), fn_constructor_args=(qref, k))
    top = cands.sort(["cosine", "vec_id"], descending=[True, False]).limit(k)
    return top.to_pandas()


def knn_brute_multi(
    emb: "ray.data.Dataset", query_mat: np.ndarray, k: int = 10
) -> pd.DataFrame:
    """Batched exact top-k: ALL queries broadcast as one matrix
    (``ray.put`` once), ONE matmul per batch scores every query against the
    batch, per-(query, batch) local top-k rows survive, then one bucketed
    per-query merge — the corpus streams once no matter how many queries.

    Returns (query_idx, vec_id, cosine) with k rows per query, ranked
    (cosine desc, vec_id asc)."""
    q = _normalize(np.asarray(query_mat, np.float64))
    qref = ray.put(q)

    class Score:
        def __init__(self, qref, k):
            self.q = ray.get(qref)
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t.column("vec_id").to_pylist(), np.int64)
            m = _normalize(np.stack([np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()]))
            sims = self.q @ m.T  # (n_queries, batch)
            kk = min(self.k, sims.shape[1])
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

    cands = emb.map_batches(Score, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4), fn_constructor_args=(qref, k))

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
    planes = np.stack([_plane(i, dim) for i in range(n_planes)])
    bits = (planes @ vec > 0).astype(int)
    return int((bits * (1 << np.arange(n_planes))).sum())


def _plane(i: int, dim: int) -> np.ndarray:
    out = np.empty(dim)
    for d in range(dim):
        h = int.from_bytes(hashlib.md5(f"plane:{i}:{d}".encode()).digest()[:8], "little")
        out[d] = (h / 2**63) - 1.0
    return out


def knn_ivf(emb: "ray.data.Dataset", query_vec: np.ndarray, k: int = 10, n_planes: int = 4) -> pd.DataFrame:
    """LSH-bucketed ANN: scan only batches' rows in the query's bucket (plus
    1-bit-flip neighbor buckets). Approximate — the recall/speed trade is
    the point; brute force is the correctness baseline."""
    q = _normalize(np.asarray(query_vec, np.float64))
    target = bucket_of(q, n_planes)
    probe = {target} | {target ^ (1 << b) for b in range(n_planes)}
    qref = ray.put((q, probe))

    class Score:
        def __init__(self, qref, k, n_planes):
            self.q, self.probe = ray.get(qref)
            self.k = k
            dim = self.q.shape[0]
            self.planes = np.stack([_plane(i, dim) for i in range(n_planes)])
            self.pows = 1 << np.arange(n_planes)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t.column("vec_id").to_pylist(), np.int64)
            m = _normalize(np.stack([np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()]))
            bits = (m @ self.planes.T > 0).astype(int)
            buckets = bits @ self.pows
            mask = np.isin(buckets, list(self.probe))
            ids, m = ids[mask], m[mask]
            if ids.size == 0:
                return pa.table({"vec_id": pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())})
            sims = m @ self.q
            order = np.lexsort((ids, -sims))[: self.k]
            return pa.table(
                {
                    "vec_id": pa.array(ids[order], pa.int64()),
                    "cosine": pa.array(np.round(sims[order], 6), pa.float64()),
                }
            )

    cands = emb.map_batches(Score, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4), fn_constructor_args=(qref, k, n_planes))
    return cands.sort(["cosine", "vec_id"], descending=[True, False]).limit(k).to_pandas()
