"""Persisted per-partition vector-index sidecar (SURVEY.md S4/ST3;
reference FAISS shard persistence, graphiti_hf/search/vector_search.py:
326-389 save/load of per-table indices).

Ray-Data-native index = bucket-partitioned Parquet, not a FAISS binary:
vectors are hashed to deterministic sign-plane buckets (same planes as
``functions.knn``) and written one directory per bucket. A query then
reads ONLY the probed buckets' files (partition pruning — the Parquet
analog of probing IVF lists), scoring them with the same vectorized
kernel as the streaming path. Exactness knob: ``probe_hamming=n_planes``
reads every bucket (= exact, just pre-partitioned); smaller values trade
recall for IO, like FAISS nprobe.

Layout::

    index_dir/
      _index_manifest.json    # n_planes, dim, emb_col, id_col, fingerprint
      bucket=0003/part-0.parquet
      ...

Build is one bucketed shuffle; each bucket shard is written atomically
(io.write_shard_atomic) so a killed build resumes per bucket.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..functions.vectors import embedding_matrix

from .. import io as gio
from ..functions.knn import _plane

INDEX_MANIFEST = "_index_manifest.json"


def _planes(n_planes: int, dim: int) -> np.ndarray:
    return np.stack([_plane(i, dim) for i in range(n_planes)])


def _norm(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=-1, keepdims=True), 1e-12)


def build_vector_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    emb_col: str,
    id_col: str = "uuid",
    n_planes: int = 4,
    fingerprint: str = "",
) -> dict:
    """Build (or resume) the bucket-partitioned sidecar for one embedding
    column. One shuffle: add sign-bucket → groupby(bucket) → atomic shard
    write per bucket inside the task (rows never return to the driver)."""
    probe = ds.take(1)
    if not probe:
        raise ValueError("empty dataset")
    dim = len(probe[0][emb_col])
    planes = _planes(n_planes, dim)
    pref = ray.put(planes)

    def add_bucket(t: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        m = _norm(embedding_matrix(t.column(emb_col)))
        bits = (m @ pl.T > 0).astype(np.int64)
        buckets = bits @ (1 << np.arange(pl.shape[0]))
        out = pa.table(
            {
                id_col: t.column(id_col),
                emb_col: t.column(emb_col),
                "bucket": pa.array(buckets, pa.int32()),
            }
        )
        return out.replace_schema_metadata(None)

    os.makedirs(index_dir, exist_ok=True)

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["bucket"].iloc[0])
        t = pa.Table.from_pandas(g.drop(columns=["bucket"]).sort_values(id_col), preserve_index=False)
        man = gio.write_shard_atomic(
            t, os.path.join(index_dir, f"bucket={b:04d}"), fingerprint + f":b{b}"
        )
        return pd.DataFrame({"bucket": [b], "rows": [man["rows"]]})

    stats = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(write_bucket, batch_format="pandas")
        .to_pandas()
    )
    manifest = {
        "n_planes": n_planes,
        "dim": dim,
        "emb_col": emb_col,
        "id_col": id_col,
        "fingerprint": fingerprint,
        "buckets": {int(b): int(r) for b, r in zip(stats["bucket"], stats["rows"])},
        "rows": int(stats["rows"].sum()),
    }
    tmp = os.path.join(index_dir, INDEX_MANIFEST + ".tmp-rw")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, INDEX_MANIFEST))
    return manifest


def load_index_manifest(index_dir: str) -> dict | None:
    p = os.path.join(index_dir, INDEX_MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def query_vector_index(
    index_dir: str,
    query_vec: np.ndarray,
    k: int = 10,
    probe_hamming: int = 1,
    min_score: float = 0.6,
) -> pd.DataFrame:
    """Top-k cosine over ONLY the probed buckets (partition pruning).

    ``probe_hamming`` = how many sign bits may disagree with the query's
    bucket (FAISS nprobe analog); ``probe_hamming >= n_planes`` reads every
    bucket and is exact."""
    import ray.data as rd

    man = load_index_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no index manifest under {index_dir}")
    n_planes = man["n_planes"]
    q = _norm(np.asarray(query_vec, np.float64))
    planes = _planes(n_planes, man["dim"])
    qbits = (planes @ q > 0).astype(int)
    qbucket = int((qbits * (1 << np.arange(n_planes))).sum())
    probe = [
        b for b in man["buckets"]
        if bin(int(b) ^ qbucket).count("1") <= probe_hamming
    ]
    dirs = [os.path.join(index_dir, f"bucket={int(b):04d}") for b in sorted(map(int, probe))]
    # enumerate part files explicitly: shard dirs also hold _manifest.json,
    # which a directory-level parquet read would try to parse
    paths = [
        os.path.join(d, fn)
        for d in dirs
        if os.path.isdir(d)
        for fn in sorted(os.listdir(d))
        if fn.endswith(".parquet")
    ]
    if not paths:
        return pd.DataFrame({man["id_col"]: [], "score": []})
    from .vector import cosine_topk

    ds = rd.read_parquet(paths, columns=[man["id_col"], man["emb_col"]])
    return cosine_topk(ds, q, emb_col=man["emb_col"], id_col=man["id_col"], k=k, min_score=min_score)


def build_graph_indices(out_dir: str, n_planes: int = 4) -> dict:
    """Sidecar indices for the graph's two embedding columns (the
    reference's auto_rebuild_indices surface, huggingface_driver.py:
    1298-1304). Index dirs live beside the tables they index."""
    import ray.data as rd

    built = {}
    for table, emb_col in (("nodes", "name_embedding"), ("edges", "fact_embedding")):
        troot = os.path.join(out_dir, table)
        if not os.path.isdir(troot):
            continue
        ds = rd.read_parquet(troot, columns=["uuid", emb_col])
        idx_dir = os.path.join(out_dir, f"_index_{table}_{emb_col}")
        built[table] = build_vector_index(ds, idx_dir, emb_col, "uuid", n_planes)
    return built
