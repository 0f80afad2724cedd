"""Persisted per-partition vector-index sidecars (SURVEY.md S4/ST3;
reference FAISS shard persistence, graphiti_hf/search/vector_search.py:
326-389 save/load of per-table indices).

Ray-Data-native index = partitioned Parquet, not a FAISS binary. Three
layouts share the same build/query machinery:

- **sign-plane** (data-oblivious): vectors hash to deterministic LSH sign
  buckets (same planes as ``functions.knn``), one directory per bucket.
- **trained IVF** (data-adaptive — the 100-TB recommendation): vectors are
  assigned ONCE at build time to their nearest trained centroid
  (``functions.knn.train_ivf_centroids``), one directory per list;
  centroids persist in the manifest so queries never touch the corpus.
  Measured recall at equal scan is far better than sign-plane buckets
  (BASELINE.md ANN section), and unlike the streaming ``knn_ivf_trained``
  re-scorer a query reads ONLY the probed lists' files — the scan
  fraction is bytes actually read, not a post-hoc mask.
- **IVF-PQ** (compressed — FAISS IndexIVFPQ shape): the trained-IVF list
  layout, but rows store m-byte product-quantizer CODES instead of full
  vectors (32× smaller probed scans at dim=64/m=8); queries score by ADC
  table lookup, and an optional refine stage re-ranks the ADC shortlist
  exactly against a same-centroid full-vector sidecar (reads the SAME
  probed lists, never the corpus). Measured trade in BASELINE.md.

A query reads only the probed partitions' files (partition pruning — the
Parquet analog of probing IVF lists), scoring them with the same
vectorized kernel as the streaming path. Exactness knobs:
``probe_hamming=n_planes`` / ``n_probe=n_lists`` read every partition
(= exact, just pre-partitioned); smaller values trade recall for IO, like
FAISS nprobe.

Layout::

    index_dir/
      _index_manifest.json        # n_planes|centroids, dim, cols, counts
      bucket=0003/part=0000/part-0.parquet + _manifest.json
      list=0007/part=0001/...
      list=0007/epoch=ab12cd34ef56/part=0000/...   # incremental adds
      ...

Incremental adds (``append_to_ivf_index`` / ``append_to_vector_index``,
the FAISS ``index.add`` contract): new rows are assigned with the
PERSISTED centroids/planes and written as an epoch subdir per partition —
no collision with base parts, no rebuild, query path unchanged (it walks
probed partitions recursively). A full rebuild sweeps every epoch.

Build shape: one cheap occupancy histogram pass sizes per-partition part
counts (``ceil(rows / rows_per_part)`` — skew-exact, a hot partition gets
more parts), then ONE bucketed shuffle on the (partition, salt) key whose
groups are part-sized — never a whole partition in one task (a 4-plane
index has only 16 buckets; at 100 TB one bucket per task is a guaranteed
OOM). Each part is written atomically (io.write_shard_atomic) so a killed
build resumes per part.
"""

from __future__ import annotations

import json
import math
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..functions.vectors import embedding_matrix

from .. import io as gio
from ..functions.knn import _plane

INDEX_MANIFEST = "_index_manifest.json"
DEFAULT_ROWS_PER_PART = 262_144


def _planes(n_planes: int, dim: int) -> np.ndarray:
    return np.stack([_plane(i, dim) for i in range(n_planes)])


def _norm(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=-1, keepdims=True), 1e-12)


def _salt_of(ids: np.ndarray, n_salts: np.ndarray) -> np.ndarray:
    """Deterministic per-row salt in [0, n_salts_of_that_row): fixed-key
    siphash (process-independent), vectorized."""
    arr = np.asarray(ids)
    if arr.dtype.kind in "iu":
        h = pd.util.hash_array(arr.astype(np.int64, copy=False))
    else:
        h = pd.util.hash_array(arr.astype(object))
    h = h.astype(np.int64) & 0x7FFFFFFFFFFFFFFF
    return h % np.maximum(n_salts, 1)


def _probe_dim(probe_vec) -> int:
    return int(np.asarray(probe_vec).shape[-1])


def _partition_parquet_files(index_dir: str, dirnames: list[str]) -> list[str]:
    """All part files under the named partition dirs (recursive — parts are
    atomic shard SUBdirs), skipping in-flight .tmp- writers."""
    paths = []
    for d in dirnames:
        root = os.path.join(index_dir, d)
        if not os.path.isdir(root):
            continue
        for dirpath, dn, filenames in os.walk(root):
            gio._prune_tmp(dn)
            for fn in sorted(filenames):
                if fn.endswith(".parquet"):
                    paths.append(os.path.join(dirpath, fn))
    return paths


def _sweep_stale_parts(index_dir: str, prefix: str, expected: set[tuple[int, int]], fingerprint: str) -> None:
    """Remove partition/part dirs a previous build (different fingerprint,
    plane count, salt sizing) left behind — the query path globs every part
    in a probed partition, so stale parts would silently double rows. A
    FULL build owns the whole directory: append epochs
    (``epoch=<tag>`` subdirs, see ``_append_to_index``) from any earlier
    generation are removed too."""
    for d in sorted(os.listdir(index_dir)):
        if not d.startswith(prefix + "="):
            continue
        pdir = os.path.join(index_dir, d)
        pid = int(d.split("=", 1)[1])
        for sub in sorted(os.listdir(pdir)):
            if sub.startswith(".tmp-") or sub.startswith("epoch="):
                shutil.rmtree(os.path.join(pdir, sub), ignore_errors=True)
                continue
            if not sub.startswith("part="):
                # legacy flat-layout remains (part-N.parquet files and the
                # bucket-level _manifest.json of the pre-sub-shard build):
                # the recursive query glob would read them ALONGSIDE the
                # new parts and double rows — a full build owns this dir
                p = os.path.join(pdir, sub)
                if os.path.isdir(p):
                    shutil.rmtree(p, ignore_errors=True)
                else:
                    try:
                        os.remove(p)
                    except OSError:
                        pass
                continue
            sid = int(sub.split("=", 1)[1])
            keep = (pid, sid) in expected
            if keep:
                man_p = os.path.join(pdir, sub, gio.MANIFEST)
                keep = os.path.exists(man_p)
                if keep:
                    with open(man_p) as f:
                        keep = json.load(f).get("fingerprint", "").startswith(fingerprint + ":")
            if not keep:
                shutil.rmtree(os.path.join(pdir, sub), ignore_errors=True)
        if not os.listdir(pdir):
            os.rmdir(pdir)


def _sweep_stale_epoch_parts(index_dir: str, prefix: str, epoch: str, expected: set[tuple[int, int]], fingerprint: str) -> None:
    """Epoch-scoped sweep for appends: clean only inside this epoch's
    subdirs (a crashed earlier attempt of the SAME append), leaving the
    base parts and other epochs untouched."""
    for d in sorted(os.listdir(index_dir)):
        if not d.startswith(prefix + "="):
            continue
        pid = int(d.split("=", 1)[1])
        edir = os.path.join(index_dir, d, f"epoch={epoch}")
        if not os.path.isdir(edir):
            continue
        for sub in sorted(os.listdir(edir)):
            if sub.startswith(".tmp-"):
                shutil.rmtree(os.path.join(edir, sub), ignore_errors=True)
                continue
            if not sub.startswith("part="):
                continue
            sid = int(sub.split("=", 1)[1])
            keep = (pid, sid) in expected
            if keep:
                man_p = os.path.join(edir, sub, gio.MANIFEST)
                keep = os.path.exists(man_p)
                if keep:
                    with open(man_p) as f:
                        keep = json.load(f).get("fingerprint", "").startswith(fingerprint + ":")
            if not keep:
                shutil.rmtree(os.path.join(edir, sub), ignore_errors=True)
        if not os.listdir(edir):
            os.rmdir(edir)


def _write_partitioned(
    ds: "ray.data.Dataset",
    index_dir: str,
    prefix: str,
    assign_fn,
    id_col: str,
    emb_col: str,
    fingerprint: str,
    rows_per_part: int,
    epoch: str | None = None,
) -> dict[int, int]:
    """Shared build body for both layouts: histogram pass → per-partition
    part counts → ONE (partition, salt) bucketed shuffle → atomic part-dir
    writes inside the group task (rows never return to the driver).
    Returns {partition: rows}.

    ``epoch`` (append mode): parts land under
    ``{prefix}=NNNN/epoch=<epoch>/part=MMMM`` — a namespace the base
    build's part ids can never collide with — and the stale-part sweep is
    scoped to that epoch, so existing data is never touched. The query
    path needs no change: it walks the partition dir recursively."""

    # the build makes TWO passes over the input (occupancy histogram, then
    # the keyed write) — materialize once so the second pass replays
    # object-store blocks instead of re-reading storage / re-running the
    # upstream lineage (the input is the narrow (id, embedding) projection,
    # and the store spills if it exceeds memory)
    ds = ds.materialize()

    def hist(t: pa.Table) -> pa.Table:
        part = assign_fn(t)
        b, c = np.unique(part, return_counts=True)
        return pa.table({"p": pa.array(b, pa.int64()), "n": pa.array(c, pa.int64())})

    h = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
    # ≤ n_partitions rows; an empty input loses even the column names
    occ = {} if h.empty else h.groupby("p")["n"].sum().to_dict()
    salts = {int(p): max(1, math.ceil(n / rows_per_part)) for p, n in occ.items()}
    max_salts = max(salts.values(), default=1)
    # salt lookup as a dense numpy LUT (partition ids are small ints from
    # the histogram) — no per-row Python in the write path's key tagging
    lut = np.ones(max(salts, default=0) + 2, np.int64)
    for p, n in salts.items():
        lut[p] = n

    def add_keys(t: pa.Table) -> pa.Table:
        part = assign_fn(t)
        ids = t.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
        ns = lut[np.minimum(part, len(lut) - 1)]
        salt = _salt_of(ids, ns)
        out = pa.table(
            {
                id_col: t.column(id_col),
                emb_col: t.column(emb_col),
                "_p": pa.array(part, pa.int32()),
                "_pkey": pa.array(part * (max_salts + 1) + salt, pa.int64()),
            }
        )
        return out.replace_schema_metadata(None)

    os.makedirs(index_dir, exist_ok=True)

    sub = "" if epoch is None else f"epoch={epoch}"

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        p = int(g["_p"].iloc[0])
        s = int(g["_pkey"].iloc[0]) - p * (max_salts + 1)
        t = pa.Table.from_pandas(
            g.drop(columns=["_p", "_pkey"]).sort_values(id_col), preserve_index=False
        )
        man = gio.write_shard_atomic(
            t,
            os.path.join(index_dir, f"{prefix}={p:04d}", sub, f"part={s:04d}"),
            fingerprint + f":{prefix}{p}:s{s}/{salts[p]}",
        )
        return pd.DataFrame({"p": [p], "rows": [man["rows"]]})

    stats = (
        ds.map_batches(add_keys, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(write_part, batch_format="pandas")
        .to_pandas()
    )
    expected = {(p, s) for p, ns in salts.items() for s in range(ns)}
    if epoch is None:
        _sweep_stale_parts(index_dir, prefix, expected, fingerprint)
    else:
        _sweep_stale_epoch_parts(index_dir, prefix, epoch, expected, fingerprint)
    if stats.empty:  # empty input: nothing written (an empty append is a no-op)
        return {}
    return stats.groupby("p")["rows"].sum().to_dict()


def build_vector_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    emb_col: str,
    id_col: str = "uuid",
    n_planes: int = 4,
    fingerprint: str = "",
    rows_per_part: int = DEFAULT_ROWS_PER_PART,
) -> dict:
    """Build (or resume) the sign-plane bucket-partitioned sidecar for one
    embedding column. Parts are (bucket, salt) sub-shards capped near
    ``rows_per_part`` rows so no single task or file ever carries a whole
    bucket (2^n_planes buckets × 100 TB ÷ 16 was the old funnel)."""
    probe = ds.take(1)
    if not probe:
        raise ValueError("empty dataset")
    dim = _probe_dim(probe[0][emb_col])
    planes = _planes(n_planes, dim)
    pref = ray.put(planes)

    def assign(t: pa.Table) -> np.ndarray:
        pl = ray.get(pref)
        m = _norm(embedding_matrix(t.column(emb_col)))
        bits = (m @ pl.T > 0).astype(np.int64)
        return bits @ (1 << np.arange(pl.shape[0]))

    rows_by_bucket = _write_partitioned(
        ds, index_dir, "bucket", assign, id_col, emb_col, fingerprint, rows_per_part
    )
    manifest = {
        "kind": "sign_plane",
        "n_planes": n_planes,
        "dim": dim,
        "emb_col": emb_col,
        "id_col": id_col,
        "fingerprint": fingerprint,
        "buckets": {int(b): int(r) for b, r in rows_by_bucket.items()},
        "rows": int(sum(rows_by_bucket.values())),
    }
    tmp = os.path.join(index_dir, INDEX_MANIFEST + ".tmp-rw")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, INDEX_MANIFEST))
    return manifest


def build_ivf_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 32,
    centroids: np.ndarray | None = None,
    fingerprint: str = "",
    rows_per_part: int = DEFAULT_ROWS_PER_PART,
) -> dict:
    """Persisted trained-IVF sidecar (VERDICT r4 #1): every row is assigned
    to its nearest centroid ONCE at build time and written into
    list-partitioned Parquet; the centroid matrix persists in the manifest.
    Queries (``query_ivf_index``) then read only the probed lists' files —
    the reference's FAISS save/query contract (vector_search.py:229-285,
    326-389) with Parquet partitions instead of a binary index. The
    streaming ``functions.knn.knn_ivf_trained`` remains the index-free
    fallback; results are identical given the same centroids
    (parity-tested)."""
    from ..functions.knn import train_ivf_centroids

    if centroids is None:
        centroids = train_ivf_centroids(ds, n_lists=n_lists, id_col=id_col, emb_col=emb_col)
    C = _norm(np.asarray(centroids, np.float64))
    n_lists = C.shape[0]
    cref = ray.put(C)

    def assign(t: pa.Table) -> np.ndarray:
        C_ = ray.get(cref)
        m = _norm(embedding_matrix(t.column(emb_col)))
        return np.argmax(m @ C_.T, axis=1).astype(np.int64)

    rows_by_list = _write_partitioned(
        ds, index_dir, "list", assign, id_col, emb_col, fingerprint, rows_per_part
    )
    # per-list bytes (from the written part files) so scan fractions can be
    # reported as bytes actually read, not a row mask
    bytes_by_list: dict[int, int] = {}
    for lid in rows_by_list:
        total = 0
        for p in _partition_parquet_files(index_dir, [f"list={int(lid):04d}"]):
            total += os.path.getsize(p)
        bytes_by_list[int(lid)] = total
    manifest = {
        "kind": "ivf_trained",
        "n_lists": int(n_lists),
        "dim": int(C.shape[1]),
        "emb_col": emb_col,
        "id_col": id_col,
        "fingerprint": fingerprint,
        "centroids": C.tolist(),  # float64 — json round-trips exactly
        "lists": {int(b): int(r) for b, r in rows_by_list.items()},
        "bytes": bytes_by_list,
        "rows": int(sum(rows_by_list.values())),
    }
    tmp = os.path.join(index_dir, INDEX_MANIFEST + ".tmp-rw")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, INDEX_MANIFEST))
    return manifest


def build_ivfpq_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 32,
    m: int = 8,
    nbits: int = 8,
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
    fingerprint: str = "",
    rows_per_part: int = DEFAULT_ROWS_PER_PART,
) -> dict:
    """IVF-PQ sidecar (FAISS ``IndexIVFPQ`` shape): same list partitioning
    as ``build_ivf_index``, but each row stores an m-byte product-quantizer
    CODE instead of the full vector — for dim=64/float32 and m=8 that is a
    32× smaller probed-list scan, the compression a 100-TB embedding table
    needs before ANY per-query scan is affordable. Assignment and encoding
    happen ONCE at build time in one streaming pass (list = nearest trained
    centroid, code = per-subspace nearest codeword); centroids AND
    codebooks persist in the manifest so queries never touch the corpus.
    Queries (``query_ivfpq_index``) read only the probed lists' code files
    and score by ADC table lookup; an optional refine step re-ranks the
    ADC shortlist exactly against a full-vector ``build_ivf_index`` sidecar
    sharing the same centroids. Training is deterministic
    (``functions.knn.train_pq_codebooks``). Reference contract: the FAISS
    index save/query surface (graphiti_hf/search/vector_search.py:229-285,
    326-389) — same persistence semantics, quantized storage instead of a
    flat binary index."""
    from ..functions.knn import (
        _sample_matrix, pq_encode, train_ivf_centroids, train_pq_codebooks,
    )

    # uint8 codes cap nbits at 8 regardless of where the codebooks come
    # from (caller-supplied books skip train_pq_codebooks' own guard)
    if not 1 <= nbits <= 8:
        raise ValueError(f"nbits must be in [1, 8] (uint8 codes), got {nbits}")
    # both quantizers train on the same deterministic bounded sample —
    # extract it ONCE (one corpus pass, not one per trainer)
    sample = None
    if centroids is None or codebooks is None:
        sample = _sample_matrix(ds, 32768, id_col, emb_col, need=1)
    if centroids is None:
        centroids = train_ivf_centroids(
            ds, n_lists=n_lists, id_col=id_col, emb_col=emb_col, sample=sample
        )
    C = _norm(np.asarray(centroids, np.float64))
    n_lists = C.shape[0]
    if codebooks is None:
        codebooks = train_pq_codebooks(
            ds, m=m, nbits=nbits, id_col=id_col, emb_col=emb_col, sample=sample
        )
    B = np.asarray(codebooks, np.float64)
    m, ncode, dsub = (int(x) for x in B.shape)
    if C.shape[1] != m * dsub:
        raise ValueError(f"codebooks cover dim {m * dsub} != centroid dim {C.shape[1]}")
    if ncode != 1 << nbits:
        # caller-supplied codebooks must agree with nbits: ncode > 256 would
        # silently wrap in the uint8 code column, a mismatch records a lie
        raise ValueError(f"codebooks have {ncode} codewords != 2**nbits ({1 << nbits})")
    cref, bref = ray.put(C), ray.put(B)

    def encode(t: pa.Table) -> pa.Table:
        C_, B_ = ray.get(cref), ray.get(bref)
        X = _norm(embedding_matrix(t.column(emb_col)))
        lists = np.argmax(X @ C_.T, axis=1).astype(np.int64)
        codes = pq_encode(X, B_)
        code_col = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.reshape(-1), pa.uint8()), m
        )
        return pa.table(
            {
                id_col: t.column(id_col),
                "pq_code": code_col,
                "_list": pa.array(lists, pa.int64()),
            }
        )

    enc = ds.map_batches(encode, batch_format="pyarrow")

    def assign(t: pa.Table) -> np.ndarray:
        return t.column("_list").combine_chunks().to_numpy(zero_copy_only=False)

    rows_by_list = _write_partitioned(
        enc, index_dir, "list", assign, id_col, "pq_code", fingerprint, rows_per_part
    )
    _, bytes_by_list = _scan_partition_stats(index_dir, "list")
    manifest = {
        "kind": "ivf_pq",
        "n_lists": int(n_lists),
        "dim": int(C.shape[1]),
        "m": m,
        "nbits": int(nbits),
        "emb_col": emb_col,
        "code_col": "pq_code",
        "id_col": id_col,
        "fingerprint": fingerprint,
        "centroids": C.tolist(),  # float64 — json round-trips exactly
        "codebooks": B.tolist(),
        "lists": {int(b): int(r) for b, r in rows_by_list.items()},
        "bytes": {int(b): int(v) for b, v in bytes_by_list.items()},
        "rows": int(sum(rows_by_list.values())),
    }
    tmp = os.path.join(index_dir, INDEX_MANIFEST + ".tmp-rw")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, INDEX_MANIFEST))
    return manifest


def _scan_partition_stats(index_dir: str, prefix: str) -> tuple[dict[int, int], dict[int, int]]:
    """(rows, bytes) per partition, rescanned from the part-shard manifests
    and file sizes on disk — the idempotent ground truth after appends or
    resumed/crashed builds (driver-held counts can be stale)."""
    rows: dict[int, int] = {}
    bts: dict[int, int] = {}
    for d in sorted(os.listdir(index_dir)):
        if not d.startswith(prefix + "="):
            continue
        pid = int(d.split("=", 1)[1])
        pdir = os.path.join(index_dir, d)
        r = b = 0
        for dirpath, dn, filenames in os.walk(pdir):
            gio._prune_tmp(dn)
            for fn in filenames:
                if fn == gio.MANIFEST:
                    with open(os.path.join(dirpath, fn)) as f:
                        r += int(json.load(f).get("rows", 0))
                elif fn.endswith(".parquet"):
                    b += os.path.getsize(os.path.join(dirpath, fn))
        if r or b:
            rows[pid], bts[pid] = r, b
    return rows, bts


def _epoch_tag(fingerprint: str) -> str:
    import hashlib

    return hashlib.md5(fingerprint.encode()).hexdigest()[:12]


def append_to_ivf_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    fingerprint: str,
    rows_per_part: int = DEFAULT_ROWS_PER_PART,
) -> dict:
    """Incrementally add vectors to an EXISTING trained-IVF sidecar — the
    reference's FAISS ``index.add`` contract (graphiti_hf/search/
    vector_search.py:229-285) without rebuilding or retraining: new rows
    are assigned to the PERSISTED centroids and written as a new append
    epoch (``list=NNNN/epoch=<tag>/part=MMMM``) that can never collide
    with the base parts or other epochs; the query path picks the new
    parts up with no change (it walks each probed list recursively).

    ``fingerprint`` must uniquely name this batch of additions — re-running
    the same append is a resume (finished parts skip via their shard
    manifests), not a duplication; a DIFFERENT batch needs a different
    fingerprint. Row/byte counts in the index manifest are rescanned from
    disk, so the recorded totals are exact even after crashes. The
    centroids stay fixed — after appending many times the data drifts from
    the trained quantization, so periodically rebuild (``build_ivf_index``
    sweeps every epoch)."""
    man = load_index_manifest(index_dir)
    if man is None or man.get("kind") != "ivf_trained":
        raise FileNotFoundError(f"no trained-IVF manifest under {index_dir}")
    if not fingerprint:
        raise ValueError("append requires a non-empty fingerprint")
    probe = ds.take(1)
    if probe and _probe_dim(probe[0][man["emb_col"]]) != man["dim"]:
        raise ValueError(
            f"append dim {_probe_dim(probe[0][man['emb_col']])} != index dim {man['dim']}"
        )
    C = np.asarray(man["centroids"], np.float64)
    cref = ray.put(C)
    emb_col, id_col = man["emb_col"], man["id_col"]

    def assign(t: pa.Table) -> np.ndarray:
        C_ = ray.get(cref)
        m = _norm(embedding_matrix(t.column(emb_col)))
        return np.argmax(m @ C_.T, axis=1).astype(np.int64)

    _write_partitioned(
        ds, index_dir, "list", assign, id_col, emb_col, fingerprint,
        rows_per_part, epoch=_epoch_tag(fingerprint),
    )
    rows_by_list, bytes_by_list = _scan_partition_stats(index_dir, "list")
    gens = man.get("generations", [man["fingerprint"]])
    if fingerprint not in gens:
        gens.append(fingerprint)
    man.update(
        {
            "lists": {int(b): int(r) for b, r in rows_by_list.items()},
            "bytes": {int(b): int(v) for b, v in bytes_by_list.items()},
            "rows": int(sum(rows_by_list.values())),
            "generations": gens,
        }
    )
    tmp = os.path.join(index_dir, INDEX_MANIFEST + ".tmp-rw")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(index_dir, INDEX_MANIFEST))
    return man


def append_to_ivfpq_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    fingerprint: str,
    rows_per_part: int = DEFAULT_ROWS_PER_PART,
) -> dict:
    """Incremental add for the IVF-PQ sidecar (same epoch mechanics as
    ``append_to_ivf_index``): new rows are assigned with the PERSISTED
    centroids and encoded with the PERSISTED codebooks, so appended codes
    are bit-identical to a one-shot build's. The quantizers stay fixed —
    after heavy appends the data drifts from both trainings, so
    periodically rebuild (``build_ivfpq_index`` sweeps every epoch via
    the shared part machinery)."""
    from ..functions.knn import pq_encode

    man = load_index_manifest(index_dir)
    if man is None or man.get("kind") != "ivf_pq":
        raise FileNotFoundError(f"no ivf_pq manifest under {index_dir}")
    if not fingerprint:
        raise ValueError("append requires a non-empty fingerprint")
    emb_col, id_col, code_col = man["emb_col"], man["id_col"], man["code_col"]
    probe = ds.take(1)
    if probe and _probe_dim(probe[0][emb_col]) != man["dim"]:
        raise ValueError(
            f"append dim {_probe_dim(probe[0][emb_col])} != index dim {man['dim']}"
        )
    C = np.asarray(man["centroids"], np.float64)
    B = np.asarray(man["codebooks"], np.float64)
    m = int(man["m"])
    cref, bref = ray.put(C), ray.put(B)

    def encode(t: pa.Table) -> pa.Table:
        C_, B_ = ray.get(cref), ray.get(bref)
        X = _norm(embedding_matrix(t.column(emb_col)))
        lists = np.argmax(X @ C_.T, axis=1).astype(np.int64)
        codes = pq_encode(X, B_)
        return pa.table(
            {
                id_col: t.column(id_col),
                code_col: pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.reshape(-1), pa.uint8()), m
                ),
                "_list": pa.array(lists, pa.int64()),
            }
        )

    enc = ds.map_batches(encode, batch_format="pyarrow")

    def assign(t: pa.Table) -> np.ndarray:
        return t.column("_list").combine_chunks().to_numpy(zero_copy_only=False)

    _write_partitioned(
        enc, index_dir, "list", assign, id_col, code_col, fingerprint,
        rows_per_part, epoch=_epoch_tag(fingerprint),
    )
    rows_by_list, bytes_by_list = _scan_partition_stats(index_dir, "list")
    gens = man.get("generations", [man["fingerprint"]])
    if fingerprint not in gens:
        gens.append(fingerprint)
    man.update(
        {
            "lists": {int(b): int(r) for b, r in rows_by_list.items()},
            "bytes": {int(b): int(v) for b, v in bytes_by_list.items()},
            "rows": int(sum(rows_by_list.values())),
            "generations": gens,
        }
    )
    tmp = os.path.join(index_dir, INDEX_MANIFEST + ".tmp-rw")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(index_dir, INDEX_MANIFEST))
    return man


def append_to_vector_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    fingerprint: str,
    rows_per_part: int = DEFAULT_ROWS_PER_PART,
) -> dict:
    """Incremental add for the sign-plane sidecar (same epoch mechanics as
    ``append_to_ivf_index``; the planes are deterministic in (n_planes,
    dim) so appended rows bucket identically to a fresh build)."""
    man = load_index_manifest(index_dir)
    if man is None or man.get("kind") != "sign_plane":
        raise FileNotFoundError(f"no sign-plane manifest under {index_dir}")
    if not fingerprint:
        raise ValueError("append requires a non-empty fingerprint")
    probe = ds.take(1)
    if probe and _probe_dim(probe[0][man["emb_col"]]) != man["dim"]:
        raise ValueError(
            f"append dim {_probe_dim(probe[0][man['emb_col']])} != index dim {man['dim']}"
        )
    planes = _planes(man["n_planes"], man["dim"])
    pref = ray.put(planes)
    emb_col, id_col = man["emb_col"], man["id_col"]

    def assign(t: pa.Table) -> np.ndarray:
        pl = ray.get(pref)
        m = _norm(embedding_matrix(t.column(emb_col)))
        bits = (m @ pl.T > 0).astype(np.int64)
        return bits @ (1 << np.arange(pl.shape[0]))

    _write_partitioned(
        ds, index_dir, "bucket", assign, id_col, emb_col, fingerprint,
        rows_per_part, epoch=_epoch_tag(fingerprint),
    )
    rows_by_bucket, _ = _scan_partition_stats(index_dir, "bucket")
    gens = man.get("generations", [man["fingerprint"]])
    if fingerprint not in gens:
        gens.append(fingerprint)
    man.update(
        {
            "buckets": {int(b): int(r) for b, r in rows_by_bucket.items()},
            "rows": int(sum(rows_by_bucket.values())),
            "generations": gens,
        }
    )
    tmp = os.path.join(index_dir, INDEX_MANIFEST + ".tmp-rw")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(index_dir, INDEX_MANIFEST))
    return man


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
    paths = _partition_parquet_files(
        index_dir, [f"bucket={int(b):04d}" for b in sorted(map(int, probe))]
    )
    if not paths:
        return pd.DataFrame({man["id_col"]: [], "score": []})
    from .vector import cosine_topk

    ds = rd.read_parquet(paths, columns=[man["id_col"], man["emb_col"]])
    return cosine_topk(ds, q, emb_col=man["emb_col"], id_col=man["id_col"], k=k, min_score=min_score)


def _ivf_probe_lists(man: dict, q: np.ndarray, n_probe: int) -> np.ndarray:
    C = np.asarray(man["centroids"], np.float64)
    return np.argsort(-(C @ q), kind="stable")[:n_probe]


def query_ivf_index(
    index_dir: str,
    query_vec: np.ndarray,
    k: int = 10,
    n_probe: int = 8,
) -> pd.DataFrame:
    """Trained-IVF query: read ONLY the ``n_probe`` nearest lists' part
    files, score with the streaming kernel, merge the ≤ k-per-batch
    candidates on the driver. Returns (id_col, cosine) ranked
    (cosine desc, id asc) — identical to ``knn_ivf_trained`` with the same
    centroids (parity-tested), at a fraction of the IO (bytes actually
    read = the probed lists' files; ``ivf_scan_stats`` reports it)."""
    import functools

    import ray.data as rd

    man = load_index_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no index manifest under {index_dir}")
    q = _norm(np.asarray(query_vec, np.float64))
    probe = _ivf_probe_lists(man, q, n_probe)
    paths = _partition_parquet_files(
        index_dir, [f"list={int(b):04d}" for b in sorted(int(x) for x in probe)]
    )
    id_col, emb_col = man["id_col"], man["emb_col"]
    if not paths:
        return pd.DataFrame({id_col: [], "cosine": pd.Series([], dtype="float64")})
    qref = ray.put(q)

    def score(t: pa.Table, qref=qref) -> pa.Table:
        q_ = ray.get(qref)
        ids = t.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
        m = _norm(embedding_matrix(t.column(emb_col)))
        sims = m @ q_
        order = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order].tolist(), t.column(id_col).type),
                "cosine": pa.array(np.round(sims[order], 6), pa.float64()),
            }
        )

    cands = rd.read_parquet(paths, columns=[id_col, emb_col]).map_batches(
        functools.partial(score), batch_format="pyarrow", batch_size=4096
    )
    df = cands.to_pandas()
    if df.empty:
        return pd.DataFrame({id_col: [], "cosine": pd.Series([], dtype="float64")})
    return (
        df.sort_values(["cosine", id_col], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def query_ivfpq_index(
    index_dir: str,
    query_vec: np.ndarray,
    k: int = 10,
    n_probe: int = 8,
    refine_index_dir: str | None = None,
    refine_factor: int = 4,
) -> pd.DataFrame:
    """IVF-PQ query: read ONLY the ``n_probe`` nearest lists' CODE files
    (m bytes/row instead of the full vector), score by ADC table lookup,
    merge the ≤ shortlist-per-batch candidates on the driver. Returns
    (id_col, adc_score) ranked by the approximate score.

    ``refine_index_dir`` (FAISS refine stage): re-rank the top
    ``k * refine_factor`` ADC candidates EXACTLY against a full-vector
    ``build_ivf_index`` sidecar built with the SAME centroids — the
    shortlist's rows live in the same probed lists by construction, so the
    refine pass reads only those lists' files too (never the corpus) and
    returns (id_col, cosine) with exact cosines."""
    import ray.data as rd

    from ..functions.knn import pq_adc_lut, pq_adc_scores

    man = load_index_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no index manifest under {index_dir}")
    if man.get("kind") != "ivf_pq":
        raise ValueError(f"not an ivf_pq index: kind={man.get('kind')!r}")
    q = _norm(np.asarray(query_vec, np.float64))
    lut = pq_adc_lut(q, np.asarray(man["codebooks"], np.float64))
    probe = _ivf_probe_lists(man, q, n_probe)
    probe_dirs = [f"list={int(b):04d}" for b in sorted(int(x) for x in probe)]
    id_col, code_col = man["id_col"], man["code_col"]
    shortlist_k = max(k, k * refine_factor) if refine_index_dir is not None else k
    out_score = "cosine" if refine_index_dir is not None else "adc_score"
    empty = pd.DataFrame({id_col: [], out_score: pd.Series([], dtype="float64")})
    rman = None
    if refine_index_dir is not None:
        # validate the refine sidecar BEFORE the distributed ADC scan — a
        # stale/mismatched sidecar must fail fast, not after the IO
        rman = load_index_manifest(refine_index_dir)
        if rman is None or rman.get("kind") != "ivf_trained":
            raise ValueError(f"refine_index_dir must hold an ivf_trained sidecar: {refine_index_dir}")
        if rman["id_col"] != id_col:
            raise ValueError(f"refine id_col {rman['id_col']!r} != index id_col {id_col!r}")
        if rman["centroids"] != man["centroids"]:
            raise ValueError("refine sidecar was built with different centroids")
        if rman["lists"] != man["lists"]:
            raise ValueError(
                "refine sidecar rows don't match the pq index (stale after an "
                "append? append to BOTH sidecars, or rebuild)"
            )
    paths = _partition_parquet_files(index_dir, probe_dirs)
    if not paths:
        return empty
    lref = ray.put(lut)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # embedding_matrix gives (0, 0) — skip the LUT kernel
            return pa.table(
                {id_col: pa.array([], t.column(id_col).type), "adc_score": pa.array([], pa.float64())}
            )
        lut_ = ray.get(lref)
        ids = t.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
        # round BEFORE the per-batch cut so shortlist membership at rounding
        # ties is independent of file/batch layout (append epochs re-batch)
        sims = np.round(pq_adc_scores(embedding_matrix(t.column(code_col), np.uint8), lut_), 6)
        order = np.lexsort((ids, -sims))[:shortlist_k]
        return pa.table(
            {
                id_col: pa.array(ids[order].tolist(), t.column(id_col).type),
                "adc_score": pa.array(sims[order], pa.float64()),
            }
        )

    df = (
        rd.read_parquet(paths, columns=[id_col, code_col])
        .map_batches(score, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    if df.empty:
        return empty
    short = (
        df.sort_values(["adc_score", id_col], ascending=[False, True], kind="mergesort")
        .head(shortlist_k)
        .reset_index(drop=True)
    )
    if refine_index_dir is None:
        return short.head(k).reset_index(drop=True)

    rpaths = _partition_parquet_files(refine_index_dir, probe_dirs)
    if not rpaths:
        return empty
    remb = rman["emb_col"]
    wref = ray.put(short[id_col].to_numpy())
    qref = ray.put(q)

    def exact(t: pa.Table) -> pa.Table:
        w, q_ = ray.get(wref), ray.get(qref)
        ids = t.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
        mask = np.isin(ids, w)
        id_type = t.column(id_col).type
        if not mask.any():
            return pa.table({id_col: pa.array([], id_type), "cosine": pa.array([], pa.float64())})
        X = _norm(embedding_matrix(t.column(remb)))[mask]
        ids = ids[mask]
        sims = np.round(X @ q_, 6)
        order = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order].tolist(), id_type),
                "cosine": pa.array(sims[order], pa.float64()),
            }
        )

    rdf = (
        rd.read_parquet(rpaths, columns=[id_col, remb])
        .map_batches(exact, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    if rdf.empty:
        return empty
    return (
        rdf.sort_values(["cosine", id_col], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def ivf_scan_stats(index_dir: str, query_vec: np.ndarray, n_probe: int = 8) -> dict:
    """IO accounting for one query: bytes/rows of the probed lists vs the
    whole index — BYTES READ, not a mask fraction (the r4 verdict's exact
    complaint about the streaming path's 'scan_frac')."""
    man = load_index_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no index manifest under {index_dir}")
    q = _norm(np.asarray(query_vec, np.float64))
    probe = {int(x) for x in _ivf_probe_lists(man, q, n_probe)}
    rows_total = sum(man["lists"].values())
    bytes_total = sum(man["bytes"].values())
    rows_probed = sum(n for b, n in man["lists"].items() if int(b) in probe)
    bytes_probed = sum(n for b, n in man["bytes"].items() if int(b) in probe)
    return {
        "rows_probed": rows_probed,
        "rows_total": rows_total,
        "bytes_probed": bytes_probed,
        "bytes_total": bytes_total,
        "bytes_frac": round(bytes_probed / bytes_total, 4) if bytes_total else 0.0,
        "rows_frac": round(rows_probed / rows_total, 4) if rows_total else 0.0,
    }


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
