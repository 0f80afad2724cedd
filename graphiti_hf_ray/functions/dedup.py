"""Deduplication family over a documents table (training-data ops).

All variants follow the same Ray-Data shape (ray_guide.md "Aggregation at
scale"): vectorized signature computation inside ``map_batches`` →
hash-partitioned ``groupby`` on the signature/bucket key → per-group
resolution. Nothing materializes the corpus driver-side.

- ``exact_dedup``            — md5(text) → groupby(hash).first (D1 analog)
- ``minhash_lsh_candidates`` — k-shingle → 64-perm MinHash → banded LSH
                               buckets → candidate pairs → exact-Jaccard
                               verification
- ``simhash_dedup``          — 64-bit SimHash + 16-bit band buckets →
                               Hamming-verified near-dup pairs
- ``ngram_jaccard_pairs``    — exact n-gram Jaccard via shingle explode +
                               pair counting (the SQL-oracle-able variant)
- ``embedding_neardup``      — cosine >= t pairs over an embedding column
                               (brute-force within LSH-ish label buckets)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

MERSENNE = (1 << 61) - 1
N_PERM = 64
N_BANDS = 8  # 8 bands x 8 rows
SHINGLE_K = 5


def _token_hashes(text: str, k: int = SHINGLE_K) -> np.ndarray:
    toks = text.split(" ")
    if len(toks) < k:
        shingles = [" ".join(toks)]
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little") for s in set(shingles)),
        dtype=np.uint64,
        count=len(set(shingles)),
    )


# deterministic permutation parameters (no RNG): a_i, b_i from md5 of i
def _perm_params(n: int = N_PERM) -> tuple[np.ndarray, np.ndarray]:
    a = np.empty(n, np.uint64)
    b = np.empty(n, np.uint64)
    for i in range(n):
        d = hashlib.md5(f"perm:{i}".encode()).digest()
        a[i] = (int.from_bytes(d[:8], "little") % (MERSENNE - 1)) + 1
        b[i] = int.from_bytes(d[8:16], "little") % MERSENNE
    return a, b


_PA, _PB = _perm_params()


def minhash_signature(text: str) -> np.ndarray:
    h = _token_hashes(text)
    if h.size == 0:
        return np.zeros(N_PERM, np.uint64)
    # (a*h + b) mod 2^64, min over shingles, per permutation — pure uint64
    # wraparound arithmetic (a valid universal-ish hash family, ~50× faster
    # than bigint mod-Mersenne; deterministic across platforms)
    with np.errstate(over="ignore"):
        vals = h[:, None] * _PA[None, :] + _PB[None, :]
    return np.min(vals, axis=0)


# ---------------------------------------------------------------------------


def exact_dedup(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """One row per distinct text: (fingerprint, keep_doc_id = min, n_dups)."""

    def add_hash(t: pa.Table) -> pa.Table:
        fp = pa.array([hashlib.md5(x.encode()).hexdigest() for x in t.column("text").to_pylist()])
        return pa.table({"fingerprint": fp, "doc_id": t.column("doc_id")})

    def first(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("fingerprint", as_index=False, sort=False).agg(
            keep_doc_id=("doc_id", "min"), n_dups=("doc_id", "size")
        )

    from ..stages.shuffle import bucketed_group_apply

    return bucketed_group_apply(
        docs.map_batches(add_hash, batch_format="pyarrow"), ["fingerprint"], first
    )


def minhash_lsh_candidates(docs: "ray.data.Dataset", jaccard_threshold: float = 0.5) -> "ray.data.Dataset":
    """Near-dup pairs via MinHash banding, then exact-Jaccard verified.

    Emits (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.
    Scale shape: signatures are 64 uint64 per doc; band rows shuffle by
    (band_id, band_hash); verification re-shingles only candidate groups.
    """

    def sig_rows(t: pa.Table) -> pa.Table:
        """Band rows carry (band_id, band_hash, doc_id) ONLY — text never
        enters the shuffle (8 band rows per doc would ship it 8×)."""
        ids, texts = t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        band_id, band_hash, doc_id = [], [], []
        rows_per_band = N_PERM // N_BANDS
        for d, x in zip(ids, texts):
            sig = minhash_signature(x)
            for b in range(N_BANDS):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                band_id.append(b)
                band_hash.append(hashlib.md5(chunk.tobytes()).hexdigest())
                doc_id.append(d)
        return pa.table(
            {
                "band_id": pa.array(band_id, pa.int32()),
                "band_hash": pa.array(band_hash, pa.string()),
                "doc_id": pa.array(doc_id, pa.int64()),
            }
        )

    from ..stages.shuffle import bucketed_group_apply

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby(["band_id", "band_hash"], sort=False):
            ids = sorted(set(g["doc_id"]))
            if len(ids) < 2:
                continue
            idx_a, idx_b = np.triu_indices(len(ids), k=1)
            arr = np.asarray(ids, np.int64)
            outs.append(pd.DataFrame({"doc_a": arr[idx_a], "doc_b": arr[idx_b]}))
        if not outs:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True).drop_duplicates(["doc_a", "doc_b"])

    cand_pairs = bucketed_group_apply(
        docs.map_batches(sig_rows, batch_format="pyarrow", batch_size=512),
        ["band_id", "band_hash"], per_bucket,
    )
    # distinct across bands
    cand_pairs = bucketed_group_apply(
        cand_pairs, ["doc_a", "doc_b"], lambda df: df.drop_duplicates(["doc_a", "doc_b"])
    )
    pairs_df = cand_pairs.to_pandas()  # candidates ≪ corpus by LSH design
    if pairs_df.empty:
        return ray.data.from_pandas(
            pd.DataFrame({"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64"), "jaccard": pd.Series([], dtype="float64")})
        )

    # exact-Jaccard verification: re-scan ONLY candidate docs' shingles
    cand_ids = sorted(set(pairs_df["doc_a"]) | set(pairs_df["doc_b"]))
    want = pa.array(cand_ids, pa.int64())

    def shingles_of(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_in(t.column("doc_id"), value_set=want))
        ids = t.column("doc_id").to_pylist()
        hs = [",".join(map(str, sorted(_token_hashes(x).tolist()))) for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "sh": pa.array(hs, pa.string())})

    sh_rows = docs.map_batches(shingles_of, batch_format="pyarrow").take_all()
    sh = {r["doc_id"]: set(map(int, r["sh"].split(","))) if r["sh"] else set() for r in sh_rows}
    a_out, b_out, j_out = [], [], []
    for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
        sa, sb = sh[a], sh[b]
        union = len(sa | sb)
        jac = len(sa & sb) / union if union else 0.0
        if jac >= jaccard_threshold:
            a_out.append(int(a))
            b_out.append(int(b))
            j_out.append(round(jac, 6))
    return ray.data.from_pandas(pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "jaccard": j_out}))


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (md5 token hashes)."""
    acc = np.zeros(64, np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok in text.split(" "):
        h = np.uint64(int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little"))
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == np.uint64(1), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_pairs(docs: "ray.data.Dataset", max_hamming: int = 3) -> "ray.data.Dataset":
    """Near-dup pairs with Hamming(simhash) <= max_hamming, found via
    4x16-bit band bucketing (any pair within distance 3 shares a band)."""

    def sig_rows(t: pa.Table) -> pa.Table:
        ids, texts = t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        band_id, band_val, doc_id, sh = [], [], [], []
        for d, x in zip(ids, texts):
            s = simhash64(x)
            for b in range(4):
                band_id.append(b)
                band_val.append((s >> (16 * b)) & 0xFFFF)
                doc_id.append(d)
                sh.append(s)
        return pa.table(
            {
                "band_id": pa.array(band_id, pa.int32()),
                "band_val": pa.array(band_val, pa.int64()),
                "doc_id": pa.array(doc_id, pa.int64()),
                "simhash": pa.array(sh, pa.uint64()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].tolist()
        sigs = g["simhash"].tolist()
        a_out, b_out, d_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(int(sigs[i]) ^ int(sigs[j])).count("1")
                if d <= max_hamming:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    d_out.append(d)
        return pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "hamming": d_out})

    from ..stages.shuffle import bucketed_group_apply

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = [bucket_pairs(g) for _, g in df.groupby(["band_id", "band_val"], sort=False)]
        if not outs:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64"), "hamming": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    pairs = bucketed_group_apply(
        docs.map_batches(sig_rows, batch_format="pyarrow", batch_size=512),
        ["band_id", "band_val"], per_bucket,
    )
    return bucketed_group_apply(pairs, ["doc_a", "doc_b"], lambda df: df.drop_duplicates(["doc_a", "doc_b"]))


def ngram_jaccard_pairs(docs: "ray.data.Dataset", k: int = 3, threshold: float = 0.5) -> "ray.data.Dataset":
    """EXACT n-gram Jaccard >= threshold pairs via shingle explode +
    pair-count aggregation — the fully SQL-expressible variant (the DuckDB
    oracle mirrors it with unnest + self-join).

    Shuffle shape: explode to (shingle, doc) rows, groupby(shingle) emits
    per-bucket co-occurring pairs with counts, second groupby sums
    intersections; |shingles| per doc comes from doc_stats.
    """

    def shingle_rows(t: pa.Table) -> pa.Table:
        ids, texts = t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        sid, did = [], []
        sizes_id, sizes_n = [], []
        for d, x in zip(ids, texts):
            toks = x.split(" ")
            sh = set(" ".join(toks[i : i + k]) for i in range(max(1, len(toks) - k + 1)))
            for s in sh:
                sid.append(hashlib.md5(s.encode()).hexdigest())
                did.append(d)
            sizes_id.append(d)
            sizes_n.append(len(sh))
        t1 = pa.table({"shingle": pa.array(sid), "doc_id": pa.array(did, pa.int64())})
        return t1

    def sizes_rows(t: pa.Table) -> pa.Table:
        ids, texts = t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        out_n = []
        for x in texts:
            toks = x.split(" ")
            out_n.append(len(set(" ".join(toks[i : i + k]) for i in range(max(1, len(toks) - k + 1)))))
        return pa.table({"doc_id": t.column("doc_id"), "n_shingles": pa.array(out_n, pa.int64())})

    shingles = docs.map_batches(shingle_rows, batch_format="pyarrow")
    sizes = docs.map_batches(sizes_rows, batch_format="pyarrow")
    size_map = {r["doc_id"]: r["n_shingles"] for r in sizes.take_all()}  # small: one int per doc
    size_ref = ray.put(size_map)

    from ..stages.shuffle import bucketed_group_apply

    def co_pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("shingle", sort=False):
            ids = sorted(set(g["doc_id"]))
            if len(ids) < 2:
                continue
            idx_a, idx_b = np.triu_indices(len(ids), k=1)
            arr = np.asarray(ids, np.int64)
            outs.append(pd.DataFrame({"doc_a": arr[idx_a], "doc_b": arr[idx_b]}))
        if not outs:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64"), "n": pd.Series([], dtype="int64")})
        out = pd.concat(outs, ignore_index=True)
        # partial pre-aggregation: count co-occurrences within this bucket
        return out.groupby(["doc_a", "doc_b"], as_index=False, sort=False).agg(n=("doc_a", "size"))

    co = bucketed_group_apply(shingles, ["shingle"], co_pairs)

    def verify(df: pd.DataFrame, _ref=size_ref) -> pd.DataFrame:
        sizes = ray.get(_ref)  # local object-store hit (broadcast once driver-side)
        agg = df.groupby(["doc_a", "doc_b"], as_index=False, sort=False)["n"].sum()
        na = agg["doc_a"].map(sizes).astype("int64")
        nb = agg["doc_b"].map(sizes).astype("int64")
        union = na + nb - agg["n"]
        jac = agg["n"] / union.where(union > 0, 1)
        keep = jac >= threshold
        out = agg.loc[keep, ["doc_a", "doc_b"]].reset_index(drop=True)
        out["jaccard"] = jac[keep].round(6).values
        return out

    return bucketed_group_apply(co, ["doc_a", "doc_b"], verify)


def embedding_neardup(emb: "ray.data.Dataset", threshold: float = 0.95) -> "ray.data.Dataset":
    """Cosine-similar pairs over an embedding column.

    Broadcasts the (id, vector) matrix once via ``ray.put`` and scans it
    per batch with one matmul — brute force O(n·B) per batch, the correct
    baseline; the scale path buckets by coarse LSH sign-bits first."""
    rows = emb.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in rows], np.int64)
    mat = np.stack([np.asarray(r["embedding"], np.float64) for r in rows])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    class Scan:
        def __init__(self, ref):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            bid = np.asarray(t.column("vec_id").to_pylist(), np.int64)
            bm = np.stack([np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()])
            bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
            sims = bm @ self.mat.T
            a_out, b_out, s_out = [], [], []
            for i in range(len(bid)):
                js = np.where(sims[i] >= threshold)[0]
                for j in js:
                    if bid[i] < self.ids[j]:
                        a_out.append(int(bid[i]))
                        b_out.append(int(self.ids[j]))
                        s_out.append(round(float(sims[i, j]), 6))
            return pa.table(
                {
                    "vec_a": pa.array(a_out, pa.int64()),
                    "vec_b": pa.array(b_out, pa.int64()),
                    "cosine": pa.array(s_out, pa.float64()),
                }
            )

    return emb.map_batches(Scan, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4), fn_constructor_args=(ref,))
