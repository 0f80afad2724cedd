"""Sequence packing: assemble chunk rows into fixed-token-budget training
sequences (the step between chunking and batching in an LLM data pipeline —
packing short pieces together so no budget is wasted on padding).

Algorithm: greedy NEXT-FIT per bucket. Chunks are hash-partitioned by
``id_col`` (all chunks of one document co-locate, so a document's windows
tend to share packs and provenance stays local), ordered by ``(id_col,
idx_col)`` inside the bucket, and accumulated into the current pack until
the next chunk would overflow ``budget`` — then the pack closes and a new
one starts. A chunk alone larger than ``budget`` is rejected up front
(callers chunk with ``max_tokens <= budget``).

Determinism and the partitioning assumption: pack composition depends on
which bucket a document hashes into, so ``num_buckets`` is a FIXED default
(64), not a cluster-sized value — the same corpus packs identically on any
cluster. Pack ids are ``md5(bucket:seq)``: stable across reruns.

Scale shape: one hash exchange (the chunk stream, already smaller than the
corpus after dedup/filter), then per-bucket sequential packing — the only
inherently order-dependent step, bounded by bucket size, O(bucket) memory
via the pandas group. No driver materialization; output rows ≈ input
tokens / budget.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

__all__ = ["pack_chunks", "next_fit_pack"]


def next_fit_pack(items: list[tuple], budget: int) -> list[list[int]]:
    """Pure next-fit kernel: ``items`` = [(n_tokens, ...), ...] in final
    order; returns pack membership as lists of item indices. The Dataset
    operator below is this kernel per bucket; tests property-check it
    directly (no Ray needed)."""
    packs: list[list[int]] = []
    cur: list[int] = []
    cur_toks = 0
    for i, it in enumerate(items):
        nt = int(it[0])
        if nt > budget:
            raise ValueError(f"item {i} has {nt} tokens > budget {budget}")
        if cur and cur_toks + nt > budget:
            packs.append(cur)
            cur, cur_toks = [], 0
        cur.append(i)
        cur_toks += nt
    if cur:
        packs.append(cur)
    return packs


def pack_chunks(
    chunks: "object",
    budget: int,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tok_col: str = "n_tokens",
    text_col: str = "text",
    num_buckets: int = 64,
    id_salt: str = "",
) -> "object":
    """Dataset[(doc_id, chunk_idx, n_tokens, text)] → Dataset[(pack_id,
    n_chunks, n_tokens, text, members)].

    ``text`` is the packed token stream (member texts joined by a single
    space, in order); ``members`` is the provenance list as
    ``"doc:idx,doc:idx,..."``. Raises on any chunk with
    ``n_tokens > budget`` (no silent truncation).

    ``id_salt`` namespaces the pack ids: pack_id = md5(salt:bucket:seq).
    The default "" keeps the historical ids; any writer adding packs
    NEXT TO an existing set (append_training_set) MUST pass a per-batch
    salt, or its (bucket, seq) ids collide with the base set's."""
    from ..stages.shuffle import bucketed_group_apply

    def pack_one(bucket: int, df: pd.DataFrame, out: dict) -> None:
        df = df.sort_values([id_col, idx_col], kind="mergesort")
        rows = list(zip(df[tok_col], df[id_col], df[idx_col], df[text_col]))
        try:
            packs = next_fit_pack(rows, budget)
        except ValueError as e:
            raise ValueError(f"{e}; chunk with max_tokens <= budget") from e
        pid_prefix = f"{id_salt}:" if id_salt else ""
        for seq, member_idxs in enumerate(packs):
            ms = [rows[i] for i in member_idxs]
            out["pack_id"].append(hashlib.md5(f"{pid_prefix}{bucket}:{seq}".encode()).hexdigest())
            out["n_chunks"].append(len(ms))
            out["n_tokens"].append(sum(int(r[0]) for r in ms))
            out["text"].append(" ".join(r[3] for r in ms))
            out["members"].append(",".join(f"{r[1]}:{r[2]}" for r in ms))

    def pack_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # one hash bucket may hold several _pack_bucket values — pack each
        # independently so pack composition is bucket-count-stable
        out: dict = {"pack_id": [], "n_chunks": [], "n_tokens": [], "text": [], "members": []}
        for b, g in df.groupby("_pack_bucket", sort=True):
            pack_one(int(b), g, out)
        res = pd.DataFrame(out)
        res["n_chunks"] = res["n_chunks"].astype("int64")
        res["n_tokens"] = res["n_tokens"].astype("int64")
        return res

    # carry the bucket index into the group fn so pack ids are bucket-stable
    def tag(t: pa.Table) -> pa.Table:
        keys = t.column(id_col).to_pylist()
        b = [
            int.from_bytes(hashlib.md5(f"pk:{k}".encode()).digest()[:4], "little") % num_buckets
            for k in keys
        ]
        return t.append_column("_pack_bucket", pa.array(b, pa.int32()))

    tagged = chunks.map_batches(tag, batch_format="pyarrow")
    return bucketed_group_apply(tagged, ["_pack_bucket"], pack_bucket, num_buckets=num_buckets)
