"""Token-window document chunking (training-data prep for LLM pipelines).

Splits each document into overlapping fixed-token-budget windows — the
standard pre-embedding / pre-training segmentation step (the reference
operates on whole episode bodies, graphiti_core/nodes.py:353-363; chunking
is the corpus-side op a 100 TB ingest needs BEFORE episodes are that
small). Pure flat explode: one ``map_batches`` pass, zero shuffle, output
row count ≈ corpus tokens / stride. Chunk identity is ``(doc_id,
chunk_idx)`` with token offsets kept so downstream joins (embeddings,
near-dup verdicts) can map back to source spans.

Tokens are whitespace tokens (the same unit ``functions/textstats`` counts
and ``functions/dedup`` shingles over), so budgets compose with the rest
of the corpus ops. Invariants (unit-tested):

- every chunk has ``n_tokens <= max_tokens``;
- consecutive chunks of one doc overlap by exactly ``overlap`` tokens
  (except the last, which may be shorter);
- concatenating each chunk's non-overlapping suffix reproduces the doc's
  token stream exactly (lossless coverage);
- a doc with ``<= max_tokens`` tokens yields exactly one chunk; an empty
  doc yields none.

Scale shape: stateless, embarrassingly parallel, streams block-by-block.
The only knob that matters at 100 TB is output block size — chunks are
strictly smaller than their documents, so the default block sizing holds.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["chunk_documents"]


def chunk_batch(
    t: pa.Table,
    max_tokens: int,
    overlap: int,
    id_col: str,
    text_col: str,
) -> pa.Table:
    """One batch: explode documents into chunk rows (vectorized assembly,
    per-doc Python only for the split — the kernel unit is Python strings,
    same justification as textstats)."""
    stride = max_tokens - overlap
    ids_out, idx_out, start_out, ntok_out, text_out = [], [], [], [], []
    ids = t.column(id_col).to_pylist()
    texts = t.column(text_col).to_pylist()
    for d, txt in zip(ids, texts):
        toks = txt.split() if txt else []
        n = len(toks)
        if n == 0:
            continue
        pos, ci = 0, 0
        while True:
            window = toks[pos : pos + max_tokens]
            ids_out.append(d)
            idx_out.append(ci)
            start_out.append(pos)
            ntok_out.append(len(window))
            text_out.append(" ".join(window))
            if pos + max_tokens >= n:
                break
            pos += stride
            ci += 1
    return pa.table(
        {
            id_col: pa.array(ids_out, t.column(id_col).type),
            "chunk_idx": pa.array(idx_out, pa.int32()),
            "start_tok": pa.array(start_out, pa.int64()),
            "n_tokens": pa.array(ntok_out, pa.int32()),
            "text": pa.array(text_out, pa.string()),
        }
    )


def chunk_documents(
    docs: "object",
    max_tokens: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "object":
    """Dataset[(id, text)] → Dataset[(id, chunk_idx, start_tok, n_tokens,
    text)] via one zero-shuffle ``map_batches`` explode. ``overlap`` tokens
    of context are repeated between consecutive chunks (0 = disjoint)."""
    if not (0 <= overlap < max_tokens):
        raise ValueError("need 0 <= overlap < max_tokens")
    import functools

    return docs.map_batches(
        functools.partial(
            chunk_batch,
            max_tokens=max_tokens,
            overlap=overlap,
            id_col=id_col,
            text_col=text_col,
        ),
        batch_format="pyarrow",
    )
