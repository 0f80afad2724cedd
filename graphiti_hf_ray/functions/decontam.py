"""Benchmark decontamination: flag / drop corpus documents that overlap a
held-out evaluation set by whole n-grams.

The standard training-data hygiene pass (n-gram collision against the
benchmark suite, as popularized by large-LM training reports): any document
sharing at least one length-``n`` token window with a benchmark text is
contaminated and must be excluded from training. The reference has no such
operator (its corpus is the user's own graph episodes); at 100 TB ingest it
is non-optional, so it ships as a first-class corpus op alongside the dedup
family (``functions/dedup.py``).

Scale shape — broadcast small side, stream the corpus, zero shuffle:

- the benchmark suite is tiny relative to the corpus BY DEFINITION (eval
  sets are thousands of documents, the corpus is billions). Its n-gram set
  is built once and broadcast via ``ray.put``; every map task reads the
  same object-store copy — never re-shipped per batch.
- the corpus pass is one stateful-actor ``map_batches``: each task slides
  an n-token window per doc and counts membership hits in the broadcast
  set. No exchange, no materialization; output adds two narrow columns.
- if a benchmark ever outgrew driver memory, the fallback is the dedup
  family's bucketed join (shingle both sides, hash-partition on the gram)
  — the ``mode="pairs"`` shape below keeps that door open but is not
  needed for real benchmark sizes.
"""

from __future__ import annotations

import pyarrow as pa

import ray

__all__ = ["benchmark_ngrams", "collision_positions", "redact_tokens", "ngram_decontaminate"]


def benchmark_ngrams(texts: list[str], n: int = 8) -> frozenset[str]:
    """All length-``n`` whitespace-token windows of the benchmark texts
    (every position; texts shorter than ``n`` tokens contribute nothing —
    too short to be evidence of contamination)."""
    grams: set[str] = set()
    for t in texts:
        toks = (t or "").split()
        for i in range(len(toks) - n + 1):
            grams.add(" ".join(toks[i : i + n]))
    return frozenset(grams)


def collision_positions(toks: list[str], grams: frozenset[str], n: int) -> list[int]:
    """Start positions ``i`` where ``toks[i:i+n]`` is a benchmark n-gram."""
    return [
        i for i in range(len(toks) - n + 1) if " ".join(toks[i : i + n]) in grams
    ]


def redact_tokens(
    toks: list[str], grams: frozenset[str], n: int
) -> tuple[list[str], int]:
    """Remove every token covered by a colliding n-gram window, to a
    FIXPOINT: splicing the survivors together can create NEW collisions
    (``a b [X Y] c d`` → ``a b c d`` may newly contain the gram ``b c``),
    so re-scan until clean. Terminates because each round strictly removes
    tokens. Returns (surviving tokens — a subsequence of the input —,
    n_removed). Invariant (property-tested): the result contains no
    benchmark n-gram."""
    removed = 0
    while True:
        hits = collision_positions(toks, grams, n)
        if not hits:
            return toks, removed
        bad = [False] * len(toks)
        for i in hits:
            for j in range(i, i + n):
                bad[j] = True
        toks = [t for t, b in zip(toks, bad) if not b]
        removed += sum(bad)


class _ContamCounter:
    """Actor-pool stage: count benchmark n-gram collisions per document.

    The benchmark gram set is fetched from the object store ONCE per actor
    (``__init__``), not per batch."""

    def __init__(self, grams_ref: "ray.ObjectRef", n: int, text_col: str, redact: bool = False):
        self.grams: frozenset[str] = ray.get(grams_ref)
        self.n = n
        self.text_col = text_col
        self.redact = redact

    def __call__(self, batch: pa.Table) -> pa.Table:
        n, grams = self.n, self.grams
        counts: list[int] = []
        removed: list[int] = []
        texts_out: list[str] = []
        for t in batch.column(self.text_col).to_pylist():
            toks = (t or "").split()
            counts.append(len(collision_positions(toks, grams, n)))
            if self.redact:
                if counts[-1] == 0:
                    # untouched docs keep their original whitespace exactly
                    removed.append(0)
                    texts_out.append(t)
                else:
                    kept, gone = redact_tokens(toks, grams, n)
                    removed.append(gone)
                    texts_out.append(" ".join(kept))
        out = batch.append_column("n_contaminated_ngrams", pa.array(counts, pa.int64()))
        out = out.append_column(
            "contaminated", pa.array([c > 0 for c in counts], pa.bool_())
        )
        if self.redact:
            i = out.schema.get_field_index(self.text_col)
            out = out.set_column(i, self.text_col, pa.array(texts_out, pa.string()))
            out = out.append_column("n_redacted_tokens", pa.array(removed, pa.int64()))
        return out


def ngram_decontaminate(
    docs: "ray.data.Dataset",
    benchmark_texts: list[str],
    n: int = 8,
    text_col: str = "text",
    mode: str = "mark",
    concurrency: tuple[int, int] | int = (1, 8),
) -> "ray.data.Dataset":
    """Mark (``mode="mark"``), drop (``mode="filter"``), or span-redact
    (``mode="redact"``) documents whose text shares any length-``n`` token
    window with ``benchmark_texts``.

    ``mark`` appends ``n_contaminated_ngrams`` (collision positions, not
    distinct grams) and ``contaminated``; ``filter`` returns only the clean
    rows with the probe columns removed (training-set shape); ``redact``
    keeps every row but removes the contaminated token spans from
    ``text_col`` (to a fixpoint — the result provably contains no benchmark
    n-gram; see ``redact_tokens``), appending the probe columns plus
    ``n_redacted_tokens``. Redacted docs lose their original whitespace
    (tokens rejoin with single spaces); untouched docs are byte-identical."""
    if mode not in ("mark", "filter", "redact"):
        raise ValueError(f"unknown mode {mode!r}")
    grams_ref = ray.put(benchmark_ngrams(benchmark_texts, n=n))
    marked = docs.map_batches(
        _ContamCounter,
        fn_constructor_kwargs={
            "grams_ref": grams_ref, "n": n, "text_col": text_col,
            "redact": mode == "redact",
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    if mode in ("mark", "redact"):
        return marked

    def keep_clean(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        clean = t.filter(pc.equal(t.column("n_contaminated_ngrams"), pa.scalar(0)))
        return clean.drop_columns(["n_contaminated_ngrams", "contaminated"])

    return marked.map_batches(keep_clean, batch_format="pyarrow")
