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

__all__ = ["benchmark_ngrams", "ngram_decontaminate"]


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


class _ContamCounter:
    """Actor-pool stage: count benchmark n-gram collisions per document.

    The benchmark gram set is fetched from the object store ONCE per actor
    (``__init__``), not per batch."""

    def __init__(self, grams_ref: "ray.ObjectRef", n: int, text_col: str):
        self.grams: frozenset[str] = ray.get(grams_ref)
        self.n = n
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n, grams = self.n, self.grams
        counts = []
        for t in batch.column(self.text_col).to_pylist():
            toks = (t or "").split()
            c = 0
            for i in range(len(toks) - n + 1):
                if " ".join(toks[i : i + n]) in grams:
                    c += 1
            counts.append(c)
        out = batch.append_column("n_contaminated_ngrams", pa.array(counts, pa.int64()))
        return out.append_column(
            "contaminated", pa.array([c > 0 for c in counts], pa.bool_())
        )


def ngram_decontaminate(
    docs: "ray.data.Dataset",
    benchmark_texts: list[str],
    n: int = 8,
    text_col: str = "text",
    mode: str = "mark",
    concurrency: tuple[int, int] | int = (1, 8),
) -> "ray.data.Dataset":
    """Mark (``mode="mark"``) or drop (``mode="filter"``) documents whose
    text shares any length-``n`` token window with ``benchmark_texts``.

    ``mark`` appends ``n_contaminated_ngrams`` (collision positions, not
    distinct grams) and ``contaminated``; ``filter`` returns only the clean
    rows with the probe columns removed (training-set shape)."""
    if mode not in ("mark", "filter"):
        raise ValueError(f"unknown mode {mode!r}")
    grams_ref = ray.put(benchmark_ngrams(benchmark_texts, n=n))
    marked = docs.map_batches(
        _ContamCounter,
        fn_constructor_kwargs={"grams_ref": grams_ref, "n": n, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    if mode == "mark":
        return marked

    def keep_clean(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        clean = t.filter(pc.equal(t.column("n_contaminated_ngrams"), pa.scalar(0)))
        return clean.drop_columns(["n_contaminated_ngrams", "contaminated"])

    return marked.map_batches(keep_clean, batch_format="pyarrow")
