"""Corpus-trained byte-level BPE tokenizer (text-analysis family).

The reference never owns a vocabulary — every token count and budget is
delegated to an LLM-provider tokenizer (``graphiti_core/llm_client/
config.py:43`` max_tokens budgets; the provider clients do the counting).
A standalone 100-TB engine cannot call out per document, so this module
trains its own byte-level BPE vocabulary FROM the corpus and applies it
as a streaming map — the ids are self-contained and reproducible.

Scale shape (how real pipelines do it — GPT-2/tiktoken vocabularies are
trained on bounded samples, never the full corpus):

- **Counting is distributed**: an optional deterministic hash-sample,
  then map-side partial pretoken counts (the combiner) → ONE narrow
  (word, count) exchange → a vocabulary-sized driver collect capped at
  ``max_words`` word TYPES (Zipf: the head carries all the merge
  signal). Text never crosses the wire — only (word-type, count) pairs.
- **The merge loop is driver-side by design**: Sennrich BPE is
  inherently sequential per merge (each merge changes the next pair
  statistics), so it runs over the capped word-frequency table with
  incremental pair-count updates — O(types), independent of corpus size.
- **Application is embarrassingly parallel**: the merge ranks ride into
  every worker once (kilobytes), ``encode`` memoizes per distinct
  pretoken, and the corpus tokenizes as a zero-exchange ``map_batches``
  (the ``tokenize=`` seam of ``corpus.iter_training_batches``).

Byte-level guarantees losslessness: ``decode(encode(s)) == s`` for any
unicode string — base vocabulary is the 256 bytes, the pretokenizer
covers every character class, merges only concatenate.
"""

from __future__ import annotations

import json
import re
from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa

# Full-cover pretokenizer: every char is whitespace, letter, digit or
# other, so findall() concatenates back to the input exactly (the
# lossless precondition). RE2-compatible (no lookaheads) like
# textstats.BPE_PATTERN, whose classes it extends with the \s arm.
PRETOKEN_PATTERN = r"\s+|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"

BASE_VOCAB = 256  # byte-level: ids 0..255 are the raw bytes


def word_frequencies(
    ds,
    text_col: str = "text",
    max_words: int = 32768,
    num_buckets: int | None = None,
) -> dict[str, int]:
    """Distributed pretoken-type frequency table, capped at ``max_words``
    types (count desc, word asc tie-break — deterministic). Same shape as
    ``quality.unigram_count_bits``: partial counts per batch, one narrow
    exchange, driver collect of TYPES (bounded), never text rows."""
    from ..stages.shuffle import bucketed_group_apply

    pat = re.compile(PRETOKEN_PATTERN)

    def partial_counts(t: pa.Table) -> pa.Table:
        c: Counter[str] = Counter()
        for x in t.column(text_col).to_pylist():
            if x:
                c.update(pat.findall(x))
        ks = list(c.keys())
        return pa.table(
            {"w": pa.array(ks, pa.string()), "c": pa.array([c[k] for k in ks], pa.int64())}
        )

    def merge(df):
        # each word type lands in exactly ONE bucket, so per-bucket top-k
        # then global top-k is EXACT — and it bounds the driver collect at
        # num_buckets × max_words rows instead of the full type table
        # (billions of types at 100 TB: the Zipf singleton tail)
        g = df.groupby("w", as_index=False, sort=False)["c"].sum()
        g = g.sort_values(["c", "w"], ascending=[False, True], kind="mergesort")
        return g.head(max_words)

    counts = bucketed_group_apply(
        ds.select_columns([text_col]).map_batches(partial_counts, batch_format="pyarrow"),
        ["w"],
        merge,
        num_buckets=num_buckets,
    ).to_pandas()  # ≤ num_buckets × max_words rows (per-bucket cap above)
    if counts.empty:
        return {}
    counts = counts.sort_values(["c", "w"], ascending=[False, True], kind="mergesort")
    head = counts.head(max_words)
    return dict(zip(head["w"], (int(v) for v in head["c"])))


def _merge_pair(syms: list[int], a: int, b: int, new_id: int) -> list[int]:
    """Greedy left-to-right rewrite of every (a, b) adjacency into
    ``new_id`` — the ONE definition of merge semantics, shared by training
    and encoding so encode always reproduces the training segmentation."""
    out: list[int] = []
    j = 0
    n = len(syms)
    while j < n:
        if j + 1 < n and syms[j] == a and syms[j + 1] == b:
            out.append(new_id)
            j += 2
        else:
            out.append(syms[j])
            j += 1
    return out


def learn_bpe(word_counts: dict[str, int], vocab_size: int) -> dict:
    """Driver-side Sennrich merge loop over a word-frequency table.

    Incremental pair-count maintenance (only words containing the merged
    pair are rewritten) plus a lazy-invalidation heap for the argmax, so
    each merge costs O(touched words + log heap) — O(types) overall, not
    O(merges × distinct pairs). Deterministic: best pair = (max count,
    then lexicographically smallest (a, b)). Returns the artifact dict
    ``{"version", "pattern", "merges"}`` — merge i creates token id
    ``BASE_VOCAB + i``."""
    import heapq

    n_merges = vocab_size - BASE_VOCAB
    if n_merges < 0:
        raise ValueError(f"vocab_size must be >= {BASE_VOCAB} (byte base vocabulary)")

    words: list[list[int]] = []
    wcounts: list[int] = []
    for w, c in word_counts.items():
        b = w.encode("utf-8")
        if len(b) >= 2:  # single-symbol words can never host a pair
            words.append(list(b))
            wcounts.append(int(c))

    pair_counts: Counter[tuple[int, int]] = Counter()
    pair_words: defaultdict[tuple[int, int], set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        c = wcounts[i]
        for p in zip(syms, syms[1:]):
            pair_counts[p] += c
            pair_words[p].add(i)

    # heap entries are (-count, a, b); stale entries (count no longer
    # current in pair_counts) are skipped at pop time
    heap = [(-c, p[0], p[1]) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    def bump(p: tuple[int, int], delta: int) -> None:
        pair_counts[p] += delta
        if pair_counts[p] <= 0:
            del pair_counts[p]
        else:
            heapq.heappush(heap, (-pair_counts[p], p[0], p[1]))

    merges: list[tuple[int, int]] = []
    for k in range(n_merges):
        ab = None
        while heap:
            negc, a, b = heapq.heappop(heap)
            if pair_counts.get((a, b)) == -negc:
                ab = (a, b)
                break
        if ab is None:
            break
        a, b = ab
        new_id = BASE_VOCAB + k
        merges.append(ab)
        for i in list(pair_words[ab]):
            syms, c = words[i], wcounts[i]
            for p in zip(syms, syms[1:]):
                bump(p, -c)
                pair_words[p].discard(i)
            out = _merge_pair(syms, a, b, new_id)
            words[i] = out
            for p in zip(out, out[1:]):
                bump(p, c)
                pair_words[p].add(i)

    return {"version": 1, "pattern": PRETOKEN_PATTERN, "merges": [list(m) for m in merges]}


def train_bpe(
    ds,
    text_col: str = "text",
    vocab_size: int = 512,
    max_words: int = 32768,
    sample_rate: float | None = None,
    num_buckets: int | None = None,
) -> dict:
    """Train a byte-level BPE artifact from a Dataset: optional
    deterministic hash-sample (``sample_rate`` on an ``id`` column-free
    dataset samples on the text hash), distributed word-frequency count,
    driver merge loop. Pure function of the input — reruns reproduce the
    same artifact bit-for-bit."""
    if sample_rate is not None and sample_rate < 1.0:
        from .sample import hash_sample

        ds = hash_sample(ds.select_columns([text_col]), text_col, sample_rate, salt="bpe")
    wc = word_frequencies(ds, text_col=text_col, max_words=max_words, num_buckets=num_buckets)
    return learn_bpe(wc, vocab_size)


def save_bpe(artifact: dict, path: str) -> None:
    import os

    tmp = path + ".tmp-bpe"
    with open(tmp, "w") as f:
        json.dump(artifact, f)
    os.replace(tmp, path)


def load_bpe(path: str) -> dict:
    with open(path) as f:
        art = json.load(f)
    if art.get("version") != 1 or "merges" not in art:
        raise ValueError(f"not a BPE artifact: {path}")
    return art


class BpeTokenizer:
    """Byte-level BPE encoder/decoder from a trained artifact.

    Worker-side state: merge ranks + a per-pretoken memo built once per
    instance (ships to workers as a small picklable object — the same
    broadcast-once posture as the embedder state). ``encode`` is the
    ``tokenize=`` seam contract of ``corpus.iter_training_batches``
    (text → list[int]).

    ``seq_len`` caveat at that seam: the pipeline's pack budget counts
    PIPELINE tokens (whitespace-free), while byte-level BPE also emits
    ids for whitespace runs and splits rare words — ``encode(pack_text)``
    routinely exceeds the pack budget. Leave ``seq_len=None`` (dynamic
    shapes, no truncation) or size it to a measured id-count bound; a
    ``seq_len``-truncated row can end mid-UTF-8-character, so decode such
    rows with ``errors="replace"``."""

    def __init__(self, artifact: dict, memo_max: int = 1 << 16):
        merges = [tuple(m) for m in artifact["merges"]]
        self.pattern = re.compile(artifact.get("pattern", PRETOKEN_PATTERN))
        self.ranks: dict[tuple[int, int], int] = {m: i for i, m in enumerate(merges)}
        tb: list[bytes] = [bytes([i]) for i in range(BASE_VOCAB)]
        for a, b in merges:
            tb.append(tb[a] + tb[b])
        self.token_bytes = tb
        self.vocab_size = len(tb)
        self._memo: dict[str, list[int]] = {}
        self._memo_max = memo_max

    # merge-window cap: the greedy loop is O(n²) in pretoken length, and
    # webtext contains megabyte character/whitespace runs that would make
    # one row quadratic. Chunks merge independently (a merge can't cross
    # a chunk boundary — only observable on >1 KiB single pretokens, a
    # degenerate case); byte concat keeps decode lossless regardless.
    _MAX_WORD_BYTES = 1024

    def _encode_word(self, bs: bytes) -> list[int]:
        out: list[int] = []
        for off in range(0, len(bs), self._MAX_WORD_BYTES):
            syms = list(bs[off : off + self._MAX_WORD_BYTES])
            while len(syms) > 1:
                best_rank = None
                best_pair = None
                for p in zip(syms, syms[1:]):
                    r = self.ranks.get(p)
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_pair = r, p
                if best_pair is None:
                    break
                syms = _merge_pair(syms, best_pair[0], best_pair[1], BASE_VOCAB + best_rank)
            out.extend(syms)
        return out

    def encode(self, text: str) -> list[int]:
        if not text:
            return []
        out: list[int] = []
        memo = self._memo
        for w in self.pattern.findall(text):
            ids = memo.get(w)
            if ids is None:
                bs = w.encode("utf-8")
                ids = self._encode_word(bs)
                # entry-COUNT cap only bounds memory if entries are small:
                # never memoize over-window pretokens (distinct megabyte
                # runs would each pin a ~1 MB key + ~1M-id list in a
                # long-lived actor; chunked encoding gains little from the
                # memo anyway). BYTE length decides — 1024 CJK chars are
                # 3072 bytes, over-window.
                if len(memo) < self._memo_max and len(bs) <= self._MAX_WORD_BYTES:
                    memo[w] = ids
            out.extend(ids)
        return out

    def decode(self, ids, errors: str = "strict") -> str:
        """Byte concat + UTF-8 decode. ``errors="strict"`` (default) keeps
        the lossless guarantee on COMPLETE id sequences; pass
        ``errors="replace"`` when decoding rows that may have been cut
        mid-character (e.g. a ``seq_len``-truncated trainer row)."""
        tb = self.token_bytes
        return b"".join(tb[int(i)] for i in ids).decode("utf-8", errors=errors)

    def encode_batch(self, texts: list[str]) -> list[list[int]]:
        return [self.encode(t or "") for t in texts]


def bpe_token_ids(ds, artifact: dict, text_col: str = "text", concurrency=(1, 8)):
    """Streaming op: append ``token_ids`` (list<int32>) per row — the
    distributed application path when the consumer is not the trainer
    seam. Actor pool: ranks/memo build once per actor in __init__."""

    class _Apply:
        def __init__(self, artifact: dict, text_col: str):
            self.tok = BpeTokenizer(artifact)
            self.text_col = text_col

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = self.tok.encode_batch(t.column(self.text_col).to_pylist())
            return t.append_column(
                "token_ids",
                pa.array(
                    [np.asarray(v, np.int32) for v in ids], pa.list_(pa.int32())
                ),
            )

    return ds.map_batches(
        _Apply,
        fn_constructor_kwargs={"artifact": artifact, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
