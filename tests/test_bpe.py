"""Corpus-trained byte-level BPE: train determinism, lossless round trip,
distributed application, and the trainer-seam integration."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

import ray.data as rd

from graphiti_hf_ray.functions.bpe import (
    BASE_VOCAB,
    BpeTokenizer,
    bpe_token_ids,
    learn_bpe,
    load_bpe,
    save_bpe,
    train_bpe,
    word_frequencies,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "pack my box with five dozen liquor jugs, quickly!",
    "über die Brücke — naïve café, 42 jugs of «liquor»",
    "数字 123 と記号 #tag が混ざる行",
]


def _ds():
    return rd.from_arrow(pa.table({"text": CORPUS}))


def test_word_frequencies_counts_and_cap(ray_session):
    wc = word_frequencies(_ds(), "text")
    assert wc["the"] == 4 and wc["quick"] == 2 and wc[" "] >= 15
    capped = word_frequencies(_ds(), "text", max_words=3)
    assert len(capped) == 3
    # cap keeps the highest counts (ties broken by word, deterministic)
    assert min(capped.values()) >= sorted(wc.values(), reverse=True)[2]


def test_learn_bpe_deterministic_and_useful(ray_session):
    art1 = train_bpe(_ds(), vocab_size=BASE_VOCAB + 64)
    art2 = train_bpe(_ds(), vocab_size=BASE_VOCAB + 64)
    assert art1 == art2  # pure function of the input
    assert len(art1["merges"]) == 64
    tok = BpeTokenizer(art1)
    # a frequent word compresses below its byte length
    assert len(tok.encode("the quick")) < len("the quick".encode("utf-8"))


@pytest.mark.parametrize(
    "s",
    [
        "",
        "plain ascii",
        "  leading  and   trailing   ",
        "tabs\tand\nnewlines\r\n",
        "mixed 123abc!@# §±",
        "emoji 🦊🐶 and ZWJ 👩‍🔬",
        "한국어 텍스트와 日本語テキスト",
        "\x00control\x07bytes",
    ],
)
def test_roundtrip_lossless(ray_session, s):
    art = learn_bpe({"the": 10, "qu": 5, "ick": 5}, BASE_VOCAB + 8)
    tok = BpeTokenizer(art)
    assert tok.decode(tok.encode(s)) == s


def test_roundtrip_property(ray_session):
    from hypothesis import given, settings, strategies as st

    art = train_bpe(_ds(), vocab_size=BASE_VOCAB + 32)
    tok = BpeTokenizer(art)

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=200))
    def check(s):
        assert tok.decode(tok.encode(s)) == s

    check()


def test_learn_bpe_matches_bruteforce(ray_session):
    """The heap/incremental merge loop must select the exact sequence the
    naive Sennrich reference (full recount + max per merge) selects."""
    import random

    from graphiti_hf_ray.functions.bpe import _merge_pair

    def brute(word_counts, n_merges):
        words = {w: list(w.encode("utf-8")) for w in word_counts}
        merges = []
        for k in range(n_merges):
            pc = {}
            for w, syms in words.items():
                c = word_counts[w]
                for p in zip(syms, syms[1:]):
                    pc[p] = pc.get(p, 0) + c
            if not pc:
                break
            (a, b), cnt = max(pc.items(), key=lambda kv: (kv[1], -kv[0][0], -kv[0][1]))
            merges.append([a, b])
            for w in words:
                words[w] = _merge_pair(words[w], a, b, 256 + k)
        return merges

    rng = random.Random(7)
    alphabet = "abcdeé 日x"
    for trial in range(20):
        wc = {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))): rng.randint(1, 9)
            for _ in range(rng.randint(2, 40))
        }
        n = rng.randint(1, 48)
        got = learn_bpe(wc, BASE_VOCAB + n)["merges"]
        assert got == brute(wc, n), (trial, wc)


def test_word_frequencies_bucket_cap_exact(ray_session):
    """Per-bucket top-k then global top-k must equal the uncapped global
    top-k (each word type aggregates in exactly one bucket)."""
    full = word_frequencies(_ds(), "text", max_words=10**9, num_buckets=7)
    capped = word_frequencies(_ds(), "text", max_words=5, num_buckets=7)
    want = dict(sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:5])
    assert capped == want


def test_decode_truncated_row_replace(ray_session):
    art = learn_bpe({"héllo": 3}, BASE_VOCAB + 4)
    tok = BpeTokenizer(art)
    ids = tok.encode("héllo")
    assert tok.decode(ids) == "héllo"
    byte_ids = [b for i in ids for b in tok.token_bytes[i]]  # re-expand to raw bytes
    # a seq_len cut can land mid-UTF-8-character: strict raises, replace degrades
    with pytest.raises(UnicodeDecodeError):
        tok.decode(byte_ids[:2])
    assert tok.decode(byte_ids[:2], errors="replace") == "h�"


def test_encode_megarun_fast_and_lossless(ray_session):
    """A single megabyte-scale pretoken (webtext has such runs) must not
    go quadratic: the merge window caps at _MAX_WORD_BYTES and the result
    still round-trips byte-exactly."""
    import time

    art = train_bpe(_ds(), vocab_size=BASE_VOCAB + 32)
    tok = BpeTokenizer(art)
    s = " " * 500_000 + "a" * 500_000 + "é" * 100_000
    t0 = time.time()
    ids = tok.encode(s)
    assert time.time() - t0 < 30.0  # capped window: linear-ish, not O(n^2)
    assert tok.decode(ids) == s


def test_artifact_save_load(ray_session, tmp_path):
    art = train_bpe(_ds(), vocab_size=BASE_VOCAB + 16)
    p = str(tmp_path / "bpe.json")
    save_bpe(art, p)
    assert load_bpe(p) == art
    with pytest.raises(ValueError):
        bad = str(tmp_path / "bad.json")
        with open(bad, "w") as f:
            f.write("{}")
        load_bpe(bad)


def test_bpe_token_ids_distributed(ray_session):
    art = train_bpe(_ds(), vocab_size=BASE_VOCAB + 32)
    tok = BpeTokenizer(art)
    out = bpe_token_ids(_ds(), art).to_pandas()
    assert len(out) == len(CORPUS)
    by_text = dict(zip(out["text"], out["token_ids"]))
    for s in CORPUS:
        assert tok.decode(by_text[s]) == s  # distributed == local, lossless


def test_trainer_seam_with_trained_bpe(ray_session, tmp_path, sf_small):
    """End-to-end: prepare_training_set(bpe_vocab_size=) trains and ships
    the tokenizer WITH the set; load_tokenizer reads it back; its encode
    through iter_training_batches' tokenize seam reconstructs the pack
    texts losslessly from the padded int32 batches."""
    import pyarrow.parquet as pq

    from graphiti_hf_ray.pipelines.corpus import (
        iter_training_batches,
        load_tokenizer,
        prepare_training_set,
    )

    docs = pq.read_table(
        os.path.join(sf_small, "documents.parquet"), columns=["doc_id", "text"]
    )
    ds = rd.from_arrow(docs.slice(0, 120))

    out = str(tmp_path / "tset")
    m = prepare_training_set(
        ds, [], out, lang_allow=(), max_tokens=64, overlap=0, pack_budget=128,
        bpe_vocab_size=BASE_VOCAB + 128,
    )
    assert m["bpe_merges"] > 0
    tok = load_tokenizer(out)
    assert tok is not None
    # the shipped artifact is the same pure function of the survivors
    assert load_tokenizer(str(tmp_path)) is None

    seen = {}
    for b in iter_training_batches(out, batch_size=16, tokenize=tok.encode):
        for row, n, pid in zip(b["input_ids"], b["lengths"], b["pack_ids"]):
            seen[pid] = tok.decode(row[: int(n)])
    assert seen  # at least one pack
    from graphiti_hf_ray.pipelines.corpus import load_packs

    packs = load_packs(out).to_pandas()
    for pid, text in zip(packs["pack_id"], packs["text"]):
        assert seen[pid] == text  # byte-lossless through the int32 matrix


def test_shipped_tokenizer_staleness_guard(ray_session, tmp_path, sf_small):
    """The artifact is stamped with the pack set's fingerprint: a re-prepare
    that rewrites the packs without retraining SWEEPS the stale bpe.json; a
    hand-staled stamp is rejected by load_tokenizer (never silently served);
    a bpe-less re-prepare with IDENTICAL knobs keeps the still-valid one."""
    import json

    import pyarrow.parquet as pq
    import pytest as _pytest

    from graphiti_hf_ray.pipelines.corpus import load_tokenizer, prepare_training_set

    docs = pq.read_table(
        os.path.join(sf_small, "documents.parquet"), columns=["doc_id", "text"]
    )
    ds = rd.from_arrow(docs.slice(0, 60))
    out = str(tmp_path / "tset")
    common = dict(lang_allow=(), max_tokens=64, overlap=0, pack_budget=128)
    prepare_training_set(ds, [], out, bpe_vocab_size=BASE_VOCAB + 32, **common)
    assert load_tokenizer(out) is not None

    # identical knobs, no bpe: packs resume as a no-op, artifact still valid
    prepare_training_set(ds, [], out, **common)
    assert load_tokenizer(out) is not None

    # changed knob rewrites the packs; the stale artifact is swept
    prepare_training_set(ds, [], out, min_tokens=9, **common)
    assert load_tokenizer(out) is None

    # hand-staled stamp: rejected, not silently served
    prepare_training_set(ds, [], out, min_tokens=9, bpe_vocab_size=BASE_VOCAB + 32, **common)
    p = os.path.join(out, "bpe.json")
    with open(p) as f:
        art = json.load(f)
    art["set_fingerprint"] = "0" * 32
    with open(p, "w") as f:
        json.dump(art, f)
    with _pytest.raises(ValueError, match="stale tokenizer"):
        load_tokenizer(out)
