"""Property-based tests (hypothesis): determinism and invariance laws the
distributed engine depends on."""

from __future__ import annotations

import string

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from graphiti_hf_ray.functions.dedup import minhash_signature, simhash64, _token_hashes
from graphiti_hf_ray.functions.sample import _hexhash
from graphiti_hf_ray.stages.canonicalize import (
    UnionFind,
    build_canonical_map,
    components_driver,
    names_duplicate,
)
from graphiti_hf_ray.stages.embed import embed_text

name_st = st.text(alphabet=string.ascii_letters + " .-", min_size=1, max_size=30).filter(
    lambda s: s.strip()
)


@given(name_st, name_st)
@settings(max_examples=200, deadline=None)
def test_names_duplicate_symmetric(a, b):
    assert names_duplicate(a, b) == names_duplicate(b, a)


@given(name_st)
@settings(max_examples=100, deadline=None)
def test_names_duplicate_reflexive(a):
    assert names_duplicate(a, a)


@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)), max_size=50))
@settings(max_examples=100, deadline=None)
def test_union_find_order_invariant(pairs):
    """Component roots don't depend on the order pairs arrive in."""
    p1 = [(f"n{a}", f"n{b}") for a, b in pairs]
    m1 = components_driver(p1)
    m2 = components_driver(list(reversed(p1)))
    assert m1 == m2


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_embed_deterministic_and_normalized(text):
    v1, v2 = embed_text(text), embed_text(text)
    assert np.array_equal(v1, v2)
    n = float(np.linalg.norm(v1))
    assert n == 0.0 or abs(n - 1.0) < 1e-5


@given(st.text(alphabet=string.ascii_lowercase + " ", min_size=1, max_size=200))
@settings(max_examples=100, deadline=None)
def test_minhash_simhash_deterministic(text):
    assert (minhash_signature(text) == minhash_signature(text)).all()
    assert simhash64(text) == simhash64(text)


@given(st.lists(st.integers(0, 10**9), min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_hash_sample_membership_stable(keys):
    """Sample membership is a pure function of the key — independent of
    batch composition / partitioning."""
    thr = "33333333"
    solo = {k: _hexhash("s", k)[:8] < thr for k in keys}
    for k in keys:
        assert (_hexhash("s", k)[:8] < thr) == solo[k]


@given(
    st.lists(
        st.tuples(st.sampled_from(["g0", "g1"]), st.sampled_from(["Person", "Organization"]), name_st),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=50, deadline=None)
def test_canonical_map_total_and_idempotent(mentions):
    """Every input surface gets a canonical assignment; canonical names are
    drawn from the input surfaces (no invention)."""
    df = pd.DataFrame(sorted(set(mentions)), columns=["group_id", "label", "surface"])
    df["n"] = 1
    cmap = build_canonical_map(df, {})
    assert len(cmap) == len(df)
    surfaces = set(df["surface"])
    assert set(cmap["canon_name"]) <= surfaces


@given(
    st.lists(  # left points: (key, ts-offset, id)
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 20)),
        min_size=1, max_size=25,
    ),
    st.lists(  # right rows: (key, ts-offset, value)
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 20), st.integers(0, 99)),
        min_size=0, max_size=25,
    ),
)
@settings(max_examples=30, deadline=None)
def test_asof_join_matches_bruteforce(ray_session, lefts, rights):
    """asof_join == the O(n²) definition: per left row, the right row with
    max (ts, tiebreak) among those with right_ts <= left_ts on the key —
    including timestamp ties and duplicate right rows."""
    import ray.data as rd

    from graphiti_hf_ray.functions.joins import asof_join

    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "k": [k for k, _ in lefts],
            "lid": range(len(lefts)),
            "ts": [base + pd.Timedelta(hours=o) for _, o in lefts],
        }
    )
    left["ts"] = left["ts"].astype("datetime64[us]")
    right = pd.DataFrame(
        {
            "k": [k for k, _, _ in rights],
            "rts": [base + pd.Timedelta(hours=o) for _, o, _ in rights],
            "val": [v for _, _, v in rights],
        }
    )
    right["rts"] = right["rts"].astype("datetime64[us]")
    got = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right), ["k"], "ts", "rts", ["val"], tiebreak="val")
        .to_pandas()
        .set_index("lid")["val"]
    )
    for _, lrow in left.iterrows():
        cands = right[(right["k"] == lrow["k"]) & (right["rts"] <= lrow["ts"])]
        expect = None if cands.empty else cands.sort_values(["rts", "val"]).iloc[-1]["val"]
        g = got[lrow["lid"]]
        if expect is None:
            assert pd.isna(g)
        else:
            assert g == expect


@given(
    st.lists(  # left: (key, payload)
        st.tuples(st.integers(0, 8), st.integers(0, 99)), min_size=0, max_size=25
    ),
    st.lists(  # right: (key, payload)
        st.tuples(st.integers(0, 8), st.integers(0, 99)), min_size=0, max_size=25
    ),
    st.sampled_from(["inner", "left"]),
)
@settings(max_examples=25, deadline=None)
def test_hash_join_matches_pandas_merge(ray_session, lefts, rights, how):
    """Partitioned hash_join == pandas merge for inner and left joins,
    including duplicate keys on both sides (cross-product within key) and
    keys present on only one side."""
    import ray.data as rd

    from graphiti_hf_ray.functions.joins import hash_join

    left = pd.DataFrame({"k": [k for k, _ in lefts], "lv": [v for _, v in lefts]})
    right = pd.DataFrame({"rk": [k for k, _ in rights], "rv": [v for _, v in rights]})
    if left.empty or (right.empty and how == "inner"):
        return  # empty-side schemas are exercised elsewhere
    if right.empty:
        right = pd.DataFrame({"rk": pd.Series([], dtype="int64"), "rv": pd.Series([], dtype="int64")})
        return
    got = hash_join(rd.from_pandas(left), rd.from_pandas(right), "k", "rk", how=how).to_pandas()
    exp = (
        left.merge(right, left_on="k", right_on="rk", how=how)
        .drop(columns=["rk"])
        .sort_values(["k", "lv", "rv"], na_position="last")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    if exp.empty:
        return  # Ray's to_pandas drops columns on all-empty output
    got = got.sort_values(["k", "lv", "rv"], na_position="last").reset_index(drop=True)
    if len(exp):
        assert got["k"].tolist() == exp["k"].tolist()
        assert got["lv"].tolist() == exp["lv"].tolist()
        a = got["rv"].fillna(-1).astype("int64").tolist()
        b = exp["rv"].fillna(-1).astype("int64").tolist()
        assert a == b


@settings(max_examples=60, deadline=None)
@given(
    docs=st.lists(st.lists(st.integers(0, 9), max_size=40), min_size=1, max_size=8),
    max_tokens=st.integers(1, 12),
    data=st.data(),
)
def test_chunk_batch_invariants_property(docs, max_tokens, data):
    """chunk_batch (the pure kernel under chunk_documents) holds its
    invariants for arbitrary token streams and (max_tokens, overlap):
    per-chunk budget, exact start offsets, exact overlap stride, lossless
    reconstruction, and single-chunk behavior for short docs."""
    import pyarrow as pa

    from graphiti_hf_ray.functions.textchunk import chunk_batch

    overlap = data.draw(st.integers(0, max_tokens - 1))
    texts = [" ".join(f"w{v}" for v in d) for d in docs]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    out = chunk_batch(t, max_tokens=max_tokens, overlap=overlap, id_col="doc_id", text_col="text")
    rows = out.to_pylist()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    stride = max_tokens - overlap
    for d, txt in enumerate(texts):
        toks = txt.split()
        g = sorted(by_doc.get(d, []), key=lambda r: r["chunk_idx"])
        if not toks:
            assert not g
            continue
        assert [r["chunk_idx"] for r in g] == list(range(len(g)))
        for i, r in enumerate(g):
            assert r["n_tokens"] <= max_tokens
            assert r["start_tok"] == i * stride
            assert r["text"].split() == toks[r["start_tok"] : r["start_tok"] + r["n_tokens"]]
        last = g[-1]
        assert last["start_tok"] + last["n_tokens"] == len(toks)  # full coverage
        if len(toks) <= max_tokens:
            assert len(g) == 1
        # reconstruction from non-overlapping suffixes
        rebuilt = g[0]["text"].split()
        for r in g[1:]:
            rebuilt.extend(r["text"].split()[overlap:])
        assert rebuilt == toks


@settings(max_examples=200, deadline=None)
@given(
    toks=st.lists(st.integers(1, 20), max_size=60),
    budget=st.integers(20, 50),
)
def test_next_fit_pack_property(toks, budget):
    """The pure next-fit kernel under pack_chunks: every item packed
    exactly once in order, pack sums within budget, and density — the
    first item of each pack except the first would have overflowed the
    previous pack."""
    from graphiti_hf_ray.functions.textpack import next_fit_pack

    items = [(n,) for n in toks]
    packs = next_fit_pack(items, budget)
    flat = [i for p in packs for i in p]
    assert flat == list(range(len(items)))          # exactly once, in order
    assert all(p for p in packs)                    # no empty packs
    sums = [sum(toks[i] for i in p) for p in packs]
    assert all(s <= budget for s in sums)
    for k in range(1, len(packs)):
        assert sums[k - 1] + toks[packs[k][0]] > budget

    import pytest

    with pytest.raises(ValueError):
        next_fit_pack([(budget + 1,)], budget)


@settings(max_examples=200, deadline=None)
@given(
    doc=st.lists(st.sampled_from("abcdef"), max_size=40),
    bench=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=3, max_size=10),
        max_size=4,
    ),
    n=st.integers(2, 4),
)
def test_redact_tokens_fixpoint_property(doc, bench, n):
    """redact_tokens invariant: the survivors are a subsequence of the
    input, contain NO benchmark n-gram (even ones created by splicing),
    and clean inputs pass through untouched."""
    from graphiti_hf_ray.functions.decontam import (
        benchmark_ngrams,
        collision_positions,
        redact_tokens,
    )

    grams = benchmark_ngrams([" ".join(b) for b in bench], n=n)
    kept, removed = redact_tokens(list(doc), grams, n)
    assert collision_positions(kept, grams, n) == []   # fixpoint: clean
    assert removed == len(doc) - len(kept)
    it = iter(doc)
    assert all(any(t == u for u in it) for t in kept)  # subsequence
    if not collision_positions(list(doc), grams, n):
        assert kept == list(doc) and removed == 0      # clean → identity


@settings(max_examples=150, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)), min_size=1, max_size=40
    )
)
def test_components_min_root_property(pairs):
    """components_driver with zero-padded decimal keys yields, for every
    node, exactly the NUMERIC min of its connected component (brute-force
    BFS oracle) — the invariant components_of_pairs and the cluster-winner
    dedups rely on."""
    from graphiti_hf_ray.stages.canonicalize import components_driver

    comp = components_driver(
        (f"{a:020d}", f"{b:020d}") for a, b in pairs
    )
    # brute-force components over the same graph
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen: set[int] = set()
    expect: dict[int, int] = {}
    for start in adj:
        if start in seen:
            continue
        stack, members = [start], set()
        while stack:
            n = stack.pop()
            if n in members:
                continue
            members.add(n)
            stack.extend(adj[n])
        seen |= members
        lo = min(members)
        for n in members:
            expect[n] = lo
    assert {int(k): int(v) for k, v in comp.items()} == expect


@settings(max_examples=200, deadline=None)
@given(
    rows=st.lists(
        st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=12),
        min_size=1, max_size=20,
    ),
    width=st.one_of(st.none(), st.integers(min_value=1, max_value=15)),
    pad_id=st.integers(min_value=-3, max_value=3),
    off=st.integers(min_value=0, max_value=3),
)
def test_pad_token_lists_matches_naive(rows, width, pad_id, off):
    """The vectorized padded-scatter kernel equals a naive per-row pad —
    including on SLICED arrays, whose list offsets don't start at 0 (the
    case the abs_idx arithmetic exists for)."""
    import pyarrow as pa

    from graphiti_hf_ray.pipelines.corpus import pad_token_lists

    off = min(off, len(rows) - 1)
    arr = pa.array(rows, pa.list_(pa.int32())).slice(off)  # offset != 0
    rows = rows[off:]
    ids, lengths = pad_token_lists(arr, width, pad_id)
    w = width if width is not None else max(max((len(r) for r in rows), default=1), 1)
    assert ids.shape == (len(rows), w) and ids.dtype == np.int32
    for i, r in enumerate(rows):
        cut = r[:w]
        assert lengths[i] == len(cut)
        assert list(ids[i, : len(cut)]) == cut
        assert all(v == pad_id for v in ids[i, len(cut):])


@settings(max_examples=100, deadline=None)
@given(
    data=st.data(),
    n=st.integers(min_value=1, max_value=24),
    m=st.sampled_from([1, 2, 4]),
    dsub=st.integers(min_value=1, max_value=4),
    ncode=st.sampled_from([2, 4, 8]),
)
def test_pq_encode_adc_identities(data, n, m, dsub, ncode):
    """PQ kernel invariants: (1) pq_encode picks the L2-argmin codeword per
    subspace (verified against brute-force enumeration), (2) an ADC score
    is EXACTLY the dot product of the query with the code's reconstruction
    (concatenated codewords) — ADC's whole premise, (3) scores are
    permutation-equivariant in the rows."""
    from graphiti_hf_ray.functions.knn import pq_adc_lut, pq_adc_scores, pq_encode

    dim = m * dsub
    felt = st.floats(min_value=-4.0, max_value=4.0, allow_nan=False, width=32)
    X = np.asarray(data.draw(st.lists(st.lists(felt, min_size=dim, max_size=dim),
                                      min_size=n, max_size=n)), np.float64)
    B = np.asarray(data.draw(st.lists(st.lists(st.lists(felt, min_size=dsub, max_size=dsub),
                                               min_size=ncode, max_size=ncode),
                                      min_size=m, max_size=m)), np.float64)
    q = np.asarray(data.draw(st.lists(felt, min_size=dim, max_size=dim)), np.float64)

    codes = pq_encode(X, B)
    assert codes.shape == (n, m) and codes.dtype == np.uint8
    for i in range(n):
        for j in range(m):
            xj = X[i, j * dsub:(j + 1) * dsub]
            d = ((B[j] - xj) ** 2).sum(axis=1)
            # ties may break differently between the kernel's -2x·c+||c||²
            # form and the naive form only at float-rounding boundaries:
            # assert optimality of the chosen codeword, not index equality
            assert d[codes[i, j]] <= d.min() + 1e-9

    lut = pq_adc_lut(q, B)
    scores = pq_adc_scores(codes, lut)
    recon = np.concatenate([B[j][codes[:, j]] for j in range(m)], axis=1)
    np.testing.assert_allclose(scores, recon @ q, rtol=0, atol=1e-9)

    perm = np.arange(n)[::-1].copy()
    np.testing.assert_array_equal(pq_adc_scores(codes[perm], lut), scores[perm])
