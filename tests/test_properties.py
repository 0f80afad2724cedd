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
