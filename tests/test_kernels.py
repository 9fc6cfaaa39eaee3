"""Property tests over the numpy hash kernels (hypothesis)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from destor_spark import hashing as H
from destor_spark.config import DedupConfig

CFG = DedupConfig()
A, B = H.minhash_params(CFG.num_hashes, CFG.seed)

tokens_st = st.lists(
    st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=200
)


@given(tokens_st)
@settings(max_examples=50, deadline=None)
def test_signature_shape_and_determinism(toks):
    t = np.array(toks, dtype=np.int64)
    sh = H.shingle_hashes(H.to_unsigned(t), CFG.shingle_size)
    s1 = H.minhash_signature(sh, A, B)
    s2 = H.minhash_signature(sh, A, B)
    assert s1.shape == (CFG.num_hashes,)
    assert np.array_equal(s1, s2)
    bk = H.band_keys(s1, CFG.bands, CFG.rows)
    assert bk.shape == (CFG.bands,)


@given(tokens_st)
@settings(max_examples=50, deadline=None)
def test_minhash_permutation_invariant(toks):
    """Signature depends on the shingle SET, not order."""
    t = np.array(toks, dtype=np.int64)
    sh = H.shingle_hashes(H.to_unsigned(t), CFG.shingle_size)
    rng = np.random.default_rng(0)
    perm = sh[rng.permutation(sh.shape[0])] if sh.shape[0] else sh
    assert np.array_equal(
        H.minhash_signature(sh, A, B), H.minhash_signature(perm, A, B)
    )


@given(tokens_st, tokens_st)
@settings(max_examples=30, deadline=None)
def test_est_jaccard_bounds_and_identity(a_toks, b_toks):
    a = H.minhash_signature(
        H.shingle_hashes(H.to_unsigned(np.array(a_toks, np.int64)), 5), A, B
    )
    b = H.minhash_signature(
        H.shingle_hashes(H.to_unsigned(np.array(b_toks, np.int64)), 5), A, B
    )
    j = H.est_jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert H.est_jaccard(a, a) == 1.0


@given(st.text(max_size=64))
@settings(max_examples=100, deadline=None)
def test_xxh64_str_stable_and_signed(s):
    v = H.xxh64_str(s)
    assert v == H.xxh64_str(s)
    assert -(2**63) <= v < 2**63


def test_simhash_small_perturbation():
    rng = np.random.default_rng(4)
    sh = rng.integers(0, 2**63, size=300, dtype=np.uint64)
    base = H.simhash64(sh)
    mod = sh.copy()
    mod[:3] = rng.integers(0, 2**63, size=3, dtype=np.uint64)
    near = H.simhash64(mod)
    dist = bin((base ^ near) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert dist <= 10  # 1% shingle change stays within a small ball
    other = H.simhash64(rng.integers(0, 2**63, size=300, dtype=np.uint64))
    far = bin((base ^ other) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert far > 15  # unrelated docs stay far
