"""Hashing primitives vs big-int ground truth (SURVEY.md §2.8)."""

import numpy as np
import pytest

from finddup_spark.config import DEFAULT_CONFIG, MERSENNE_P
from finddup_spark.hashing import (
    band_hashes,
    minhash_signature,
    minhash_signatures_segmented,
    modmul61,
    perm_hash61,
    rolling_gram_hashes,
    shingle_hashes,
    simhash_batch,
    splitmix64,
    winnow,
    SHINGLE_MULT,
)


def test_modmul61_matches_bigint():
    rng = np.random.default_rng(0)
    a = rng.integers(0, MERSENNE_P, 2000, dtype=np.uint64)
    b = rng.integers(0, MERSENNE_P, 2000, dtype=np.uint64)
    got = modmul61(a, b).astype(object)
    exp = (a.astype(object) * b.astype(object)) % MERSENNE_P
    assert (got == exp).all()


def test_modmul61_edges():
    M = MERSENNE_P
    for x, y in [(0, 0), (M - 1, M - 1), (1, M - 1), (M - 1, 1), (0, M - 1)]:
        got = int(modmul61(np.array([x], dtype=np.uint64), np.array([y], dtype=np.uint64))[0])
        assert got == (x * y) % M


def test_perm_hash61_full_u64_domain():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 2**64 - 1, 2000, dtype=np.uint64)
    a, b = DEFAULT_CONFIG.perm_params
    got = perm_hash61(x, a[3], b[3]).astype(object)
    exp = (int(a[3]) * (x.astype(object) % MERSENNE_P) + int(b[3])) % MERSENNE_P
    assert (got == exp).all()


def test_segmented_minhash_equals_per_doc():
    rng = np.random.default_rng(2)
    a, b = DEFAULT_CONFIG.perm_params
    docs = [rng.integers(0, 2**64 - 1, n, dtype=np.uint64) for n in [5, 0, 120, 1, 33, 0]]
    lengths = np.array([len(d) for d in docs])
    allsh = np.concatenate([d for d in docs if len(d)]) if any(len(d) for d in docs) else np.empty(0, dtype=np.uint64)
    seg = minhash_signatures_segmented(allsh, lengths, a, b)
    for i, d in enumerate(docs):
        assert (seg[i] == minhash_signature(d, a, b)).all()


def test_minhash_jaccard_estimate():
    """MinHash collision rate ≈ Jaccard (sanity of the permutation family)."""
    rng = np.random.default_rng(3)
    a, b = DEFAULT_CONFIG.perm_params
    base = rng.integers(0, 2**64 - 1, 1000, dtype=np.uint64)
    other = base.copy()
    other[:200] = rng.integers(0, 2**64 - 1, 200, dtype=np.uint64)  # J ≈ 800/1200
    s1 = minhash_signature(np.unique(base), a, b)
    s2 = minhash_signature(np.unique(other), a, b)
    est = (s1 == s2).mean()
    true_j = len(set(base) & set(other)) / len(set(base) | set(other))
    assert abs(est - true_j) < 0.12


def test_shingles_window_and_short_doc():
    rng = np.random.default_rng(4)
    h = rng.integers(0, 2**64 - 1, 100, dtype=np.uint64)
    assert len(shingle_hashes(h, 5)) == 96
    assert len(shingle_hashes(h[:3], 5)) == 1
    assert len(shingle_hashes(h[:0], 5)) == 0
    # same window content at different positions hashes identically
    hh = np.concatenate([h[:10], h[:10]])
    sh = shingle_hashes(hh, 5)
    assert sh[0] == sh[10]


def test_band_hashes_shape_and_band_mixing():
    rng = np.random.default_rng(5)
    sig = rng.integers(0, MERSENNE_P, (7, 128), dtype=np.uint64)
    bh = band_hashes(sig, 32, 4)
    assert bh.shape == (7, 32)
    # identical signature rows in two different bands must differ
    sig2 = np.tile(sig[:, :4], (1, 32))
    bh2 = band_hashes(sig2, 32, 4)
    assert len(np.unique(bh2[0])) == 32


def test_rolling_gram_hash_matches_bruteforce():
    rng = np.random.default_rng(6)
    data = bytes(rng.integers(0, 256, 300, dtype=np.uint8).tolist())
    g = 16
    got = rolling_gram_hashes(data, g)
    C, M = int(SHINGLE_MULT), (1 << 64) - 1

    def brute(i):
        acc = 0
        for j in range(g):
            acc = (acc * C + data[i + j]) & M
        return splitmix64(np.array([acc], dtype=np.uint64))[0]

    for i in [0, 1, 57, len(data) - g]:
        assert got[i] == brute(i)


def test_winnow_guarantee():
    """Docs sharing a span >= gram+window-1 chars share a fingerprint."""
    rng = np.random.default_rng(7)
    span = bytes(rng.integers(32, 127, 600, dtype=np.uint8).tolist())
    d1 = bytes(rng.integers(32, 127, 200, dtype=np.uint8).tolist()) + span
    d2 = span + bytes(rng.integers(32, 127, 300, dtype=np.uint8).tolist())
    g, w = 64, 449
    f1 = set(winnow(rolling_gram_hashes(d1, g), w).tolist())
    f2 = set(winnow(rolling_gram_hashes(d2, g), w).tolist())
    assert f1 & f2


def test_simhash_batch_similarity():
    rng = np.random.default_rng(8)
    base = rng.integers(0, 2**64 - 1, 500, dtype=np.uint64)
    near = base.copy()
    near[:25] = rng.integers(0, 2**64 - 1, 25, dtype=np.uint64)
    far = rng.integers(0, 2**64 - 1, 500, dtype=np.uint64)
    w = np.ones(500)
    lengths = np.array([500, 500, 500])
    fps = simhash_batch(np.concatenate([base, near, far]), np.concatenate([w, w, w]), lengths)
    ham = lambda a, b: bin(int(a) ^ int(b)).count("1")
    assert ham(fps[0], fps[1]) < 10
    assert ham(fps[0], fps[2]) > 20
