"""Hashing primitives: determinism + statistical behavior."""

import numpy as np

from kgraft.hashing import (
    MinHasher,
    hash_strings,
    jaccard,
    shingle_hashes,
    simhash64,
    splitmix64,
)


def test_hash_strings_deterministic():
    a = hash_strings(["x", "y", "zorvex corp"])
    b = hash_strings(["x", "y", "zorvex corp"])
    assert (a == b).all()
    assert len(set(a.tolist())) == 3
    assert (hash_strings(["x"], seed=1) != hash_strings(["x"], seed=2)).all()


def test_splitmix_vectorized_matches_scalar():
    xs = np.arange(10, dtype=np.uint64)
    assert (splitmix64(xs)[3:4] == splitmix64(xs[3:4])).all()


def test_shingles_set_semantics():
    h = shingle_hashes("abcabc", 3)
    assert (np.sort(h) == h).all() and len(np.unique(h)) == len(h)
    assert len(shingle_hashes("ab", 3)) >= 1  # shorter than k: padded


def test_minhash_estimates_jaccard():
    mh = MinHasher(num_perm=256, seed=1001, shingle_k=3)
    a = "the quick brown fox jumps over the lazy dog near the river bank"
    b = a + " at dawn"
    c = "completely different content with no overlap whatsoever in text"
    sa, sb, sc = mh.signatures([a, b, c])
    est_ab = (sa == sb).mean()
    est_ac = (sa == sc).mean()
    true_ab = jaccard(a, b, 3)
    assert abs(est_ab - true_ab) < 0.15
    assert est_ac < 0.2 and est_ab > 0.6


def test_band_hashes_collide_for_near_dups():
    mh = MinHasher(num_perm=128, seed=1001, shingle_k=4)
    a = "gondar systems partnered with zorvex corporation last year"
    sigs = mh.signatures([a, a + "!", "unrelated text entirely about weather"])
    bands = mh.band_hashes(sigs, 32)
    assert (bands[0] == bands[1]).sum() > 0  # near-dups share >=1 band
    assert (bands[0] == bands[2]).sum() == 0


def test_simhash_near_for_near_dups():
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d1 = bin(simhash64(a) ^ simhash64(a + " x")).count("1")
    d2 = bin(simhash64(a) ^ simhash64("totally other words here now")).count("1")
    assert d1 < d2
