"""Distributed dup-group finishing (kgraft.dupgroups): tiled pairwise
kernels, giant DISTINCT-entry buckets (the round-2 silent 256-cap), and
the pairs -> contracted-components -> searchsorted labeling path."""

import logging

import numpy as np
import pandas as pd
import pytest

from kgraft import dupgroups
from kgraft.graph.components import components_numpy


def _n_components(a: np.ndarray, b: np.ndarray, all_ids: np.ndarray) -> int:
    # self-loops keep isolated ids visible
    src = np.concatenate([a, all_ids])
    dst = np.concatenate([b, all_ids])
    _, labels = components_numpy(src, dst)
    return len(np.unique(labels))


def test_hamming_pair_stars_large_distinct_cluster():
    """600 DISTINCT fingerprints, pairwise hamming <= 2, spanning one
    cluster: the round-2 code emitted NOTHING for >256 distinct entries;
    the tiled kernel must connect all of them (and emit stars, not the
    O(n^2) clique)."""
    base = np.uint64(0xDEADBEEFCAFEF00D)
    n = 600
    ids = np.arange(n, dtype=np.int64)
    # flip exactly one of 40 high bits -> distance to base 1, pairwise <= 2
    hs = np.array(
        [base ^ (np.uint64(1) << np.uint64(16 + (i % 40))) for i in range(n)],
        dtype=np.uint64,
    )
    # ids sharing a flipped bit have IDENTICAL hashes -> dist 0 pairs are
    # excluded by the kernel (identical fps are star-reduced upstream),
    # but distinct-hash pairs still connect every hash class
    a, b = dupgroups.hamming_pair_stars(ids, hs, max_hamming=3)
    assert len(a) > 0
    # every one of the 40 distinct hash classes joins one component
    reps = ids[:40]  # first occurrence of each class
    assert _n_components(a, b, reps) == 1
    # star contraction: edges bounded by #nodes, not n^2/2
    assert len(a) < n


def test_cosine_pair_stars_large_distinct_cluster():
    rng = np.random.default_rng(0)
    base = rng.normal(size=16)
    n = 600
    vecs = base[None, :] + 1e-4 * rng.normal(size=(n, 16))
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    ids = np.arange(n, dtype=np.int64)
    a, b = dupgroups.cosine_pair_stars(ids, unit, threshold=0.999)
    assert _n_components(a, b, ids) == 1
    assert len(a) < n  # stars, not the clique


def test_pair_stars_subsplit_is_loud(monkeypatch, caplog):
    """Buckets beyond MAX_VERIFY sub-split on a secondary hash and WARN
    (never a silent drop); within-sub pairs are still found."""
    monkeypatch.setattr(dupgroups, "MAX_VERIFY", 64)
    rng = np.random.default_rng(1)
    base = rng.normal(size=8)
    n = 200
    vecs = base[None, :] + 1e-5 * rng.normal(size=(n, 8))
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    ids = np.arange(n, dtype=np.int64)
    with caplog.at_level(logging.WARNING, logger="kgraft.dupgroups"):
        a, b = dupgroups.cosine_pair_stars(ids, unit, threshold=0.999)
    assert any("sub-split" in r.message for r in caplog.records)
    # each sub-bucket still resolves internally: far fewer than n groups
    assert 1 <= _n_components(a, b, ids) <= -(-n // 64)


def test_embed_near_dup_giant_distinct_cluster(ray_session):
    """>256 DISTINCT near-identical (non-equal) embeddings must form one
    dup group — the round-2 bucket cap silently dropped every pair of
    such a cluster (star reduction only covered byte-identical ones)."""
    import ray

    from kgraft import embedops

    rng = np.random.default_rng(7)
    base = rng.normal(size=8)
    n = 300
    vecs = base[None, :] + 1e-6 * rng.normal(size=(n, 8))
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": [v.tolist() for v in vecs],
        }
    )
    out = embedops.embed_near_dup(
        ray.data.from_pandas(df), threshold=0.999
    ).to_pandas()
    assert out["dup_group"].nunique() == 1
    assert (out["dup_group"] == 0).all()


def test_label_by_pairs_distributed(ray_session):
    import ray

    ids = ray.data.from_pandas(pd.DataFrame({"doc_id": np.arange(10, dtype="int64")}))
    pairs = ray.data.from_pandas(
        pd.DataFrame(
            {"doc_a": [1, 2, 7], "doc_b": [2, 3, 8]}, dtype="int64"
        )
    )
    out = (
        dupgroups.label_by_pairs(ids, pairs, "doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    expect = {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 6, 7: 7, 8: 7, 9: 9}
    assert dict(zip(out["doc_id"], out["dup_group"])) == expect


def test_route_texts_to_pairs_exact(ray_session):
    """Texts reach their pairs through the Bloom + two-exchange route;
    the fused verifier sees exactly the right (text_a, text_b)."""
    import pyarrow as pa
    import ray

    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.arange(6, dtype="int64"),
                "text": [f"text number {i}" for i in range(6)],
            }
        )
    )
    pairs = ray.data.from_pandas(
        pd.DataFrame({"doc_a": [0, 2], "doc_b": [1, 5]}, dtype="int64")
    )
    seen = []

    def verify(t: pa.Table) -> pa.Table:
        for a, b, ta, tb in zip(
            t["doc_a"].to_pylist(),
            t["doc_b"].to_pylist(),
            t["text_a"].to_pylist(),
            t["text_b"].to_pylist(),
        ):
            assert ta == f"text number {a}"
            assert tb == f"text number {b}"
        return t.select(["doc_a", "doc_b"])

    out = dupgroups.route_texts_to_pairs(docs, pairs, verify).to_pandas()
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert got == {(0, 1), (2, 5)}


def test_near_dup_multiblock_planted(ray_session):
    """Planted dup clusters SPANNING many blocks must cluster correctly
    through the full distributed route (Bloom prefilter + both
    exchanges + components + labeling) — single-block toy inputs can
    hide bucket-affinity bugs."""
    import ray

    from kgraft import textops

    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(500)]
    n = 400
    texts = []
    for i in range(n):
        if i % 10 == 0:
            # cluster A: near-identical long docs, ids spread over blocks
            texts.append(
                "alpha beta gamma delta " * 30 + f"suffix variant {i % 3}"
            )
        elif i % 10 == 1:
            # cluster B: exact duplicates
            texts.append("identical body text repeated verbatim " * 10)
        else:
            texts.append(" ".join(rng.choice(vocab, size=40)))
    docs = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"), "text": texts})
    ds = ray.data.from_pandas(docs).repartition(16)
    out = textops.near_dup_groups(ds, threshold=0.7).to_pandas()
    groups = dict(zip(out["doc_id"], out["dup_group"]))
    a_ids = [i for i in range(n) if i % 10 == 0]
    b_ids = [i for i in range(n) if i % 10 == 1]
    assert len({groups[i] for i in a_ids}) == 1
    assert groups[a_ids[0]] == min(a_ids)
    assert len({groups[i] for i in b_ids}) == 1
    assert groups[b_ids[0]] == min(b_ids)
    # the two clusters stay separate, and random docs stay singletons
    assert groups[a_ids[0]] != groups[b_ids[0]]
    rand_ids = [i for i in range(n) if i % 10 > 1]
    assert all(groups[i] == i for i in rand_ids[:50])
