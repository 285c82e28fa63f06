"""Composite curation pipeline: planted fixtures exercise every drop rule."""

from __future__ import annotations

import numpy as np
import pandas as pd

from kgraft.curation import prepare_training_corpus


def test_curation_drops_each_class(ray_session):
    import ray

    rng = np.random.RandomState(3)
    vocab = [
        "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "field",
        "river", "mountain", "castle", "window", "market", "signal", "harbor",
        "journey", "lantern", "meadow", "thunder", "whisper", "granite", "velvet",
        "copper", "orchard", "saddle", "compass", "ember", "willow", "harvest",
    ]
    rows = []
    # 0-9: good, genuinely distinct docs (random word sequences)
    for i in range(10):
        words = rng.choice(vocab, size=120, replace=True)
        rows.append((i, " ".join(words) + f" unique tail number {i}"))
    # 10: exact duplicate of doc 0 -> dropped (min id wins)
    rows.append((10, rows[0][1]))
    # 11: near duplicate of doc 1 (small tail edit) -> dropped
    rows.append((11, rows[1][1] + "tiny edit"))
    # 12: too short -> dropped
    rows.append((12, "short text"))
    # 13: contaminated (verbatim benchmark passage) -> dropped
    bench_text = "this exact benchmark passage is long enough to shingle " * 4
    rows.append((13, " ".join(rng.choice(vocab, size=80)) + " " + bench_text))
    docs = pd.DataFrame({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]})
    bench = pd.DataFrame({"doc_id": [999], "text": [bench_text]})

    out = (
        prepare_training_corpus(
            ray.data.from_pandas(docs),
            ray.data.from_pandas(bench),
            min_quality=0.2,
            min_tokens=10,
            # shared small vocab keeps char-shingle Jaccard between
            # distinct docs well below 0.9; the tiny-edit dup is ~0.98
            near_dup_threshold=0.9,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == list(range(10))
    assert (out["n_tokens"] > 10).all()
    assert (out["quality"] >= 0.2).all()


def test_pack_sequences_matches_straightline_oracle(ray_session):
    """Next-fit packing vs a straight-line single-process oracle, plus
    the engine invariants: every doc exactly once, pack totals within
    budget unless a single oversize doc, and the output is invariant to
    input order and bucket count (determinism under parallelism)."""
    import ray

    from kgraft.curation import pack_sequences

    rng = np.random.RandomState(23)
    words = np.array(["alpha", "beta", "gamma", "delta", "epsilon"])
    texts = [
        " ".join(rng.choice(words, rng.randint(1, 40)))
        for _ in range(300)
    ]
    texts[7] = " ".join(rng.choice(words, 500))  # oversize doc
    ids = rng.permutation(10_000)[:300]  # sparse, shuffled ids
    docs = pd.DataFrame({"doc_id": ids, "text": texts})

    budget, width = 64, 128

    def oracle(df):
        rows = []
        df = df.sort_values("doc_id")
        ntok = df["text"].str.count(r"[A-Za-z0-9_]+").astype("int64")
        for rng_id, g in df.assign(nt=ntok, r=df["doc_id"] // width).groupby("r"):
            cur, cur_tok = [], 0
            for did, nt in zip(g["doc_id"], g["nt"]):
                if cur and cur_tok + nt > budget:
                    rows.extend((d, cur[0], i, cur_tok) for i, d in enumerate(cur))
                    cur, cur_tok = [], 0
                cur.append(did)
                cur_tok += nt
            if cur:
                rows.extend((d, cur[0], i, cur_tok) for i, d in enumerate(cur))
        return pd.DataFrame(rows, columns=["doc_id", "pack_id", "seq_pos", "pack_tokens"])

    want = oracle(docs).sort_values("doc_id").reset_index(drop=True)

    outs = []
    for nb, frac_seed in ((4, 1), (17, 2)):
        got = (
            pack_sequences(
                ray.data.from_pandas(docs.sample(frac=1, random_state=frac_seed)),
                budget=budget,
                range_width=width,
                num_buckets=nb,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(got)
    # invariant to bucket count and input order
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]
    # matches the straight-line oracle
    for c in ("pack_id", "seq_pos", "pack_tokens"):
        assert got[c].tolist() == want[c].tolist(), c
    # every doc exactly once
    assert sorted(got["doc_id"]) == sorted(docs["doc_id"])
    # pack totals: <= budget unless a single oversize doc
    per_pack = got.groupby("pack_id").agg(
        total=("n_tokens", "sum"), n=("doc_id", "size"), over=("oversize", "any")
    )
    bad = per_pack[per_pack["total"] > budget]
    assert ((bad["n"] == 1) & bad["over"]).all()
    # packs never cross the fixed id ranges
    assert (got["pack_id"] // width == got["doc_id"] // width).all()


def test_assign_splits_duplicate_invariant_and_fractions(ray_session):
    """Identical texts must share a split under ANY ids/order; fractions
    approximately honored; assignment stable across repartitioning."""
    import ray

    from kgraft.curation import assign_splits

    rng = np.random.RandomState(3)
    uniq = [f"document body number {i} with distinct content" for i in range(3000)]
    texts = uniq + uniq[:400]  # 400 planted exact dups with different ids
    docs = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})

    got = (
        assign_splits(ray.data.from_pandas(docs).repartition(5))
        .to_pandas()
        .set_index("doc_id")["split"]
    )
    # duplicate invariant
    for i in range(400):
        assert got[i] == got[3000 + i], i
    # fractions (98/1/1 within loose tolerance at n=3000 uniques)
    share = got.iloc[:3000].value_counts(normalize=True)
    assert share["train"] > 0.95
    assert 0.001 < share.get("val", 0) < 0.05
    assert 0.001 < share.get("test", 0) < 0.05
    # repartition/order invariance
    got2 = (
        assign_splits(
            ray.data.from_pandas(docs.sample(frac=1, random_state=9)).repartition(2)
        )
        .to_pandas()
        .set_index("doc_id")["split"]
    )
    assert got.sort_index().tolist() == got2.sort_index().tolist()
