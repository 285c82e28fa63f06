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
