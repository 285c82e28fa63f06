"""Stages 4-5: mention detection + triple extraction (deterministic backend)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from kgraft.models.triples import TripleExtractor


def _seg_batch(rows):
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([0] * len(rows), pa.timestamp("us")),
            "seg_idx": pa.array([r[1] for r in rows], pa.int32()),
            "seg_text": pa.array([r[2] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        }
    )


def test_triple_extraction_basic():
    ex = TripleExtractor()
    out = ex(
        _seg_batch(
            [
                ("u1", 0, "Zorvex Corp was founded by Mira Tal. Filler text here."),
                ("u1", 1, "Acme Labs has acquired Beta Group. Acme Labs competes with Gamma Inc."),
                ("u2", 0, "No facts in this one."),
            ]
        )
    )
    rows = sorted(
        zip(
            out["url"].to_pylist(),
            out["seg_idx"].to_pylist(),
            out["subj"].to_pylist(),
            out["pred"].to_pylist(),
            out["obj"].to_pylist(),
        )
    )
    assert rows == [
        ("u1", 0, "Zorvex Corp", "founded_by", "Mira Tal"),
        ("u1", 1, "Acme Labs", "acquired", "Beta Group"),
        ("u1", 1, "Acme Labs", "competes_with", "Gamma Inc"),
    ]
    assert out.schema.field("conf").type == pa.float32()


def test_triple_extraction_empty_batch():
    ex = TripleExtractor()
    out = ex(_seg_batch([]))
    assert len(out) == 0 and "subj" in out.column_names


def test_mention_detector(ray_session):
    import ray

    from kgraft.models.ner import MentionDetector

    ref = ray.put({"zorvex corp": 0, "zorvex": 0, "acme labs": 1})
    det = MentionDetector(ref)
    out = det(
        _seg_batch([("u", 0, "Zorvex Corp met Acme Labs. zorvex smiled.")])
    )
    surfaces = out["surface"].to_pylist()
    assert surfaces == ["Zorvex Corp", "Acme Labs", "zorvex"]  # longest-first
    s, e = out["start"].to_pylist()[0], out["end"].to_pylist()[0]
    assert s == 0 and e == len("Zorvex Corp")


def test_text_classifier_matches_serial_gd(ray_session):
    """Distributed full-batch GD == serial numpy GD (same hashed
    features): gradient partials are exact sums, so block layout cannot
    change the trajectory beyond float-summation noise."""
    import ray

    from kgraft.hashing import hash_strings
    from kgraft.models.classifier import train_text_classifier

    rng = np.random.RandomState(3)
    good_vocab = [f"good{i}" for i in range(30)]
    bad_vocab = [f"bad{i}" for i in range(30)]
    rows = []
    for i in range(200):
        v = good_vocab if i % 2 == 0 else bad_vocab
        rows.append((" ".join(rng.choice(v, 12)), i % 2 == 0 and 1 or 0))
    df = pd.DataFrame(rows, columns=["text", "label"])
    df["label"] = (np.arange(200) % 2 == 0).astype("int64")

    hash_bits, n_iter, lr, l2, seed = 10, 12, 10.0, 1e-6, 11
    model = train_text_classifier(
        ray.data.from_pandas(df).repartition(6), "text", "label",
        hash_bits=hash_bits, n_iter=n_iter, lr=lr, l2=l2, seed=seed,
    )

    # serial twin
    import re

    dim = 1 << hash_bits
    X = np.zeros((len(df), dim))
    for r, text in enumerate(df["text"]):
        toks = re.findall(r"[a-z0-9_]+", text.lower())
        cols = (hash_strings(toks, seed=seed) % np.uint64(dim)).astype(int)
        np.add.at(X[r], cols, 1.0 / max(len(toks), 1))  # mean pooling
    y = df["label"].to_numpy(dtype=float)
    w, b = np.zeros(dim), 0.0
    n = len(df)
    for _ in range(n_iter):
        p = 1 / (1 + np.exp(-(X @ w + b)))
        w -= lr * (X.T @ (p - y) / n + l2 * w)
        b -= lr * float((p - y).sum()) / n
    np.testing.assert_allclose(model["w"], w, atol=1e-10)
    np.testing.assert_allclose(model["b"], b, atol=1e-10)

    # loss decreases and the planted separation is learned
    assert model["losses"][-1] < model["losses"][0] * 0.6


def test_text_classifier_scores_separate_sources(ray_session):
    import ray

    from kgraft.models.classifier import score_text, train_text_classifier

    rng = np.random.RandomState(9)
    rows = []
    for i in range(300):
        if i % 2:
            rows.append(("clean prose " + " ".join(rng.choice(list("abcdef"), 5)), 1))
        else:
            rows.append(("spam junk buy " + " ".join(rng.choice(list("uvwxyz"), 5)), 0))
    df = pd.DataFrame(rows, columns=["text", "label"])
    df["label"] = df["label"].astype("int64")
    ds = ray.data.from_pandas(df).repartition(5)
    model = train_text_classifier(ds, "text", "label", hash_bits=12, n_iter=10)
    scored = score_text(ds, model, "text").to_pandas()
    acc = ((scored["p_good"] > 0.5).astype(int) == scored["label"]).mean()
    assert acc > 0.95


def test_pr_curve_matches_direct(ray_session):
    """Histogram-partial PR sweep == direct per-threshold counting."""
    import ray

    from kgraft.models.classifier import pr_curve

    rng = np.random.RandomState(5)
    n = 2000
    y = (rng.rand(n) < 0.3).astype("int64")
    # scores correlated with labels but noisy
    s = np.clip(0.5 * y + 0.4 * rng.rand(n), 0, 1)
    df = pd.DataFrame({"p": s, "y": y})
    got = pr_curve(ray.data.from_pandas(df).repartition(6), "p", "y", num_bins=64)

    for _, row in got.sample(10, random_state=1).iterrows():
        t = row["threshold"]
        keep = s >= t
        tp = int((keep & (y == 1)).sum())
        assert row["n_kept"] == int(keep.sum())
        assert abs(row["precision"] - tp / keep.sum()) < 1e-6
        assert abs(row["recall"] - tp / (y == 1).sum()) < 1e-6


def test_pr_curve_threshold_one_exact_scores(ray_session):
    """Scores of exactly 1.0 must be counted at the 1.0 threshold (the
    saturated-sigmoid case the histogram's right-closed last bin hid)."""
    import ray

    from kgraft.models.classifier import pr_curve

    df = pd.DataFrame({"p": [1.0, 1.0, 0.9, 0.2], "y": [1, 0, 1, 0]})
    got = pr_curve(ray.data.from_pandas(df), "p", "y", num_bins=4)
    row = got[got["threshold"] == 1.0]
    assert len(row) == 1
    assert row.iloc[0]["n_kept"] == 2
    assert abs(row.iloc[0]["precision"] - 0.5) < 1e-9
