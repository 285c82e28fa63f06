"""Distributed quality-classifier training: logistic regression over
hashed bag-of-words features (the fastText-style linear text classifier
of Joulin et al. 2017, trained the CCNet way — a cheap model that
scores web text for keep/drop curation decisions).

Why this shape: a curation pipeline wants a TRAINABLE quality filter
(label a few sources "good"/"bad", fit, score the corpus), not just the
fixed heuristics in ``textops`` (Gopher rules, C4, unigram NLL). A
linear model over hashed features needs no vocabulary pass at all —
the hashing trick (Weinberger et al. 2009) fixes the dimension up
front, so training state is one dense weight vector.

Scale shape (SURVEY.md §4): full-batch gradient descent where each
iteration is ONE shuffle-free pass over the corpus — every block emits
its dense gradient partial (dim+1 floats, map-side ``X^T (p - y)``
accumulation via ``np.add.at``), partials reduce by sum, the driver
applies the update and re-broadcasts the weights via ``ray.put``. The
weight vector is dimension-scale (2^hash_bits), never corpus-scale;
raw text never shuffles. Deterministic end-to-end: fixed hash seed,
fixed init, full-batch updates (no sampling order to drift).

Scoring is one more shuffle-free pass with the final weights broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..hashing import hash_strings
from kgraft.sqlround import sql_round

_TOKEN_RE = r"[a-z0-9_]+"


def _featurize(texts: pd.Series, dim: int, seed: int):
    """Hashed bag-of-words: per row, (column indices, counts) of its
    tokens hashed into [0, dim). Vectorized across the whole batch —
    one findall/explode, one hash sweep, one bincount per row segment."""
    import re

    toks = texts.fillna("").str.lower().str.findall(re.compile(_TOKEN_RE))
    lens = toks.str.len().to_numpy(dtype=np.int64)
    flat = [t for lst in toks for t in lst]
    if not flat:
        return lens, np.array([], dtype=np.int64), np.array([], dtype=np.float64)
    cols = (hash_strings(flat, seed=seed) % np.uint64(dim)).astype(np.int64)
    # mean pooling (fastText-style): each occurrence weighs 1/len(doc),
    # so margins stay O(|w|) regardless of document length — unit counts
    # saturate the sigmoid on long web documents and stall training
    vals = np.repeat(1.0 / np.maximum(lens, 1).astype(np.float64), lens)
    return lens, cols, vals


def _xtv(lens, cols, vals, row_vec, dim):
    """X^T @ row_vec for the batch's implicit sparse matrix: scatter-add
    each token occurrence's row weight into its hashed column."""
    out = np.zeros(dim, dtype=np.float64)
    row_of_tok = np.repeat(np.arange(len(lens)), lens)
    np.add.at(out, cols, vals * row_vec[row_of_tok])
    return out


def _margins(lens, cols, vals, w, b):
    """X @ w + b per row: segment-sum of token weights."""
    row_of_tok = np.repeat(np.arange(len(lens)), lens)
    z = np.zeros(len(lens), dtype=np.float64)
    np.add.at(z, row_of_tok, vals * w[cols])
    return z + b


def train_text_classifier(
    ds,
    text_col: str,
    label_col: str,
    hash_bits: int = 16,
    n_iter: int = 30,
    lr: float = 5.0,
    l2: float = 1e-6,
    seed: int = 11,
) -> dict:
    """Fit binary logistic regression over hashed bag-of-words.

    ``label_col``: int column with values in {0, 1}. Returns a model
    dict ``{w, b, dim, seed, n, losses}`` — ``losses`` is the per-
    iteration mean log-loss (for convergence tests/monitoring).
    The default lr suits mean-pooled features (scale ~1/len(doc)); it is normalized by n (gradient partials are SUMS so the
    update is exact full-batch GD regardless of block layout).
    """
    dim = 1 << hash_bits
    # pinned: every GD iteration re-reads the corpus; without this the
    # whole upstream chain (read, labeling, filters) re-executes
    # n_iter+1 times. At 100 TB the equivalent is a cached FEATURE table
    # (write the hashed (cols, vals) once, iterate over that).
    ds = ds.materialize()
    n = int(ds.count())
    if n == 0:
        raise ValueError("train_text_classifier: empty dataset")
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    losses = []
    for _ in range(n_iter):
        wref = ray.put((w, b))

        def grad_partial(df: pd.DataFrame) -> pd.DataFrame:
            wg, bg = ray.get(wref)
            lens, cols, vals = _featurize(df[text_col], dim, seed)
            y = df[label_col].to_numpy(dtype=np.float64)
            z = _margins(lens, cols, vals, wg, bg)
            p = 1.0 / (1.0 + np.exp(-z))
            r = p - y
            gw = _xtv(lens, cols, vals, r, dim)
            # log-loss sum (clipped like sklearn to dodge log(0))
            pc = np.clip(p, 1e-12, 1 - 1e-12)
            ll = float(-(y * np.log(pc) + (1 - y) * np.log(1 - pc)).sum())
            return pd.DataFrame(
                {"g": [gw.tobytes()], "gb": [float(r.sum())], "loss": [ll]}
            )

        parts = ds.map_batches(grad_partial, batch_format="pandas").to_pandas()
        gw = np.zeros(dim, dtype=np.float64)
        for blob in parts["g"]:
            gw += np.frombuffer(blob, dtype=np.float64)
        gb = float(parts["gb"].sum())
        losses.append(float(parts["loss"].sum()) / n)
        w -= lr * (gw / n + l2 * w)
        b -= lr * gb / n
    return {"w": w, "b": b, "dim": dim, "seed": seed, "n": n, "losses": losses}


def score_text(ds, model: dict, text_col: str, out_col: str = "p_good"):
    """One shuffle-free scoring pass: broadcast the weight vector once,
    append the per-row keep probability."""
    wref = ray.put((model["w"], model["b"]))
    dim, seed = model["dim"], model["seed"]

    def score(df: pd.DataFrame) -> pd.DataFrame:
        w, b = ray.get(wref)
        lens, cols, vals = _featurize(df[text_col], dim, seed)
        z = _margins(lens, cols, vals, w, b)
        df = df.copy()
        df[out_col] = 1.0 / (1.0 + np.exp(-z))
        return df

    return ds.map_batches(score, batch_format="pandas")


def pr_curve(ds, score_col: str, label_col: str, num_bins: int = 256) -> pd.DataFrame:
    """Precision/recall sweep for a scored corpus: metrics at every
    threshold k/num_bins — how a curation team picks the keep-rate /
    precision operating point for a quality filter.

    Scale shape: ONE shuffle-free pass; each block emits two fixed-size
    score histograms (positives, negatives), the driver's cumulative
    sums turn them into exact tp/fp/fn at every bin-edge threshold.
    Exact because thresholds sit ON bin edges. Returns
    (threshold, n_kept, precision, recall, f1) rows, thresholds with an
    empty keep set dropped (precision undefined there, SQL-NULL-like).
    """
    edges = np.linspace(0.0, 1.0, num_bins + 1)

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df[score_col].to_numpy(dtype=np.float64)
        y = df[label_col].to_numpy(dtype=np.int64)
        hp, _ = np.histogram(s[y == 1], bins=edges)
        hn, _ = np.histogram(s[y == 0], bins=edges)
        # exact-1.0 scores counted separately: the histogram's last bin
        # is right-closed, so threshold 1.0 would otherwise read as 0
        # (saturated sigmoids DO emit exactly 1.0)
        p1 = int(((s == 1.0) & (y == 1)).sum())
        n1 = int(((s == 1.0) & (y == 0)).sum())
        return pd.DataFrame(
            {"hp": [hp.tobytes()], "hn": [hn.tobytes()],
             "p1": [np.int64(p1)], "n1": [np.int64(n1)]}
        )

    parts = ds.map_batches(hist_partial, batch_format="pandas").to_pandas()
    hp = np.zeros(num_bins, dtype=np.int64)
    hn = np.zeros(num_bins, dtype=np.int64)
    for a, b in zip(parts["hp"], parts["hn"]):
        hp += np.frombuffer(a, dtype=np.int64)
        hn += np.frombuffer(b, dtype=np.int64)
    p1, n1 = int(parts["p1"].sum()), int(parts["n1"].sum())
    n_pos = int(hp.sum())
    # tp at threshold t_k = positives with score >= t_k; at t = 1.0 that
    # is exactly the score == 1.0 mass
    tp = np.r_[hp[::-1].cumsum()[::-1], p1].astype(np.float64)
    fp = np.r_[hn[::-1].cumsum()[::-1], n1].astype(np.float64)
    kept = tp + fp
    with np.errstate(divide="ignore", invalid="ignore"):
        prec = tp / kept
        rec = tp / n_pos if n_pos else np.full_like(tp, np.nan)
        f1 = 2 * prec * rec / (prec + rec)
    out = pd.DataFrame(
        {
            "threshold": sql_round(edges, 6),
            "n_kept": kept.astype("int64"),
            "precision": sql_round(prec, 6),
            "recall": sql_round(rec, 6),
            "f1": sql_round(np.where(np.isfinite(f1), f1, 0.0), 6),
        }
    )
    return out[out["n_kept"] > 0].reset_index(drop=True)
