"""Distributed skip-gram-negative-sampling node embeddings.

The last stage of the DeepWalk chain the engine already owns
(``graph/walks.random_walks`` -> ``walk_skipgram_pairs`` -> HERE):
train node vectors so that co-walked entities score high and random
entity pairs score low (Mikolov et al. 2013 SGNS objective over
Perozzi et al. 2014 walk sentences — public). The output embeds the
KG for downstream retrieval/link-prediction, feeding the engine's
existing ANN/kNN operators.

Scale shape — the ``models/classifier.py`` full-batch-GD contract,
matrix-valued: per iteration the (vocab x dim) input/context matrices
broadcast once via ``ray.put``; each PAIR block computes its gradient
contribution vectorized (gather -> sigmoid -> scatter-add) and emits a
SPARSE partial — only the rows it touched, as (index, row-block)
bytes — so partial size tracks the block's distinct nodes, not the
vocabulary. The driver folds partials (np.add.at) and applies one
exact full-batch update. Pair weights (co-occurrence counts) ride the
gradient, so the result is independent of block layout up to float
summation order. Negatives are DETERMINISTIC splitmix64 draws keyed by
(u, v, k, iter) — no RNG state, no sampling drift across workers.

Training state is vocab-scale (the engine's documented KG bound); the
pair table streams. For vocabularies too large to broadcast, the
standard sharded-parameter-server layout (hash-partitioned rows,
pairs routed by u-bucket) replaces the broadcast — documented, not
needed at KG vocab.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..hashing import splitmix64
from .pagerank import _to_index

_NEG_SALT = np.uint64(0xD6E8FEB86659FD93)


def _init_matrix(n: int, dim: int, seed: int) -> np.ndarray:
    """Deterministic uniform(-0.5, 0.5)/dim init from a splitmix64
    stream — the word2vec input-matrix init without RNG state."""
    salt = np.uint64((seed * 0xD6E8FEB86659FD93) & 0xFFFFFFFFFFFFFFFF)
    u = splitmix64(np.arange(n * dim, dtype=np.uint64) + salt)
    f = (u >> np.uint64(11)).astype(np.float64) * (2.0**-53)
    return ((f - 0.5) / dim).reshape(n, dim)


def _neg_draws(u_idx, v_idx, k: int, it: int, seed: int, n_vocab: int):
    """(len(pairs), k) deterministic negative indices."""
    base = splitmix64(
        u_idx.astype(np.uint64) * _NEG_SALT
        ^ splitmix64(v_idx.astype(np.uint64) + np.uint64(it * 1_000_003 + seed))
    )
    ks = splitmix64(np.arange(1, k + 1, dtype=np.uint64) * _NEG_SALT)
    return (
        splitmix64(base[:, None] ^ ks[None, :]) % np.uint64(n_vocab)
    ).astype(np.int64)


def _sigmoid(z):
    return 1.0 / (1.0 + np.exp(-np.clip(z, -35.0, 35.0)))


def _pair_grads(W, C, u, v, wt, it, seed, negatives):
    """One full SGNS gradient pass over a pair slice -> dense
    (dW, dC, loss). Shared by the distributed per-block partial and the
    driver tier so both tiers run the SAME math (gather -> sigmoid ->
    scatter-add; deterministic splitmix64 negatives keyed per pair)."""
    dW = np.zeros_like(W)
    dC = np.zeros_like(C)
    # positive term: push sigma(Wu . Cv) -> 1
    Wu, Cv = W[u], C[v]
    p = _sigmoid(np.einsum("ij,ij->i", Wu, Cv))
    g = wt * (p - 1.0)
    np.add.at(dW, u, g[:, None] * Cv)
    np.add.at(dC, v, g[:, None] * Wu)
    loss = float(-(wt * np.log(np.clip(p, 1e-12, None))).sum())
    # negative term: push sigma(Wu . Cneg) -> 0
    neg = _neg_draws(u, v, negatives, it, seed, len(W))
    for kk in range(negatives):
        nv = neg[:, kk]
        Cn = C[nv]
        pn = _sigmoid(np.einsum("ij,ij->i", Wu, Cn))
        gn = wt * pn
        np.add.at(dW, u, gn[:, None] * Cn)
        np.add.at(dC, nv, gn[:, None] * Wu)
        loss += float(-(wt * np.log(np.clip(1.0 - pn, 1e-12, None))).sum())
    return dW, dC, loss


def train_node_embeddings(
    pairs,
    node_ids: np.ndarray,
    dim: int = 32,
    n_iter: int = 25,
    lr: float = 0.1,
    negatives: int = 5,
    seed: int = 0,
    u_col: str = "u",
    v_col: str = "v",
    weight_col: str = "n",
    driver_tier_max_pairs: int = 2_000_000,
) -> dict:
    """Fit SGNS embeddings over a weighted co-occurrence pair Dataset
    -> ``{ids, W, C, losses}`` (W = input vectors aligned to sorted
    ``ids``; ``losses`` = per-iteration mean weighted log-loss for
    convergence monitoring/tests).

    Two tiers (the ``graph/walks.py`` split): when the deduped pair
    table fits (``<= driver_tier_max_pairs``), iterations run over ONE
    locally-pinned index array — n_iter Dataset execution rounds at
    ~0.25 s of fixed scheduling cost each are the whole runtime at KG
    vocab scale, for matrices that are already driver-resident by
    design. Beyond the threshold the per-block sparse-partial path
    streams the pairs. Same math in both tiers (``_pair_grads``);
    results agree up to float summation order across blocks."""
    ids = np.unique(np.asarray(node_ids, dtype=np.int64))
    n = len(ids)
    if n == 0:
        raise ValueError("train_node_embeddings: empty vocabulary")
    pairs = pairs.materialize()  # every GD iteration re-reads the pairs

    W = _init_matrix(n, dim, seed)
    C = np.zeros((n, dim), dtype=np.float64)
    GW = np.zeros_like(W)  # AdaGrad accumulators
    GC = np.zeros_like(C)
    losses = []

    if pairs.count() <= driver_tier_max_pairs:
        df = pairs.select_columns([u_col, v_col, weight_col]).to_pandas()
        u = _to_index(ids, df[u_col].to_numpy(dtype=np.int64), u_col)
        v = _to_index(ids, df[v_col].to_numpy(dtype=np.int64), v_col)
        wt = df[weight_col].to_numpy(dtype=np.float64)
        wsum = float(wt.sum())
        if wsum == 0.0:
            raise ValueError("train_node_embeddings: no pairs")
        for it in range(n_iter):
            dW, dC, loss = _pair_grads(W, C, u, v, wt, it, seed, negatives)
            GW += dW * dW
            GC += dC * dC
            W = W - lr * dW / np.sqrt(GW + 1e-10)
            C = C - lr * dC / np.sqrt(GC + 1e-10)
            losses.append(loss / (wsum * (1 + negatives)))
        return {"ids": ids, "W": W, "C": C, "losses": losses}

    ids_ref = ray.put(ids)
    wsum = None
    for it in range(n_iter):
        wc_ref = ray.put((W, C))

        def grad_partial(df: pd.DataFrame) -> pd.DataFrame:
            ids_l = ray.get(ids_ref)
            Wl, Cl = ray.get(wc_ref)
            if df.empty:
                return pd.DataFrame(
                    {"i": [], "gw": [], "gc": [], "loss": [], "wsum": []}
                )
            u = _to_index(ids_l, df[u_col].to_numpy(dtype=np.int64), u_col)
            v = _to_index(ids_l, df[v_col].to_numpy(dtype=np.int64), v_col)
            wt = df[weight_col].to_numpy(dtype=np.float64)
            dW, dC, loss = _pair_grads(Wl, Cl, u, v, wt, it, seed, negatives)
            # sparse partial: touched rows only
            touched_w = np.nonzero(np.any(dW != 0.0, axis=1))[0]
            touched_c = np.nonzero(np.any(dC != 0.0, axis=1))[0]
            return pd.DataFrame(
                {
                    "i": [touched_w.tobytes(), touched_c.tobytes()],
                    "gw": [dW[touched_w].tobytes(), b""],
                    "gc": [b"", dC[touched_c].tobytes()],
                    "loss": [loss, 0.0],
                    "wsum": [float(wt.sum()), 0.0],
                }
            )

        parts = pairs.map_batches(grad_partial, batch_format="pandas").to_pandas()
        dW = np.zeros_like(W)
        dC = np.zeros_like(C)
        total_loss = float(parts["loss"].sum())
        if wsum is None:
            wsum = float(parts["wsum"].sum())
            if wsum == 0.0:
                raise ValueError("train_node_embeddings: no pairs")
        for r in parts.itertuples():
            idx = np.frombuffer(r.i, dtype=np.int64)
            if r.gw:
                np.add.at(dW, idx, np.frombuffer(r.gw, dtype=np.float64).reshape(-1, dim))
            if r.gc:
                np.add.at(dC, idx, np.frombuffer(r.gc, dtype=np.float64).reshape(-1, dim))
        # AdaGrad: per-coordinate step scaling tames the degree skew of
        # full-batch gradients (a head entity's row accumulates
        # degree-proportional gradient mass; a uniform lr either stalls
        # the tail or blows up the head). Deterministic — no momentum
        # state beyond the accumulators.
        GW += dW * dW
        GC += dC * dC
        W = W - lr * dW / np.sqrt(GW + 1e-10)
        C = C - lr * dC / np.sqrt(GC + 1e-10)
        losses.append(total_loss / (wsum * (1 + negatives)))
    return {"ids": ids, "W": W, "C": C, "losses": losses}
