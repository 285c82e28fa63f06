"""Approximate neighborhood function + effective diameter (HyperBall).

The HyperBall algorithm (Boldi & Vigna, "In-core computation of
geometric centralities with HyperBall", 2013; the HyperANF line of
work): every node carries a HyperLogLog counter of the ball B(v, t);
one BSP round unions each node's counter with its neighbors' (HLL
union = elementwise register max), so after t rounds the counter
estimates |B(v, t)|. The neighborhood function N(t) = sum_v |B(v, t)|
converges at the graph's diameter; the effective diameter is the
(interpolated) smallest t with N(t) >= 0.9 * N(inf).

Scale shape: node state is vocab-bounded — n * 2^p register bytes
(p=8 -> 256 B/node) broadcast per round, exactly the pagerank/kcore
contract — while edges stream through max-scatter passes over the
materialized pair blocks; the driver merges per-block register
partials with elementwise max (HLL merge is commutative/associative/
idempotent, so block partials compose exactly). Rounds = diameter.

``mode="exact"`` swaps the HLL registers for per-node bitsets (n bits
per node — test-scale only) running the IDENTICAL propagation loop,
which is how the estimator is validated in tests/test_graph.py.

The reference has no graph analytics at all (SURVEY.md §2.1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..hashing import splitmix64
from .kcore import simple_pairs
from .pagerank import _to_index
from kgraft.sqlround import sql_round

_ALPHA_256 = 0.7213 / (1 + 1.079 / 256)  # standard HLL alpha for m=256


def _hll_init(ids: np.ndarray, p: int = 8) -> np.ndarray:
    """One register row per node, seeded with the node itself."""
    m = 1 << p
    h = splitmix64(ids.astype(np.uint64))
    j = (h & np.uint64(m - 1)).astype(np.int64)
    w = h >> np.uint64(p)
    # rho = position of the leftmost 1-bit of the remaining 64-p bits
    nbits = 64 - p
    shifted = w.astype(np.uint64)
    lz = np.full(len(ids), nbits, dtype=np.int64)
    nz = shifted != 0
    # bit_length via log2 is unsafe at 2^53; use a loop over 64 bits'
    # worth of vectorized halving (6 steps)
    val = shifted[nz]
    bl = np.zeros(val.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = val >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        val = np.where(big, val >> np.uint64(s), val)
    lz[nz] = nbits - 1 - bl
    rho = (lz + 1).astype(np.uint8)
    reg = np.zeros((len(ids), m), dtype=np.uint8)
    reg[np.arange(len(ids)), j] = rho
    return reg


def _hll_estimate(reg: np.ndarray) -> np.ndarray:
    """Per-node cardinality estimates with the standard small-range
    linear-counting correction."""
    m = reg.shape[1]
    est = _ALPHA_256 * m * m / np.power(2.0, -reg.astype(np.float64)).sum(axis=1)
    zeros = (reg == 0).sum(axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lin = m * np.log(m / np.maximum(zeros, 1).astype(np.float64))
    return np.where(small, lin, est)


def _bitset_init(n: int) -> np.ndarray:
    words = (n + 7) // 8
    reg = np.zeros((n, words), dtype=np.uint8)
    idx = np.arange(n)
    reg[idx, idx // 8] = np.uint8(1) << (idx % 8).astype(np.uint8)
    return reg


_POPCNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.int64)


def neighborhood_function(
    edges,
    node_ids: np.ndarray,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
    mode: str = "hll",
    max_rounds: int = 64,
):
    """N(t) for t = 0, 1, ... until convergence. Returns
    ``(nf, reg)``: ``nf`` a list of N(t) values (N(0) = n), ``reg`` the
    final per-node counters (callers derive per-node ball sizes)."""
    import ray

    ids = np.unique(np.asarray(node_ids, dtype=np.int64))
    n = len(ids)
    pairs = simple_pairs(edges, src_col, dst_col).materialize()

    reg = _hll_init(ids) if mode == "hll" else _bitset_init(n)
    m = reg.shape[1]
    # HLL union = register max; bitset union = bitwise OR — same
    # commutative/associative/idempotent merge contract
    merge = np.maximum if mode == "hll" else np.bitwise_or

    def estimate(r: np.ndarray) -> float:
        if mode == "hll":
            return float(_hll_estimate(r).sum())
        return float(_POPCNT[r].sum())

    nf = [float(n)]  # exact by construction at t=0
    from .pagerank import edge_shard_pool

    ids_ref = ray.put(ids)
    # deduped pairs pinned as pre-indexed shard actors across rounds
    # (HyperBall runs until fixpoint — a Dataset job per round is pure
    # launch overhead; see pagerank._DatasetEdgeShard)
    shards = edge_shard_pool(pairs, ids_ref, "lo", "hi")
    is_hll = mode == "hll"
    try:
        for _ in range(max_rounds):
            reg_ref = ray.put(reg)
            parts = ray.get(
                [a.apply.remote(_anf_kernel, reg_ref, is_hll) for a in shards]
            )
            new = reg.copy()
            for touched, part in parts:
                if len(touched):
                    # shard partials may overlap on shared nodes: ufunc.at
                    # merges repeated rows exactly
                    merge.at(new, touched, part)
            if np.array_equal(new, reg):
                break
            reg = new
            nf.append(estimate(reg))
    finally:
        for a in shards:
            ray.kill(a)
    return nf, reg


def geometric_centralities(
    edges,
    node_ids: np.ndarray,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
    mode: str = "hll",
    max_rounds: int = 64,
) -> pd.DataFrame:
    """Harmonic and closeness centrality for every node — the actual
    payload of Boldi & Vigna's HyperBall paper: with |B(v, t)| tracked
    per round, the number of nodes at distance exactly t is the ball
    increment, so harmonic(v) = sum_t (|B(v,t)|-|B(v,t-1)|)/t and
    closeness(v) = (reached-1) / sum_t t*(increment at t). Same BSP
    register propagation as :func:`neighborhood_function`; per-round
    cost unchanged, just one vocab-scale estimate vector kept.
    HLL increments can wiggle slightly negative; they clamp to 0 (the
    paper's practice). ``mode="exact"`` is the bitset twin used by the
    BFS-equivalence pytest."""
    import ray

    ids = np.unique(np.asarray(node_ids, dtype=np.int64))
    n = len(ids)
    pairs = simple_pairs(edges, src_col, dst_col).materialize()
    reg = _hll_init(ids) if mode == "hll" else _bitset_init(n)
    m = reg.shape[1]
    merge = np.maximum if mode == "hll" else np.bitwise_or

    def per_node(r: np.ndarray) -> np.ndarray:
        if mode == "hll":
            return _hll_estimate(r)
        return _POPCNT[r].sum(axis=1).astype(np.float64)

    prev = np.ones(n, dtype=np.float64)  # |B(v, 0)| = 1 exactly
    harmonic = np.zeros(n, dtype=np.float64)
    dist_sum = np.zeros(n, dtype=np.float64)
    reached = np.ones(n, dtype=np.float64)
    for t in range(1, max_rounds + 1):
        reg_ref = ray.put(reg)

        def propagate(tb: pa.Table) -> pa.Table:
            r = ray.get(reg_ref)
            lo = _to_index(ids, tb["lo"].to_numpy(zero_copy_only=False), "lo")
            hi = _to_index(ids, tb["hi"].to_numpy(zero_copy_only=False), "hi")
            touched = np.unique(np.concatenate([lo, hi]))
            pos = np.searchsorted(touched, np.concatenate([lo, hi]))
            part = r[touched].copy()
            src = np.concatenate([hi, lo])
            merge.at(part, pos, r[src])
            return pa.table(
                {
                    "__i": pa.array(touched.astype(np.int64), pa.int64()),
                    "__r": pa.FixedSizeListArray.from_arrays(
                        pa.array(part.reshape(-1), pa.uint8()), m
                    ),
                }
            )

        parts = pairs.map_batches(propagate, batch_format="pyarrow").to_pandas()
        new = reg.copy()
        if len(parts):
            i = parts["__i"].to_numpy()
            r = np.vstack(parts["__r"].to_numpy()).astype(np.uint8)
            merge.at(new, i, r)
        if np.array_equal(new, reg):
            break
        reg = new
        est = per_node(reg)
        inc = np.maximum(est - prev, 0.0)
        harmonic += inc / t
        dist_sum += inc * t
        reached += inc
        prev = np.maximum(prev, est)
    with np.errstate(divide="ignore", invalid="ignore"):
        closeness = np.where(dist_sum > 0, (reached - 1.0) / dist_sum, 0.0)
    return pd.DataFrame(
        {
            "node_id": ids,
            "harmonic": sql_round(harmonic, 6),
            "closeness": sql_round(closeness, 6),
        }
    )


def effective_diameter(nf, alpha: float = 0.9) -> float:
    """Interpolated effective diameter from a neighborhood function."""
    target = alpha * nf[-1]
    for t, v in enumerate(nf):
        if v >= target:
            if t == 0:
                return 0.0
            prev = nf[t - 1]
            return sql_round(t - 1 + (target - prev) / (v - prev), 4)
    return float(len(nf) - 1)


def _anf_kernel(lo, hi, n, r, is_hll):
    """Per-shard register propagation: each endpoint absorbs its
    neighbor's registers (max for HLL, OR for bitsets)."""
    merge = np.maximum if is_hll else np.bitwise_or
    tgt = np.concatenate([lo, hi])
    touched = np.unique(tgt)
    pos = np.searchsorted(touched, tgt)
    part = r[touched].copy()
    src_ = np.concatenate([hi, lo])
    merge.at(part, pos, r[src_])
    return touched, part
