"""Local community extraction via a PPR sweep cut (PageRank-Nibble).

The Andersen-Chung-Lang (FOCS 2006) recipe: rank nodes by
personalized-PageRank mass normalized by degree, then return the rank
PREFIX with minimum CONDUCTANCE phi(S) = cut(S) / min(vol(S),
vol(V\\S)) — the provably-good local cluster around a seed set.

Scale shape: the PPR vector comes from the existing BSP pagerank pass
(vocab-scale vector broadcast, shuffle-free edge bincounts). The sweep
itself needs cut(S_k) for EVERY prefix k, which is ONE more edge pass:
an undirected edge whose endpoints sit at ranks r_lo < r_hi is cut by
exactly the prefixes k in [r_lo, r_hi), so per-block bincount partials
of +1 at r_lo and -1 at r_hi cumulative-sum into the whole cut curve.
Volumes are a degree cumsum in rank order. The driver does vocab-scale
argmin arithmetic only.

The reference has no graph analytics at all (SURVEY.md §2.1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .kcore import simple_pairs
from .pagerank import _to_index, personalized_pagerank
from kgraft.sqlround import sql_round


def ppr_sweep_cut(
    edges,
    node_ids: np.ndarray,
    seeds,
    damping: float = 0.85,
    n_iter: int = 20,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
):
    """Returns ``(members, info)``: the min-conductance PPR sweep
    community containing the seeds (a pandas frame of node ids in rank
    order) and a dict with conductance / cut / volume / size. Only
    nodes with positive PPR mass enter the sweep (the seeds' reachable
    set); prefixes covering the entire candidate set are excluded so
    the cut is never the trivial full graph."""
    ids = np.unique(np.asarray(node_ids, dtype=np.int64))
    n = len(ids)
    pairs = simple_pairs(edges, src_col, dst_col).materialize()

    # undirected degree per node (one endpoints pass)
    def endpoints(t: pa.Table) -> pa.Table:
        lo = _to_index(ids, t["lo"].to_numpy(zero_copy_only=False), "lo")
        hi = _to_index(ids, t["hi"].to_numpy(zero_copy_only=False), "hi")
        d = np.bincount(lo, minlength=n) + np.bincount(hi, minlength=n)
        nz = np.nonzero(d)[0]
        return pa.table(
            {
                "__i": pa.array(nz.astype(np.int64), pa.int64()),
                "__d": pa.array(d[nz].astype(np.int64), pa.int64()),
            }
        )

    parts = pairs.map_batches(endpoints, batch_format="pyarrow").to_pandas()
    deg = np.zeros(n, dtype=np.int64)
    if len(parts):
        np.add.at(deg, parts["__i"].to_numpy(), parts["__d"].to_numpy())
    two_m = int(deg.sum())

    # conductance is an undirected notion — run the PPR over the
    # SYMMETRIZED pair set so mass reaches every undirected neighbor
    def sym(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "s": pa.array(np.concatenate([lo, hi]), pa.int64()),
                "d": pa.array(np.concatenate([hi, lo]), pa.int64()),
            }
        )

    ppr = personalized_pagerank(
        pairs.map_batches(sym, batch_format="pyarrow"), ids, seeds,
        damping=damping, n_iter=n_iter, src_col="s", dst_col="d",
    )
    r = ppr.set_index("node_id").loc[ids, "rank"].to_numpy(np.float64)
    score = np.where(deg > 0, r / np.maximum(deg, 1), 0.0)
    cand = np.flatnonzero((score > 0) & (deg > 0))
    if len(cand) < 2 or two_m == 0:
        return pd.DataFrame({"node_id": ids[cand]}), {
            "conductance": 1.0, "cut": 0, "volume": int(deg[cand].sum()),
            "size": int(len(cand)), "swept": int(len(cand)),
        }
    # deterministic rank: score desc, node id asc — on the 9dp grid:
    # raw-float ordering would let the +-ulp summation-order drift of
    # the PPR masses (both across engines and across shard layouts)
    # reorder structural near-ties; rounding groups them and the id
    # tie-break resolves them identically everywhere (r5: enables the
    # DuckDB sweep twin)
    score_g = sql_round(score, 9)
    order = cand[np.lexsort((ids[cand], -score_g[cand]))]
    rank_of = np.full(n, len(order), dtype=np.int64)  # non-candidates: last
    rank_of[order] = np.arange(len(order))
    rank_ref = ray.put(rank_of)

    def cut_partial(t: pa.Table) -> pa.Table:
        rk = ray.get(rank_ref)
        lo = rk[_to_index(ids, t["lo"].to_numpy(zero_copy_only=False), "lo")]
        hi = rk[_to_index(ids, t["hi"].to_numpy(zero_copy_only=False), "hi")]
        a = np.minimum(lo, hi)
        b = np.maximum(lo, hi)
        keep = a < b  # same-rank impossible; both-outside contributes to
        # every prefix? No: a==b==len(order) edges never straddle a prefix
        m = len(order) + 1
        delta = np.bincount(a[keep], minlength=m).astype(np.int64) - np.bincount(
            b[keep], minlength=m
        ).astype(np.int64)
        nz = np.nonzero(delta)[0]
        return pa.table(
            {
                "__k": pa.array(nz.astype(np.int64), pa.int64()),
                "__v": pa.array(delta[nz], pa.int64()),
            }
        )

    cp = pairs.map_batches(cut_partial, batch_format="pyarrow").to_pandas()
    delta = np.zeros(len(order) + 1, dtype=np.int64)
    if len(cp):
        np.add.at(delta, cp["__k"].to_numpy(), cp["__v"].to_numpy())
    cut = np.cumsum(delta)[: len(order)]  # cut(S_k) for prefix ending at k
    vol = np.cumsum(deg[order])
    # ACL sweep runs within the seed's reachable component: the
    # complement volume is the rest of the SWEPT set, not unreachable
    # components (whose free 0-cuts would always win)
    other = vol[-1] - vol
    denom = np.minimum(vol, other)
    with np.errstate(divide="ignore", invalid="ignore"):
        phi = np.where(denom > 0, cut / denom.astype(np.float64), np.inf)
    # prefixes are S_0..S_{len-1} (k nodes = prefix k-1); exclude any
    # prefix whose complement volume is 0 (the full reachable graph)
    valid = np.flatnonzero(denom > 0)
    if not len(valid):
        best = len(order) - 1
    else:
        best = int(valid[np.argmin(phi[valid])])
    members = ids[order[: best + 1]]
    return pd.DataFrame({"node_id": members}), {
        "conductance": sql_round(float(phi[best]), 6) if np.isfinite(phi[best]) else 1.0,
        "cut": int(cut[best]),
        "volume": int(vol[best]),
        "size": int(best + 1),
        "swept": int(len(order)),
    }
