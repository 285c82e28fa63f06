"""Approximate betweenness centrality (Brandes 2001, "A faster
algorithm for betweenness centrality", J. Math. Sociol.; sampled-source
estimator per Brandes & Pich 2007): how often a node sits on shortest
paths — the load/bridging centrality next to the engine's PageRank,
HITS and k-core.

Scale shape: the undirected distinct edge set (the triangles/kcore
dedup pass) is compiled ONCE into CSR arrays and broadcast via
``ray.put`` — the module's documented partitioning assumption is the
vocab-bounded KG adjacency (the same residency trade
`graph/walks.py`'s in-bucket CSR and `graph/triangles.py`'s pinned
edge set make). Sources are a deterministic splitmix64 bottom-k sample
(permutation-invariant, the `_hash_sample` idiom); each source's full
Brandes pass (level-synchronous BFS forward, per-level dependency
accumulation backward — every step a vectorized gather/scatter over
the CSR, no per-node Python) runs as an independent task over a
sources Dataset, and per-batch dependency partials reduce to the
driver as sparse (node, delta) rows. With k = n sources the estimate
IS exact Brandes; the pytest pins both.

Reference: forsummer/Gondar has no graph analytics; north-rule
"graph materialize + analytics" territory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..hashing import splitmix64
from .metrics import _undirected_distinct


def _csr_from_pairs(u: np.ndarray, v: np.ndarray, n: int):
    """Undirected CSR (indptr, indices) from canonical index pairs."""
    src = np.concatenate([u, v])
    dst = np.concatenate([v, u])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, dst.astype(np.int64)


def _gather_neighbors(indptr, indices, frontier):
    """All (u_rep, w) CSR edges out of ``frontier`` — vectorized
    ragged gather (cumsum-offset trick, no per-node loop)."""
    starts = indptr[frontier]
    cnt = indptr[frontier + 1] - starts
    total = int(cnt.sum())
    if total == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
        )
    pos = np.arange(total, dtype=np.int64)
    csum = np.cumsum(cnt) - cnt
    idx = np.repeat(starts, cnt) + (pos - np.repeat(csum, cnt))
    return np.repeat(frontier, cnt), indices[idx]


def _brandes_source(indptr, indices, n: int, s: int) -> np.ndarray:
    """Dependency vector delta[.] of one source (Brandes Thm 6):
    level-synchronous BFS with path counts, then backward per-level
    accumulation. Every level is vectorized gather + np.add.at."""
    dist = np.full(n, -1, dtype=np.int64)
    sigma = np.zeros(n, dtype=np.float64)
    dist[s] = 0
    sigma[s] = 1.0
    frontier = np.array([s], dtype=np.int64)
    level_edges = []  # (u_rep, w) tree/cross edges per BFS level
    while len(frontier):
        u_rep, w = _gather_neighbors(indptr, indices, frontier)
        new = w[dist[w] == -1]
        if len(new):
            new = np.unique(new)
            dist[new] = dist[frontier[0]] + 1
        # shortest-path DAG edges: w exactly one level deeper than u
        m = dist[w] == dist[u_rep] + 1
        ue, we = u_rep[m], w[m]
        np.add.at(sigma, we, sigma[ue])
        level_edges.append((ue, we))
        frontier = new
    delta = np.zeros(n, dtype=np.float64)
    for ue, we in reversed(level_edges):
        if len(ue):
            np.add.at(
                delta, ue, sigma[ue] / sigma[we] * (1.0 + delta[we])
            )
    delta[s] = 0.0
    return delta


def approx_betweenness(
    edges,
    n_sources: int = 64,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 64,
    top_k: int | None = None,
) -> pd.DataFrame:
    """-> (node_id, betweenness) for every node (or ``top_k`` by score,
    score desc / node_id asc). Undirected convention: path pairs are
    unordered, so accumulated dependencies are halved; sampled sources
    are extrapolated by n/k (Brandes-Pich), making the estimate
    unbiased and EXACT when every node is a source."""
    und = _undirected_distinct(edges, src, dst, num_buckets)

    def collect(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "u": t["u"].to_numpy(zero_copy_only=False),
                "v": t["v"].to_numpy(zero_copy_only=False),
            }
        )

    uv = und.map_batches(collect, batch_format="pyarrow").to_pandas()
    ids = np.unique(np.concatenate([uv["u"].to_numpy(), uv["v"].to_numpy()]))
    n = len(ids)
    if n == 0:
        return pd.DataFrame(
            {
                "node_id": pd.Series([], dtype="int64"),
                "betweenness": pd.Series([], dtype="float64"),
            }
        )
    ui = np.searchsorted(ids, uv["u"].to_numpy(np.int64))
    vi = np.searchsorted(ids, uv["v"].to_numpy(np.int64))
    indptr, indices = _csr_from_pairs(ui, vi, n)

    # deterministic permutation-invariant source sample: bottom-k of
    # splitmix64(node id) — every worker/layout picks the same sources
    k = min(int(n_sources), n)
    h = splitmix64(ids.astype(np.uint64))
    sources = np.sort(np.argpartition(h, k - 1)[:k]) if k < n else np.arange(n)

    csr_ref = ray.put((indptr, indices))
    src_ds = ray.data.from_pandas(
        pd.DataFrame({"s": sources.astype(np.int64)})
    )

    def batch_deltas(df: pd.DataFrame) -> pd.DataFrame:
        ip, ix = ray.get(csr_ref)
        acc = np.zeros(n, dtype=np.float64)
        for s in df["s"].to_numpy(dtype=np.int64):
            acc += _brandes_source(ip, ix, n, int(s))
        nz = np.nonzero(acc)[0]
        return pd.DataFrame({"i": nz.astype(np.int64), "d": acc[nz]})

    parts = src_ds.map_batches(
        batch_deltas, batch_format="pandas", batch_size=max(1, k // 32)
    ).to_pandas()
    bc = np.zeros(n, dtype=np.float64)
    if len(parts):
        np.add.at(
            bc,
            parts["i"].to_numpy(np.int64),
            parts["d"].to_numpy(np.float64),
        )
    bc *= (n / k) / 2.0  # undirected halving + sample extrapolation
    out = pd.DataFrame(
        {
            "node_id": pd.Series(ids, dtype="int64"),
            "betweenness": pd.Series(bc, dtype="float64"),
        }
    )
    if top_k is not None:
        out = (
            out.sort_values(
                ["betweenness", "node_id"], ascending=[False, True]
            )
            .head(top_k)
            .reset_index(drop=True)
        )
    return out
