"""Distributed PageRank over the materialized edge table.

Graph analytics over the engine's own output (nodes/edges parquet,
`schema.EDGES`) — the consumption side of KG construction: entity
importance ranking for canonical-name selection audits, crawl
prioritization, and graph-quality monitoring.

Scale shape (the documented partitioning assumption, same as
canonicalization in ``pipeline.py``): the NODE vector is
vocabulary-scale — bounded, broadcastable — while EDGES are
corpus-scale and never leave their scan. Each BSP iteration broadcasts
the (rank / out-degree) vectors once via ``ray.put``, streams the edge
blocks through one shuffle-free ``map_batches`` that combines
contributions map-side with ``np.bincount`` (one sparse partial per
block, never raw edges), and reduces the vocab-scale partials. Every
iteration is necessarily a full edge pass in any BSP PageRank; at
10^12-edge scale the scan dominates and the vocab-bounded vector is the
serial component.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _to_index(ids: np.ndarray, vals: np.ndarray, col: str) -> np.ndarray:
    """Map endpoint ids to dense indices via searchsorted on the sorted
    vocabulary — VALIDATED: an id absent from the vocabulary would
    otherwise be silently credited to its insertion neighbor (corrupt
    ranks) or index out of bounds."""
    idx = np.searchsorted(ids, vals)
    bad = (idx >= len(ids)) | (ids[np.minimum(idx, len(ids) - 1)] != vals)
    if bad.any():
        raise ValueError(
            f"pagerank: {int(bad.sum())} {col} id(s) not in node_ids "
            f"(e.g. {vals[bad][:3].tolist()})"
        )
    return idx


def _sparse_partials(edges, ids_ref, src_col, dst_col, weights_ref=None):
    """One edge pass: per block, emit the block's sparse
    (index, value) sums — weighted rank contributions keyed by DST when
    ``weights_ref`` is set, plain out-degree counts keyed by SRC when
    it is None."""

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"__i": pa.array([], pa.int64()), "__c": pa.array([], pa.float64())}
            )
        ids = ray.get(ids_ref)
        s = _to_index(ids, t[src_col].to_numpy(zero_copy_only=False), src_col)
        if weights_ref is None:
            dense = np.bincount(s, minlength=len(ids)).astype(np.float64)
        else:
            d = _to_index(ids, t[dst_col].to_numpy(zero_copy_only=False), dst_col)
            dense = np.bincount(d, weights=ray.get(weights_ref)[s], minlength=len(ids))
        nz = np.nonzero(dense)[0]
        return pa.table(
            {
                "__i": pa.array(nz.astype(np.int64), pa.int64()),
                "__c": pa.array(dense[nz], pa.float64()),
            }
        )

    return edges.map_batches(fn, batch_format="pyarrow")


def _fold(parts_df: pd.DataFrame, n: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.float64)
    np.add.at(out, parts_df["__i"].to_numpy(), parts_df["__c"].to_numpy())
    return out


@ray.remote(num_cpus=1)
class _DatasetEdgeShard:
    """One shard of the edge table, pinned in actor memory for BSP
    iteration. Endpoint ids are mapped to dense vocabulary indices ONCE
    at construction (the per-iteration searchsorted of the
    Dataset-job-per-round variant is gone); each round is then a single
    ``bincount`` over the resident index arrays.

    Why an actor pool and not ``map_batches`` per round: an iterative
    BSP loop re-reads the SAME edges every round, and a Dataset job
    carries ~150 ms of launch/teardown per round — 20 PageRank rounds
    paid 3 s of pure overhead at any corpus size. Persistent per-worker
    state across rounds is exactly the case the Dataset API cannot
    express and raw actors can (the shard holds indices, the driver
    holds only vocab-scale vectors). At 10^12-edge scale the shards
    hold the same blocks the scan would read, partitioned across the
    cluster, and each round is one vectorized pass per shard plus a
    vocab-scale reduce."""

    def __init__(self, ids_ref, table_refs, src_col, dst_col):
        ids = ray.get(ids_ref) if isinstance(ids_ref, ray.ObjectRef) else ids_ref
        ss, dd = [], []
        for r in table_refs:
            t = ray.get(r)
            if len(t) == 0:
                continue
            ss.append(_to_index(ids, t[src_col].to_numpy(zero_copy_only=False), src_col))
            dd.append(_to_index(ids, t[dst_col].to_numpy(zero_copy_only=False), dst_col))
        self.s = np.concatenate(ss) if ss else np.empty(0, dtype=np.int64)
        self.d = np.concatenate(dd) if dd else np.empty(0, dtype=np.int64)
        self.n = len(ids)

    def outdeg(self) -> np.ndarray:
        return np.bincount(self.s, minlength=self.n).astype(np.float64)

    def contrib(self, w: np.ndarray) -> np.ndarray:
        """One BSP round: dense destination-keyed weighted counts.
        Dense is fine — the vector is vocab-scale by the module
        contract, and shards-per-node is bounded by CPU count."""
        if len(self.s) == 0:
            return np.zeros(self.n, dtype=np.float64)
        return np.bincount(self.d, weights=w[self.s], minlength=self.n)

    def contrib_rev(self, w: np.ndarray) -> np.ndarray:
        """Reverse-direction round (HITS hub step: h[s] = sum a[d])."""
        if len(self.s) == 0:
            return np.zeros(self.n, dtype=np.float64)
        return np.bincount(self.s, weights=w[self.d], minlength=self.n)

    def apply(self, fn, *args):
        """Generic pinned-edge kernel: ``fn(s_idx, d_idx, n, *args)``.
        Lets every iterative graph algorithm (LPA, k-core peeling,
        k-hop frontiers, ANF, MIS, SCC reach) run its per-round edge
        scan against the resident index arrays instead of launching a
        Dataset job per round — the kernel is a module-level function,
        cloudpickled per call (bytes-scale), args are vocab-scale
        vectors."""
        return fn(self.s, self.d, self.n, *args)


def edge_shard_pool(edges, ids_ref, src_col: str, dst_col: str):
    """Materialize ``edges`` and pin them across an actor pool, one
    actor per ~CPU (capped by block count). Returns the shard handles;
    they are reclaimed when the handles go out of scope."""
    refs = edges.materialize().to_arrow_refs()
    n_shards = max(1, min(int(ray.cluster_resources().get("CPU", 8)), len(refs)))
    return [
        _DatasetEdgeShard.remote(ids_ref, refs[i::n_shards], src_col, dst_col)
        for i in range(n_shards)
    ]


def pagerank(
    edges,
    node_ids: np.ndarray,
    damping: float = 0.85,
    n_iter: int = 20,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
) -> pd.DataFrame:
    """PageRank with uniform teleport and dangling-mass redistribution:
    ``r' = (1-d)/N + d * (A^T (r/outdeg) + dangling_mass/N)``.

    ``node_ids``: the vocabulary (every id appearing in ``edges`` must
    be present — validated per block, see :func:`_to_index`). Returns
    ``(node_id, rank)`` for all nodes. Deterministic.
    """
    ids = np.unique(np.asarray(node_ids, dtype=np.int64))
    n = len(ids)
    ids_ref = ray.put(ids)

    shards = edge_shard_pool(edges, ids_ref, src_col, dst_col)
    try:
        outdeg = np.sum(ray.get([a.outdeg.remote() for a in shards]), axis=0)
        rank = np.full(n, 1.0 / n, dtype=np.float64)
        safe_deg = np.where(outdeg > 0, outdeg, 1.0)
        for _ in range(n_iter):
            w_ref = ray.put(rank / safe_deg)
            agg = np.sum(
                ray.get([a.contrib.remote(w_ref) for a in shards]), axis=0
            )
            dangling = rank[outdeg == 0].sum()
            rank = (1.0 - damping) / n + damping * (agg + dangling / n)
    finally:
        for a in shards:  # do not pin the edge table for the session
            ray.kill(a)
    return pd.DataFrame({"node_id": ids, "rank": rank})


def personalized_pagerank(
    edges,
    node_ids: np.ndarray,
    seeds,
    damping: float = 0.85,
    n_iter: int = 20,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
) -> pd.DataFrame:
    """Personalized PageRank (Page et al. 1999 §6 / Jeh & Widom 2003):
    teleport mass returns to the SEED distribution instead of
    uniformly — ``r' = (1-d)·p + d·(A^T (r/outdeg) + dangling_mass·p)``
    with p uniform over ``seeds``. The local-importance ranking around
    an entity set (seed-expansion, related-entity retrieval).

    Same scale shape as :func:`pagerank`: vocab-scale vectors
    broadcast per BSP round, edges stream through shuffle-free
    bincount partials. Returns ``(node_id, rank)``."""
    ids = np.unique(np.asarray(node_ids, dtype=np.int64))
    n = len(ids)
    seed_idx = _to_index(ids, np.unique(np.asarray(seeds, dtype=np.int64)), "seed")
    p = np.zeros(n, dtype=np.float64)
    p[seed_idx] = 1.0 / len(seed_idx)
    ids_ref = ray.put(ids)

    shards = edge_shard_pool(edges, ids_ref, src_col, dst_col)
    try:
        outdeg = np.sum(ray.get([a.outdeg.remote() for a in shards]), axis=0)
        rank = p.copy()
        safe_deg = np.where(outdeg > 0, outdeg, 1.0)
        for _ in range(n_iter):
            w_ref = ray.put(rank / safe_deg)
            agg = np.sum(
                ray.get([a.contrib.remote(w_ref) for a in shards]), axis=0
            )
            dangling = rank[outdeg == 0].sum()
            rank = (1.0 - damping) * p + damping * (agg + dangling * p)
    finally:
        for a in shards:
            ray.kill(a)
    return pd.DataFrame({"node_id": ids, "rank": rank})


# ---------------------------------------------------------------------------
# Pregel-style iteration: edge shards pinned in actors


@ray.remote
class _EdgeShard:
    """One edge partition held in memory across BSP iterations.

    The streaming :func:`pagerank` pays a full Dataset job (launch +
    parquet re-read + endpoint re-indexing) PER ITERATION — correct for
    corpus-scale edges that cannot stay resident, pure overhead when
    they can. This actor loads and index-maps its shard ONCE; each
    iteration is then a single sub-second remote call returning a
    sparse vocab-scale partial (the Pregel model: graph partitioned
    and pinned, rank vector broadcast per superstep)."""

    def __init__(self, paths: list, ids: np.ndarray, src_col: str, dst_col: str):
        import pyarrow.parquet as pq

        tables = [pq.read_table(p, columns=[src_col, dst_col]) for p in paths]
        t = pa.concat_tables(tables) if tables else None
        if t is None or len(t) == 0:
            self.s = np.empty(0, dtype=np.int64)
            self.d = np.empty(0, dtype=np.int64)
        else:
            self.s = _to_index(ids, t[src_col].to_numpy(zero_copy_only=False), src_col)
            self.d = _to_index(ids, t[dst_col].to_numpy(zero_copy_only=False), dst_col)
        self.n = len(ids)

    def outdeg(self):
        dense = np.bincount(self.s, minlength=self.n).astype(np.float64)
        nz = np.nonzero(dense)[0]
        return nz, dense[nz]

    def contrib(self, w: np.ndarray):
        if len(self.s) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        dense = np.bincount(self.d, weights=w[self.s], minlength=self.n)
        nz = np.nonzero(dense)[0]
        return nz, dense[nz]


def pagerank_pregel(
    edge_files: list,
    node_ids: np.ndarray,
    damping: float = 0.85,
    n_iter: int = 20,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
    num_shards: int | None = None,
) -> pd.DataFrame:
    """:func:`pagerank` semantics (identical output, equivalence-tested)
    over edges pinned in a shard-actor pool — use when the edge table
    fits cluster memory; fall back to the streaming pass otherwise.
    Per-iteration cost drops from a Dataset job to one round of actor
    calls + a vocab-scale fold."""
    ids = np.unique(np.asarray(node_ids, dtype=np.int64))
    n = len(ids)
    if num_shards is None:
        num_shards = max(1, min(len(edge_files), int(ray.cluster_resources().get("CPU", 8)) // 2))
    chunks = [edge_files[i::num_shards] for i in range(num_shards)]
    ids_ref = ray.put(ids)
    shards = [
        _EdgeShard.remote(c, ids_ref, src_col, dst_col) for c in chunks if c
    ]

    def fold(results) -> np.ndarray:
        out = np.zeros(n, dtype=np.float64)
        for nz, vals in results:
            out[nz] += vals
        return out

    try:
        outdeg = fold(ray.get([s.outdeg.remote() for s in shards]))
        rank = np.full(n, 1.0 / n, dtype=np.float64)
        safe_deg = np.where(outdeg > 0, outdeg, 1.0)
        for _ in range(n_iter):
            w_ref = ray.put(rank / safe_deg)
            agg = fold(ray.get([s.contrib.remote(w_ref) for s in shards]))
            dangling = rank[outdeg == 0].sum()
            rank = (1.0 - damping) / n + damping * (agg + dangling / n)
    finally:
        # a mid-iteration failure must not leave shard actors pinning the
        # edge table in cluster memory for the session's lifetime
        for s in shards:
            ray.kill(s)
    return pd.DataFrame({"node_id": ids, "rank": rank})


def _weighted_partials(edges, ids_ref, src_col, dst_col, weight_col,
                       rank_ref=None):
    """One edge pass with PER-EDGE weights: keyed by SRC summing raw
    edge weights when ``rank_ref`` is None (weighted out-degree), else
    keyed by DST summing ``edge_w * rank_vec[src]`` (the weighted rank
    contribution). Same sparse per-block partial shape as
    :func:`_sparse_partials`."""

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"__i": pa.array([], pa.int64()), "__c": pa.array([], pa.float64())}
            )
        ids = ray.get(ids_ref)
        s = _to_index(ids, t[src_col].to_numpy(zero_copy_only=False), src_col)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.maximum(np.nan_to_num(w, nan=0.0), 0.0)  # neg/NaN = absent
        if rank_ref is None:
            dense = np.bincount(s, weights=w, minlength=len(ids))
        else:
            d = _to_index(ids, t[dst_col].to_numpy(zero_copy_only=False), dst_col)
            dense = np.bincount(
                d, weights=w * ray.get(rank_ref)[s], minlength=len(ids)
            )
        nz = np.nonzero(dense)[0]
        return pa.table(
            {
                "__i": pa.array(nz.astype(np.int64), pa.int64()),
                "__c": pa.array(dense[nz], pa.float64()),
            }
        )

    return edges.map_batches(fn, batch_format="pyarrow")


def pagerank_weighted(
    edges,
    node_ids: np.ndarray,
    weight_col: str,
    damping: float = 0.85,
    n_iter: int = 20,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
) -> pd.DataFrame:
    """Edge-weighted PageRank: transition probability out of a node is
    proportional to EDGE WEIGHT (e.g. the KG's extraction-confidence
    column), so low-confidence links leak less importance —
    ``r' = (1-d)/N + d·(Σ_{(s,v)} w_sv · r_s / wout_s + dangling/N)``
    with wout the weighted out-degree; zero/negative weights are
    treated as absent edges. Same scale shape as :func:`pagerank`
    (vocab-scale vectors broadcast per round, one shuffle-free edge
    pass each). Returns ``(node_id, rank)``."""
    ids = np.unique(np.asarray(node_ids, dtype=np.int64))
    n = len(ids)
    ids_ref = ray.put(ids)

    wout = _fold(
        _weighted_partials(edges, ids_ref, src_col, dst_col, weight_col).to_pandas(),
        n,
    )

    rank = np.full(n, 1.0 / n, dtype=np.float64)
    safe = np.where(wout > 0, wout, 1.0)
    for _ in range(n_iter):
        r_ref = ray.put(rank / safe)
        agg = _fold(
            _weighted_partials(
                edges, ids_ref, src_col, dst_col, weight_col, rank_ref=r_ref
            ).to_pandas(),
            n,
        )
        dangling = rank[wout == 0].sum()
        rank = (1.0 - damping) / n + damping * (agg + dangling / n)
    return pd.DataFrame({"node_id": ids, "rank": rank})
