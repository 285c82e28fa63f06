"""k-core decomposition over the materialized edge table.

Third graph-quality signal next to ``kg_degree_stats`` and
``kg_triangles``: coreness separates genuinely dense regions from
star-shaped hub artifacts (a hub explosion inflates degrees but not
coreness — a star's periphery is 1-core no matter how big the hub).

Scale shape (same contract as ``pagerank``): the per-node state
(alive flags, coreness) is vocabulary-scale — bounded, broadcast per
superstep via ``ray.put`` — while edges are corpus-scale and stream
through shuffle-free bincount passes. The algorithm is standard BSP
peeling: for k = 1, 2, ... repeatedly drop alive nodes with alive
degree < k until fixpoint; nodes removed while peeling k+1 have
coreness k. Each peel round is ONE edge pass; the (k+1)-core starts
from the k-core's survivor set so the rounds shrink as k grows.

The graph is simplified first (undirected, self-loops dropped,
parallel edges collapsed) with one bucketed exchange; the deduped pair
set is materialized when it fits the object store (size guard) so peel
passes scan blocks instead of re-executing the dedup shuffle — the
corpus-scale fallback re-reads the lineage per pass, exactly like the
streaming PageRank path.

The reference has no graph analytics at all (SURVEY.md §2.1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .pagerank import _to_index


def simple_pairs(edges, src_col: str = "subj_id", dst_col: str = "obj_id"):
    """Canonical undirected unique pairs (lo < hi): map-side canonicalize
    + local drop-dup (the combiner), one bucketed exchange keyed on the
    pair hash, exact drop-dup post-colocation."""
    from ..relational import bucketed_groupby_apply

    def canon(t: pa.Table) -> pd.DataFrame:
        s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = s != d  # self-loops contribute nothing to coreness
        lo = np.minimum(s[m], d[m])
        hi = np.maximum(s[m], d[m])
        return pd.DataFrame({"lo": lo, "hi": hi}).drop_duplicates()

    local = edges.map_batches(canon, batch_format="pyarrow")
    return bucketed_groupby_apply(
        local, ["lo", "hi"], lambda g: g.drop_duplicates(), num_buckets=32
    )


def _alive_degree(pairs, ids_ref, alive_ref, n: int) -> np.ndarray:
    """One edge pass: per-node degree counting only pairs whose BOTH
    endpoints are alive — sparse vocab-scale partials per block."""

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"__i": pa.array([], pa.int64()), "__c": pa.array([], pa.int64())}
            )
        ids = ray.get(ids_ref)
        alive = ray.get(alive_ref)
        lo = _to_index(ids, t["lo"].to_numpy(zero_copy_only=False), "lo")
        hi = _to_index(ids, t["hi"].to_numpy(zero_copy_only=False), "hi")
        m = alive[lo] & alive[hi]
        dense = np.bincount(lo[m], minlength=n) + np.bincount(hi[m], minlength=n)
        nz = np.nonzero(dense)[0]
        return pa.table(
            {
                "__i": pa.array(nz.astype(np.int64), pa.int64()),
                "__c": pa.array(dense[nz].astype(np.int64), pa.int64()),
            }
        )

    parts = pairs.map_batches(fn, batch_format="pyarrow").to_pandas()
    out = np.zeros(n, dtype=np.int64)
    if len(parts):  # all-empty partials arrive column-less
        np.add.at(out, parts["__i"].to_numpy(), parts["__c"].to_numpy())
    return out


@ray.remote
class _PairShard:
    """One deduped-pair partition pinned across peel rounds (the Pregel
    model, same as ``pagerank._EdgeShard``): peeling needs MANY passes
    (one per (k, round)); a Dataset job per pass is pure launch overhead
    when the pair set fits cluster memory. Blocks arrive as object-store
    refs — zero-copy handoff, never through the driver."""

    def __init__(self, block_refs: list, ids: np.ndarray):
        tables = [t for t in ray.get(list(block_refs)) if len(t)]
        if not tables:
            self.lo = np.empty(0, dtype=np.int64)
            self.hi = np.empty(0, dtype=np.int64)
        else:
            t = pa.concat_tables(
                [tb if isinstance(tb, pa.Table) else pa.Table.from_pandas(tb) for tb in tables]
            )
            self.lo = _to_index(ids, t["lo"].to_numpy(zero_copy_only=False), "lo")
            self.hi = _to_index(ids, t["hi"].to_numpy(zero_copy_only=False), "hi")
        self.n = len(ids)

    def alive_degree(self, alive: np.ndarray):
        if len(self.lo) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        m = alive[self.lo] & alive[self.hi]
        dense = np.bincount(self.lo[m], minlength=self.n) + np.bincount(
            self.hi[m], minlength=self.n
        )
        nz = np.nonzero(dense)[0]
        return nz, dense[nz].astype(np.int64)


def _peel(degree_fn, ids: np.ndarray, n: int) -> pd.DataFrame:
    """Shared peel loop: ``degree_fn(alive) -> alive-degree vector``.

    The degree vector is recomputed only after an actual drop — at each
    k's fixpoint it is still valid for the k+1 check, so total passes =
    drop rounds + 1, not (drop rounds + number of k levels). Unbounded
    in k on purpose: once k exceeds the max alive degree every node
    drops, so the loop always terminates with alive empty (a fixed cap
    would silently truncate the coreness of denser-than-expected
    graphs)."""
    alive = np.ones(n, dtype=bool)
    core = np.zeros(n, dtype=np.int64)
    deg = degree_fn(alive)
    k = 0
    while alive.any():
        k += 1
        # peel to the k-core from the (k-1)-core survivor set
        while True:
            drop = alive & (deg < k)
            if not drop.any():
                break
            core[drop] = k - 1
            alive &= ~drop
            if not alive.any():
                break
            deg = degree_fn(alive)
    return pd.DataFrame({"node_id": ids, "coreness": core})


def core_numbers(
    edges,
    node_ids: np.ndarray,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
    pin_limit_bytes: int = 4 << 30,
) -> pd.DataFrame:
    """Coreness per node: ``(node_id, coreness)`` for every id in
    ``node_ids`` (isolated / absent nodes get 0). Deterministic; every
    edge id must appear in ``node_ids`` (validated per block).

    Peeling needs one alive-degree pass per (k, round) — dozens of
    passes on real graphs — so when the deduped pair set fits cluster
    memory it is pinned in a shard-actor pool and each pass is one
    remote round (~ms), not a Dataset job (the Pregel path; measured
    30x on the sf0.1 KG). Corpus-scale pair sets fall back to streaming
    Dataset passes, paying the job launch per round."""
    ids = np.unique(np.asarray(node_ids, dtype=np.int64))
    n = len(ids)

    # ONE dedup exchange; blocks land in the object store (which spills
    # to disk past memory, so this is safe at any size) — every peel
    # pass then scans blocks instead of re-running the shuffle
    pairs = simple_pairs(edges, src_col, dst_col).materialize()
    if pairs.size_bytes() <= pin_limit_bytes:
        # Pregel path: hand the deduped blocks to shard actors by ref
        refs = pairs.to_arrow_refs()
        num_shards = max(1, min(len(refs), int(ray.cluster_resources().get("CPU", 8)) // 2))
        chunks = [refs[i::num_shards] for i in range(num_shards)]
        ids_ref = ray.put(ids)
        shards = [_PairShard.remote(c, ids_ref) for c in chunks if c]

        def degree_fn(alive: np.ndarray) -> np.ndarray:
            a_ref = ray.put(alive)
            out = np.zeros(n, dtype=np.int64)
            for nz, vals in ray.get([s.alive_degree.remote(a_ref) for s in shards]):
                out[nz] += vals
            return out

        try:
            return _peel(degree_fn, ids, n)
        finally:
            for s in shards:
                ray.kill(s)

    # streaming fallback: every pass scans the materialized blocks
    ids_ref = ray.put(ids)
    return _peel(
        lambda alive: _alive_degree(pairs, ids_ref, ray.put(alive), n), ids, n
    )
