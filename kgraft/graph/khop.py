"""Multi-source k-hop reachability (bounded BFS) over the edge table.

The seed-expansion primitive (entity neighborhoods, blast-radius
queries, subgraph extraction pre-pass). Same scale commitment as
`graph/pagerank.py`: the frontier/visited state is a vocab-scale bool
vector broadcast once per hop via ``ray.put``; each hop is ONE
shuffle-free edge scan that emits the block's newly-reached indices
(bincount-style sparse partials, never raw edges); the per-hop reduce
is vocab-bounded. k hops = k edge passes — the unavoidable BSP cost.

Reference: n/a (forsummer/Gondar has no graph ops); north-rule graph
analytics territory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .pagerank import _to_index


def k_hop_reach(
    edges,
    node_ids: np.ndarray,
    seeds,
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = False,
) -> pd.DataFrame:
    """-> ``(node_id, hop)`` for every node within ``k`` hops of any
    seed; ``hop`` is the shortest distance (seeds at 0). Undirected by
    default (edges traversed both ways)."""
    ids = np.unique(np.asarray(node_ids, dtype=np.int64))
    n = len(ids)
    ids_ref = ray.put(ids)
    hop = np.full(n, -1, dtype=np.int64)
    seed_idx = _to_index(ids, np.unique(np.asarray(seeds, dtype=np.int64)), "seed")
    hop[seed_idx] = 0
    frontier = np.zeros(n, dtype=bool)
    frontier[seed_idx] = True

    from .pagerank import edge_shard_pool

    shards = edge_shard_pool(edges, ids_ref, src_col, dst_col)
    try:
        for h in range(1, int(k) + 1):
            fref = ray.put(frontier)
            parts = ray.get(
                [a.apply.remote(_khop_kernel, fref, directed) for a in shards]
            )
            reached = np.zeros(n, dtype=bool)
            for arr in parts:
                if len(arr):
                    reached[arr] = True
            new = reached & (hop < 0)
            if not new.any():
                break
            hop[new] = h
            frontier = new
    finally:
        for a in shards:
            ray.kill(a)

    mask = hop >= 0
    return pd.DataFrame({"node_id": ids[mask], "hop": hop[mask]})


def _khop_kernel(s, d, n, f, directed):
    """Per-shard frontier expansion over resident index arrays."""
    reached = d[f[s]]
    if not directed:
        reached = np.concatenate([reached, s[f[d]]])
    return np.unique(reached) if len(reached) else np.empty(0, dtype=np.int64)
