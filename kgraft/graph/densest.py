"""Densest-subgraph extraction (greedy (2+2eps)-approximation).

The MapReduce densest-subgraph algorithm of Bahmani, Kumar &
Vassilvitskii (WSDM 2012 / PVLDB 5(5)): repeatedly drop every alive
node whose alive-degree is <= 2*(1+eps)*density(alive), tracking the
densest intermediate subgraph seen. Runs in O(log n / eps) rounds and
guarantees density(best) >= optimal / (2*(1+eps)) — the distributed
replacement for Charikar's serial one-node-at-a-time peel, which
cannot be parallelized.

Scale shape: identical to :mod:`kgraft.graph.kcore` — per-node state
(alive flags) is vocab-bounded and broadcast per round; edges stream
through bincount passes (or sit pinned in the shard-actor pool via the
same ``_PairShard`` Pregel path). Density bookkeeping is two scalars a
round on the driver.

KG reading: the densest region of the entity co-mention graph is the
topical core a hub-degree ranking overstates — a crawl-spam cluster
shows up here before it shows in degree stats.

The reference has no graph analytics at all (SURVEY.md §2.1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from .kcore import _alive_degree, _PairShard, simple_pairs


def densest_subgraph(
    edges,
    node_ids: np.ndarray,
    epsilon: float = 0.05,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
    pin_limit_bytes: int = 4 << 30,
):
    """Greedy (2+2*epsilon)-approximate densest subgraph.

    Returns ``(members, info)``: ``members`` a pandas frame of the best
    subgraph's node ids, ``info`` a dict with density / n_nodes /
    n_edges / rounds. Density is edges / nodes (so a clique K_n scores
    (n-1)/2). Empty-edge graphs return density 0 and no members.
    """
    ids = np.unique(np.asarray(node_ids, dtype=np.int64))
    n = len(ids)
    pairs = simple_pairs(edges, src_col, dst_col).materialize()

    if pairs.size_bytes() <= pin_limit_bytes:
        refs = pairs.to_arrow_refs()
        num_shards = max(
            1, min(len(refs), int(ray.cluster_resources().get("CPU", 8)) // 2)
        )
        chunks = [refs[i::num_shards] for i in range(num_shards)]
        ids_ref = ray.put(ids)
        shards = [_PairShard.remote(c, ids_ref) for c in chunks if c]

        def degree_fn(alive: np.ndarray) -> np.ndarray:
            a_ref = ray.put(alive)
            out = np.zeros(n, dtype=np.int64)
            for nz, vals in ray.get(
                [s.alive_degree.remote(a_ref) for s in shards]
            ):
                out[nz] += vals
            return out

        try:
            return _densest_loop(degree_fn, ids, n, epsilon)
        finally:
            for s in shards:
                ray.kill(s)

    ids_ref = ray.put(ids)
    return _densest_loop(
        lambda alive: _alive_degree(pairs, ids_ref, ray.put(alive), n),
        ids,
        n,
        epsilon,
    )


def _densest_loop(degree_fn, ids: np.ndarray, n: int, epsilon: float):
    alive = np.ones(n, dtype=bool)
    best_density = 0.0
    best_mask = np.zeros(n, dtype=bool)
    best_m = 0
    rounds = 0
    while alive.any():
        deg = degree_fn(alive)
        m_alive = int(deg.sum()) // 2
        if m_alive == 0:
            break
        n_alive = int(alive.sum())
        density = m_alive / n_alive
        if density > best_density:
            best_density = density
            best_mask = alive.copy()
            best_m = m_alive
        rounds += 1
        drop = alive & (deg <= 2.0 * (1.0 + epsilon) * density)
        if not drop.any():  # cannot happen for epsilon >= 0, but terminate
            break
        alive &= ~drop
    members = pd.DataFrame({"node_id": ids[best_mask]})
    info = {
        "density": best_density,
        "n_nodes": int(best_mask.sum()),
        "n_edges": best_m,
        "rounds": rounds,
    }
    return members, info
