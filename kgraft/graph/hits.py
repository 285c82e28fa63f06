"""HITS hub/authority scoring (Kleinberg, JACM 1999) over the
materialized edge table — the directed-graph complement to PageRank:
authorities are entities many good hubs point AT, hubs are entities
that point at many good authorities. On a KG this separates
well-referenced canonical entities (authorities) from aggregator/index
pages (hubs), a signal PageRank's single score conflates.

Scale shape — identical to ``graph/pagerank.py`` and reusing its
kernels: the node vectors are vocabulary-scale (broadcast once per
half-iteration via ``ray.put``), edges are corpus-scale and never leave
their scan. Each half-iteration is one shuffle-free edge pass whose
blocks emit sparse ``np.bincount`` partials (one per block, never raw
edges). The hub update IS the authority update on the reversed graph,
so both halves share ``_sparse_partials`` with src/dst swapped.
L2 normalization after every half-step, per the original paper.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from .pagerank import edge_shard_pool


def hits(
    edges,
    node_ids: np.ndarray,
    n_iter: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
) -> pd.DataFrame:
    """Run ``n_iter`` HITS iterations; returns a ``pd.DataFrame``
    (node, authority, hub) over the given vocabulary.

    ``node_ids``: the full node vocabulary (every edge endpoint must
    appear; validated by the shared ``_to_index``). Multi-edges
    contribute multiplicity, matching the adjacency-matrix definition.
    """
    ids = np.unique(np.asarray(node_ids, dtype=np.int64))
    n = len(ids)
    if n == 0:
        return pd.DataFrame(
            {
                "node": pd.Series([], dtype="int64"),
                "authority": pd.Series([], dtype="float64"),
                "hub": pd.Series([], dtype="float64"),
            }
        )
    ids_ref = ray.put(ids)
    auth = np.full(n, 1.0 / np.sqrt(n))
    hub = np.full(n, 1.0 / np.sqrt(n))
    # edges pinned once across all 2*n_iter rounds (see _DatasetEdgeShard:
    # a Dataset job per round is pure launch overhead for a BSP loop)
    shards = edge_shard_pool(edges, ids_ref, src_col, dst_col)
    try:
        for _ in range(n_iter):
            # authority step: a[d] = sum over (s, d) of h[s]
            h_ref = ray.put(hub)
            auth = np.sum(
                ray.get([a.contrib.remote(h_ref) for a in shards]), axis=0
            )
            norm = np.linalg.norm(auth)
            auth = auth / norm if norm > 0 else auth
            # hub step = authority step on the reversed graph: h[s] = sum a[d]
            a_ref = ray.put(auth)
            hub = np.sum(
                ray.get([a.contrib_rev.remote(a_ref) for a in shards]), axis=0
            )
            norm = np.linalg.norm(hub)
            hub = hub / norm if norm > 0 else hub
    finally:
        for a in shards:
            ray.kill(a)
    return pd.DataFrame({"node": ids, "authority": auth, "hub": hub})
