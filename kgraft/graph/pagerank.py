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


def _dense_partials(edges, ids_ref, rank_over_deg_ref, src_col, dst_col):
    """One edge pass: per block, map endpoint ids to dense indices
    (searchsorted on the broadcast sorted id vector) and emit the
    block's sparse (dst_idx, contribution) sums."""

    def fn(t: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        w = ray.get(rank_over_deg_ref)
        if len(t) == 0:
            return pa.table(
                {
                    "__i": pa.array([], pa.int64()),
                    "__c": pa.array([], pa.float64()),
                }
            )
        s = np.searchsorted(ids, t[src_col].to_numpy(zero_copy_only=False))
        d = np.searchsorted(ids, t[dst_col].to_numpy(zero_copy_only=False))
        contrib = np.bincount(d, weights=w[s], minlength=len(ids))
        nz = np.nonzero(contrib)[0]
        return pa.table(
            {
                "__i": pa.array(nz.astype(np.int64), pa.int64()),
                "__c": pa.array(contrib[nz], pa.float64()),
            }
        )

    return edges.map_batches(fn, batch_format="pyarrow")


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

    ``node_ids``: the vocabulary (every id appearing in ``edges`` must be
    present). Returns ``(node_id, rank)`` for all nodes. Deterministic.
    """
    ids = np.unique(np.asarray(node_ids, dtype=np.int64))
    n = len(ids)
    ids_ref = ray.put(ids)

    # out-degrees: one edge pass of sparse per-block counts
    def deg_fn(t: pa.Table) -> pa.Table:
        idvec = ray.get(ids_ref)
        if len(t) == 0:
            return pa.table(
                {"__i": pa.array([], pa.int64()), "__c": pa.array([], pa.float64())}
            )
        s = np.searchsorted(idvec, t[src_col].to_numpy(zero_copy_only=False))
        cnt = np.bincount(s, minlength=len(idvec))
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "__i": pa.array(nz.astype(np.int64), pa.int64()),
                "__c": pa.array(cnt[nz].astype(np.float64), pa.float64()),
            }
        )

    deg_parts = edges.map_batches(deg_fn, batch_format="pyarrow").to_pandas()
    outdeg = np.zeros(n, dtype=np.float64)
    np.add.at(outdeg, deg_parts["__i"].to_numpy(), deg_parts["__c"].to_numpy())

    rank = np.full(n, 1.0 / n, dtype=np.float64)
    safe_deg = np.where(outdeg > 0, outdeg, 1.0)
    for _ in range(n_iter):
        w_ref = ray.put(rank / safe_deg)
        parts = _dense_partials(edges, ids_ref, w_ref, src_col, dst_col).to_pandas()
        agg = np.zeros(n, dtype=np.float64)
        np.add.at(agg, parts["__i"].to_numpy(), parts["__c"].to_numpy())
        dangling = rank[outdeg == 0].sum()
        rank = (1.0 - damping) / n + damping * (agg + dangling / n)
    return pd.DataFrame({"node_id": ids, "rank": rank})
