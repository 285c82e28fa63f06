"""Neighborhood feature aggregation over an edge Dataset — the message-
passing primitive of GNN feature engineering (GraphSAGE-style mean/sum
pooling, Hamilton et al. 2017): for every node, aggregate its
neighbors' feature vectors. Chained k times it yields k-hop smoothed
features — on a KG, "importance/quality of the company you keep",
the feature prep step before training a node classifier.

Scale shape — the ``graph/pagerank.py`` contract: the FEATURE matrix is
vocabulary-scale (bounded, broadcast once per hop via ``ray.put``);
EDGES are corpus-scale and never leave their scan. One shuffle-free
edge pass per hop: each block scatter-adds its neighbor contributions
into a dense (n, d) accumulator and emits only the TOUCHED rows
(sparse row partials — (node index, d sums, count)); the driver folds
the partials and divides for the mean. No exchange anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .pagerank import _to_index


def neighbor_aggregate(
    edges,
    node_ids: np.ndarray,
    features: np.ndarray,
    agg: str = "mean",
    direction: str = "both",
    n_hops: int = 1,
    src_col: str = "src",
    dst_col: str = "dst",
    include_self: bool = False,
) -> np.ndarray:
    """Aggregate neighbor features; returns the new (n, d) matrix
    aligned with SORTED ``node_ids``.

    ``agg``: 'mean' or 'sum' (mean of an isolated node is its zero
    vector, count 0 guarded). ``direction``: 'out' aggregates over
    edges leaving the node, 'in' over edges entering it, 'both' over
    the undirected neighborhood (multi-edges count multiplicity).
    ``include_self`` adds the node's own current features with weight 1
    (the GraphSAGE self-loop) before the mean.
    """
    if agg not in ("mean", "sum"):
        raise ValueError(f"neighbor_aggregate: unknown agg {agg!r}")
    if direction not in ("out", "in", "both"):
        raise ValueError(f"neighbor_aggregate: unknown direction {direction!r}")
    ids = np.sort(np.asarray(node_ids, dtype=np.int64))
    if len(ids) and (ids[1:] == ids[:-1]).any():
        # a duplicate id would make the features-row alignment ambiguous
        # and searchsorted would credit all mass to one slot
        raise ValueError("neighbor_aggregate: node_ids contains duplicates")
    feats = np.ascontiguousarray(np.asarray(features, dtype=np.float64))
    n, d = feats.shape
    if n != len(ids):
        raise ValueError("neighbor_aggregate: features rows != node_ids")
    ids_ref = ray.put(ids)

    for _ in range(n_hops):
        fref = ray.put(feats)

        def partial(t: pa.Table) -> pa.Table:
            cols = {"__i": pa.array([], pa.int64()), "__n": pa.array([], pa.float64())}
            for j in range(d):
                cols[f"__c{j}"] = pa.array([], pa.float64())
            if len(t) == 0:
                return pa.table(cols)
            f = ray.get(fref)
            s = _to_index(ray.get(ids_ref), t[src_col].to_numpy(zero_copy_only=False), src_col)
            dd = _to_index(ray.get(ids_ref), t[dst_col].to_numpy(zero_copy_only=False), dst_col)
            acc = np.zeros((n, d), dtype=np.float64)
            cnt = np.zeros(n, dtype=np.float64)
            if direction in ("out", "both"):
                np.add.at(acc, s, f[dd])
                np.add.at(cnt, s, 1.0)
            if direction in ("in", "both"):
                np.add.at(acc, dd, f[s])
                np.add.at(cnt, dd, 1.0)
            nz = np.nonzero(cnt)[0]
            out = {
                "__i": pa.array(nz.astype(np.int64), pa.int64()),
                "__n": pa.array(cnt[nz], pa.float64()),
            }
            for j in range(d):
                out[f"__c{j}"] = pa.array(acc[nz, j], pa.float64())
            return pa.table(out)

        parts = edges.map_batches(partial, batch_format="pyarrow").to_pandas()
        acc = np.zeros((n, d), dtype=np.float64)
        cnt = np.zeros(n, dtype=np.float64)
        if len(parts):
            idx = parts["__i"].to_numpy()
            np.add.at(cnt, idx, parts["__n"].to_numpy())
            for j in range(d):
                np.add.at(acc[:, j], idx, parts[f"__c{j}"].to_numpy())
        if include_self:
            acc += feats
            cnt += 1.0
        if agg == "mean":
            feats = acc / np.where(cnt == 0, 1.0, cnt)[:, None]
        else:
            feats = acc
    return feats
