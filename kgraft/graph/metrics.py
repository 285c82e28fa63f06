"""Whole-graph structural metrics: degree assortativity (Newman 2002,
"Assortative mixing in networks", PRL 89) and Newman-Girvan modularity
(Newman 2006, PNAS 103) — the two standard one-number summaries of KG
shape next to clustering coefficient and coreness.

Scale shape (the pagerank/kcore commitment): the undirected distinct
edge set is produced by map-side numpy dedup + ONE bucketed exchange
(an edge's duplicates share its bucket, so the finish is exact); node
ids and degrees are vocab-scale vectors broadcast via ``ray.put``; each
metric is then ONE shuffle-free edge scan emitting a few floats of
moment/count partials per batch — nothing corpus-proportional ever
lands on the driver. Correlation of endpoint degrees is shift-invariant,
so Pearson over plain degrees equals Newman's "remaining degree"
(degree-1) formulation exactly.

Reference: forsummer/Gondar has no graph analytics at all; this is
north-rule "graph materialize + analytics" territory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .triangles import _edge_bucket


def _undirected_distinct(edges, src: str, dst: str, num_buckets: int):
    """Canonical (u<v) self-loop-free distinct pair set as a pinned
    Dataset — map-side numpy dedup as the combiner, one bucketed
    exchange as the exact finish (the `graph/triangles.py` idiom)."""

    def canon(t: pa.Table) -> pa.Table:
        a = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.minimum(a, b)
        v = np.maximum(a, b)
        keep = u != v
        uv = (
            np.unique(np.stack([u[keep], v[keep]], axis=1), axis=0)
            if keep.any()
            else np.empty((0, 2), dtype=np.int64)
        )
        return pa.table(
            {
                "u": pa.array(uv[:, 0], pa.int64()),
                "v": pa.array(uv[:, 1], pa.int64()),
                "__bucket": pa.array(
                    _edge_bucket(uv[:, 0], uv[:, 1], num_buckets), pa.int64()
                ),
            }
        )

    def dedup_bucket(g: pa.Table) -> pa.Table:
        uv = np.unique(
            np.stack(
                [
                    g["u"].to_numpy(zero_copy_only=False),
                    g["v"].to_numpy(zero_copy_only=False),
                ],
                axis=1,
            ),
            axis=0,
        )
        return pa.table(
            {"u": pa.array(uv[:, 0], pa.int64()), "v": pa.array(uv[:, 1], pa.int64())}
        )

    return (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(dedup_bucket, batch_format="pyarrow")
        .materialize()
    )


def _ids_and_degrees(und) -> tuple[np.ndarray, np.ndarray]:
    """Sorted node-id vector + matching undirected degree vector from
    the pinned distinct pair set: per-batch (ids, counts) partials via
    unique+bincount, vocab-scale fold on the driver."""

    def partial(t: pa.Table) -> pd.DataFrame:
        if len(t) == 0:
            return pd.DataFrame(
                {
                    "n": pd.Series([], dtype="int64"),
                    "c": pd.Series([], dtype="int64"),
                }
            )
        both = np.concatenate(
            [
                t["u"].to_numpy(zero_copy_only=False),
                t["v"].to_numpy(zero_copy_only=False),
            ]
        )
        ids, counts = np.unique(both, return_counts=True)
        return pd.DataFrame({"n": ids, "c": counts.astype(np.int64)})

    parts = und.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    agg = parts.groupby("n", sort=True, as_index=False)["c"].sum()
    return agg["n"].to_numpy(np.int64), agg["c"].to_numpy(np.int64)


def degree_assortativity(
    edges, src: str = "src", dst: str = "dst", num_buckets: int = 64
) -> pd.DataFrame:
    """Pearson correlation of the degrees at the two ends of each
    undirected distinct edge (both orientations counted, the symmetric
    joint distribution). Returns one row:
    (n_nodes, n_edges, assortativity) — NaN for degree-regular or
    edge-free graphs (zero variance), matching the standard definition.
    """
    und = _undirected_distinct(edges, src, dst, num_buckets)
    ids, deg = _ids_and_degrees(und)
    ids_ref, deg_ref = ray.put(ids), ray.put(deg)

    def moments(t: pa.Table) -> pd.DataFrame:
        cols = ["n", "sx", "sxx", "sxy"]
        if len(t) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="float64") for c in cols})
        ids_s, dg = ray.get(ids_ref), ray.get(deg_ref)
        x = dg[
            np.searchsorted(ids_s, t["u"].to_numpy(zero_copy_only=False))
        ].astype(np.float64)
        y = dg[
            np.searchsorted(ids_s, t["v"].to_numpy(zero_copy_only=False))
        ].astype(np.float64)
        # symmetric: each edge contributes (x,y) and (y,x)
        return pd.DataFrame(
            {
                "n": [2.0 * len(x)],
                "sx": [float(x.sum() + y.sum())],
                "sxx": [float((x * x).sum() + (y * y).sum())],
                "sxy": [2.0 * float((x * y).sum())],
            }
        )

    parts = und.map_batches(moments, batch_format="pyarrow").to_pandas()
    n = float(parts["n"].sum())
    if n == 0:
        r = float("nan")
    else:
        mx = parts["sx"].sum() / n
        var = parts["sxx"].sum() / n - mx * mx
        cov = parts["sxy"].sum() / n - mx * mx
        r = float(cov / var) if var > 0 else float("nan")
    return pd.DataFrame(
        {
            "n_nodes": pd.Series([len(ids)], dtype="int64"),
            "n_edges": pd.Series([int(n / 2)], dtype="int64"),
            "assortativity": pd.Series([r], dtype="float64"),
        }
    )


def modularity(
    edges,
    communities: pd.DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node_id",
    label_col: str = "community",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Newman-Girvan modularity of a node->community assignment over the
    undirected distinct edge set:

        Q = sum_c [ L_c / m  -  (K_c / (2m))^2 ]

    with ``L_c`` = intra-community edge count, ``K_c`` = total degree of
    community ``c``, ``m`` = distinct undirected edges. ``communities``
    is the vocab-scale (node_id, community) table LPA emits; nodes
    missing from it are treated as singleton communities of their own
    id. Returns one row: (n_nodes, n_edges, n_communities, modularity).
    """
    und = _undirected_distinct(edges, src, dst, num_buckets)
    ids, deg = _ids_and_degrees(und)
    # label vector aligned to ids; unassigned -> own id (singleton)
    lab = ids.copy()
    if len(communities):
        cn = communities[node_col].to_numpy(np.int64)
        cl = communities[label_col].to_numpy(np.int64)
        pos = np.searchsorted(ids, cn)
        ok = (pos < len(ids)) & (ids[np.minimum(pos, len(ids) - 1)] == cn)
        lab[pos[ok]] = cl[ok]
    ids_ref, lab_ref = ray.put(ids), ray.put(lab)

    def intra_partial(t: pa.Table) -> pd.DataFrame:
        if len(t) == 0:
            return pd.DataFrame(
                {
                    "c": pd.Series([], dtype="int64"),
                    "l": pd.Series([], dtype="int64"),
                }
            )
        ids_s, lb = ray.get(ids_ref), ray.get(lab_ref)
        lu = lb[np.searchsorted(ids_s, t["u"].to_numpy(zero_copy_only=False))]
        lv = lb[np.searchsorted(ids_s, t["v"].to_numpy(zero_copy_only=False))]
        same = lu == lv
        cs, counts = np.unique(lu[same], return_counts=True)
        return pd.DataFrame({"c": cs, "l": counts.astype(np.int64)})

    parts = und.map_batches(intra_partial, batch_format="pyarrow").to_pandas()
    l_c = (
        parts.groupby("c", as_index=False)["l"].sum()
        if len(parts)
        else pd.DataFrame({"c": [], "l": []})
    )
    m = float(deg.sum()) / 2.0
    if m == 0:
        q = float("nan")
        n_comm = int(len(np.unique(lab))) if len(lab) else 0
    else:
        k_c = pd.DataFrame({"c": lab, "k": deg}).groupby("c", as_index=False)["k"].sum()
        merged = k_c.merge(l_c, on="c", how="left").fillna({"l": 0})
        q = float(
            (merged["l"] / m - (merged["k"] / (2.0 * m)) ** 2).sum()
        )
        n_comm = int(len(k_c))
    return pd.DataFrame(
        {
            "n_nodes": pd.Series([len(ids)], dtype="int64"),
            "n_edges": pd.Series([int(m)], dtype="int64"),
            "n_communities": pd.Series([n_comm], dtype="int64"),
            "modularity": pd.Series([q], dtype="float64"),
        }
    )
