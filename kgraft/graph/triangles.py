"""Exact triangle counting + global clustering coefficient over an edge
Dataset — the degree-ordered node-iterator algorithm (Schank & Wagner
2005; the MapReduce adaptation is Suri & Vassilvitskii, WWW 2011).

Graph-quality analytics for the materialized KG (consumption side of
SURVEY.md §2.2 stage 10): triangle density distinguishes a healthy
entity graph from hub-explosion artifacts that degree stats alone miss.
The reference has no graph surface at all (SURVEY.md §2.1).

Scale shape: every step is a bucketed exchange or a partial-combined
aggregate —

1. canonicalize to undirected distinct edges (map-side numpy dedup as
   the combiner + one bucketed exchange on the edge key; self-loops
   dropped),
2. degree table via endpoint-explode + partial counts,
3. attach degrees to both endpoints (degree-table broadcast at
   node-scale; two bucketed hash joins beyond it),
4. ORIENT each edge from its lower (degree, id) endpoint to the higher —
   the trick that caps forward out-degree at O(sqrt(m)), so the
   per-source pair explosion in step 5 is O(m^1.5) TOTAL work spread
   over buckets, never a hub-squared blowup on one reducer,
5. per-source wedge generation (vectorized pair indices per source
   segment inside a bucketed groupby), and
6. one bucketed join of wedges against oriented edges on the composite
   (b, c) key; each triangle matches exactly once.

The wedge Dataset is the big intermediate (O(m^1.5) worst case); it
streams through the closing join without materializing. All stages run
``batch_format="pyarrow"`` with numpy kernels — no pandas block
round-trips on the hot path (r2 verdict task 8).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..hashing import splitmix64
from ..relational import hash_join, pre_aggregate_ds
from kgraft.sqlround import sql_round


def _edge_bucket(u: np.ndarray, v: np.ndarray, num_buckets: int) -> np.ndarray:
    h = splitmix64(u.astype(np.uint64) ^ splitmix64(v.astype(np.uint64)))
    return (h % np.uint64(num_buckets)).astype(np.int64)


def count_triangles(
    edges,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 64,
    broadcast_max_nodes: int = 50_000_000,
):
    """Exact triangle count and global clustering coefficient.

    ``edges``: Dataset with two int64 endpoint columns (directed or
    undirected, duplicates and self-loops tolerated). Returns a one-row
    ``pd.DataFrame``: n_nodes, n_edges (undirected distinct),
    n_triangles, n_wedges (paths of length 2), global_clustering
    (= 3*triangles / wedges; 0.0 for wedge-free graphs).
    """

    def canon(t: pa.Table) -> pa.Table:
        a = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.minimum(a, b)
        v = np.maximum(a, b)
        keep = u != v
        # map-side dedup is the combiner; the bucketed exchange below
        # finishes it exactly (an edge's duplicates share its bucket)
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

    # pinned: three consumers (degree pass, join chain, edge count) would
    # otherwise each re-run the dedup shuffle. Distinct-edge scale is the
    # module's documented partitioning assumption (vocab-bounded for the
    # KG; for a general corpus graph this is the O(m) working set any
    # triangle algorithm carries).
    und = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(dedup_bucket, batch_format="pyarrow")
        .materialize()
    )

    # adapt downstream exchange width to the MEASURED distinct-edge count
    # (free: und is pinned): a vocab-scale graph at 64 buckets pays
    # 64 fixed task costs per side per shuffle — 5 shuffles of overhead
    # for milliseconds of compute. ~50k edges per bucket, floor 4;
    # corpus-scale graphs still fan out to the caller's num_buckets.
    n_edges = int(und.count())
    nb = int(np.clip(n_edges // 50_000 + 1, 4, num_buckets))

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.array(
                    np.concatenate(
                        [
                            t["u"].to_numpy(zero_copy_only=False),
                            t["v"].to_numpy(zero_copy_only=False),
                        ]
                    ),
                    pa.int64(),
                )
            }
        )

    deg = pre_aggregate_ds(
        und.map_batches(endpoints, batch_format="pyarrow"),
        "node",
        {"deg": (None, "count")},
    ).materialize()  # node-scale (vocab-bounded for the KG); 3 consumers below

    n_nodes = deg.count()
    # wedge count needs no join: sum_v C(deg_v, 2) over the degree table
    wedge_parts = deg.map_batches(
        lambda t: pa.table(
            {
                "w": pa.array(
                    (lambda d: d * (d - 1) // 2)(
                        t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
                    ),
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    )
    n_wedges = int(wedge_parts.sum("w") or 0)

    def _orient_table(u, v, du, dv) -> pa.Table:
        # lexicographic (degree, id): ties on degree break by node id
        u_first = (du < dv) | ((du == dv) & (u < v))
        return pa.table(
            {
                "a": pa.array(np.where(u_first, u, v), pa.int64()),
                "b": pa.array(np.where(u_first, v, u), pa.int64()),
                "db": pa.array(np.where(u_first, dv, du), pa.int64()),
            }
        )

    if n_nodes <= broadcast_max_nodes:
        # degree table is node-scale: broadcast it once (the same
        # vocab-bounded assumption graph/pagerank.py documents) and
        # orient shuffle-free — two bucketed joins disappear
        deg_df = deg.to_pandas()
        order = np.argsort(deg_df["node"].to_numpy(dtype="int64"))
        ids = deg_df["node"].to_numpy(dtype="int64")[order]
        degs = deg_df["deg"].to_numpy(dtype="int64")[order]
        deg_ref = ray.put((ids, degs))

        def orient_bcast(t: pa.Table) -> pa.Table:
            ids_s, degs_s = ray.get(deg_ref)
            u = t["u"].to_numpy(zero_copy_only=False)
            v = t["v"].to_numpy(zero_copy_only=False)
            du = degs_s[np.searchsorted(ids_s, u)]
            dv = degs_s[np.searchsorted(ids_s, v)]
            return _orient_table(u, v, du, dv)

        oriented = und.map_batches(orient_bcast, batch_format="pyarrow")
    else:
        # beyond-broadcast node counts: attach degrees by bucketed join
        def rename_deg(node_as: str, deg_as: str):
            def fn(t: pa.Table) -> pa.Table:
                return pa.table({node_as: t["node"], deg_as: t["deg"]})

            return fn

        with_du = hash_join(
            und,
            deg.map_batches(rename_deg("u", "du"), batch_format="pyarrow"),
            on="u",
            num_buckets=num_buckets,
            left_schema=pa.schema([("u", pa.int64()), ("v", pa.int64())]),
            right_schema=pa.schema([("u", pa.int64()), ("du", pa.int64())]),
        )
        with_both = hash_join(
            with_du,
            deg.map_batches(rename_deg("v", "dv"), batch_format="pyarrow"),
            on="v",
            num_buckets=num_buckets,
            left_schema=pa.schema(
                [("u", pa.int64()), ("v", pa.int64()), ("du", pa.int64())]
            ),
            right_schema=pa.schema([("v", pa.int64()), ("dv", pa.int64())]),
        )
        oriented = with_both.map_batches(
            lambda t: _orient_table(
                t["u"].to_numpy(zero_copy_only=False),
                t["v"].to_numpy(zero_copy_only=False),
                t["du"].to_numpy(zero_copy_only=False),
                t["dv"].to_numpy(zero_copy_only=False),
            ),
            batch_format="pyarrow",
        )

    def add_src_bucket(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        h = splitmix64(a.astype(np.uint64))
        return t.append_column(
            "__bucket", pa.array((h % np.uint64(nb)).astype(np.int64), pa.int64())
        )

    # pinned: wedge generation and the closing-edge side both read it
    fwd = oriented.materialize()

    def wedges(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        db = g["db"].to_numpy(zero_copy_only=False)
        # one lexsort segments by source with neighbors ordered by the
        # SAME (degree, id) rule, so each emitted pair matches the
        # closing edge's orientation
        order = np.lexsort((b, db, a))
        sa, sb = a[order], b[order]
        starts = np.flatnonzero(np.r_[True, sa[1:] != sa[:-1]])
        ends = np.r_[starts[1:], len(sa)]
        out_b, out_c = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            i, j = np.triu_indices(m, 1)
            out_b.append(sb[s + i])
            out_c.append(sb[s + j])
        if not out_b:
            return pa.table(
                {"b": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "b": pa.array(np.concatenate(out_b), pa.int64()),
                "c": pa.array(np.concatenate(out_c), pa.int64()),
            }
        )

    wedge_ds = (
        fwd.map_batches(add_src_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(wedges, batch_format="pyarrow")
    )

    closing = fwd.map_batches(
        lambda t: pa.table({"b": t["a"], "c": t["b"]}), batch_format="pyarrow"
    )
    tri = hash_join(
        wedge_ds,
        closing,
        on=["b", "c"],
        num_buckets=nb,
        left_schema=pa.schema([("b", pa.int64()), ("c", pa.int64())]),
        right_schema=pa.schema([("b", pa.int64()), ("c", pa.int64())]),
    )
    n_triangles = int(tri.count())
    clustering = sql_round(3.0 * n_triangles / n_wedges, 6) if n_wedges else 0.0
    return pd.DataFrame(
        {
            "n_nodes": [int(n_nodes)],
            "n_edges": [n_edges],
            "n_triangles": [n_triangles],
            "n_wedges": [n_wedges],
            "global_clustering": [clustering],
        }
    )
