"""Link prediction over an edge Dataset: common-neighbor counts and
Adamic-Adar scores (Adamic & Adar, Social Networks 2003) for node pairs
NOT already connected — the classic "entities that should probably be
linked" signal over a knowledge graph (kNN of the graph world).

The reference has no graph surface at all (SURVEY.md §2.1); this is a
consumption-side analytic for the materialized KG (SURVEY.md §2.2
stage 10), same family as pagerank/triangles/kcore.

Scale shape — every step is a bucketed exchange or a partial-combined
aggregate:

1. canonicalize to undirected distinct edges (map-side numpy dedup +
   one bucketed exchange on the edge key; self-loops dropped) — the
   graph/triangles.py shape,
2. adjacency rows (center, neighbor) in both directions, ONE bucketed
   exchange on the center key — a center's full neighbor list lands in
   one bucket, so its degree (the Adamic-Adar log-weight) is just its
   group size: no degree join needed,
3. per-center vectorized pair generation; every wedge u–w–v emits one
   (u, v) partial carrying weight 1/ln(deg(w)),
4. pair partials reduce through the map-side-combined aggregate,
5. already-linked pairs drop via one bucketed LEFT join against the
   edge set, and
6. a distributed top-k cut returns the k best unlinked pairs.

Hub centers: a center of degree d emits d·(d-1)/2 wedge pairs, so one
celebrity entity would quadratically flood its bucket. Centers with
degree > ``max_center_degree`` are SKIPPED — the standard
link-prediction trade (their per-wedge weight 1/ln(d) is the smallest
in the graph, and Adamic-Adar exists precisely to discount them) — and
the skip is LOUD: the operator reports ``n_skipped_hubs`` in the
returned frame's ``attrs`` and warns through ``logging`` (SURVEY "no
silent caps"). Tests run below the cap, where the result is exact.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

from ..hashing import splitmix64
from ..relational import hash_join, pre_aggregate_ds
from kgraft.sqlround import sql_round

logger = logging.getLogger(__name__)


def _canon_undirected(edges, src: str, dst: str, num_buckets: int):
    """Undirected distinct edges (u < v), self-loops dropped — one
    bucketed exchange finishes the map-side dedup exactly."""

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
        h = splitmix64(uv[:, 0].astype(np.uint64) ^ splitmix64(uv[:, 1].astype(np.uint64)))
        return pa.table(
            {
                "u": pa.array(uv[:, 0], pa.int64()),
                "v": pa.array(uv[:, 1], pa.int64()),
                "__bucket": pa.array(
                    (h % np.uint64(num_buckets)).astype(np.int64), pa.int64()
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
    )


def adamic_adar_topk(
    edges,
    src: str = "src",
    dst: str = "dst",
    k: int = 20,
    max_center_degree: int = 1024,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Top-k UNLINKED node pairs by Adamic-Adar score.

    ``edges``: Dataset with two int64 endpoint columns (directed or
    undirected; duplicates/self-loops tolerated). Returns a
    ``pd.DataFrame`` (node_a, node_b, common_neighbors, adamic_adar)
    sorted by (adamic_adar desc, node_a, node_b); ``attrs`` carries
    ``n_skipped_hubs`` (centers above ``max_center_degree``, see module
    docstring).
    """
    # pinned: wedge pass + anti-join side both read it; distinct-edge
    # scale is the module's documented partitioning assumption
    und = _canon_undirected(edges, src, dst, num_buckets).materialize()

    def adjacency(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        c = np.concatenate([u, v])
        n = np.concatenate([v, u])
        h = splitmix64(c.astype(np.uint64))
        return pa.table(
            {
                "center": pa.array(c, pa.int64()),
                "nbr": pa.array(n, pa.int64()),
                "__bucket": pa.array(
                    (h % np.uint64(num_buckets)).astype(np.int64), pa.int64()
                ),
            }
        )

    # hub accounting BEFORE the wedge pass (no silent caps): the degree
    # table is a map-side-combined count over adjacency endpoints
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
    )
    n_skipped = int(
        deg.map_batches(
            lambda t: pa.table(
                {
                    "h": pa.array(
                        (
                            t["deg"].to_numpy(zero_copy_only=False)
                            > max_center_degree
                        ).astype(np.int64),
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ).sum("h")
        or 0
    )
    if n_skipped:
        logger.warning(
            "adamic_adar_topk: skipping %d hub centers with degree > %d "
            "(their wedges carry the graph's smallest per-wedge weight); "
            "raise max_center_degree to include them",
            n_skipped,
            max_center_degree,
        )

    def wedge_pairs(g: pa.Table) -> pa.Table:
        c = g["center"].to_numpy(zero_copy_only=False)
        n = g["nbr"].to_numpy(zero_copy_only=False)
        order = np.lexsort((n, c))
        sc, sn = c[order], n[order]
        starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        ends = np.r_[starts[1:], len(sc)]
        out_a, out_b, out_w = [], [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2 or m > max_center_degree:
                continue
            i, j = np.triu_indices(m, 1)
            # neighbors of one center are distinct and lexsort-ascending,
            # so sn[s+i] < sn[s+j]: pairs emerge in canonical order
            out_a.append(sn[s + i])
            out_b.append(sn[s + j])
            out_w.append(np.full(len(i), 1.0 / np.log(m)))
        if not out_a:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "w": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a), pa.int64()),
                "b": pa.array(np.concatenate(out_b), pa.int64()),
                "w": pa.array(np.concatenate(out_w), pa.float64()),
            }
        )

    wedges = (
        und.map_batches(adjacency, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(wedge_pairs, batch_format="pyarrow")
    )

    pairs = pre_aggregate_ds(
        wedges, ["a", "b"], {"common_neighbors": (None, "count"), "aa": ("w", "sum")}
    )

    marked = und.map_batches(
        lambda t: pa.table(
            {
                "a": t["u"],
                "b": t["v"],
                "__linked": pa.array(np.ones(len(t), dtype=np.int64), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = hash_join(
        pairs,
        marked,
        on=["a", "b"],
        how="left",
        num_buckets=num_buckets,
        left_schema=pa.schema(
            [
                ("a", pa.int64()),
                ("b", pa.int64()),
                ("common_neighbors", pa.int64()),
                ("aa", pa.float64()),
            ]
        ),
        right_schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("__linked", pa.int64())]
        ),
    )
    def drop_linked(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_null(t["__linked"])).drop_columns(["__linked"])

    unlinked = joined.map_batches(drop_linked, batch_format="pyarrow")
    out = (
        unlinked.sort(["aa", "a", "b"], descending=[True, False, False])
        .limit(k)
        .to_pandas()
    )
    if out.empty:  # wedge-free graph: empty blocks arrive schema-less
        out = pd.DataFrame(
            {
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "common_neighbors": pd.Series([], dtype="int64"),
                "aa": pd.Series([], dtype="float64"),
            }
        )
    res = pd.DataFrame(
        {
            "node_a": out["a"].astype("int64"),
            "node_b": out["b"].astype("int64"),
            "common_neighbors": out["common_neighbors"].astype("int64"),
            "adamic_adar": sql_round(out["aa"], 6),
        }
    )
    res.attrs["n_skipped_hubs"] = n_skipped
    return res
