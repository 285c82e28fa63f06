"""k-truss decomposition over the materialized edge table.

Fourth graph-density signal next to ``kg_degree_stats`` /
``kg_triangles`` / ``kg_kcore``: the k-truss is the maximal subgraph
in which EVERY edge closes at least k-2 triangles inside the subgraph
— a strictly stronger cohesion notion than the k-core (every k-truss
is inside the (k-1)-core, but a hub-and-spoke region that survives
coring dissolves under trussing because spokes close no triangles).

Scale shape: per-edge support is computed by the same oriented-wedge
machinery as :mod:`kgraft.graph.triangles` — degree-ordered
orientation bounds the forward adjacency at O(sqrt(m)), wedges close
through ONE bucketed (b, c) join — and peeling is BSP: each round
recounts support over the SURVIVOR edge Dataset and drops edges below
k-2 until fixpoint. Edge state never lands on the driver; only the
survivor count (one int per round) does. The node-degree table is
vocab-bounded and broadcast per round (the documented partitioning
assumption shared with pagerank/kcore/triangles).

The reference has no graph analytics at all (SURVEY.md §2.1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..hashing import splitmix64
from ..relational import hash_join, pre_aggregate_ds
from kgraft.sqlround import sql_round


def _wedges_with_apex(g: pa.Table) -> pa.Table:
    """Within one source-bucket: emit every oriented wedge (a->b, a->c)
    as (b, c, apex a) with neighbors ordered by the closing edge's own
    (degree, id) orientation rule, so (b, c) matches forward edges."""
    a = g["a"].to_numpy(zero_copy_only=False)
    b = g["b"].to_numpy(zero_copy_only=False)
    db = g["db"].to_numpy(zero_copy_only=False)
    order = np.lexsort((b, db, a))
    sa, sb = a[order], b[order]
    starts = np.flatnonzero(np.r_[True, sa[1:] != sa[:-1]])
    ends = np.r_[starts[1:], len(sa)]
    out_b, out_c, out_a = [], [], []
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        i, j = np.triu_indices(m, 1)
        out_b.append(sb[s + i])
        out_c.append(sb[s + j])
        out_a.append(np.full(len(i), sa[s], dtype=np.int64))
    if not out_b:
        return pa.table(
            {
                "b": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
                "apex": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "b": pa.array(np.concatenate(out_b), pa.int64()),
            "c": pa.array(np.concatenate(out_c), pa.int64()),
            "apex": pa.array(np.concatenate(out_a), pa.int64()),
        }
    )


def edge_support(pairs, num_buckets: int = 32):
    """Per-edge triangle count over an undirected distinct pair Dataset
    (columns ``lo`` < ``hi``) -> Dataset (lo, hi, support), edges with
    zero support omitted. One degree pass (vocab-bounded broadcast),
    one wedge exchange, one (b, c) closing join, one pair-count
    exchange."""

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.array(
                    np.concatenate(
                        [
                            t["lo"].to_numpy(zero_copy_only=False),
                            t["hi"].to_numpy(zero_copy_only=False),
                        ]
                    ),
                    pa.int64(),
                )
            }
        )

    deg_df = pre_aggregate_ds(
        pairs.map_batches(endpoints, batch_format="pyarrow"),
        "node",
        {"deg": (None, "count")},
    ).to_pandas()  # vocab-bounded node-degree table
    order = np.argsort(deg_df["node"].to_numpy(dtype="int64"))
    ids = deg_df["node"].to_numpy(dtype="int64")[order]
    degs = deg_df["deg"].to_numpy(dtype="int64")[order]
    deg_ref = ray.put((ids, degs))

    def orient(t: pa.Table) -> pa.Table:
        ids_s, degs_s = ray.get(deg_ref)
        u = t["lo"].to_numpy(zero_copy_only=False)
        v = t["hi"].to_numpy(zero_copy_only=False)
        du = degs_s[np.searchsorted(ids_s, u)]
        dv = degs_s[np.searchsorted(ids_s, v)]
        u_first = (du < dv) | ((du == dv) & (u < v))
        return pa.table(
            {
                "a": pa.array(np.where(u_first, u, v), pa.int64()),
                "b": pa.array(np.where(u_first, v, u), pa.int64()),
                "db": pa.array(np.where(u_first, dv, du), pa.int64()),
            }
        )

    # pinned: wedge generation and the closing-edge side both read it
    fwd = pairs.map_batches(orient, batch_format="pyarrow").materialize()

    def add_src_bucket(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        h = splitmix64(a.astype(np.uint64))
        return t.append_column(
            "__bucket",
            pa.array((h % np.uint64(num_buckets)).astype(np.int64), pa.int64()),
        )

    wedge_ds = (
        fwd.map_batches(add_src_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_wedges_with_apex, batch_format="pyarrow")
    )
    closing = fwd.map_batches(
        lambda t: pa.table({"b": t["a"], "c": t["b"]}), batch_format="pyarrow"
    )
    tri = hash_join(
        wedge_ds,
        closing,
        on=["b", "c"],
        num_buckets=num_buckets,
        left_schema=pa.schema(
            [("b", pa.int64()), ("c", pa.int64()), ("apex", pa.int64())]
        ),
        right_schema=pa.schema([("b", pa.int64()), ("c", pa.int64())]),
    )

    def tri_edges(t: pa.Table) -> pa.Table:
        a = t["apex"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        e1 = np.concatenate([a, a, b])
        e2 = np.concatenate([b, c, c])
        return pa.table(
            {
                "lo": pa.array(np.minimum(e1, e2), pa.int64()),
                "hi": pa.array(np.maximum(e1, e2), pa.int64()),
            }
        )

    return pre_aggregate_ds(
        tri.map_batches(tri_edges, batch_format="pyarrow"),
        ["lo", "hi"],
        {"support": (None, "count")},
    )


def local_clustering(pairs, num_buckets: int = 32) -> "ray.data.Dataset":
    """Per-node local clustering coefficient over an undirected distinct
    pair Dataset (lo < hi): lcc(v) = triangles(v) / C(deg(v), 2).

    Per-node triangle counts fall out of :func:`edge_support` for free:
    every triangle at v contributes support to exactly TWO of v's
    incident edges, so sum(support over v's edges) = 2 * triangles(v).
    One explode + count exchange turns edge supports into node sums;
    degrees come from the same endpoints pass. Nodes with deg < 2 get
    lcc 0. Returns a Dataset (node, deg, triangles, lcc)."""
    sup = edge_support(pairs, num_buckets=num_buckets)

    def explode(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        s = t["support"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([lo, hi]), pa.int64()),
                "s": pa.array(np.concatenate([s, s]), pa.int64()),
            }
        )

    tri2 = pre_aggregate_ds(
        sup.map_batches(explode, batch_format="pyarrow"),
        "node",
        {"tri2": ("s", "sum")},
    )

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.array(
                    np.concatenate(
                        [
                            t["lo"].to_numpy(zero_copy_only=False),
                            t["hi"].to_numpy(zero_copy_only=False),
                        ]
                    ),
                    pa.int64(),
                )
            }
        )

    deg = pre_aggregate_ds(
        pairs.map_batches(endpoints, batch_format="pyarrow"),
        "node",
        {"deg": (None, "count")},
    )
    joined = hash_join(
        deg,
        tri2,
        on="node",
        how="left",
        num_buckets=num_buckets,
        left_schema=pa.schema([("node", pa.int64()), ("deg", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()), ("tri2", pa.float64())]),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        deg_v = df["deg"].to_numpy(np.int64)
        tri = df["tri2"].fillna(0).to_numpy(np.float64) / 2.0
        wedges = deg_v * (deg_v - 1) / 2.0
        lcc = np.where(wedges > 0, tri / np.maximum(wedges, 1.0), 0.0)
        return pd.DataFrame(
            {
                "node": df["node"].to_numpy(np.int64),
                "deg": deg_v,
                "triangles": tri.astype("int64"),
                "lcc": sql_round(lcc, 6),
            }
        )

    return joined.map_batches(finish, batch_format="pandas")


def k_truss(
    edges,
    k: int,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 32,
    max_rounds: int = 100,
):
    """The k-truss (k >= 3) of an arbitrary edge Dataset (directed or
    undirected, duplicates/self-loops tolerated). Returns
    ``(survivors, info)``: ``survivors`` is a MATERIALIZED Dataset of
    undirected distinct edges (lo < hi) in the k-truss, ``info`` a dict
    with n_edges_in / n_edges_truss / rounds."""
    if k < 3:
        raise ValueError("k_truss needs k >= 3 (every edge is a 2-truss)")
    from .kcore import simple_pairs

    pairs = simple_pairs(edges, src_col=src, dst_col=dst)

    def as_lohi(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lo": df["lo"].astype("int64"),
                "hi": df["hi"].astype("int64"),
            }
        )

    alive = pairs.map_batches(as_lohi, batch_format="pandas").materialize()
    n_in = int(alive.count())
    n_prev = n_in
    rounds = 0
    thr = k - 2
    while rounds < max_rounds:
        rounds += 1
        sup = edge_support(alive, num_buckets=num_buckets)
        survivors = sup.filter(expr=f"support >= {thr}").select_columns(
            ["lo", "hi"]
        )
        alive = survivors.materialize()
        n_now = int(alive.count())
        if n_now == n_prev or n_now == 0:
            break
        n_prev = n_now
    return alive, {
        "n_edges_in": n_in,
        "n_edges_truss": int(alive.count()),
        "rounds": rounds,
    }
