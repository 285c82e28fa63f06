"""Exact triangle counting + global clustering coefficient over an edge
Dataset — the degree-ordered node-iterator algorithm (Schank & Wagner
2005; the MapReduce adaptation is Suri & Vassilvitskii, WWW 2011).

Graph-quality analytics for the materialized KG (consumption side of
SURVEY.md §2.2 stage 10): triangle density distinguishes a healthy
entity graph from hub-explosion artifacts that degree stats alone miss.
The reference has no graph surface at all (SURVEY.md §2.1).

Scale shape: every step is a bucketed exchange or a partial-combined
aggregate —

1. canonicalize to undirected distinct edges (one bucketed dedup on the
   edge key; self-loops dropped),
2. degree table via endpoint-explode + partial counts,
3. attach degrees to both endpoints (two bucketed hash joins),
4. ORIENT each edge from its lower (degree, id) endpoint to the higher —
   the trick that caps forward out-degree at O(sqrt(m)), so the
   per-source pair explosion in step 5 is O(m^1.5) TOTAL work spread
   over buckets, never a hub-squared blowup on one reducer,
5. per-source wedge generation (vectorized triu pair indices inside a
   bucketed groupby), and
6. one bucketed join of wedges against oriented edges on the composite
   (b, c) key; each triangle matches exactly once.

The wedge Dataset is the big intermediate (O(m^1.5) worst case); it
streams through the closing join without materializing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..relational import bucketed_groupby_apply, hash_join, pre_aggregate_ds


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

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src].to_numpy(dtype="int64")
        b = df[dst].to_numpy(dtype="int64")
        u = np.minimum(a, b)
        v = np.maximum(a, b)
        keep = u != v
        out = pd.DataFrame({"u": u[keep], "v": v[keep]})
        return out.drop_duplicates()

    # pinned: three consumers (degree pass, join chain, edge count) would
    # otherwise each re-run the dedup shuffle. Distinct-edge scale is the
    # module's documented partitioning assumption (vocab-bounded for the
    # KG; for a general corpus graph this is the O(m) working set any
    # triangle algorithm carries).
    und = bucketed_groupby_apply(
        edges.map_batches(canon, batch_format="pandas"),
        ["u", "v"],
        lambda g: g.drop_duplicates(),
        num_buckets,
    ).materialize()

    # adapt downstream exchange width to the MEASURED distinct-edge count
    # (free: und is pinned): a vocab-scale graph at 64 buckets pays
    # 64 fixed task costs per side per shuffle — 5 shuffles of overhead
    # for milliseconds of compute. ~50k edges per bucket, floor 4;
    # corpus-scale graphs still fan out to the caller's num_buckets.
    n_edges = int(und.count())
    nb = int(np.clip(n_edges // 50_000 + 1, 4, num_buckets))

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": np.concatenate([df["u"].to_numpy(), df["v"].to_numpy()])}
        )

    deg = pre_aggregate_ds(
        und.map_batches(endpoints, batch_format="pandas"),
        "node",
        {"deg": (None, "count")},
    ).materialize()  # node-scale (vocab-bounded for the KG); 3 consumers below

    n_nodes = deg.count()
    # wedge count needs no join: sum_v C(deg_v, 2) over the degree table
    wedge_parts = deg.map_batches(
        lambda df: pd.DataFrame(
            {"w": (df["deg"].to_numpy(dtype="int64") * (df["deg"].to_numpy(dtype="int64") - 1)) // 2}
        ),
        batch_format="pandas",
    )
    n_wedges = int(wedge_parts.sum("w") or 0)

    def _orient_frame(u, v, du, dv) -> pd.DataFrame:
        # lexicographic (degree, id): ties on degree break by node id
        u_first = (du < dv) | ((du == dv) & (u < v))
        return pd.DataFrame(
            {
                "a": np.where(u_first, u, v),
                "b": np.where(u_first, v, u),
                "db": np.where(u_first, dv, du),
            }
        )

    if n_nodes <= broadcast_max_nodes:
        # degree table is node-scale: broadcast it once (the same
        # vocab-bounded assumption graph/pagerank.py documents) and
        # orient shuffle-free — two bucketed joins disappear
        deg_df = deg.to_pandas()
        ids = np.sort(deg_df["node"].to_numpy(dtype="int64"))
        dmap = deg_df.set_index("node")["deg"]
        degs = dmap.loc[ids].to_numpy(dtype="int64")
        deg_ref = ray.put((ids, degs))

        def orient_bcast(df: pd.DataFrame) -> pd.DataFrame:
            ids_s, degs_s = ray.get(deg_ref)
            u = df["u"].to_numpy(dtype="int64")
            v = df["v"].to_numpy(dtype="int64")
            du = degs_s[np.searchsorted(ids_s, u)]
            dv = degs_s[np.searchsorted(ids_s, v)]
            return _orient_frame(u, v, du, dv)

        oriented = und.map_batches(orient_bcast, batch_format="pandas")
    else:
        # beyond-broadcast node counts: attach degrees by bucketed join
        with_du = hash_join(
            und,
            deg.map_batches(
                lambda df: df.rename(columns={"node": "u", "deg": "du"}),
                batch_format="pandas",
            ),
            on="u",
            num_buckets=num_buckets,
            left_schema=pa.schema([("u", pa.int64()), ("v", pa.int64())]),
            right_schema=pa.schema([("u", pa.int64()), ("du", pa.int64())]),
        )
        with_both = hash_join(
            with_du,
            deg.map_batches(
                lambda df: df.rename(columns={"node": "v", "deg": "dv"}),
                batch_format="pandas",
            ),
            on="v",
            num_buckets=num_buckets,
            left_schema=pa.schema(
                [("u", pa.int64()), ("v", pa.int64()), ("du", pa.int64())]
            ),
            right_schema=pa.schema([("v", pa.int64()), ("dv", pa.int64())]),
        )
        oriented = with_both.map_batches(
            lambda df: _orient_frame(
                df["u"].to_numpy(dtype="int64"),
                df["v"].to_numpy(dtype="int64"),
                df["du"].to_numpy(dtype="int64"),
                df["dv"].to_numpy(dtype="int64"),
            ),
            batch_format="pandas",
        )

    # pinned: wedge generation and the closing-edge side both read it
    fwd = oriented.materialize()

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in g.groupby("a", sort=False):
            m = len(grp)
            if m < 2:
                continue
            # neighbors ordered by the SAME (degree, id) rule, so each
            # emitted pair matches the closing edge's orientation
            order = np.lexsort((grp["b"].to_numpy(), grp["db"].to_numpy()))
            nb = grp["b"].to_numpy()[order]
            i, j = np.triu_indices(m, 1)
            outs.append(pd.DataFrame({"b": nb[i], "c": nb[j]}))
        if not outs:
            return pd.DataFrame(
                {"b": pd.Series([], dtype="int64"), "c": pd.Series([], dtype="int64")}
            )
        return pd.concat(outs, ignore_index=True)

    wedge_ds = bucketed_groupby_apply(fwd, "a", wedges, nb)

    closing = fwd.map_batches(
        lambda df: df[["a", "b"]].rename(columns={"a": "b", "b": "c"}),
        batch_format="pandas",
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
    clustering = round(3.0 * n_triangles / n_wedges, 6) if n_wedges else 0.0
    return pd.DataFrame(
        {
            "n_nodes": [int(n_nodes)],
            "n_edges": [n_edges],
            "n_triangles": [n_triangles],
            "n_wedges": [n_wedges],
            "global_clustering": [clustering],
        }
    )
