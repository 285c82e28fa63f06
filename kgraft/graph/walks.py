"""Distributed random-walk corpus generation over the materialized KG.

DeepWalk-style walks (Perozzi et al., KDD 2014 — public) are the
standard training-data prep for graph embeddings: each walk is a
"sentence" of entity ids fed to a skip-gram trainer. The engine's KG
consumption side already ranks (pagerank/HITS), clusters (communities)
and slices (k-hop) the graph; this operator turns it into a TRAINING
CORPUS.

Scale shape — two exchanges total, not one per step:

1. Adjacency pairs are written ONCE as a hash-bucketed Parquet layout
   (:func:`kgraft.io.write_bucketed` — the storage layout IS the
   exchange, paid once). In-bucket pair dedup is exact because a
   node's pairs all hash to one bucket (the ``dedup_right`` trick from
   ``relational.hash_join``).
2. Each of the L steps shuffles ONLY the walk frontier
   ``(walk_id, start, cur)`` — three int64 columns — keyed by the
   LAYOUT'S OWN join hash of ``cur``, so every frontier row lands on
   the bucket holding its node's neighbor run. The bucket task
   rebuilds its CSR slice from local Parquet and advances all resident
   walks vectorized (searchsorted + one gather); no adjacency bytes
   ever re-enter the object store. At cluster scale the bucket
   fragments live on shared storage and the rebuild is a
   1/num_buckets-of-the-table columnar read; pinning per-bucket CSRs
   in shard actors (the ``pagerank_pregel`` pattern) removes even that
   re-read when the graph fits cluster memory.

Determinism: the neighbor choice at (walk, position) is
``splitmix64(walk_id ^ salt(pos, seed)) % degree`` over the node's
SORTED, DEDUPED neighbor run — independent of block layout, bucket
count and worker scheduling, so the corpus is bit-reproducible and
testable against a serial oracle (tests/test_graph.py).

Reference: forsummer/Gondar has no graph analytics (SURVEY.md §2.1);
north-rule territory (graph materialization consumption).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..hashing import splitmix64

_POS_SALT = np.uint64(0x9E3779B97F4A7C15)


def _walk_choice(walk_id: np.ndarray, pos: int, seed: int) -> np.ndarray:
    """Deterministic 64-bit draw per (walk, position): a fresh
    splitmix64 stream keyed by the walk id, salted by position and
    seed. Vectorized; wraps mod 2^64 by construction."""
    salt = splitmix64(
        np.array([pos], dtype=np.uint64) * _POS_SALT
        + np.array([seed], dtype=np.uint64)
    )[0]
    return splitmix64(walk_id.astype(np.uint64) ^ salt)


def _empty_frontier() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "walk_id": pd.Series([], dtype="int64"),
            "start": pd.Series([], dtype="int64"),
            "cur": pd.Series([], dtype="int64"),
        }
    )


def random_walks(
    edges,
    start_nodes: np.ndarray,
    walk_length: int = 8,
    walks_per_node: int = 1,
    seed: int = 0,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
    undirected: bool = True,
    num_buckets: int = 32,
    scratch_dir: str | None = None,
    method: str = "auto",
    max_driver_pairs: int = 5_000_000,
):
    """Generate ``walks_per_node`` random walks of up to ``walk_length``
    steps from every node in ``start_nodes`` -> Dataset of
    ``(walk_id, start, pos, node)`` rows (pos 0 is the start node; a
    walk that reaches a sink node ends early — no self-loop padding).

    ``walk_id = i * walks_per_node + j`` with ``i`` the node's index in
    the unique-sorted ``start_nodes`` — dense, collision-free, and
    independent of entity-id magnitude (entity ids are 64-bit hashes;
    ``node_id * k`` could overflow).

    ``start_nodes`` is the walk seed set — vocab-scale by the engine's
    documented partitioning assumption (same contract as
    ``pagerank(node_ids=...)``); at corpus scale the caller builds the
    pos-0 frontier from the nodes Dataset instead.

    ``method`` — the pagerank streaming-vs-pregel tier split, applied
    to walks:
    * ``"driver"``: one distributed distinct-pair reduction, then the
      DEDUPED adjacency (vocabulary-scale — the same bound
      ``components.py``'s contracted union-find already relies on)
      advances all walks in vectorized numpy on the driver. No
      per-step Dataset job; the right tier whenever the distinct edge
      set fits one machine.
    * ``"bucketed"``: the frontier-shuffle machinery documented above —
      the 10^12-edge tier, where even distinct adjacency cannot land
      on the driver.
    * ``"auto"`` (default): driver tier iff the distinct-pair count is
      <= ``max_driver_pairs``. Both tiers emit BIT-IDENTICAL corpora
      (same choice rule over the same sorted-deduped neighbor runs) —
      equivalence-tested in tests/test_graph.py.
    """
    import shutil
    import tempfile

    from ..io import write_bucketed
    from ..relational import join_key_hash

    starts = np.unique(np.asarray(start_nodes, dtype=np.int64))
    k = int(walks_per_node)
    if len(starts) == 0 or k <= 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "walk_id": pa.array([], pa.int64()),
                    "start": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "node": pa.array([], pa.int64()),
                }
            )
        )

    # ---- adjacency layout: one bucketed write, L local probes -------
    def to_pairs(flip: bool):
        def fn(t: pa.Table) -> pa.Table:
            a, b = (dst_col, src_col) if flip else (src_col, dst_col)
            return pa.table(
                {
                    "node": t[a].cast(pa.int64()),
                    "nbr": t[b].cast(pa.int64()),
                }
            )

        return edges.map_batches(fn, batch_format="pyarrow")

    pairs = to_pairs(False)
    if undirected:
        pairs = pairs.union(to_pairs(True))

    if method not in ("auto", "driver", "bucketed"):
        raise ValueError(f"random_walks: unknown method {method!r}")
    if method != "bucketed":
        from ..relational import pre_aggregate_ds

        dpairs = pre_aggregate_ds(
            pairs, ["node", "nbr"], {"__n": (None, "count")}
        ).materialize()
        if method == "driver" or dpairs.count() <= max_driver_pairs:
            return _driver_walks(
                dpairs.to_pandas(), starts, k, walk_length, seed
            )
        # auto fallback: distinct adjacency exceeds the driver bound —
        # use the frontier-shuffle tier below

    own_scratch = scratch_dir is None
    if own_scratch:
        scratch_dir = tempfile.mkdtemp(prefix="kgraft_walks_")
    layout = os.path.join(scratch_dir, "adj")
    try:
        write_bucketed(pairs, layout, on="node", num_buckets=num_buckets)

        def add_bucket(t: pa.Table) -> pa.Table:
            h = join_key_hash(t, ["cur"], True)
            return t.append_column(
                "__bucket",
                pa.array((h % np.uint64(num_buckets)).astype(np.int64), pa.int64()),
            )

        def make_advance(pos: int):
            def advance(g: pd.DataFrame) -> pd.DataFrame:
                if g.empty:
                    return _empty_frontier()
                b = int(g["__bucket"].iloc[0])
                files = sorted(
                    glob.glob(os.path.join(layout, f"__bucket={b}", "*.parquet"))
                )
                if not files:  # every resident walk sits on a sink node
                    return _empty_frontier()
                import pyarrow.parquet as pq

                t = pa.concat_tables(
                    [pq.read_table(f, columns=["node", "nbr"]) for f in files]
                )
                s = t["node"].to_numpy(zero_copy_only=False)
                d = t["nbr"].to_numpy(zero_copy_only=False)
                order = np.lexsort((d, s))
                s, d = s[order], d[order]
                keep = np.ones(len(s), dtype=bool)  # in-bucket pair dedup
                keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
                s, d = s[keep], d[keep]
                nodes, offsets, deg = np.unique(
                    s, return_index=True, return_counts=True
                )

                cur = g["cur"].to_numpy(dtype=np.int64)
                idx = np.searchsorted(nodes, cur)
                ok = (idx < len(nodes)) & (
                    nodes[np.minimum(idx, len(nodes) - 1)] == cur
                )
                if not ok.any():
                    return _empty_frontier()
                wid = g["walk_id"].to_numpy(dtype=np.int64)[ok]
                i = idx[ok]
                choice = _walk_choice(wid, pos, seed) % deg[i].astype(np.uint64)
                nxt = d[offsets[i] + choice.astype(np.int64)]
                return pd.DataFrame(
                    {
                        "walk_id": wid,
                        "start": g["start"].to_numpy(dtype=np.int64)[ok],
                        "cur": nxt.astype(np.int64),
                    }
                )

            return advance

        def stamp(frontier, pos: int):
            def fn(t: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        "walk_id": t["walk_id"],
                        "start": t["start"],
                        "pos": pa.array(np.full(len(t), pos, dtype=np.int64)),
                        "node": t["cur"],
                    }
                )

            return frontier.map_batches(fn, batch_format="pyarrow")

        frontier = ray.data.from_arrow(
            pa.table(
                {
                    "walk_id": pa.array(
                        np.arange(len(starts) * k, dtype=np.int64)
                    ),
                    "start": pa.array(np.repeat(starts, k)),
                    "cur": pa.array(np.repeat(starts, k)),
                }
            )
        ).materialize()

        outs = [stamp(frontier, 0).materialize()]
        for pos in range(walk_length):
            frontier = (
                frontier.map_batches(add_bucket, batch_format="pyarrow")
                .groupby("__bucket")
                .map_groups(make_advance(pos), batch_format="pandas")
                .materialize()  # iterative op: cut lineage per step
            )
            if frontier.count() == 0:
                break
            outs.append(stamp(frontier, pos + 1).materialize())

        walks = outs[0]
        for o in outs[1:]:
            walks = walks.union(o)
        # the scratch layout dies with this call, so the result must not
        # lazily re-read it
        return walks.materialize()
    finally:
        if own_scratch:
            shutil.rmtree(scratch_dir, ignore_errors=True)


def _driver_walks(
    dpairs: pd.DataFrame,
    starts: np.ndarray,
    k: int,
    walk_length: int,
    seed: int,
):
    """Driver-tier advance over the DEDUPED (vocab-scale) adjacency:
    same sorted-run CSR, same choice rule, all walks advanced per step
    in one vectorized pass — bit-identical to the bucketed tier."""
    s = dpairs["node"].to_numpy(dtype=np.int64)
    d = dpairs["nbr"].to_numpy(dtype=np.int64)
    order = np.lexsort((d, s))
    s, d = s[order], d[order]
    nodes, offsets, deg = np.unique(s, return_index=True, return_counts=True)

    n_walks = len(starts) * k
    wid_all = np.arange(n_walks, dtype=np.int64)
    start_all = np.repeat(starts, k)
    cur = start_all.copy()
    alive = np.ones(n_walks, dtype=bool)
    out_w = [wid_all]
    out_s = [start_all]
    out_p = [np.zeros(n_walks, dtype=np.int64)]
    out_n = [cur.copy()]
    for pos in range(walk_length):
        if len(nodes) == 0 or not alive.any():
            break
        idx = np.searchsorted(nodes, cur)
        ok = (
            alive
            & (idx < len(nodes))
            & (nodes[np.minimum(idx, len(nodes) - 1)] == cur)
        )
        if not ok.any():
            break
        i = idx[ok]
        choice = _walk_choice(wid_all[ok], pos, seed) % deg[i].astype(np.uint64)
        cur[ok] = d[offsets[i] + choice.astype(np.int64)]
        alive = ok
        out_w.append(wid_all[ok])
        out_s.append(start_all[ok])
        out_p.append(np.full(int(ok.sum()), pos + 1, dtype=np.int64))
        out_n.append(cur[ok])
    return ray.data.from_arrow(
        pa.table(
            {
                "walk_id": pa.array(np.concatenate(out_w), pa.int64()),
                "start": pa.array(np.concatenate(out_s), pa.int64()),
                "pos": pa.array(np.concatenate(out_p), pa.int64()),
                "node": pa.array(np.concatenate(out_n), pa.int64()),
            }
        )
    )


def walk_skipgram_pairs(walks, window: int = 2, num_buckets: int = 32):
    """Skip-gram co-occurrence pairs from a walk corpus — the training
    examples a skip-gram embedder consumes (Mikolov et al. 2013 over
    DeepWalk sentences): unordered node pairs within ``window``
    positions of each other on the same walk, with multiplicity ->
    Dataset ``(u, v, n)`` with ``u <= v``.

    Realization: one bucketed shuffle co-locates each walk's rows
    (``walk_id`` key); inside a bucket the pair sweep is VECTORIZED —
    sort by (walk_id, pos) once, then for each offset d<=window a
    single shifted comparison ``walk_id[:-d] == walk_id[d:]`` yields
    every distance-d pair (walk positions are contiguous by
    construction, so array adjacency IS walk adjacency). Buckets emit
    pre-counted partials; a final vocab-pair-scale grouped sum merges
    them (map-side combine before the wide exchange)."""
    from ..relational import bucketed_groupby_apply, pre_aggregate_ds

    def _empty_pairs() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "u": pd.Series([], dtype="int64"),
                "v": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return _empty_pairs()
        g = g.sort_values(["walk_id", "pos"], kind="mergesort")
        w = g["walk_id"].to_numpy(dtype=np.int64)
        nd = g["node"].to_numpy(dtype=np.int64)
        us, vs = [], []
        for d in range(1, window + 1):
            if d >= len(w):
                break
            m = w[:-d] == w[d:]
            us.append(nd[:-d][m])
            vs.append(nd[d:][m])
        if not us:
            return _empty_pairs()
        a = np.concatenate(us)
        b = np.concatenate(vs)
        u = np.minimum(a, b)
        v = np.maximum(a, b)
        part = (
            pd.DataFrame({"u": u, "v": v})
            .groupby(["u", "v"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        part["n"] = part["n"].astype("int64")
        return part

    partials = bucketed_groupby_apply(
        walks.select_columns(["walk_id", "pos", "node"]),
        "walk_id",
        pairs_in_bucket,
        num_buckets=num_buckets,
    )
    return pre_aggregate_ds(partials, ["u", "v"], {"n": ("n", "sum")})
