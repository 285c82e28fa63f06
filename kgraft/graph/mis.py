"""Maximal independent set via Luby's algorithm (BSP).

Luby (1986, "A simple parallel algorithm for the maximal independent
set problem") — the canonical O(log n)-round distributed MIS: each
round every alive node draws a priority; a node enters the MIS when
its priority strictly beats every alive neighbor's, then it and its
neighbors leave the graph. Priorities here are deterministic
splitmix64(node_id, round) draws, so the output is a pure function of
the graph — repartition/worker-count invariant like every other
operator in the engine.

Scale shape: the kcore/pagerank contract — per-node state (alive /
in-MIS flags, one priority vector) is vocab-bounded and broadcast per
round; edges stream through ONE shuffle-free scatter-max pass per
round computing each node's best alive-neighbor priority.

MIS is the standard building block for distributed graph coloring and
symmetry breaking; on the KG it yields a maximal set of pairwise
non-adjacent entities (e.g. spread-out seed selection for labeling).

The reference has no graph analytics at all (SURVEY.md §2.1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..hashing import splitmix64
from .kcore import simple_pairs
from .pagerank import _to_index


def maximal_independent_set(
    edges,
    node_ids: np.ndarray,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
    max_rounds: int = 10_000,
) -> pd.DataFrame:
    """Returns ``(node_id, in_mis)`` for every id in ``node_ids``.
    Isolated nodes always join the MIS. Deterministic."""
    ids = np.unique(np.asarray(node_ids, dtype=np.int64))
    n = len(ids)
    pairs = simple_pairs(edges, src_col, dst_col).materialize()

    alive = np.ones(n, dtype=bool)
    in_mis = np.zeros(n, dtype=bool)
    rnd = 0
    while alive.any() and rnd < max_rounds:
        rnd += 1
        # deterministic per-(node, round) priorities; ids are unique so
        # ties across nodes are measure-zero for splitmix64 but we break
        # them anyway by comparing (priority, id) lexicographically
        prio = splitmix64(
            ids.astype(np.uint64) ^ splitmix64(np.uint64(rnd))
        )
        prio_ref = ray.put(prio)
        alive_ref = ray.put(alive)
        ids_ref = ray.put(ids)

        def best_neighbor(t: pa.Table) -> pa.Table:
            p = ray.get(prio_ref)
            a = ray.get(alive_ref)
            s_ids = ray.get(ids_ref)
            lo = _to_index(s_ids, t["lo"].to_numpy(zero_copy_only=False), "lo")
            hi = _to_index(s_ids, t["hi"].to_numpy(zero_copy_only=False), "hi")
            m = a[lo] & a[hi]
            lo, hi = lo[m], hi[m]
            tgt = np.concatenate([lo, hi])
            src = np.concatenate([hi, lo])
            touched = np.unique(tgt)
            pos = np.searchsorted(touched, tgt)
            # best = max (priority, id) pair among alive neighbors;
            # encode as priority with id as vectorized tie-break below
            bp = np.zeros(len(touched), dtype=np.uint64)
            np.maximum.at(bp, pos, p[src])
            # second pass: among sources achieving bp, the max id
            bi = np.full(len(touched), -1, dtype=np.int64)
            hit = p[src] == bp[pos]
            np.maximum.at(bi, pos[hit], src[hit])
            return pa.table(
                {
                    "__i": pa.array(touched.astype(np.int64), pa.int64()),
                    "__p": pa.array(bp, pa.uint64()),
                    "__s": pa.array(bi, pa.int64()),
                }
            )

        parts = pairs.map_batches(best_neighbor, batch_format="pyarrow").to_pandas()
        best_p = np.zeros(n, dtype=np.uint64)
        best_i = np.full(n, -1, dtype=np.int64)
        if len(parts):
            i = parts["__i"].to_numpy()
            np.maximum.at(best_p, i, parts["__p"].to_numpy())
            hit = parts["__p"].to_numpy() == best_p[i]
            np.maximum.at(best_i, i[hit], parts["__s"].to_numpy()[hit])
        # win = strictly better (priority, idx) than best alive neighbor
        mine = prio
        idx = np.arange(n)
        win = alive & (
            (mine > best_p)
            | ((mine == best_p) & (idx > best_i))
        )
        if not win.any():
            continue
        in_mis |= win
        # winners and their alive neighbors leave; neighbors of winners
        # are exactly nodes whose best alive neighbor this round was a
        # winner OR that are adjacent to one — recompute adjacency drop
        # with one more edge pass
        win_ref = ray.put(win)

        def neigh_of_winners(t: pa.Table) -> pa.Table:
            w = ray.get(win_ref)
            a = ray.get(alive_ref)
            s_ids = ray.get(ids_ref)
            lo = _to_index(s_ids, t["lo"].to_numpy(zero_copy_only=False), "lo")
            hi = _to_index(s_ids, t["hi"].to_numpy(zero_copy_only=False), "hi")
            m = a[lo] & a[hi]
            lo, hi = lo[m], hi[m]
            out = np.unique(
                np.concatenate([hi[w[lo]], lo[w[hi]]])
            )
            return pa.table({"__i": pa.array(out.astype(np.int64), pa.int64())})

        nw = pairs.map_batches(neigh_of_winners, batch_format="pyarrow").to_pandas()
        alive = alive & ~win
        if len(nw):
            alive[nw["__i"].to_numpy()] = False
    return pd.DataFrame({"node_id": ids, "in_mis": in_mis})
