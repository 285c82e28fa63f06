"""Strongly connected components over the directed KG edge table.

Directed-cycle structure is a KG quality signal the undirected
components pass (``graph/components.py``) cannot see: a
``subsidiary_of`` cycle or a mutual-``acquired`` pair is an extraction
contradiction, and relation-flow analytics (reachability, influence)
need DAG condensation. Undirected CC answers "touches"; SCC answers
"mutually reaches".

Algorithm — trim + max-coloring rounds (Orzan's coloring / FB-Trim
family; McLendon et al. 2005, Hong et al. 2013 — public):

repeat until every node is assigned
  1. TRIM: peel nodes with zero in- or zero out-degree inside the
     unassigned subgraph — each is a singleton SCC (its own label).
     Web-shaped graphs are mostly tree-like, so trimming assigns the
     bulk cheaply (the reason FB-Trim beats plain FB on real graphs).
  2. COLOR: propagate ``color[v] = max(color[v], color[src])`` along
     remaining edges to fixpoint — color[v] = the max unassigned id
     that reaches v.
  3. EXTRACT: for every root r (``color[r] == r``), the nodes of r's
     color class that reach r BACKWARD within the class are exactly
     SCC(r); assign them label r (= the max id in the SCC, so labels
     are deterministic) and remove them.

Scale shape — identical to ``graph/pagerank.py``: every per-node
vector (color, active flag, in_scc flag) is VOCABULARY-scale,
broadcast per BSP step via ``ray.put``; edges are corpus-scale and
never leave their scan — each step is one shuffle-free ``map_batches``
pass emitting sparse per-block partials (np.maximum folds). Iteration
count is bounded by the unassigned subgraph's diameter per phase and
the SCC nesting depth across rounds; each pass is a full edge scan,
the unavoidable cost of any BSP SCC. For graphs that fit cluster
memory, pinning index-mapped edge shards in actors (the
``pagerank_pregel`` pattern) drops the per-step cost to one actor
round trip.

Reference: forsummer/Gondar has no graph analytics (SURVEY.md §2.1);
engine-contract / north-rule territory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .pagerank import _to_index


def _edge_fold(edges, ids_ref, src_col, dst_col, kind, state_ref):
    """One shuffle-free edge pass -> dense vocab-scale fold.

    kind="maxprop":  out[dst] = max over active edges of color[src]
                     (state = (active mask, color)); color values are
                     DENSE INDICES (>= 0), never raw ids — raw 64-bit
                     entity ids can be negative, which would collide
                     with the no-contribution sentinel;
    kind="backprop": out[src] = 1 where an active same-color edge leads
                     to an in_scc dst (state = (active, color, in_scc));
    kind="degrees":  out = (indeg>0, outdeg>0) over active edges
                     (state = active mask).
    Per block the partial is a dense vocab vector reduced to its
    nonzero (index, value) pairs — the pagerank partial shape."""

    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"__i": pa.array([], pa.int64()), "__c": pa.array([], pa.int64())}
        )
        if len(t) == 0:
            return empty
        ids = ray.get(ids_ref)
        s = _to_index(ids, t[src_col].to_numpy(zero_copy_only=False), src_col)
        d = _to_index(ids, t[dst_col].to_numpy(zero_copy_only=False), dst_col)
        state = ray.get(state_ref)
        if kind == "degrees":
            active = state
            m = active[s] & active[d]
            s, d = s[m], d[m]
            dense = np.zeros(len(ids), dtype=np.int64)
            dense[s] |= 1  # has out-edge
            dense[d] |= 2  # has in-edge
        elif kind == "maxprop":
            active, color = state
            m = active[s] & active[d]
            s, d = s[m], d[m]
            dense = np.full(len(ids), -1, dtype=np.int64)
            np.maximum.at(dense, d, color[s])
            dense = dense + 1  # shift so "no contribution" folds as 0
        else:  # backprop
            active, color, in_scc = state
            m = active[s] & active[d] & (color[s] == color[d]) & in_scc[d]
            dense = np.zeros(len(ids), dtype=np.int64)
            dense[s[m]] = 1
        nz = np.nonzero(dense)[0]
        if len(nz) == 0:
            return empty
        return pa.table(
            {
                "__i": pa.array(nz.astype(np.int64), pa.int64()),
                "__c": pa.array(dense[nz], pa.int64()),
            }
        )

    parts = edges.map_batches(fn, batch_format="pyarrow").to_pandas()
    out = np.zeros(len(ray.get(ids_ref)), dtype=np.int64)
    if len(parts):
        if kind == "degrees":
            np.bitwise_or.at(
                out, parts["__i"].to_numpy(), parts["__c"].to_numpy()
            )
        else:
            np.maximum.at(out, parts["__i"].to_numpy(), parts["__c"].to_numpy())
    return out




def _scc_kernel(s, d, n, kind, state):
    """Per-shard edge scan over resident index arrays — the three
    per-round kinds of the serial _edge_fold, minus its per-round
    Dataset job and endpoint re-indexing."""
    if kind == "degrees":
        active = state
        m = active[s] & active[d]
        s2, d2 = s[m], d[m]
        dense = np.zeros(n, dtype=np.int64)
        dense[s2] |= 1  # has out-edge
        dense[d2] |= 2  # has in-edge
    elif kind == "maxprop":
        active, color = state
        m = active[s] & active[d]
        s2, d2 = s[m], d[m]
        dense = np.full(n, -1, dtype=np.int64)
        np.maximum.at(dense, d2, color[s2])
        dense = dense + 1  # shift so "no contribution" folds as 0
    else:  # backprop
        active, color, in_scc = state
        m = active[s] & active[d] & (color[s] == color[d]) & in_scc[d]
        dense = np.zeros(n, dtype=np.int64)
        dense[s[m]] = 1
    return dense


def _shard_fold(shards, n, kind, state_ref):
    parts = ray.get(
        [a.apply.remote(_scc_kernel, kind, state_ref) for a in shards]
    )
    out = np.zeros(n, dtype=np.int64)
    for dense in parts:
        if kind == "degrees":
            np.bitwise_or(out, dense, out=out)
        else:
            np.maximum(out, dense, out=out)
    return out


def strongly_connected_components(
    edges,
    node_ids: np.ndarray,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
    max_rounds: int = 10_000,
) -> pd.DataFrame:
    """SCC labels for every node in ``node_ids`` ->
    ``(node_id, scc_id)`` with ``scc_id`` = the max node id in the SCC
    (deterministic). Every endpoint in ``edges`` must appear in
    ``node_ids`` (validated per block). Materialize ``edges`` first —
    the BSP loop re-scans it every step."""
    from .pagerank import edge_shard_pool

    ids = np.unique(np.asarray(node_ids, dtype=np.int64))
    n = len(ids)
    scc = np.full(n, -1, dtype=np.int64)
    active = np.ones(n, dtype=bool)
    ids_ref = ray.put(ids)
    # edges pinned once across ALL trim/color/extract rounds (the
    # nested fixpoint loops make this the most job-heavy algorithm in
    # the module — see pagerank._DatasetEdgeShard)
    shards = edge_shard_pool(edges, ids_ref, src_col, dst_col)

    rounds = 0
    try:
        _scc_main(ids, n, scc, active, shards, max_rounds)
    finally:
        for a in shards:
            ray.kill(a)
    return pd.DataFrame({"node_id": ids, "scc_id": scc})


def _scc_main(ids, n, scc, active, shards, max_rounds):
    rounds = 0
    while active.any():
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"scc: no convergence after {max_rounds} rounds "
                f"({int(active.sum())} nodes unassigned)"
            )
        # 1. TRIM to fixpoint: no in- or no out-edge inside the active set
        while True:
            deg = _shard_fold(shards, n, "degrees", ray.put(active))
            trim = active & (deg != 3)  # missing an in- or an out-edge
            if not trim.any():
                break
            scc[trim] = ids[trim]
            active &= ~trim
        if not active.any():
            break
        # 2. COLOR to fixpoint: max active index reaching each node
        # (ids are unique-sorted, so index order == id order and the
        # resulting labels are still "max id in the SCC")
        idx = np.arange(n, dtype=np.int64)
        color = np.where(active, idx, np.int64(-1))
        while True:
            prop = (
                _shard_fold(shards, n, "maxprop", ray.put((active, color)))
                - 1
            )  # undo the +1 shift; untouched nodes read -1
            new = np.maximum(color, prop)
            if np.array_equal(new, color):
                break
            color = new
        # 3. EXTRACT: backward reachability from each root within its class
        in_scc = active & (color == idx)
        while True:
            hit = _shard_fold(
                shards, n, "backprop", ray.put((active, color, in_scc))
            ).astype(bool)
            grow = hit & ~in_scc
            if not grow.any():
                break
            in_scc |= grow
        scc[in_scc] = ids[color[in_scc]]
        active &= ~in_scc
