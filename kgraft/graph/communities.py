"""Community detection by label propagation (Raghavan, Albert & Kumara
2007, "Near linear time algorithm to detect community structures in
large-scale networks", Phys. Rev. E 76) — SYNCHRONOUS variant with
deterministic tie-breaks so output never depends on visit order,
partitioning, or worker count.

Each round every node adopts the most frequent label among its
(undirected) neighbors; ties break to the smallest label; isolated
nodes keep their own id. A fixed round count bounds work (LPA converges
in a few rounds on modular graphs; synchronous LPA can oscillate on
bipartite structures, which the round cap also contains).

Scale shape (the pagerank commitment, `graph/pagerank.py`): the label
vector is vocab-scale and broadcast per round via ``ray.put``; each
round is ONE shuffle-free edge scan emitting per-batch
(node, neighbor-label, count) partials that combine map-side; the fold
and the vectorized mode selection run on the driver over the
distinct-(node, label) table — bounded by the edge count, same
vocab-scale driver trade the KG degree/triangle stages already make
(watch at 100x; move the mode to a bucketed node-keyed exchange if the
label table outgrows the driver).

Reference: forsummer/Gondar has no graph analytics at all; this is
north-rule "graph materialize + analytics" territory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def label_propagation_communities(
    edges,
    node_ids: np.ndarray,
    n_iter: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> pd.DataFrame:
    """-> (node_id, community) for every node in ``node_ids``;
    ``community`` is a node id (labels start as own ids). Every id
    appearing in ``edges`` must be present in ``node_ids``."""
    from .pagerank import edge_shard_pool

    ids = np.unique(np.asarray(node_ids, dtype=np.int64))
    ids_ref = ray.put(ids)
    labels = ids.copy()

    # pin the edge table as pre-indexed shard actors: every round
    # re-scans the same edges, and a Dataset job per round is pure
    # launch overhead (see _DatasetEdgeShard) — plus the per-round
    # endpoint searchsorted disappears
    shards = edge_shard_pool(edges, ids_ref, src_col, dst_col)
    try:
        for _ in range(int(n_iter)):
            lref = ray.put(labels)
            parts = [
                p
                for p in ray.get(
                    [a.apply.remote(_lpa_kernel, lref) for a in shards]
                )
                if len(p)
            ]
            if not parts:
                break
            part = pd.concat(parts, ignore_index=True)
            g = part.groupby(["n", "l"], as_index=False)["c"].sum()
            g = g.sort_values(["n", "c", "l"], ascending=[True, False, True])
            best = g.drop_duplicates("n")
            new_labels = labels.copy()
            new_labels[best["n"].to_numpy()] = best["l"].to_numpy()
            if np.array_equal(new_labels, labels):
                break
            labels = new_labels
    finally:
        for a in shards:
            ray.kill(a)

    return pd.DataFrame({"node_id": ids, "community": labels})


def _lpa_kernel(s, d, n, lab) -> pd.DataFrame:
    """Per-shard LPA round: neighbor-label counts per node (both
    directions — undirected propagation)."""
    node = np.concatenate([d, s])
    nb = np.concatenate([lab[s], lab[d]])
    return (
        pd.DataFrame({"n": node, "l": nb})
        .groupby(["n", "l"], sort=False)
        .size()
        .rename("c")
        .reset_index()
    )
