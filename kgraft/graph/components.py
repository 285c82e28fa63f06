"""Stage 9: connected components over the entity graph.

Two paths (SURVEY.md §7 "hard parts"):

* **Contracted union-find (default).** The component structure depends
  only on the *distinct* ``(subj_id, obj_id)`` pairs — vocabulary-scale,
  not corpus-scale. Each ``map_batches`` task first contracts its batch
  with a local union-find and emits only spanning-forest edges (≤
  #distinct nodes per batch), then a distinct-pairs groupby reduces the
  edge set, and the driver union-finds the contracted remainder. At
  10^12 documents the contracted graph is ~#entities edges; the driver
  step is bounded by vocabulary size, which is the documented
  partitioning assumption.

* **Min-label propagation (scale fallback, ``method="labelprop"``).**
  Pure dataset iterations: labels(u) starts at u; each round ships
  ``label(u)`` across edges via a bucketed hash join and takes the
  per-node min; stops at fixpoint (bounded by graph diameter). All
  shuffles, no driver state — use when even the contracted edge set
  cannot sit on the driver.

Both are deterministic (component_id = min entity_id in the component)
and equivalence-tested against each other and the golden components.
"""

from __future__ import annotations

import numpy as np

from ..errors import PlanError
import pandas as pd
import pyarrow as pa
import ray
from ray.data.aggregate import Min


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent = {}

    def find(self, x):
        p = self.parent
        root = x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != x:
            p[x], x = root, p[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def components_numpy(src: np.ndarray, dst: np.ndarray):
    """Vectorized connected components over int64 edge arrays:
    ``(sorted distinct nodes, component label per node)`` where the label
    is the minimum entity_id in the component — identical semantics to
    the min-rooted :class:`_UnionFind`, but min-label propagation with
    pointer jumping in numpy (the pure-Python union/find loop cost
    seconds on million-edge inputs; this is ~milliseconds)."""
    edges = np.concatenate([src, dst])
    nodes, inv = np.unique(edges, return_inverse=True)
    a, b = inv[: len(src)], inv[len(src) :]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = label.copy()
        lo = np.minimum(label[a], label[b])
        np.minimum.at(label, a, lo)
        np.minimum.at(label, b, lo)
        while True:
            nxt = label[label]
            if np.array_equal(nxt, label):
                break
            label = nxt
        if np.array_equal(label, before):
            break
    return nodes, nodes[label]


def _contract_batch(batch: pa.Table) -> pa.Table:
    """Local contraction: edges in -> spanning-star edges (root, node) out,
    self-edge for each root. Vectorized via :func:`components_numpy`
    (min-rooted, identical semantics to the per-pair union-find loop it
    replaced — which cost seconds of Python on million-edge batches)."""
    src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, labels = components_numpy(src, dst)
    return pa.table(
        {"src": pa.array(labels, pa.int64()), "dst": pa.array(nodes, pa.int64())}
    )


def connected_components(
    edges: "ray.data.Dataset",
    method: str = "unionfind",
    max_iter: int = 50,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Edges ``(src, dst)`` -> pandas ``(entity_id, component_id)``.

    ``component_id`` is the minimum entity_id in the component.
    """
    if method == "unionfind":
        contracted = edges.map_batches(_contract_batch, batch_format="pyarrow")
        # second contraction round over coalesced blocks: each first-round
        # block can emit up to #nodes edges, so with many blocks the driver
        # would union-find blocks×nodes rows; contracting again over ~4
        # wide blocks bounds the driver's input near vocabulary size
        contracted = contracted.repartition(4).map_batches(
            _contract_batch, batch_format="pyarrow"
        )
        local = contracted.map_batches(
            lambda df: df.drop_duplicates(), batch_format="pandas"
        )
        df = local.to_pandas().drop_duplicates()
        if "src" not in df.columns:
            # a fully-empty edge Dataset (e.g. zero dup pairs) arrives
            # column-less from to_pandas(); every id is its own component
            df = pd.DataFrame(
                {
                    "src": pd.Series([], dtype="int64"),
                    "dst": pd.Series([], dtype="int64"),
                }
            )
        nodes, labels = components_numpy(
            df["src"].to_numpy(dtype=np.int64), df["dst"].to_numpy(dtype=np.int64)
        )
        return pd.DataFrame(
            {
                "entity_id": nodes,
                "component_id": labels,
            }
        )
    if method == "labelprop":
        return _label_propagation(edges, max_iter=max_iter, num_buckets=num_buckets)
    raise PlanError(f"unknown method {method!r}")


def _label_propagation(
    edges: "ray.data.Dataset", max_iter: int, num_buckets: int
) -> pd.DataFrame:
    """Dataset-only min-label propagation (see module docstring)."""
    # undirected: both directions, plus self loops to keep isolated endpoints
    def both_dirs(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.concatenate([src, dst]), pa.int64()),
                "v": pa.array(np.concatenate([dst, src]), pa.int64()),
            }
        )

    # dedup without per-pair Python dispatch: map-side drop_duplicates is
    # the combiner, one bucketed exchange, vectorized in-bucket drop-dup
    # (groupby(pair).map_groups(head) paid a group dispatch PER DISTINCT
    # EDGE — review r2; this is the kcore.simple_pairs shape)
    from ..relational import bucketed_groupby_apply

    und = edges.map_batches(both_dirs, batch_format="pyarrow").map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas"
    )
    und = bucketed_groupby_apply(und, ["u", "v"], lambda g: g.drop_duplicates())
    und = und.materialize()

    labels = und.groupby("u").aggregate(Min("v", alias_name="label"))
    labels = labels.map_batches(
        lambda t: pa.table(
            {
                "u": t["u"],
                "label": pa.array(
                    np.minimum(
                        t["u"].to_numpy(zero_copy_only=False),
                        t["label"].to_numpy(zero_copy_only=False),
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(max_iter):
        # ship label(u) across edges: bucketed hash join on u
        def tag_edge(t: pa.Table) -> pa.Table:
            return t.append_column(
                "kind", pa.array(np.zeros(len(t), dtype=np.int8), pa.int8())
            ).append_column("label", pa.array(np.full(len(t), -1), pa.int64()))

        def tag_label(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "u": t["u"],
                    "v": pa.array(np.full(len(t), -1), pa.int64()),
                    "kind": pa.array(np.ones(len(t), dtype=np.int8), pa.int8()),
                    "label": t["label"],
                }
            )

        tagged = und.map_batches(tag_edge, batch_format="pyarrow").union(
            labels.map_batches(tag_label, batch_format="pyarrow")
        )

        def bucket(t: pa.Table) -> pa.Table:
            u = t["u"].to_numpy(zero_copy_only=False)
            return t.append_column(
                "bucket", pa.array((u % num_buckets).astype(np.int32), pa.int32())
            )

        tagged = tagged.map_batches(bucket, batch_format="pyarrow")

        def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
            lab = g[g["kind"] == 1][["u", "label"]]
            edg = g[g["kind"] == 0][["u", "v"]]
            m = edg.merge(lab, on="u", how="inner")
            msgs = m[["v", "label"]].rename(columns={"v": "u"})
            own = lab
            return pd.concat([msgs, own], ignore_index=True)

        new_labels = (
            tagged.groupby("bucket")
            .map_groups(join_bucket, batch_format="pandas")
            .groupby("u")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        old = labels.to_pandas().set_index("u")["label"]
        new = new_labels.to_pandas().set_index("u")["label"]
        labels = new_labels
        if old.sort_index().equals(new.sort_index()):
            break
    else:
        # labels advance one hop per round, so max_iter < graph diameter
        # means some components still carry multiple labels — returning
        # them silently would corrupt canonical-id assignment (review r2)
        from ..errors import PlanError

        raise PlanError(
            f"label propagation did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter); raise max_iter or use "
            "method='unionfind'"
        )

    out = labels.to_pandas().rename(columns={"u": "entity_id", "label": "component_id"})
    return out.sort_values("entity_id").reset_index(drop=True)
