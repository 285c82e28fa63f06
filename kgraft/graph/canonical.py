"""Stage 8: canonicalization — skew-defused groupby aggregation.

Picks, per entity, the canonical surface form (most frequent mention
surface; ties -> lexicographically smallest), the alias set, and the
mention count. The reference's analogue is the prompt's "consistent
columns" normalization intent plus attribute-stripping
(``tools/entrez.py:59-68``); the distributed realization is ours.

Head-entity skew (Zipf mention frequency — a few entities dominate) is
defused by **pre-aggregation**: each ``map_batches`` task combines its
batch down to ``(entity_id, surface) -> partial_count`` rows before any
shuffle, so the groupby moves partial counts, not raw mentions. This is
the salted/partial two-round pattern of SURVEY.md §4 — round 1 happens
map-side (keyed implicitly by block = salt), round 2 is the small
``groupby``. Equivalence with the naive single groupby is tested in
``tests/test_graph.py``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray


def _partial_counts(batch: pa.Table) -> pa.Table:
    """Map-side combine: raw (entity_id, surface) rows -> partial counts."""
    df = batch.to_pandas()
    part = (
        df.groupby(["entity_id", "surface"], as_index=False)
        .size()
        .rename(columns={"size": "partial_count"})
    )
    return pa.Table.from_pandas(part, preserve_index=False)


def canonicalize(mentions: "ray.data.Dataset") -> "ray.data.Dataset":
    """(entity_id, surface) rows -> one row per entity (NODES columns
    minus ``component_id``): entity_id, canonical, aliases, n_mentions.

    One bucketed shuffle: map-side partial counts (raw mention rows never
    shuffle — Zipf head entities become one partial row per block), then
    per-bucket fully-vectorized pandas reduction (no per-entity Python
    through Ray, which costs a group-dispatch per entity).
    """
    from ..relational import bucketed_groupby_apply

    partials = mentions.map_batches(_partial_counts, batch_format="pyarrow")

    def pick_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.groupby(["entity_id", "surface"], as_index=False, sort=False)[
                "partial_count"
            ]
            .sum()
            .rename(columns={"partial_count": "n"})
        )
        g = g.sort_values(
            ["entity_id", "n", "surface"], ascending=[True, False, True]
        )
        agg = g.groupby("entity_id", sort=False).agg(
            canonical=("surface", "first"), n_mentions=("n", "sum")
        )
        aliases = (
            g.sort_values(["entity_id", "surface"])
            .groupby("entity_id", sort=False)["surface"]
            .agg(list)
        )
        out = agg.join(aliases.rename("aliases")).reset_index()
        out["n_mentions"] = out["n_mentions"].astype("int64")
        return out[["entity_id", "canonical", "aliases", "n_mentions"]]

    return bucketed_groupby_apply(partials, "entity_id", pick_bucket)


def canonicalize_naive(mentions: "ray.data.Dataset") -> "ray.data.Dataset":
    """Single-shuffle reference implementation (equivalence-test twin)."""

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        vc = g.groupby("surface").size().reset_index(name="n")
        vc = vc.sort_values(["n", "surface"], ascending=[False, True])
        return pd.DataFrame(
            {
                "entity_id": [g["entity_id"].iloc[0]],
                "canonical": [vc["surface"].iloc[0]],
                "aliases": [sorted(vc["surface"].unique().tolist())],
                "n_mentions": [int(len(g))],
            }
        )

    return mentions.groupby("entity_id").map_groups(pick, batch_format="pandas")
