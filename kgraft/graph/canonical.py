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
from ray.data.aggregate import Sum


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
    """
    partials = mentions.map_batches(_partial_counts, batch_format="pyarrow")
    counts = partials.groupby(["entity_id", "surface"]).aggregate(
        Sum("partial_count", alias_name="n")
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "surface"], ascending=[False, True])
        return pd.DataFrame(
            {
                "entity_id": [g["entity_id"].iloc[0]],
                "canonical": [g["surface"].iloc[0]],
                "aliases": [sorted(g["surface"].unique().tolist())],
                "n_mentions": [int(g["n"].sum())],
            }
        )

    return counts.groupby("entity_id").map_groups(pick, batch_format="pandas")


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
