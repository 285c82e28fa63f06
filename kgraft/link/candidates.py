"""Stage 6: entity-linking candidate generation + resolution.

Two-tier linking (SURVEY.md §2.2 stages 6-7):

1. **Exact tier** — the alias dictionary (normalized alias -> entity_id)
   is broadcast **once** with ``ray.put``; linker actors fetch it in
   ``__init__`` and resolve surfaces with a vectorized pandas dict map.
   No shuffle. (Alias vocabularies are entity-scale, not corpus-scale,
   so broadcast holds even at 10^12 documents.)

2. **MinHash-LSH tier** — surfaces missing from the dictionary (the
   corpus uses alias variants the dictionary doesn't know) are blocked
   against the alias table by LSH: both sides are MinHash-signed and
   exploded to ``(band_id, band_hash)`` rows — that pair is the shuffle
   key — then ``groupby(band_id, band_hash).map_groups`` emits candidate
   (mention, alias) pairs, an actor-pool scorer computes exact trigram
   Jaccard, and a final groupby keeps each mention's best alias above a
   threshold. The recovered mapping is distinct-surface-sized (vocab,
   not corpus), so it is collected and broadcast for the second resolve
   pass.

Determinism: fixed-seed MinHash permutations (:class:`kgraft.hashing.
MinHasher`), ties broken by (max score, min entity_id, min alias).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..hashing import MinHasher
from .score import LinkScorer

NUM_PERM = 128
NUM_BANDS = 32
JACCARD_THRESHOLD = 0.30


def _norm_series(s: pd.Series) -> pd.Series:
    """Vectorized linking normalization (lowercase + whitespace collapse)."""
    return s.str.lower().str.split().str.join(" ")


class SurfaceLinker:
    """Actor: resolve ``subj``/``obj`` surfaces to entity ids.

    The (alias -> entity_id) dict arrives as a ``ray.put`` object ref and
    is fetched once per actor in ``__init__`` (broadcast, zero per-batch
    shipping). Unresolved surfaces get id -1.
    """

    def __init__(self, alias_ref) -> None:
        self.lut = pd.Series(ray.get(alias_ref), dtype="int64")

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        subj_id = _norm_series(df["subj"]).map(self.lut).fillna(-1).astype("int64")
        obj_id = _norm_series(df["obj"]).map(self.lut).fillna(-1).astype("int64")
        out = batch.append_column("subj_id", pa.array(subj_id.values, pa.int64()))
        return out.append_column("obj_id", pa.array(obj_id.values, pa.int64()))


def link_triples(
    triples: "ray.data.Dataset",
    alias_ds: "ray.data.Dataset",
    threshold: float = JACCARD_THRESHOLD,
):
    """Full stage-6/7 linking: exact broadcast tier + LSH recovery tier.

    Returns ``(linked_triples, recovered_mapping_df)`` where the dataset
    carries ``subj_id``/``obj_id`` (-1 = unlinkable).
    """
    alias_df = alias_ds.to_pandas()  # vocab-scale, driver-safe
    base = dict(zip(alias_df["alias"], alias_df["entity_id"].astype(int)))
    known_ref = ray.put(set(base))

    # pass 1 (projection only): distinct surfaces NOT in the dictionary.
    # Distinct-surface count is vocabulary-sized, not corpus-sized.
    def unresolved(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        known = ray.get(known_ref)
        surfs = pd.concat(
            [_norm_series(df["subj"]), _norm_series(df["obj"])]
        ).drop_duplicates()
        miss = surfs[~surfs.isin(known)]
        return pa.table({"mention": pa.array(miss.tolist(), pa.string())})

    unk = triples.map_batches(unresolved, batch_format="pyarrow").unique("mention")
    if len(unk) > 0:
        unk_ds = ray.data.from_items([{"mention": m} for m in unk])
        recovered = lsh_recover(unk_ds, alias_ds, threshold)
    else:
        recovered = pd.DataFrame({"mention": [], "entity_id": [], "score": []})

    merged = dict(base)
    for m, e in zip(recovered["mention"], recovered["entity_id"]):
        merged[m] = int(e)
    ref2 = ray.put(merged)
    linked = triples.map_batches(
        SurfaceLinker,
        fn_constructor_args=(ref2,),
        batch_format="pyarrow",
        concurrency=4,
        batch_size=8192,
    )
    return linked, recovered


def _band_explode(batch: pa.Table, text_col: str, hasher: MinHasher) -> pa.Table:
    """texts -> (band_id, band_hash, <carried cols>) rows, one per band."""
    texts = batch[text_col].to_pylist()
    if not texts:
        return pa.table(
            {
                "band_id": pa.array([], pa.int32()),
                "band_hash": pa.array([], pa.uint64()),
                **{c: batch[c] for c in batch.column_names},
            }
        )
    sigs = hasher.signatures(texts)
    bands = hasher.band_hashes(sigs, NUM_BANDS)  # (n, NUM_BANDS)
    n = len(texts)
    idx = np.repeat(np.arange(n), NUM_BANDS)
    out = {
        "band_id": pa.array(np.tile(np.arange(NUM_BANDS, dtype=np.int32), n), pa.int32()),
        "band_hash": pa.array(bands.reshape(-1), pa.uint64()),
    }
    taken = batch.take(pa.array(idx))
    for c in batch.column_names:
        out[c] = taken[c]
    return pa.table(out)


class _BandExploder:
    """Actor: MinHasher built once per worker (fixed seed)."""

    def __init__(self, text_col: str):
        self.hasher = MinHasher(num_perm=NUM_PERM, seed=1001)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _band_explode(batch, self.text_col, self.hasher)


def lsh_recover(
    unknown_surfaces: "ray.data.Dataset",
    alias_ds: "ray.data.Dataset",
    threshold: float = JACCARD_THRESHOLD,
) -> pd.DataFrame:
    """Map unknown surfaces to entity ids via LSH blocking + Jaccard.

    ``unknown_surfaces``: one column ``mention`` (distinct, normalized).
    ``alias_ds``: columns ``alias``, ``entity_id`` (normalized).
    Returns a small pandas DataFrame ``(mention, entity_id, score)``.
    """
    m_bands = unknown_surfaces.map_batches(
        _BandExploder,
        fn_constructor_args=("mention",),
        batch_format="pyarrow",
        concurrency=2,
    )
    a_bands = alias_ds.map_batches(
        _BandExploder,
        fn_constructor_args=("alias",),
        batch_format="pyarrow",
        concurrency=2,
    )
    # tag and union; shuffle key = (band_id, band_hash)
    m_tag = m_bands.map_batches(
        lambda t: t.append_column("alias", pa.array([""] * len(t), pa.string()))
        .append_column("entity_id", pa.array([-1] * len(t), pa.int64())),
        batch_format="pyarrow",
    )
    a_tag = a_bands.map_batches(
        lambda t: t.append_column("mention", pa.array([""] * len(t), pa.string())),
        batch_format="pyarrow",
    )
    both = m_tag.select_columns(
        ["band_id", "band_hash", "mention", "alias", "entity_id"]
    ).union(
        a_tag.select_columns(["band_id", "band_hash", "mention", "alias", "entity_id"])
    )

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        mentions = g[g["entity_id"] < 0]["mention"].unique()
        aliases = g[g["entity_id"] >= 0][["alias", "entity_id"]].drop_duplicates()
        if len(mentions) == 0 or len(aliases) == 0:
            return pd.DataFrame({"mention": [], "alias": [], "entity_id": []})
        out = aliases.merge(pd.DataFrame({"mention": mentions}), how="cross")
        return out[["mention", "alias", "entity_id"]]

    pairs = both.groupby(["band_id", "band_hash"]).map_groups(
        emit_pairs, batch_format="pandas"
    )
    # candidate pairs are vocabulary-sized; dedup then score on actor pool
    pairs = pairs.groupby(["mention", "alias", "entity_id"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
    scored = pairs.map_batches(
        LinkScorer, batch_format="pyarrow", concurrency=2, batch_size=4096
    )

    def best(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["score"] >= threshold]
        if len(g) == 0:
            return g.head(0)
        g = g.sort_values(["score", "entity_id", "alias"], ascending=[False, True, True])
        return g.head(1)

    resolved = scored.groupby("mention").map_groups(best, batch_format="pandas")
    df = resolved.to_pandas()
    if len(df) == 0:
        return pd.DataFrame({"mention": [], "entity_id": [], "score": []})
    return df[["mention", "entity_id", "score"]].reset_index(drop=True)
