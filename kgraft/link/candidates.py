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
from .score import LinkScorer, build_token_idf

NUM_PERM = 128
NUM_BANDS = 32
# soft-TFIDF score floor: correct alias matches land ~0.8-1.0, spurious
# shared-suffix candidates ~0.4 (see kgraft/link/score.py)
JACCARD_THRESHOLD = 0.50


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
        concurrency=(1, 4),
        batch_size=8192,
    )
    return linked, recovered


import re as _re

_BLOCKNORM_RE = _re.compile(r"[a-z0-9]+")


def _blocknorm(s: str) -> str:
    """Blocking normalization: keep alphanumeric runs only, space-joined.
    More aggressive than the exact-match norm so 'lux-partners' and
    'lux partners' produce identical shingle sets (banding recall)."""
    return " ".join(_BLOCKNORM_RE.findall(s.lower()))


def _band_explode(batch: pa.Table, text_col: str, hasher: MinHasher) -> pa.Table:
    """texts -> (band_id, band_hash, <carried cols>) rows, one per band."""
    texts = [_blocknorm(t) for t in batch[text_col].to_pylist()]
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


from functools import lru_cache


@lru_cache(maxsize=1)
def _shared_hasher() -> MinHasher:
    """One fixed-seed MinHasher per worker process (init is a seeded
    parameter draw — cheap, but no reason to repeat it per task)."""
    return MinHasher(num_perm=NUM_PERM, seed=1001)


def _make_band_fn(text_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        return _band_explode(batch, text_col, _shared_hasher())

    return fn


_MATCH_BUCKETS = 64


def lsh_recover(
    unknown_surfaces: "ray.data.Dataset",
    alias_ds: "ray.data.Dataset",
    threshold: float = JACCARD_THRESHOLD,
) -> pd.DataFrame:
    """Map unknown surfaces to entity ids via LSH blocking + soft-TFIDF.

    ``unknown_surfaces``: one column ``mention`` (distinct, normalized).
    ``alias_ds``: columns ``alias``, ``entity_id`` (normalized).
    Returns a small pandas DataFrame ``(mention, entity_id, score)``.

    Physical plan: both sides explode to ``(band_id, band_hash)`` rows;
    ONE shuffle keyed on ``band_hash % B`` co-locates colliding rows in
    ~B groups; inside each group a vectorized pandas merge emits + scores
    candidate pairs (scorer state fetched once per group from a ``ray.put``
    broadcast). The scored survivors are vocabulary-sized by construction
    (distinct unknown surfaces × their colliding aliases), so best-per-
    mention finalization happens on the driver — that is the documented
    partitioning assumption of this operator.
    """
    idf_ref = ray.put(build_token_idf(alias_ds.to_pandas()))

    m_bands = unknown_surfaces.map_batches(
        _make_band_fn("mention"), batch_format="pyarrow"
    )
    a_bands = alias_ds.map_batches(_make_band_fn("alias"), batch_format="pyarrow")
    # tag and union; shuffle key = band_hash % B (band_id folded into hash)
    m_tag = m_bands.map_batches(
        lambda t: t.append_column("alias", pa.array([""] * len(t), pa.string()))
        .append_column("entity_id", pa.array([-1] * len(t), pa.int64())),
        batch_format="pyarrow",
    )
    a_tag = a_bands.map_batches(
        lambda t: t.append_column("mention", pa.array([""] * len(t), pa.string())),
        batch_format="pyarrow",
    )
    cols = ["band_id", "band_hash", "mention", "alias", "entity_id"]
    both = m_tag.select_columns(cols).union(a_tag.select_columns(cols))

    def add_bucket(t: pa.Table) -> pa.Table:
        h = t["band_hash"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((h % _MATCH_BUCKETS).astype(np.int32), pa.int32())
        )

    both = both.map_batches(add_bucket, batch_format="pyarrow")

    def match_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "mention": pd.Series([], dtype=object),
                "alias": pd.Series([], dtype=object),
                "entity_id": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            }
        )
        men = g[g["entity_id"] < 0][["band_id", "band_hash", "mention"]]
        ali = g[g["entity_id"] >= 0][
            ["band_id", "band_hash", "alias", "entity_id"]
        ]
        if men.empty or ali.empty:
            return empty
        cand = (
            men.merge(ali, on=["band_id", "band_hash"])[
                ["mention", "alias", "entity_id"]
            ]
            .drop_duplicates()
            .reset_index(drop=True)
        )
        if cand.empty:
            return empty
        scorer = LinkScorer(idf_ref)
        cand["score"] = [
            scorer._soft_tfidf(m, a) for m, a in zip(cand["mention"], cand["alias"])
        ]
        return cand[cand["score"] >= threshold]

    scored = both.groupby("bucket").map_groups(match_bucket, batch_format="pandas")
    df = scored.to_pandas()  # vocabulary-scale (see docstring)
    if len(df) == 0:
        return pd.DataFrame({"mention": [], "entity_id": [], "score": []})
    df = df.drop_duplicates(["mention", "alias", "entity_id"]).sort_values(
        ["mention", "score", "entity_id", "alias"],
        ascending=[True, False, True, True],
    )
    best = df.groupby("mention", as_index=False).head(1)
    return best[["mention", "entity_id", "score"]].reset_index(drop=True)
