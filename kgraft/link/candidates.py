"""Stage 6: entity-linking candidate generation + resolution.

Two-tier linking (SURVEY.md §2.2 stages 6-7):

1. **Exact tier** — the alias dictionary (normalized alias -> entity_id)
   is broadcast **once** with ``ray.put``; map tasks fetch it once per
   worker process (lru-cached deserialization) and resolve surfaces with
   a vectorized pandas dict map. No shuffle. (Alias vocabularies are
   entity-scale, not corpus-scale, so broadcast holds even at 10^12
   documents.)

2. **MinHash-LSH tier** — surfaces missing from the dictionary (the
   corpus uses alias variants the dictionary doesn't know) are recovered
   shuffle-free: the distinct unknown surfaces (vocab-scale) are
   MinHash-signed driver-side into a band-hash index that is broadcast;
   the alias table streams through map tasks that probe the index and
   soft-TFIDF-score colliding pairs exactly once each. The recovered
   mapping is distinct-surface-sized, so it is collected and merged into
   the broadcast dictionary for the resolve pass.

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


from functools import lru_cache


@lru_cache(maxsize=8)
def _cached_lut(alias_ref) -> pd.Series:
    """Per-worker-process cache of the broadcast alias LUT (ObjectRefs are
    hashable). Tasks on warm workers pay the deserialization once."""
    return pd.Series(ray.get(alias_ref), dtype="int64")


def load_alias_lut(alias_path: str):
    """Read the alias dictionary parquet and broadcast the alias ->
    entity_id dict: ``(alias_df, object_ref)``. The ONE place this
    read-zip-put logic lives (it used to be duplicated at three call
    sites, which would drift on any alias-normalization change)."""
    import pyarrow.parquet as pq

    adf = pq.read_table(alias_path).to_pandas()
    ref = ray.put(dict(zip(adf["alias"], adf["entity_id"].astype(int))))
    return adf, ref


@ray.remote(num_cpus=0)
class _SetCollector:
    """Shared mutable set actor (SURVEY.md §2.2's 'shared mutable index'
    carve-out). Kept as the building block for genuinely ONLINE
    accumulation; the linking path no longer routes per-batch pushes
    through it — a synchronous single-actor ``add`` per batch is a
    serialization point on the extract path (r1 verdict #10). Batch
    pushes and shard the actor if you do use it under load."""

    def __init__(self) -> None:
        self._items: set = set()

    def add(self, items) -> None:
        self._items.update(items)

    def get(self) -> list:
        return sorted(self._items)


class SurfaceLinker:
    """Resolve ``subj``/``obj`` surfaces to entity ids (broadcast LUT).

    Used in TASK mode (an instance passed to ``map_batches``): the
    ``ray.put`` LUT ref travels in the closure; each worker process
    deserializes it once via :func:`_cached_lut`. Task mode reuses warm
    Ray workers — an actor pool here pays a cold process start per actor,
    which dominates at this state size. Unresolved surfaces get id -1.

    Also emits the normalized surfaces (``subj_norm``/``obj_norm``) so
    downstream stages (canonicalization, unresolved collection) never
    re-normalize the corpus — normalization is the per-row string cost
    of this stage and must be paid exactly once.
    """

    def __init__(self, alias_ref) -> None:
        self.alias_ref = alias_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        lut = _cached_lut(self.alias_ref)
        df = batch.to_pandas()
        subj_norm = _norm_series(df["subj"])
        obj_norm = _norm_series(df["obj"])
        subj_id = subj_norm.map(lut).fillna(-1).astype("int64")
        obj_id = obj_norm.map(lut).fillna(-1).astype("int64")
        out = batch.append_column("subj_id", pa.array(subj_id.values, pa.int64()))
        out = out.append_column("obj_id", pa.array(obj_id.values, pa.int64()))
        out = out.append_column("subj_norm", pa.array(subj_norm.tolist(), pa.string()))
        return out.append_column("obj_norm", pa.array(obj_norm.tolist(), pa.string()))


class _RecoveryPatcher:
    """Second resolve pass: map still-unresolved (-1) surfaces through the
    LSH-recovered mapping (broadcast; tiny). Touches only -1 rows."""

    def __init__(self, rec_ref) -> None:
        self.rec_ref = rec_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        rec = _cached_lut(self.rec_ref)
        df = batch.to_pandas()
        for id_col, norm_col in (("subj_id", "subj_norm"), ("obj_id", "obj_norm")):
            miss = df[id_col] < 0
            if miss.any():
                df.loc[miss, id_col] = (
                    df.loc[miss, norm_col].map(rec).fillna(-1).astype("int64")
                )
        return pa.Table.from_pandas(df, preserve_index=False)


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

    # resolve-first: one pass normalizes every surface exactly once and
    # tags unresolved ids -1 (materialized — reused by the patch pass and
    # every downstream graph consumer)
    ref = ray.put(base)
    linked0 = triples.map_batches(
        SurfaceLinker(ref),  # instance -> task mode
        batch_format="pyarrow",
        batch_size=8192,
    ).materialize()

    # distinct unresolved surfaces from a cheap scan of the materialized
    # result (vocab-scale output) — no per-batch synchronous pushes into
    # a single collector actor on the extract path (r1 verdict #10)
    def _miss(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = t.filter(pc.less(t["subj_id"], 0))["subj_norm"]
        o = t.filter(pc.less(t["obj_id"], 0))["obj_norm"]
        vals = pd.unique(
            np.concatenate(
                [s.to_numpy(zero_copy_only=False), o.to_numpy(zero_copy_only=False)]
            )
        )
        return pa.table({"mention": pa.array(vals, pa.string())})

    unk = sorted(
        set(
            linked0.map_batches(_miss, batch_format="pyarrow")
            .to_pandas()["mention"]
            .tolist()
        )
    )
    if unk:
        recovered = lsh_recover(unk, alias_ds, threshold, alias_df=alias_df)
    else:
        recovered = pd.DataFrame({"mention": [], "entity_id": [], "score": []})

    if len(recovered):
        rec_ref = ray.put(
            dict(zip(recovered["mention"], recovered["entity_id"].astype(int)))
        )
        linked = linked0.map_batches(
            _RecoveryPatcher(rec_ref), batch_format="pyarrow", batch_size=8192
        )
    else:
        linked = linked0
    return linked, recovered


import re as _re

_BLOCKNORM_RE = _re.compile(r"[a-z0-9]+")


def _blocknorm(s: str) -> str:
    """Blocking normalization: keep alphanumeric runs only, space-joined.
    More aggressive than the exact-match norm so 'lux-partners' and
    'lux partners' produce identical shingle sets (banding recall)."""
    return " ".join(_BLOCKNORM_RE.findall(s.lower()))


@lru_cache(maxsize=1)
def _shared_hasher() -> MinHasher:
    """One fixed-seed MinHasher per worker process (init is a seeded
    parameter draw — cheap, but no reason to repeat it per task)."""
    return MinHasher(num_perm=NUM_PERM, seed=1001)


@lru_cache(maxsize=8)
def _cached_index(idx_ref):
    return ray.get(idx_ref)


def _disc_tokens(tokens, df: dict, max_df: int) -> frozenset:
    """Discriminative (rare) tokens: document frequency <= max_df in the
    alias table. Unknown tokens count as maximally rare."""
    return frozenset(t for t in tokens if df.get(t, 0) <= max_df)


@lru_cache(maxsize=8)
def _cached_scorer(idf_ref) -> LinkScorer:
    return LinkScorer(idf_ref)


class _ProbeScorer:
    """Probe the broadcast mention band index with each alias batch and
    score colliding pairs in place (task mode — refs in the closure,
    state deserialized once per worker process via lru caches).

    Each alias row is MinHash-signed once and each colliding
    (mention, alias) pair is scored exactly once — bands only widen the
    candidate set, they never duplicate scoring work.
    """

    def __init__(self, idx_ref, idf_ref, threshold: float):
        self.idx_ref = idx_ref
        self.idf_ref = idf_ref
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        from .score import tokenize

        mentions, index, mention_disc, token_df, max_df = _cached_index(
            self.idx_ref
        )
        scorer = _cached_scorer(self.idf_ref)
        hasher = _shared_hasher()
        aliases = t["alias"].to_pylist()
        eids = t["entity_id"].to_pylist()
        out_m, out_e, out_s = [], [], []
        if aliases:
            sigs = hasher.signatures([_blocknorm(a) for a in aliases])
            bands = hasher.band_hashes(sigs, NUM_BANDS)
            for j, (a, e) in enumerate(zip(aliases, eids)):
                cand: set = set()
                for b in range(NUM_BANDS):
                    cand.update(index[b].get(int(bands[j, b]), ()))
                if not cand:
                    continue
                a_disc = _disc_tokens(tokenize(a), token_df, max_df)
                for mi in cand:
                    # prune: a real variant shares the entity's distinctive
                    # (rare) token; suffix-only collisions don't. Mentions
                    # with no rare token fall through to full scoring.
                    m_disc = mention_disc[mi]
                    if m_disc and a_disc and not (m_disc & a_disc):
                        continue
                    s = scorer._soft_tfidf(mentions[mi], a)
                    if s >= self.threshold:
                        out_m.append(mentions[mi])
                        out_e.append(int(e))
                        out_s.append(s)
        return pa.table(
            {
                "mention": pa.array(out_m, pa.string()),
                "entity_id": pa.array(out_e, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


class AliasLSHIndex:
    """Flipped-probe recovery: MinHash-LSH index over the STATIC alias
    table, built once per run.

    :func:`lsh_recover` indexes the per-run unknown set and probes it
    with the alias table — a cluster-wide probe burst sitting on the
    extract→graph critical path. The alias side never changes during a
    run, so indexing IT (in a background thread while extraction runs)
    turns recovery into a few seconds of driver-side work over the
    vocab-scale unknown set, fully overlappable with the edges scan.
    Candidate pairs are identical (band collision is symmetric); the
    disc-token prune is the same predicate, evaluated vectorized through
    an inverted rare-token → alias index instead of per-pair set ops.
    """

    def __init__(self, alias_df: pd.DataFrame, max_bucket: int = 1024):
        from .score import build_token_stats, build_token_idf, tokenize

        self.alias_df = alias_df.reset_index(drop=True)
        self.aliases = self.alias_df["alias"].tolist()
        self.entity_ids = self.alias_df["entity_id"].astype("int64").to_numpy()
        h = _shared_hasher()
        sigs = h.signatures([_blocknorm(a) for a in self.aliases])
        bands = h.band_hashes(sigs, NUM_BANDS)
        # COMPACT bucket layout — (sorted keys, offsets, members) arrays
        # per band, looked up by searchsorted — instead of dicts of tiny
        # numpy views. The dict layout made the index hostile to
        # serialization (hundreds of thousands of 1-element buffers:
        # 13s pickle / 17s ray.put / ~12s PER-TASK deserialize, which
        # turned the sharded probe 10x SLOWER than the serial one); a
        # handful of large arrays ships near-zero-copy through plasma.
        self.band_keys: list = []
        self.band_offs: list = []
        self.band_members: list = []
        for b in range(NUM_BANDS):
            col = bands[:, b]
            order = np.argsort(col, kind="stable").astype(np.int64)
            sc = col[order]
            starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
            ends = np.r_[starts[1:], len(sc)]
            sizes = ends - starts
            # giant buckets are non-discriminative band patterns;
            # true variants still meet in their other bands
            keep = sizes <= max_bucket
            ks, lens = starts[keep], sizes[keep]
            # gather members: order[ks[j] : ks[j]+lens[j]] for all j,
            # loop-free (repeat each start, add a per-bucket ramp)
            total = int(lens.sum())
            ramp = np.arange(total, dtype=np.int64) - np.repeat(
                np.r_[0, np.cumsum(lens[:-1])], lens
            )
            self.band_members.append(order[np.repeat(ks, lens) + ramp])
            self.band_keys.append(sc[ks])
            self.band_offs.append(np.r_[0, np.cumsum(lens)])
        self.token_df, n_entities = build_token_stats(self.alias_df)
        self.max_df = max(3, n_entities // 100)
        # inverted rare-token -> alias-idx index (the vectorized twin of
        # the per-pair disc-token prune), plus the aliases with no rare
        # token at all (prune always lets those through). Same compact
        # (bucket-id dict, offsets, members) layout as the band index.
        tok_ids: dict = {}
        pairs_t: list = []
        pairs_a: list = []
        no_disc: list = []
        for ai, a in enumerate(self.aliases):
            disc = _disc_tokens(tokenize(a), self.token_df, self.max_df)
            if not disc:
                no_disc.append(ai)
            for t in disc:
                pairs_t.append(tok_ids.setdefault(t, len(tok_ids)))
                pairs_a.append(ai)
        tid = np.array(pairs_t, dtype=np.int64)
        aid = np.array(pairs_a, dtype=np.int64)
        torder = np.argsort(tid, kind="stable")
        counts = np.bincount(tid, minlength=len(tok_ids)).astype(np.int64)
        self.tok_bucket = tok_ids  # token -> bucket id (plain str->int)
        self.tok_offs = np.r_[0, np.cumsum(counts)]
        self.tok_members = aid[torder]
        self.no_disc = np.array(sorted(no_disc), dtype=np.int64)
        self.idf = build_token_idf(self.alias_df)

    def recover(self, unknown_surfaces, threshold: float = JACCARD_THRESHOLD) -> pd.DataFrame:
        """Driver-side probe of the prebuilt index; same output contract
        as :func:`lsh_recover` (best alias per mention, score desc then
        entity_id asc)."""
        from .score import LinkScorer, tokenize

        mentions = list(dict.fromkeys(unknown_surfaces))
        if not mentions:
            return pd.DataFrame({"mention": [], "entity_id": [], "score": []})
        h = _shared_hasher()
        sigs = h.signatures([_blocknorm(m) for m in mentions])
        bands = h.band_hashes(sigs, NUM_BANDS)
        scorer = LinkScorer(self.idf)
        # bucket hits for ALL mentions per band in one searchsorted,
        # instead of NUM_BANDS dict probes per mention
        n = len(mentions)
        hits: list = [[] for _ in range(n)]
        for b in range(NUM_BANDS):
            keys = self.band_keys[b]
            if not len(keys):
                continue
            col = bands[:, b]
            pos = np.searchsorted(keys, col)
            inb = pos < len(keys)
            valid = np.flatnonzero(inb & (keys[np.minimum(pos, len(keys) - 1)] == col))
            offs, members = self.band_offs[b], self.band_members[b]
            for i in valid:
                p = pos[i]
                hits[i].append(members[offs[p] : offs[p + 1]])
        out_m, out_e, out_s = [], [], []
        empty = np.array([], dtype=np.int64)
        for i, m in enumerate(mentions):
            hit = hits[i]
            if not hit:
                continue
            cand = np.unique(np.concatenate(hit))
            m_disc = _disc_tokens(tokenize(m), self.token_df, self.max_df)
            if m_disc:
                slices = [self.no_disc]
                for t in m_disc:
                    j = self.tok_bucket.get(t)
                    if j is not None:
                        slices.append(
                            self.tok_members[self.tok_offs[j] : self.tok_offs[j + 1]]
                        )
                allowed = np.unique(np.concatenate(slices))
                cand = cand[np.isin(cand, allowed, assume_unique=True)]
            best = None
            for ai in cand:
                s = scorer._soft_tfidf(m, self.aliases[ai])
                if s < threshold:
                    continue
                eid = int(self.entity_ids[ai])
                if best is None or s > best[0] or (s == best[0] and eid < best[1]):
                    best = (s, eid)
            if best is not None:
                out_m.append(m)
                out_e.append(best[1])
                out_s.append(best[0])
        return pd.DataFrame(
            {"mention": out_m, "entity_id": out_e, "score": out_s}
        )

    def recover_parallel(
        self,
        unknown_surfaces,
        threshold: float = JACCARD_THRESHOLD,
        n_tasks: int = 8,
        index_ref=None,
    ) -> pd.DataFrame:
        """Same contract as :meth:`recover`, but sharded across Ray tasks
        — per-mention probes are independent, so the unknown set splits
        into ``n_tasks`` chunks and each task probes a shared broadcast
        copy of the index (``index_ref``: pass the ``ray.put`` handle to
        avoid re-shipping the index per call). The driver-serial version
        costs ~10s at bench scale, squarely on the graph critical path."""
        mentions = list(dict.fromkeys(unknown_surfaces))
        if len(mentions) < 512:  # not worth task overhead
            return self.recover(mentions, threshold)
        if index_ref is None:
            index_ref = ray.put(self)
        chunks = np.array_split(np.array(mentions, dtype=object), n_tasks)

        @ray.remote(num_cpus=1)
        def _probe(ref, chunk, thr):
            idx = ref  # Ray resolves the ObjectRef to the index
            return idx.recover(list(chunk), thr)

        parts = ray.get(
            [_probe.remote(index_ref, c, threshold) for c in chunks if len(c)]
        )
        if not parts:
            return pd.DataFrame({"mention": [], "entity_id": [], "score": []})
        return pd.concat(parts, ignore_index=True)


def lsh_recover(
    unknown_surfaces,
    alias_ds: "ray.data.Dataset",
    threshold: float = JACCARD_THRESHOLD,
    alias_df: pd.DataFrame | None = None,
) -> pd.DataFrame:
    """Map unknown surfaces to entity ids via LSH blocking + soft-TFIDF.

    ``unknown_surfaces``: a Dataset with one column ``mention``, or a
    plain list of normalized distinct surfaces.
    ``alias_ds``: columns ``alias``, ``entity_id`` (normalized);
    ``alias_df`` optionally passes its already-collected pandas twin to
    avoid a second read. Returns pandas ``(mention, entity_id, score)``.

    Physical plan (shuffle-free): distinct unknown surfaces are
    vocabulary-scale by construction, so their MinHash band index is built
    driver-side and **broadcast** (``ray.put``); the alias table streams
    through ``map_batches`` tasks that probe the index and score
    colliding pairs map-side. Survivors are (unknowns × colliding
    aliases) — vocab-scale — so best-per-mention finalizes on the driver.
    That broadcastability is the documented partitioning assumption; if
    unknown surfaces ever outgrow broadcast, flip the probe direction
    (index the aliases, stream the mentions) or shard the index.
    """
    if hasattr(unknown_surfaces, "to_pandas"):
        mentions = (
            unknown_surfaces.to_pandas()["mention"].drop_duplicates().tolist()
        )
    else:
        mentions = list(dict.fromkeys(unknown_surfaces))
    if not mentions:
        return pd.DataFrame({"mention": [], "entity_id": [], "score": []})
    hasher = _shared_hasher()
    sigs = hasher.signatures([_blocknorm(m) for m in mentions])
    bands = hasher.band_hashes(sigs, NUM_BANDS)
    index: list = [dict() for _ in range(NUM_BANDS)]
    for i in range(len(mentions)):
        for b in range(NUM_BANDS):
            index[b].setdefault(int(bands[i, b]), []).append(i)
    # drop non-discriminative buckets (standard LSH guard, same as
    # minhash_candidate_pairs): a 300-mention bucket is a degenerate band
    # pattern, and its members still meet their true matches in other
    # bands. Measured on a 7.8k-unknown / 152k-alias recovery: 2.4x fewer
    # candidate hits with ZERO change in the pairs that reach scoring
    # (the disc-token prune already rejected all of them).
    for b in range(NUM_BANDS):
        for key in [k for k, v in index[b].items() if len(v) > 64]:
            del index[b][key]
    if alias_df is None:
        alias_df = alias_ds.to_pandas()
    from .score import build_token_stats, tokenize

    token_df, n_entities = build_token_stats(alias_df)
    max_df = max(3, n_entities // 100)
    mention_disc = [
        _disc_tokens(tokenize(m), token_df, max_df) for m in mentions
    ]
    idx_ref = ray.put((mentions, index, mention_disc, token_df, max_df))
    idf_ref = ray.put(build_token_idf(alias_df))

    # the alias parquet is typically ONE row group -> ONE read block -> a
    # single serial probe task; spread the probe across the cluster (this
    # was the dominant fixed serial cost in the graph stage). With the
    # pandas twin already in hand, pre-chunked from_pandas blocks skip
    # the read + repartition shuffle entirely.
    n_cpus = int(ray.cluster_resources().get("CPU", 4))
    n_chunks = max(8, n_cpus)
    if alias_df is not None and len(alias_df) > n_chunks:
        # zero-copy arrow slices — from_pandas here pickled 152k strings
        # per chunk and cost ~2s of driver time before the probe started
        tbl = pa.Table.from_pandas(
            alias_df[["alias", "entity_id"]], preserve_index=False
        )
        step = (len(tbl) + n_chunks - 1) // n_chunks
        alias_ds = ray.data.from_arrow(
            [tbl.slice(i, step) for i in range(0, len(tbl), step)]
        )
    elif hasattr(alias_ds, "repartition"):
        alias_ds = alias_ds.repartition(n_chunks)
    scored = alias_ds.map_batches(
        _ProbeScorer(idx_ref, idf_ref, threshold),  # instance -> task mode
        batch_format="pyarrow",
        batch_size=2048,
    )
    df = scored.to_pandas()  # vocabulary-scale (see docstring)
    if len(df) == 0:
        return pd.DataFrame({"mention": [], "entity_id": [], "score": []})
    df = df.sort_values(
        ["mention", "score", "entity_id"], ascending=[True, False, True]
    )
    best = df.groupby("mention", as_index=False).head(1)
    return best[["mention", "entity_id", "score"]].reset_index(drop=True)
