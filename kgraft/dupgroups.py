"""Shared distributed finishing for the near-duplicate family.

Round-2 verdict: all three near-dup paths (MinHash/n-gram Jaccard,
SimHash, embedding-cosine) ended on the driver — survivor texts pulled
via ``to_pandas`` into a Python dict, per-pair Python union-find, and a
Python-dict broadcast to label the corpus. On a real web corpus
near-dup pairs are corpus-proportional (30-50 % dup rates), so that
tail is a scale-killer. This module is the replacement, shared by all
three paths:

* :func:`label_by_pairs` — dup groups via the engine's contracted
  Dataset union-find (``graph.components``: per-block vectorized
  contraction to spanning stars, a coalesced re-contraction, then one
  vectorized ``components_numpy`` pass over the vocabulary-scale
  remainder). Labeling broadcasts ONLY two sorted int64 numpy arrays
  (ids + group ids — 16 bytes per doc that appears in a pair, never
  texts, never a Python dict) and labels each batch with one
  ``searchsorted`` — no per-row Python.

* :func:`route_texts_to_pairs` — texts onto candidate pairs without a
  driver staging dict: a Bloom bitmap (built map-side, OR-folded, one
  fixed-size broadcast) prefilters the corpus down to ~pair-member
  scale, then TWO bucketed exchanges route each surviving text to its
  pair halves (keyed on doc id) and reunite the halves (keyed on the
  pair), with the exact verification fused into the second exchange's
  reducer. False positives from the Bloom tier ship a few extra texts
  and die in the first inner merge — exactness is preserved.

* :func:`hamming_pair_stars` / :func:`cosine_pair_stars` — tiled
  in-bucket pairwise verification kernels. The round-2 code capped
  pairwise work at 256 distinct entries per LSH bucket and silently
  emitted NOTHING above that — a big near-identical (but not equal)
  cluster lost every pair. These kernels tile the O(n^2) comparison
  (bounded memory), then contract the in-bucket matches to spanning
  stars via ``components_numpy`` so a verified m-cluster emits m-1
  edges, not m^2/2. Buckets beyond ``max_verify`` distinct entries are
  sub-split on a secondary hash and the lost cross-sub coverage is
  LOGGED (never silent).

The reference engine (forsummer/Gondar) has no dedup at all; these are
the BASELINE.json north-rule training-data operators.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .hashing import splitmix64

log = logging.getLogger("kgraft.dupgroups")

# Above this many DISTINCT entries one LSH bucket's exact pairwise tier
# is quadratic-degenerate (the band carries no information); sub-split
# on a secondary hash and log the reduced cross-sub coverage.
MAX_VERIFY = 16384
_TILE = 512


def label_by_pairs(ids_ds, pairs_ds, id_col: str, a_col: str = "doc_a",
                   b_col: str = "doc_b"):
    """Verified dup pairs -> ``(id_col, dup_group)`` over the full corpus.

    ``dup_group`` = min id in the pair-connected component; ids in no
    pair map to themselves. Groups come from the contracted Dataset
    union-find (``graph.components.connected_components``); the only
    driver/broadcast state is the (sorted ids, group ids) int64 pair —
    the same vocabulary-bounded shape the KG component stage already
    commits to, and ~1000x smaller than the texts the round-2 code
    staged. The labeling scan APPENDS ``dup_group`` to ``ids_ds``'s
    columns, so payload can ride through for free (callers that want
    only ids select them upstream)."""
    from .graph.components import connected_components

    def as_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t[a_col].cast(pa.int64()),
                "dst": t[b_col].cast(pa.int64()),
            }
        )

    comp = connected_components(
        pairs_ds.map_batches(as_edges, batch_format="pyarrow")
    )
    nodes = comp["entity_id"].to_numpy(dtype=np.int64)   # sorted (np.unique)
    groups = comp["component_id"].to_numpy(dtype=np.int64)
    lut_ref = ray.put((nodes, groups))

    def label(t: pa.Table) -> pa.Table:
        lnodes, lgroups = ray.get(lut_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(lnodes) and len(ids):
            pos = np.searchsorted(lnodes, ids)
            pos = np.clip(pos, 0, len(lnodes) - 1)
            hit = lnodes[pos] == ids
            grp = np.where(hit, lgroups[pos], ids)
        else:
            grp = ids
        return t.append_column("dup_group", pa.array(grp, pa.int64()))

    return ids_ds.map_batches(label, batch_format="pyarrow")


def _pair_bucket(a: np.ndarray, b: np.ndarray, num_buckets: int) -> np.ndarray:
    h = splitmix64(a.astype(np.uint64) ^ splitmix64(b.astype(np.uint64)))
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _bloom_refs(pairs_ds, a_col, b_col, num_bits, num_hashes):
    """OR-folded Bloom bitmap of every id appearing in a pair. Map-side
    fixed-size partials; the fold is associative (tree-reduce on a real
    cluster, driver fold of #blocks x 1 MiB here)."""
    nb = np.uint64(num_bits)
    words = num_bits // 64
    seeds = [np.uint64(0x9E3779B97F4A7C15 * (i + 1) & (2**64 - 1))
             for i in range(num_hashes)]

    def build(df: pd.DataFrame) -> pd.DataFrame:
        bm = np.zeros(words, dtype=np.uint64)
        ids = np.concatenate(
            [df[a_col].to_numpy(dtype=np.int64), df[b_col].to_numpy(dtype=np.int64)]
        ).astype(np.uint64)
        for s in seeds:
            pos = splitmix64(ids ^ s) % nb
            np.bitwise_or.at(
                bm, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        return pd.DataFrame({"__bm": [bm.tobytes()]})

    parts = pairs_ds.map_batches(build, batch_format="pandas")
    bitmap = np.zeros(words, dtype=np.uint64)
    for blob in parts.to_pandas().get("__bm", []):
        bitmap |= np.frombuffer(blob, dtype=np.uint64)
    return ray.put(bitmap), nb, seeds


def route_texts_to_pairs(
    docs,
    pairs_ds,
    verify_fn,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
    num_bits: int = 1 << 23,
    num_hashes: int = 4,
):
    """Candidate pairs + corpus -> verified pairs, fully distributed.

    ``verify_fn(table) -> table`` receives an Arrow table with columns
    (doc_a, doc_b, text_a, text_b) and returns the surviving
    (doc_a, doc_b) rows; it runs inside the second exchange's reducer.

    Dataflow (shuffle keys in caps):
      pairs --explode--> half rows (KEY=doc id, doc_a, doc_b, side)
      docs  --bloom-prefilter--> ~pair-member-scale (KEY=doc id, text)
      union --exchange 1 on KEY--> half rows with text
            --exchange 2 on PAIR hash--> (text_a, text_b) reunited,
            verify_fn fused in-reducer --> verified (doc_a, doc_b)

    Driver state: one fixed-size Bloom bitmap (1 MiB default) — never
    an id list, never a text."""
    pairs_ds = pairs_ds.materialize()  # read twice: bloom build + explode
    # the candidate set arrives as one tiny block per LSH reduce
    # partition; every downstream pass pays a per-block task cost, so
    # coalesce to ~50k pairs/block (floor 8 — at corpus scale the block
    # count grows with the pair count, which is the 100-TB layout)
    n_blocks = pairs_ds.num_blocks()
    target = max(8, min(n_blocks, int(pairs_ds.count()) // 50_000 + 1))
    if target < n_blocks:
        pairs_ds = pairs_ds.repartition(target).materialize()
    bref, nb, seeds = _bloom_refs(pairs_ds, "doc_a", "doc_b", num_bits, num_hashes)

    # every intermediate is built as an explicitly-typed Arrow table:
    # empty pandas blocks would otherwise infer null-typed text columns
    # and break the union/groupby schema
    def explode(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        # map-side combiner for cross-band re-emissions (most duplicates
        # of a pair are emitted by adjacent bands in the same block);
        # cross-block survivors dedupe for free in attach_text — same
        # (key, pair, side) rows land in the same bucket by construction
        if len(a):
            uniq = np.unique(np.stack([a, b], axis=1), axis=0)
            a, b = uniq[:, 0], uniq[:, 1]
        key = np.concatenate([a, b])
        bucket = (splitmix64(key.astype(np.uint64)) % np.uint64(num_buckets))
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "doc_a": pa.array(np.concatenate([a, a]), pa.int64()),
                "doc_b": pa.array(np.concatenate([b, b]), pa.int64()),
                "side": pa.array(
                    np.repeat(np.array([0, 1], dtype=np.int32), len(a)), pa.int32()
                ),
                text_col: pa.array([""] * (2 * len(a)), pa.string()),
                "__bucket": pa.array(bucket.astype(np.int64), pa.int64()),
            }
        )

    halves = pairs_ds.map_batches(explode, batch_format="pyarrow")

    def prefilter(t: pa.Table) -> pa.Table:
        bm = ray.get(bref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = np.ones(len(t), dtype=bool)
        for s in seeds:
            pos = splitmix64(ids ^ s) % nb
            word = bm[(pos >> np.uint64(6)).astype(np.int64)]
            keep &= (word >> (pos & np.uint64(63))) & np.uint64(1) > 0
        sub = t.filter(pa.array(keep))
        key = sub[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (splitmix64(key.astype(np.uint64)) % np.uint64(num_buckets))
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "doc_a": pa.array(np.full(len(sub), -1, dtype=np.int64), pa.int64()),
                "doc_b": pa.array(np.full(len(sub), -1, dtype=np.int64), pa.int64()),
                "side": pa.array(np.full(len(sub), 2, dtype=np.int32), pa.int32()),
                text_col: sub[text_col].cast(pa.string()),
                "__bucket": pa.array(bucket.astype(np.int64), pa.int64()),
            }
        )

    texts = docs.select_columns([id_col, text_col]).map_batches(
        prefilter, batch_format="pyarrow"
    )

    def attach_text(g: pd.DataFrame) -> pa.Table:
        # exact pair dedup, co-located: duplicates of a (pair, side) half
        # share the same key and therefore the same bucket
        half = g[g["side"] < 2][["key", "doc_a", "doc_b", "side"]].drop_duplicates()
        txt = g[g["side"] == 2][["key", text_col]]
        # inner merge drops Bloom false positives (texts matching no half)
        m = half.merge(txt, on="key")
        b2 = _pair_bucket(
            m["doc_a"].to_numpy(dtype=np.int64),
            m["doc_b"].to_numpy(dtype=np.int64),
            num_buckets,
        )
        return pa.table(
            {
                "doc_a": pa.array(m["doc_a"].to_numpy(dtype=np.int64), pa.int64()),
                "doc_b": pa.array(m["doc_b"].to_numpy(dtype=np.int64), pa.int64()),
                "side": pa.array(m["side"].to_numpy(dtype=np.int32), pa.int32()),
                text_col: pa.array(m[text_col].tolist(), pa.string()),
                "__b2": pa.array(b2, pa.int64()),
            }
        )

    with_text = halves.union(texts).groupby("__bucket").map_groups(
        attach_text, batch_format="pandas"
    )

    def reunite_verify(g: pd.DataFrame) -> pa.Table:
        a_side = g[g["side"] == 0][["doc_a", "doc_b", text_col]].rename(
            columns={text_col: "text_a"}
        )
        b_side = g[g["side"] == 1][["doc_a", "doc_b", text_col]].rename(
            columns={text_col: "text_b"}
        )
        m = a_side.merge(b_side, on=["doc_a", "doc_b"])
        t = pa.table(
            {
                "doc_a": pa.array(m["doc_a"].to_numpy(dtype=np.int64), pa.int64()),
                "doc_b": pa.array(m["doc_b"].to_numpy(dtype=np.int64), pa.int64()),
                "text_a": pa.array(m["text_a"].tolist(), pa.string()),
                "text_b": pa.array(m["text_b"].tolist(), pa.string()),
            }
        )
        return verify_fn(t)

    return with_text.groupby("__b2").map_groups(
        reunite_verify, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# tiled in-bucket pairwise kernels (giant-bucket fix)


def _contract_edges(a_parts: list, b_parts: list):
    """Edge fragments -> spanning-star edges (root, node) per component.

    Grouping semantics (dup_group = connected components over verified
    pairs) are preserved exactly; a verified m-clique emits m-1 star
    edges instead of m^2/2 pair rows."""
    from .graph.components import components_numpy

    if not a_parts:
        e = np.array([], dtype=np.int64)
        return e, e
    src = np.concatenate(a_parts).astype(np.int64)
    dst = np.concatenate(b_parts).astype(np.int64)
    nodes, labels = components_numpy(src, dst)
    keep = labels != nodes
    return labels[keep], nodes[keep]


def _subsplit(ids: np.ndarray, n: int, what: str):
    """Secondary-hash sub-split of a degenerate bucket, loudly."""
    n_sub = -(-n // MAX_VERIFY)
    log.warning(
        "%s: LSH bucket with %d distinct entries exceeds max_verify=%d; "
        "sub-splitting into %d sub-buckets on a secondary hash — "
        "cross-sub pairs in this bucket are not compared here (they can "
        "still meet in their other bands)",
        what, n, MAX_VERIFY, n_sub,
    )
    return (splitmix64(ids.astype(np.uint64)) % np.uint64(n_sub)).astype(np.int64)


def hamming_pair_stars(ids: np.ndarray, hashes: np.ndarray, max_hamming: int,
                       what: str = "simhash"):
    """All (i, j) with 0 < popcount(h_i ^ h_j) <= max_hamming over
    DISTINCT fingerprints, tiled (bounded memory at any bucket size),
    contracted to spanning stars. Returns (a, b) int64 arrays."""
    order = np.argsort(ids, kind="stable")
    ids, hashes = ids[order], hashes[order].astype(np.uint64)
    n = len(ids)
    if n < 2:
        e = np.array([], dtype=np.int64)
        return e, e
    if n > MAX_VERIFY:
        sub = _subsplit(ids, n, what)
        a_all, b_all = [], []
        for s in np.unique(sub):
            m = sub == s
            a, b = hamming_pair_stars(ids[m], hashes[m], max_hamming, what)
            a_all.append(a)
            b_all.append(b)
        return _contract_edges(a_all, b_all)
    a_parts, b_parts = [], []
    for i0 in range(0, n, _TILE):
        hi = hashes[i0 : i0 + _TILE]
        for j0 in range(i0, n, _TILE):
            hj = hashes[j0 : j0 + _TILE]
            xor = hi[:, None] ^ hj[None, :]
            dist = (
                np.unpackbits(xor.view(np.uint8))
                .reshape(len(hi), len(hj), 64)
                .sum(axis=2)
            )
            mask = (dist > 0) & (dist <= max_hamming)
            if i0 == j0:
                mask = np.triu(mask, k=1)
            ai, bi = np.nonzero(mask)
            if len(ai):
                a_parts.append(ids[i0 + ai])
                b_parts.append(ids[j0 + bi])
    return _contract_edges(a_parts, b_parts)


def cosine_pair_stars(ids: np.ndarray, unit: np.ndarray, threshold: float,
                      what: str = "embed"):
    """All (i, j) with unit_i . unit_j >= threshold (distinct vectors),
    tiled matmul, contracted to spanning stars."""
    order = np.argsort(ids, kind="stable")
    ids, unit = ids[order], unit[order]
    n = len(ids)
    if n < 2:
        e = np.array([], dtype=np.int64)
        return e, e
    if n > MAX_VERIFY:
        sub = _subsplit(ids, n, what)
        a_all, b_all = [], []
        for s in np.unique(sub):
            m = sub == s
            a, b = cosine_pair_stars(ids[m], unit[m], threshold, what)
            a_all.append(a)
            b_all.append(b)
        return _contract_edges(a_all, b_all)
    a_parts, b_parts = [], []
    for i0 in range(0, n, _TILE):
        ui = unit[i0 : i0 + _TILE]
        for j0 in range(i0, n, _TILE):
            uj = unit[j0 : j0 + _TILE]
            mask = ui @ uj.T >= threshold
            if i0 == j0:
                mask = np.triu(mask, k=1)
            ai, bi = np.nonzero(mask)
            if len(ai):
                a_parts.append(ids[i0 + ai])
                b_parts.append(ids[j0 + bi])
    return _contract_edges(a_parts, b_parts)
