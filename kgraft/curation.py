"""End-to-end training-corpus curation: the composite pipeline a user
of this engine actually runs before tokenization.

One streaming DAG chaining the training-data operators:

1. **signals** — one fused, shuffle-free pass computes quality score and
   token count while the text rides along (no per-signal re-scan);
2. **filter** — drop low-quality / too-short documents map-side;
3. **exact dedup** — keep the min-id row per identical text (128-bit
   content key, one bucketed shuffle, payload carried so no
   re-join against the corpus);
4. **near-dup** — MinHash-LSH + exact-Jaccard verified groups
   (:func:`kgraft.textops.near_dup_groups`); only each group's
   representative (min doc id) survives;
5. **decontaminate** — drop documents sharing any 32-char shingle with
   the benchmark/eval corpus (:func:`kgraft.textops.decontaminate`);
6. emit ``(doc_id, n_tokens, quality)`` for the surviving set.

Every stage is the already-tested operator; this module owns only the
composition (schema handoff between stages and the join keys). Scale
notes: stages 1-2 are shuffle-free; stage 3 is one content-key
exchange; stage 4's blocking is the LSH band shuffle; stage 5
broadcasts only the BOUNDED benchmark shingle set; the payload rides
the shuffle-free labeling and decontaminate scans, so the composite has
NO doc_id re-join exchanges at all.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from .hashing import hash_strings
from .relational import bucketed_groupby_apply
from .textops import _STOPWORDS, decontaminate, near_dup_groups
from kgraft.sqlround import sql_round


def _signals(docs):
    """(doc_id, text) -> + quality, n_tokens — same math as
    textops.quality_scores, fused so the text column rides along."""
    stop_pat = r"\b(?:" + "|".join(sorted(_STOPWORDS["en"])) + r")\b"

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"]
        n_chars = text.str.len().astype("int64")
        n_tokens = text.str.count(r"[A-Za-z0-9_]+").astype("int64")
        n_punct = text.str.count(r"[.,;:!?]").astype("int64")
        stop = text.str.lower().str.count(stop_pat)
        score = (
            (n_tokens.clip(0, 500) / 500.0) * 0.5
            + (1.0 - (n_punct / n_chars.replace(0, 1)).clip(0, 1)) * 0.2
            + (stop / n_tokens.replace(0, 1)).clip(0, 1) * 0.3
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "text": text,
                "n_tokens": n_tokens,
                "quality": sql_round(score, 6),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


def _exact_dedup_rows(ds):
    """Keep the min-doc_id ROW per identical text (payload carried
    through the shuffle — unlike textops.exact_dedup, which emits ids
    only and would force a corpus re-join here)."""

    def add_hashes(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        t = t.append_column(
            "__h1", pa.array(hash_strings(texts).astype(np.int64), pa.int64())
        )
        return t.append_column(
            "__h2", pa.array(hash_strings(texts, seed=1).astype(np.int64), pa.int64())
        )

    hashed = ds.map_batches(add_hashes, batch_format="pyarrow")

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        out = g.drop_duplicates(["__h1", "__h2"], keep="first")
        return out.drop(columns=["__h1", "__h2"])

    return bucketed_groupby_apply(hashed, ["__h1", "__h2"], keep_min)


def prepare_training_corpus(
    docs,
    benchmark,
    min_quality: float = 0.2,
    min_tokens: int = 10,
    near_dup_threshold: float = 0.7,
):
    """documents + benchmark Datasets -> curated (doc_id, n_tokens,
    quality) Dataset of surviving training documents."""
    sig = _signals(docs)
    kept = sig.map_batches(
        lambda df: df[(df["quality"] >= min_quality) & (df["n_tokens"] >= min_tokens)],
        batch_format="pandas",
    )
    # pin the multi-consumer intermediate: the sketch pass, the text
    # router and the labeling scan inside near_dup_groups all consume
    # it, and a lazy Dataset re-executes the whole signals scan +
    # content-hash exchange per consumer (review r2). Blocks live in
    # the object store, which spills — safe at any size.
    deduped = _exact_dedup_rows(kept).materialize()

    # near-dup groups over the deduped survivors; the labeling scan is
    # shuffle-free and appends dup_group to whatever columns ride in, so
    # the payload carries through and the representative filter needs NO
    # join back against the corpus (round 3: this plus the payload-
    # carrying decontaminate scan removed both of the composite's
    # doc_id hash-join exchanges)
    groups = near_dup_groups(
        deduped,
        threshold=near_dup_threshold,
        keep_cols=["text", "n_tokens", "quality"],
    )  # (doc_id, text, n_tokens, quality, dup_group)
    uniq = groups.map_batches(
        lambda df: df.loc[
            df["doc_id"] == df["dup_group"],
            ["doc_id", "text", "n_tokens", "quality"],
        ],
        batch_format="pandas",
    )

    decon = decontaminate(uniq, benchmark, keep_cols=["n_tokens", "quality"])
    return decon.map_batches(
        lambda df: df.loc[~df["contaminated"], ["doc_id", "n_tokens", "quality"]],
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weighting — domain-targeted data selection


_DSIR_TOKEN_PAT = re.compile(r"[a-z0-9_]+")


def importance_weights(
    docs,
    target_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
):
    """Per-document importance weight for domain-targeted data
    selection (DSIR estimator, Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): weight(doc) =
    sum over tokens of n_t * log(p_target(t) / p_raw(t)), with
    Laplace-smoothed unigram distributions estimated from the corpus
    itself — ``target_col`` (0/1) marks the target-domain rows.
    Selecting the top-weight documents resamples the raw corpus toward
    the target domain.

    This is the WORD-unigram variant so the DuckDB twin is exact; at
    100 TB swap the token key for DSIR's hashed n-gram buckets (fixed
    vocabulary => the log-ratio table becomes a broadcastable float
    array and the join below degenerates to a shuffle-free lookup).

    Scale shape: ONE tokenizing scan (per-batch (doc, token, count)
    combine), materialized because two consumers need it — the
    vocab-scale token-marginal aggregate and the per-doc join-back.
    Token marginals reduce map-side; the smoothing scalars (two sums +
    the vocab count) are the only driver values. The log-ratio table
    attaches back by a bucketed string-key join (vocab-scale right
    side, NOT broadcast — web vocab is unbounded), and per-doc weights
    reduce map-side. Returns a ``(id_col, weight)`` Dataset.
    """
    import ray  # noqa: F401  (Dataset ops only; session owned by caller)

    from .relational import hash_join, pre_aggregate_ds

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.lower().str.findall(_DSIR_TOKEN_PAT)
        n = toks.str.len().to_numpy()
        flat = pd.DataFrame(
            {
                id_col: np.repeat(df[id_col].to_numpy(), n),
                "is_tgt": np.repeat(
                    df[target_col].to_numpy().astype(np.int64), n
                ),
                "t": np.concatenate(toks.to_numpy()) if len(df) else [],
            }
        )
        return (
            flat.groupby([id_col, "is_tgt", "t"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    dt = (
        docs.select_columns([id_col, text_col, target_col])
        .map_batches(explode, batch_format="pandas")
        .materialize()
    )

    tok = pre_aggregate_ds(
        dt.map_batches(
            lambda df: pd.DataFrame(
                {
                    "t": df["t"],
                    "raw_n": df["n"],
                    "tgt_n": df["n"] * df["is_tgt"],
                }
            ),
            batch_format="pandas",
        ),
        ["t"],
        {"raw_n": ("raw_n", "sum"), "tgt_n": ("tgt_n", "sum")},
    ).materialize()
    tots = tok.sum(["raw_n", "tgt_n"])
    n_raw = float(tots["sum(raw_n)"])
    n_tgt = float(tots["sum(tgt_n)"])
    v = float(tok.count())

    def add_lr(df: pd.DataFrame) -> pd.DataFrame:
        p_t = (df["tgt_n"].to_numpy(dtype="float64") + 1.0) / (n_tgt + v)
        p_r = (df["raw_n"].to_numpy(dtype="float64") + 1.0) / (n_raw + v)
        return pd.DataFrame({"t": df["t"], "lr": np.log(p_t / p_r)})

    lr = tok.map_batches(add_lr, batch_format="pandas")
    j = hash_join(
        dt.map_batches(
            lambda df: df[[id_col, "t", "n"]], batch_format="pandas"
        ),
        lr,
        on="t",
        num_buckets=num_buckets,
        left_schema=pa.schema(
            [(id_col, pa.int64()), ("t", pa.string()), ("n", pa.int64())]
        ),
        right_schema=pa.schema([("t", pa.string()), ("lr", pa.float64())]),
    )

    def term(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: df[id_col],
                "w": df["n"].to_numpy(dtype="float64") * df["lr"].to_numpy(),
            }
        )

    return pre_aggregate_ds(
        j.map_batches(term, batch_format="pandas"),
        [id_col],
        {"weight": ("w", "sum")},
    )


# ---------------------------------------------------------------------------
# sequence packing — the step between curation and tokenization


def pack_sequences(
    docs,
    budget: int = 256,
    range_width: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
):
    """Greedy next-fit sequence packing: assign each document to a
    training pack so every pack's token total stays ≤ ``budget``
    (tokens = ``[A-Za-z0-9_]+`` runs, the engine's token regex).

    Determinism under parallelism (the engine invariant): docs pack in
    id order within FIXED id ranges (``id // range_width``), so the
    output never depends on block boundaries or worker count — range r
    always packs the same docs in the same order. One bucketed shuffle
    co-locates each range; packing inside a bucket is a cumsum +
    ``searchsorted`` gallop whose Python loop is per PACK (not per
    row), with forced breaks at range boundaries. A doc longer than
    the budget gets a single-doc pack flagged ``oversize`` (a real
    pipeline would chunk it; flagging keeps this op total and
    auditable). ``pack_id`` = first doc id in the pack — globally
    unique because ranges partition the id space.

    Output: (id_col, pack_id, seq_pos, n_tokens, pack_tokens, oversize).
    """
    from .relational import bucketed_groupby_apply

    def tokens(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: df[id_col],
                "n_tokens": df[text_col].str.count(r"[A-Za-z0-9_]+").astype("int64"),
                "__rng": (df[id_col] // range_width).astype("int64"),
            }
        )

    slim = docs.select_columns([id_col, text_col]).map_batches(
        tokens, batch_format="pandas"
    )

    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__rng", id_col], kind="mergesort").reset_index(drop=True)
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "pack_id": pd.Series([], dtype="int64"),
                    "seq_pos": pd.Series([], dtype="int64"),
                    "n_tokens": pd.Series([], dtype="int64"),
                    "pack_tokens": pd.Series([], dtype="int64"),
                    "oversize": pd.Series([], dtype="bool"),
                }
            )
        tok = g["n_tokens"].to_numpy()
        rng = g["__rng"].to_numpy()
        csum = np.cumsum(tok)
        # exclusive end index of each row's range (forced pack break)
        bounds = np.flatnonzero(np.diff(rng)) + 1
        seg_ends = np.append(bounds, n)
        seg_lens = np.diff(np.append(0, seg_ends))
        row_end = np.repeat(seg_ends, seg_lens)
        starts = []
        s = 0
        while s < n:  # one iteration per PACK
            starts.append(s)
            base = csum[s - 1] if s else 0
            e = int(np.searchsorted(csum, base + budget, side="right"))
            e = min(e, int(row_end[s]))
            if e == s:  # single doc over budget
                e = s + 1
            s = e
        starts = np.asarray(starts, dtype=np.int64)
        pack_idx = np.searchsorted(starts, np.arange(n), side="right") - 1
        first = g[id_col].to_numpy()[starts]
        pack_tok = np.add.reduceat(tok, starts)
        return pd.DataFrame(
            {
                id_col: g[id_col],
                "pack_id": first[pack_idx],
                "seq_pos": (np.arange(n) - starts[pack_idx]).astype("int64"),
                "n_tokens": g["n_tokens"],
                "pack_tokens": pack_tok[pack_idx],
                "oversize": tok > budget,
            }
        )

    return bucketed_groupby_apply(slim, ["__rng"], pack_bucket, num_buckets)


def assign_splits(
    docs,
    fractions=(("train", 0.98), ("val", 0.01), ("test", 0.01)),
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 11,
):
    """Leakage-free train/val/test split assignment: the split is a
    deterministic hash of the document's CONTENT (128-bit key, same as
    exact dedup), so byte-identical duplicates — however many and
    wherever they sit — always land in the same split, and the
    assignment is reproducible across runs, repartitions, and corpus
    versions (a doc keeps its split when the corpus grows).

    Shuffle-free: one map pass hashes and buckets into 1e6 slots, split
    boundaries are cumulative-fraction cuts over the slot space. For
    NEAR-duplicate awareness, dedup first (``near_dup_groups``) and keep
    representatives — this op guarantees the exact-dup invariant.

    Output: (id_col, split).
    """
    from .hashing import hash_strings

    names = [n for n, _ in fractions]
    fracs = np.array([f for _, f in fractions], dtype=np.float64)
    if not np.isclose(fracs.sum(), 1.0):
        raise ValueError(f"split fractions must sum to 1, got {fracs.sum()}")
    cuts = np.cumsum(fracs)[:-1] * 1_000_000.0

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = hash_strings(df[text_col].tolist(), seed=seed)
        slot = (h % np.uint64(1_000_000)).astype(np.float64)
        idx = np.searchsorted(cuts, slot, side="right")
        return pd.DataFrame(
            {id_col: df[id_col], "split": np.array(names, dtype=object)[idx]}
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pandas"
    )
