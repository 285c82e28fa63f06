"""Stage 7: candidate-pair scoring — actor pool (SURVEY.md §2.2).

The north rule places link scoring on (GPU) actor pools; in this sandbox
the scorer is a CPU actor pool computing a deterministic soft-TFIDF-style
similarity (the classic Cohen/Ravikumar/Fienberg record-linkage scorer —
IDF-weighted greedy token alignment with character-trigram token
similarity). Plain character Jaccard fails on entity names because
generic suffix tokens ("Networks", "Partners") dominate the shingle set;
IDF weights learned from the alias table make the distinctive token
decide. To move to GPUs, pass ``num_gpus=...`` to ``map_batches`` and
swap the kernel — the actor shape is unchanged.
"""

from __future__ import annotations

import math
import re

import pyarrow as pa
import ray

from ..hashing import jaccard

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize(s: str) -> list:
    """Lowercase alphanumeric tokens (hyphen/space/punct all split)."""
    return _TOKEN_RE.findall(s.lower())


def build_token_stats(alias_df) -> tuple:
    """(token -> #distinct entities using it, n_entities) over the alias
    table. Vocabulary-sized — safe to broadcast. Vectorized (pandas
    explode + groupby) — this runs on the driver, so a Python loop here
    is serial time the whole cluster waits on."""
    import pandas as pd

    n_entities = max(int(alias_df["entity_id"].nunique()), 1)
    toks = alias_df["alias"].str.findall(_TOKEN_RE)
    flat = pd.DataFrame(
        {"tok": toks, "entity_id": alias_df["entity_id"]}
    ).explode("tok")
    flat = flat.dropna().drop_duplicates()
    counts = flat.groupby("tok", sort=False)["entity_id"].nunique()
    return counts.to_dict(), n_entities


def build_token_idf(alias_df) -> dict:
    """IDF per token over the alias table (smooth log)."""
    counts, n_entities = build_token_stats(alias_df)
    return {
        tok: math.log((n_entities + 1) / (n + 1)) + 1.0
        for tok, n in counts.items()
    }


class LinkScorer:
    """Actor: (mention, alias, entity_id) pairs -> + ``score`` column.

    ``idf_ref``: optional ``ray.put`` handle of the token-IDF dict
    (broadcast once, fetched in ``__init__`` — never re-shipped per
    batch), or the dict itself when the caller already holds it
    in-process. Without it, falls back to unweighted trigram Jaccard.
    """

    def __init__(self, idf_ref=None, shingle_k: int = 3) -> None:
        self.k = shingle_k
        if idf_ref is None or isinstance(idf_ref, dict):
            self.idf = idf_ref
        else:
            self.idf = ray.get(idf_ref)
        self._max_idf = max(self.idf.values(), default=1.0) if self.idf else 1.0
        self._tok_cache: dict = {}
        self._shingle_cache: dict = {}
        self._sim_cache: dict = {}

    def _w(self, tok: str) -> float:
        return self.idf.get(tok, self._max_idf)

    def _shingles(self, tok: str):
        s = self._shingle_cache.get(tok)
        if s is None:
            from ..hashing import shingle_hashes

            s = self._shingle_cache[tok] = shingle_hashes(tok, self.k)
        return s

    def _tok_sim(self, a: str, b: str) -> float:
        """Trigram Jaccard between two tokens, memoized — token vocab is
        tiny relative to the pair stream, so the cache hit rate is high."""
        if a == b:
            return 1.0
        key = (a, b) if a <= b else (b, a)
        s = self._sim_cache.get(key)
        if s is None:
            import numpy as np

            sa, sb = self._shingles(a), self._shingles(b)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            s = self._sim_cache[key] = inter / union if union else 0.0
        return s

    def _soft_tfidf(self, mention: str, alias: str) -> float:
        mt = self._tok_cache.get(mention)
        if mt is None:
            mt = self._tok_cache[mention] = tokenize(mention)
        at = self._tok_cache.get(alias)
        if at is None:
            at = self._tok_cache[alias] = tokenize(alias)
        if not mt or not at:
            return 0.0
        num = 0.0
        den = 0.0
        for side_a, side_b in ((mt, at), (at, mt)):
            for t in side_a:
                best = max(self._tok_sim(t, b) for b in side_b)
                w = self._w(t)
                num += w * best
                den += w
        return num / den if den else 0.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.idf is None:
            scores = [
                jaccard(m, a, self.k)
                for m, a in zip(
                    batch["mention"].to_pylist(), batch["alias"].to_pylist()
                )
            ]
        else:
            scores = [
                self._soft_tfidf(m, a)
                for m, a in zip(
                    batch["mention"].to_pylist(), batch["alias"].to_pylist()
                )
            ]
        return batch.append_column("score", pa.array(scores, pa.float64()))
