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


def build_token_idf(alias_df) -> dict:
    """IDF per token over the alias table: df = #distinct entities whose
    aliases use the token. Vocabulary-sized — safe to broadcast."""
    n_entities = max(int(alias_df["entity_id"].nunique()), 1)
    df: dict = {}
    for alias, eid in zip(alias_df["alias"], alias_df["entity_id"]):
        for tok in set(tokenize(alias)):
            df.setdefault(tok, set()).add(int(eid))
    return {
        tok: math.log((n_entities + 1) / (len(ents) + 1)) + 1.0
        for tok, ents in df.items()
    }


class LinkScorer:
    """Actor: (mention, alias, entity_id) pairs -> + ``score`` column.

    ``idf_ref``: optional ``ray.put`` handle of the token-IDF dict
    (broadcast once, fetched in ``__init__`` — never re-shipped per
    batch). Without it, falls back to unweighted trigram Jaccard.
    """

    def __init__(self, idf_ref=None, shingle_k: int = 3) -> None:
        self.k = shingle_k
        self.idf = ray.get(idf_ref) if idf_ref is not None else None
        self._max_idf = max(self.idf.values(), default=1.0) if self.idf else 1.0
        self._tok_cache: dict = {}

    def _w(self, tok: str) -> float:
        return self.idf.get(tok, self._max_idf)

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
                best = max(
                    (t == b and 1.0 or jaccard(t, b, self.k)) for b in side_b
                )
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
