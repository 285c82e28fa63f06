"""Stage 5: (subj, pred, obj) triple extraction — stateful actor pool.

Re-expresses the reference's per-section LLM relation extraction (system
prompt demands rows of related values per section,
``modules/PubMedFlow.py:159-172``; driven one section at a time at
``:233-252``) as a Ray Data actor-pool stage:

    segments.map_batches(TripleExtractor, concurrency=(lo, hi),
                         batch_size=B, batch_format="pyarrow")

The deterministic backend compiles one master regex over the predicate
phrase inventory **once per actor** (``__init__``) and extracts with
vectorized pandas ``str`` kernels per batch (`extractall` runs the C
regex loop — no Python-per-row work in ``__call__``).
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

# Predicate phrase inventory — must stay in sync with synth.PREDICATES,
# longest-first so alternation prefers the most specific phrase.
from ..synth import PREDICATES

_PHRASES = sorted((phrase, key) for key, phrase in PREDICATES)
_PHRASE_TO_KEY = {phrase: key for phrase, key in _PHRASES}
_ALTERNATION = "|".join(
    re.escape(p) for p in sorted(_PHRASE_TO_KEY, key=len, reverse=True)
)
# a sentence is "<Subj> <phrase> <Obj>." — subjects/objects are entity
# surface forms (capitalized tokens), phrases are lowercase verb phrases.
_SENTENCE_RE = f"(?P<subj>[^.]+?) (?P<phrase>{_ALTERNATION}) (?P<obj>[^.]+?)\\."


class TripleExtractor:
    """Actor: segments -> TRIPLES schema rows (deterministic backend)."""

    def __init__(self) -> None:
        # once per actor (the A1 pattern, modules/PubMedFlow.py:87-96)
        self.sentence_re = _SENTENCE_RE
        self.split_pat = r"(?<=\.)\s+"
        self.phrase_to_key = dict(_PHRASE_TO_KEY)

    def __call__(self, batch: pa.Table) -> pa.Table:
        seg = batch.to_pandas()
        if len(seg) == 0:
            return _empty()
        # extractall directly over segment text: the pattern's [^.]+?
        # classes cannot cross a sentence period, so pre-splitting into
        # sentences (split + explode + dropna) only allocated throwaway
        # string frames — verified output-identical on the full corpus
        hits = seg["seg_text"].str.extractall(self.sentence_re)
        if hits.empty:
            return _empty()
        hits = hits.reset_index(level="match", drop=True)
        src = seg.loc[hits.index]
        return pa.table(
            {
                "url": pa.array(src["url"].tolist(), pa.string()),
                "seg_idx": pa.array(src["seg_idx"].tolist(), pa.int32()),
                "subj": pa.array(hits["subj"].str.strip().tolist(), pa.string()),
                "pred": pa.array(
                    hits["phrase"].map(self.phrase_to_key).tolist(), pa.string()
                ),
                "obj": pa.array(hits["obj"].str.strip().tolist(), pa.string()),
                "conf": pa.array([1.0] * len(hits), pa.float32()),
                "warc_ts": pa.array(src["warc_ts"].tolist(), pa.timestamp("us")),
            }
        )


def _empty() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([], pa.string()),
            "seg_idx": pa.array([], pa.int32()),
            "subj": pa.array([], pa.string()),
            "pred": pa.array([], pa.string()),
            "obj": pa.array([], pa.string()),
            "conf": pa.array([], pa.float32()),
            "warc_ts": pa.array([], pa.timestamp("us")),
        }
    )
