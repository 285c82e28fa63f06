"""Stage 4: mention detection — gazetteer actor pool.

Re-expresses the reference's "Named Entity" head extraction (the LLM is
asked for entities matching typed column heads,
``modules/PubMedFlow.py:213-218``) as a deterministic gazetteer matcher:

    segments.map_batches(MentionDetector, concurrency=(lo, hi),
                         batch_size=B, batch_format="pyarrow")

The alias dictionary is **broadcast once** via ``ray.put`` on the driver
and read in ``__init__`` (once per actor) — never re-shipped per batch.
The matcher compiles one alternation regex over all aliases per actor.

Scale note: at a multi-million-alias vocabulary the alternation regex
should be replaced by an Aho-Corasick automaton (same actor shape — the
automaton is built once in ``__init__``; ``__call__`` is unchanged).
The partitioning assumption is none: mention detection is embarrassingly
parallel over segment rows.
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray


class MentionDetector:
    """Actor: segments -> MENTIONS schema rows via broadcast gazetteer."""

    def __init__(self, alias_ref) -> None:
        aliases = ray.get(alias_ref)  # dict[str, int] normalized alias -> id
        # longest-first so "Zorvex Corp" beats "Zorvex"
        pats = sorted(aliases, key=len, reverse=True)
        self.rx = re.compile(
            r"(?<![\w-])(" + "|".join(re.escape(a) for a in pats) + r")(?![\w-])",
            re.IGNORECASE,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, segi, surf, starts, ends = [], [], [], [], []
        for url, si, text in zip(
            batch["url"].to_pylist(),
            batch["seg_idx"].to_pylist(),
            batch["seg_text"].to_pylist(),
        ):
            for m in self.rx.finditer(text):
                urls.append(url)
                segi.append(si)
                surf.append(m.group(1))
                starts.append(m.start(1))
                ends.append(m.end(1))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "seg_idx": pa.array(segi, pa.int32()),
                "surface": pa.array(surf, pa.string()),
                "start": pa.array(starts, pa.int32()),
                "end": pa.array(ends, pa.int32()),
            }
        )
