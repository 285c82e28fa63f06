"""Stages 2-3: HTML -> canonical text -> segment rows (SURVEY.md §2.2).

Both are vectorized ``map_batches`` transforms over Arrow batches; no
per-row ``ds.map``/``flat_map`` (the per-page Python work is the frozen
extractor itself, invoked once per row inside a batched loop — the
reference's per-article parse fold, ``tools/entrez.py:184-189``, done
block-at-a-time).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .html import extract_text, text_to_segments


def html_to_text_batch(batch: pa.Table) -> pa.Table:
    """Stage 2: derive canonical ``text`` from ``html`` (byte-identity op).

    Replaces the incoming ``text`` column with the extractor output and
    **drops ``html``** immediately — wide binary rows must not travel past
    this stage (SURVEY.md §7 "wide rows").
    """
    texts = pa.array(
        [extract_text(h) for h in batch["html"].to_pylist()], pa.string()
    )
    drop = [c for c in ("html", "text") if c in batch.column_names]
    return batch.drop_columns(drop).append_column("text", texts)


def segment_batch(batch: pa.Table) -> pa.Table:
    """Stage 3: explode pages into ``(url, warc_ts, seg_idx, seg_text, lang)``.

    Segmentation is the exact inverse of the extractor's block join
    (``text.split("\\n")``), so ``seg_idx`` is stable and reproducible —
    the per-``<sec>`` granularity of the reference loop
    (``modules/PubMedFlow.py:233``).
    """
    urls = batch["url"].to_pylist()
    texts = batch["text"].to_pylist()
    seg_lists = [text_to_segments(t) for t in texts]
    counts = np.array([len(s) for s in seg_lists], dtype=np.int64)
    idx = np.repeat(np.arange(len(urls)), counts)
    seg_idx = np.concatenate([np.arange(c, dtype=np.int32) for c in counts]) if len(counts) else np.array([], dtype=np.int32)
    flat = [s for segs in seg_lists for s in segs]
    return pa.table(
        {
            "url": pa.array(np.array(urls, dtype=object)[idx].tolist(), pa.string()),
            "warc_ts": batch["warc_ts"].take(pa.array(idx)),
            "seg_idx": pa.array(seg_idx, pa.int32()),
            "seg_text": pa.array(flat, pa.string()),
            "lang": batch["lang"].take(pa.array(idx)),
        }
    )
