"""Stage 7: candidate-pair scoring — actor pool (SURVEY.md §2.2).

The north rule places link scoring on (GPU) actor pools; in this sandbox
the scorer is a CPU actor pool computing exact character-trigram Jaccard
between the mention surface and the candidate alias (deterministic twin
of an embedding cross-encoder). To move to GPUs, pass ``num_gpus=...`` to
``map_batches`` and swap the kernel — the actor shape is unchanged.
"""

from __future__ import annotations

import pyarrow as pa

from ..hashing import jaccard


class LinkScorer:
    """Actor: (mention, alias, entity_id) pairs -> + ``score`` column."""

    def __init__(self, shingle_k: int = 3) -> None:
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        scores = [
            jaccard(m, a, self.k)
            for m, a in zip(batch["mention"].to_pylist(), batch["alias"].to_pylist())
        ]
        return batch.append_column("score", pa.array(scores, pa.float64()))
