"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Images/audio/video travel as Arrow ``binary`` columns with metadata
columns beside them; decode / feature-extraction are **actor-pool**
``map_batches`` stages with small batches (payloads are wide — block
memory is payload-dominated, so ``batch_size`` must be small and the
batch format must stay ``pyarrow``; binary columns do not round-trip
pandas cleanly).

The decode step is STUBBED in this sandbox (no PIL/ffmpeg): real
decoding raises :class:`NotImplementedError` unless the library is
importable; the default is a deterministic fake feature extractor
(hash-seeded), so the Ray-side plumbing — schema, actor signature,
batch sizing, output layout — is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import hash_strings
from .util import pool_concurrency


class ImageFeatureExtractor:
    """Actor: (id, payload binary) -> (id, width, height, feature list<float>).

    ``backend="fake"`` derives a deterministic 8-dim feature from the
    payload hash (plumbing test double). ``backend="pil"`` requires PIL
    at actor construction (once per actor) and raises here if absent.
    """

    FEATURE_DIM = 8

    def __init__(self, backend: str = "fake", id_col: str = "url", payload_col: str = "html"):
        self.id_col = id_col
        self.payload_col = payload_col
        if backend == "fake":
            self.decode = self._fake_decode
        elif backend == "pil":
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:  # pragma: no cover - no PIL in sandbox
                raise NotImplementedError(
                    "real image decode needs PIL; not available in this environment"
                ) from e
            raise NotImplementedError("PIL backend wiring is a stub in this sandbox")
        else:
            raise ValueError(backend)

    def _fake_decode(self, payloads):
        h = hash_strings([bytes(p) for p in payloads])
        rng_feats = np.empty((len(payloads), self.FEATURE_DIM), dtype=np.float32)
        for j in range(self.FEATURE_DIM):
            from .hashing import splitmix64

            mixed = splitmix64(h ^ np.uint64(j + 1))
            rng_feats[:, j] = (mixed % np.uint64(10_000)).astype(np.float32) / 10_000.0
        widths = (h % np.uint64(1920)).astype(np.int32)
        heights = (h % np.uint64(1080)).astype(np.int32)
        return widths, heights, rng_feats

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.payload_col].to_pylist()
        if not payloads:
            return pa.table(
                {
                    self.id_col: t[self.id_col],
                    "width": pa.array([], pa.int32()),
                    "height": pa.array([], pa.int32()),
                    "feature": pa.array([], pa.list_(pa.float32())),
                }
            )
        w, h, f = self.decode(payloads)
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "width": pa.array(w, pa.int32()),
                "height": pa.array(h, pa.int32()),
                "feature": pa.array([row.tolist() for row in f], pa.list_(pa.float32())),
            }
        )


def extract_image_features(ds, id_col="url", payload_col="html", concurrency=None, batch_size=64):
    """Actor-pool feature extraction over a binary column. Small batches:
    payload bytes dominate block memory."""
    return ds.select_columns([id_col, payload_col]).map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={"id_col": id_col, "payload_col": payload_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or pool_concurrency(),
    )
