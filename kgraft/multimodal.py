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


class ImageResizer:
    """Actor: (id, payload) -> (id, payload binary, width, height) at a
    target size — the thumbnail/normalize stage between decode and
    model input. ``backend="fake"`` emits a deterministic byte slice
    (payload-hash-seeded) of length proportional to the target area;
    ``backend="pil"`` requires PIL at actor construction."""

    def __init__(
        self,
        target_w: int = 224,
        target_h: int = 224,
        backend: str = "fake",
        id_col: str = "url",
        payload_col: str = "html",
    ):
        self.tw, self.th = int(target_w), int(target_h)
        self.id_col, self.payload_col = id_col, payload_col
        if backend == "pil":  # pragma: no cover - no PIL in sandbox
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real resize needs PIL; not available in this environment"
                ) from e
            raise NotImplementedError("PIL backend wiring is a stub in this sandbox")
        if backend != "fake":
            raise ValueError(backend)

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.payload_col].to_pylist()
        out_bytes = []
        n = max(16, (self.tw * self.th) // 1024)  # proportional stand-in
        for p in payloads:
            b = bytes(p)
            rep = (b * (n // max(1, len(b)) + 1))[:n]
            out_bytes.append(rep)
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "payload": pa.array(out_bytes, pa.binary()),
                "width": pa.array([self.tw] * len(payloads), pa.int32()),
                "height": pa.array([self.th] * len(payloads), pa.int32()),
            }
        )


class VideoFrameSampler:
    """Actor: (id, payload) -> EXPLODED rows (id, frame_idx, frame_ts_ms,
    frame_feature list<float32>) — one row per sampled frame.

    The explode happens inside the actor (a video is one input row,
    many output rows), which is the layout a real ffmpeg-backed sampler
    needs: frame extraction is stateful and payload-wide, so it cannot
    be a ``flat_map`` scalar. ``backend="fake"`` derives a deterministic
    frame count (1-8) and per-frame features from the payload hash;
    ``backend="ffmpeg"`` raises in this sandbox."""

    FEATURE_DIM = 8
    FRAME_MS = 1000  # fake: one sampled frame per second of "video"

    def __init__(self, backend: str = "fake", id_col: str = "url", payload_col: str = "html"):
        self.id_col, self.payload_col = id_col, payload_col
        if backend == "ffmpeg":  # pragma: no cover - no ffmpeg in sandbox
            raise NotImplementedError(
                "real frame sampling needs ffmpeg; not available in this environment"
            )
        if backend != "fake":
            raise ValueError(backend)

    def __call__(self, t: pa.Table) -> pa.Table:
        from .hashing import splitmix64

        payloads = t[self.payload_col].to_pylist()
        ids = t[self.id_col].to_pylist()
        out_id, out_idx, out_ts, out_feat = [], [], [], []
        if payloads:
            h = hash_strings([bytes(p) for p in payloads])
            n_frames = (h % np.uint64(8)).astype(np.int64) + 1
            for i, (vid, nf) in enumerate(zip(ids, n_frames)):
                for k in range(int(nf)):
                    out_id.append(vid)
                    out_idx.append(k)
                    out_ts.append(k * self.FRAME_MS)
                    mixed = splitmix64(
                        np.full(self.FEATURE_DIM, h[i], dtype=np.uint64)
                        ^ np.arange(1, self.FEATURE_DIM + 1, dtype=np.uint64)
                        * np.uint64(k + 1)
                    )
                    out_feat.append(
                        ((mixed % np.uint64(10_000)).astype(np.float32) / 10_000.0).tolist()
                    )
        id_type = t.schema.field(self.id_col).type
        return pa.table(
            {
                self.id_col: pa.array(out_id, id_type),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "frame_ts_ms": pa.array(out_ts, pa.int64()),
                "frame_feature": pa.array(out_feat, pa.list_(pa.float32())),
            }
        )


class AudioFeatureExtractor:
    """Actor: (id, payload) -> (id, duration_ms, n_channels,
    audio_feature list<float32>) — the MFCC-ish summary stage.
    ``backend="fake"`` derives all outputs from the payload hash;
    ``backend="soundfile"`` raises in this sandbox."""

    FEATURE_DIM = 13  # MFCC-coefficient-count stand-in

    def __init__(self, backend: str = "fake", id_col: str = "url", payload_col: str = "html"):
        self.id_col, self.payload_col = id_col, payload_col
        if backend == "soundfile":  # pragma: no cover - lib absent
            try:
                import soundfile  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real audio decode needs soundfile/librosa; unavailable here"
                ) from e
            raise NotImplementedError("soundfile backend wiring is a stub in this sandbox")
        if backend != "fake":
            raise ValueError(backend)

    def __call__(self, t: pa.Table) -> pa.Table:
        from .hashing import splitmix64

        payloads = t[self.payload_col].to_pylist()
        if not payloads:
            return pa.table(
                {
                    self.id_col: t[self.id_col],
                    "duration_ms": pa.array([], pa.int64()),
                    "n_channels": pa.array([], pa.int32()),
                    "audio_feature": pa.array([], pa.list_(pa.float32())),
                }
            )
        h = hash_strings([bytes(p) for p in payloads])
        dur = (h % np.uint64(600_000)).astype(np.int64)  # <=10 min
        ch = ((h >> np.uint64(8)) % np.uint64(2)).astype(np.int32) + 1
        feats = np.empty((len(payloads), self.FEATURE_DIM), dtype=np.float32)
        for j in range(self.FEATURE_DIM):
            mixed = splitmix64(h ^ np.uint64(101 + j))
            feats[:, j] = (mixed % np.uint64(10_000)).astype(np.float32) / 10_000.0
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "duration_ms": pa.array(dur, pa.int64()),
                "n_channels": pa.array(ch, pa.int32()),
                "audio_feature": pa.array(
                    [row.tolist() for row in feats], pa.list_(pa.float32())
                ),
            }
        )


def sample_video_frames(ds, id_col="url", payload_col="html", concurrency=None, batch_size=32):
    """Actor-pool frame sampling (exploded rows). Smaller batches than
    image features: output rows multiply per input."""
    return ds.select_columns([id_col, payload_col]).map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"id_col": id_col, "payload_col": payload_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or pool_concurrency(),
    )


def extract_audio_features(ds, id_col="url", payload_col="html", concurrency=None, batch_size=64):
    return ds.select_columns([id_col, payload_col]).map_batches(
        AudioFeatureExtractor,
        fn_constructor_kwargs={"id_col": id_col, "payload_col": payload_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or pool_concurrency(),
    )


def resize_images(ds, target_w=224, target_h=224, id_col="url", payload_col="html",
                  concurrency=None, batch_size=64):
    return ds.select_columns([id_col, payload_col]).map_batches(
        ImageResizer,
        fn_constructor_kwargs={
            "target_w": target_w,
            "target_h": target_h,
            "id_col": id_col,
            "payload_col": payload_col,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or pool_concurrency(),
    )
