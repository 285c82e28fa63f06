"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Images/audio/video travel as Arrow ``binary`` columns with metadata
columns beside them; decode / feature-extraction are **actor-pool**
``map_batches`` stages with small batches (payloads are wide — block
memory is payload-dominated, so ``batch_size`` must be small and the
batch format must stay ``pyarrow``; binary columns do not round-trip
pandas cleanly).

Backends are import-guarded. Every actor takes ``backend=`` with three
values:

* ``"fake"`` — deterministic hash-seeded stand-in (always available;
  what CI exercises in this sandbox, which has no PIL/av/soundfile);
* the real backend (``"pil"`` / ``"av"`` / ``"soundfile"``) — real
  decode wiring, resolved at ACTOR CONSTRUCTION (once per actor, the
  state-in-init rule); raises :class:`NotImplementedError` with an
  install hint when the library is absent;
* ``"auto"`` — picks the real backend when its library imports, else
  falls back to the fake (the guard path a mixed fleet wants).

Swap recipe: install the decoder lib on the cluster image (``Pillow``
for images, ``av`` for video, ``soundfile`` for audio), then pass
``backend="auto"`` (or the explicit name) through
``extract_image_features`` / ``resize_images`` / ``sample_video_frames``
/ ``extract_audio_features``. No other change: schemas, batch sizing
and the actor-pool signature are identical for fake and real backends.
"""

from __future__ import annotations

import importlib

import numpy as np
import pyarrow as pa

from .hashing import hash_strings
from .util import pool_concurrency


def _has_module(mod: str) -> bool:
    try:
        importlib.import_module(mod)
        return True
    except ImportError:
        return False


def resolve_backend(requested: str, real: str, mod: str) -> str:
    """Backend guard: ``auto`` -> ``real`` iff ``mod`` imports, else
    ``fake``; an EXPLICIT real backend without its library raises (the
    caller asked for real decode — silently faking would corrupt
    downstream features)."""
    if requested == "auto":
        return real if _has_module(mod) else "fake"
    if requested == real and not _has_module(mod):
        raise NotImplementedError(
            f"backend {real!r} needs the {mod!r} library, which is not "
            f"installed; install it or pass backend='auto'/'fake'"
        )
    return requested


class ImageFeatureExtractor:
    """Actor: (id, payload binary) -> (id, width, height, feature list<float>).

    ``backend="fake"`` derives a deterministic 8-dim feature from the
    payload hash (plumbing test double). ``backend="pil"`` decodes with
    Pillow (resolved once per actor); ``"auto"`` picks pil iff
    importable. See the module docstring for the swap recipe.
    """

    FEATURE_DIM = 8

    def __init__(self, backend: str = "fake", id_col: str = "url", payload_col: str = "html"):
        self.id_col = id_col
        self.payload_col = payload_col
        self.backend = resolve_backend(backend, "pil", "PIL")
        if self.backend == "fake":
            self.decode = self._fake_decode
        elif self.backend == "pil":  # pragma: no cover - no PIL in sandbox
            self.decode = self._pil_decode
        else:
            raise ValueError(backend)

    def _pil_decode(self, payloads):  # pragma: no cover - no PIL in sandbox
        import io

        from PIL import Image

        n = len(payloads)
        widths = np.empty(n, dtype=np.int32)
        heights = np.empty(n, dtype=np.int32)
        feats = np.empty((n, self.FEATURE_DIM), dtype=np.float32)
        for i, p in enumerate(payloads):
            img = Image.open(io.BytesIO(bytes(p)))
            widths[i], heights[i] = img.size
            # 8-dim feature: 4x2 grayscale thumbnail intensities in [0,1]
            thumb = np.asarray(
                img.convert("L").resize((4, 2)), dtype=np.float32
            )
            feats[i] = thumb.reshape(-1) / 255.0
        return widths, heights, feats

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


def extract_image_features(ds, id_col="url", payload_col="html", concurrency=None, batch_size=64, backend="fake"):
    """Actor-pool feature extraction over a binary column. Small batches:
    payload bytes dominate block memory."""
    return ds.select_columns([id_col, payload_col]).map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={"id_col": id_col, "payload_col": payload_col, "backend": backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or pool_concurrency(),
    )


class ImageResizer:
    """Actor: (id, payload) -> (id, payload binary, width, height) at a
    target size — the thumbnail/normalize stage between decode and
    model input. ``backend="fake"`` emits a deterministic byte slice
    (payload-hash-seeded) of length proportional to the target area;
    ``backend="pil"`` decodes + resizes with Pillow and re-encodes PNG;
    ``"auto"`` picks pil iff importable."""

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
        self.backend = resolve_backend(backend, "pil", "PIL")
        if self.backend not in ("fake", "pil"):
            raise ValueError(backend)

    def _resize_pil(self, payloads):  # pragma: no cover - no PIL in sandbox
        import io

        from PIL import Image

        out = []
        for p in payloads:
            img = Image.open(io.BytesIO(bytes(p))).convert("RGB")
            buf = io.BytesIO()
            img.resize((self.tw, self.th)).save(buf, format="PNG")
            out.append(buf.getvalue())
        return out

    def _resize_fake(self, payloads):
        out_bytes = []
        n = max(16, (self.tw * self.th) // 1024)  # proportional stand-in
        for p in payloads:
            b = bytes(p)
            rep = (b * (n // max(1, len(b)) + 1))[:n]
            out_bytes.append(rep)
        return out_bytes

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.payload_col].to_pylist()
        out_bytes = (
            self._resize_pil(payloads)
            if self.backend == "pil"
            else self._resize_fake(payloads)
        )
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
    ``backend="av"`` decodes with PyAV at ~1 frame/sec (max
    ``MAX_FRAMES``); ``"auto"`` picks av iff importable."""

    FEATURE_DIM = 8
    FRAME_MS = 1000  # one sampled frame per second of video
    MAX_FRAMES = 64

    def __init__(self, backend: str = "fake", id_col: str = "url", payload_col: str = "html"):
        self.id_col, self.payload_col = id_col, payload_col
        self.backend = resolve_backend(backend, "av", "av")
        if self.backend not in ("fake", "av"):
            raise ValueError(backend)

    def _sample_av(self, vid, payload):  # pragma: no cover - no av in sandbox
        """One video payload -> (frame_idx, ts_ms, feature) triples at
        ~1 fps: keep the first decoded frame of each second."""
        import io

        import av

        rows = []
        with av.open(io.BytesIO(bytes(payload))) as container:
            stream = container.streams.video[0]
            tb = float(stream.time_base)
            next_t, idx = 0.0, 0
            for frame in container.decode(stream):
                t_sec = (frame.pts or 0) * tb
                if t_sec + 1e-9 < next_t:
                    continue
                gray = frame.to_ndarray(format="gray").astype(np.float32)
                # 8-dim feature: 4x2 block means in [0,1]
                hh, ww = gray.shape
                blocks = gray[: hh - hh % 2, : ww - ww % 4]
                feat = (
                    blocks.reshape(2, hh // 2, 4, ww // 4).mean(axis=(1, 3)).reshape(-1)
                    / 255.0
                )
                rows.append((idx, int(t_sec * 1000), feat.tolist()))
                idx += 1
                next_t = t_sec + self.FRAME_MS / 1000.0
                if idx >= self.MAX_FRAMES:
                    break
        return rows

    def __call__(self, t: pa.Table) -> pa.Table:
        from .hashing import splitmix64

        payloads = t[self.payload_col].to_pylist()
        ids = t[self.id_col].to_pylist()
        out_id, out_idx, out_ts, out_feat = [], [], [], []
        if payloads and self.backend == "av":  # pragma: no cover - no av here
            for vid, p in zip(ids, payloads):
                for idx, ts_ms, feat in self._sample_av(vid, p):
                    out_id.append(vid)
                    out_idx.append(idx)
                    out_ts.append(ts_ms)
                    out_feat.append(feat)
        elif payloads:
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
    ``backend="soundfile"`` decodes with libsndfile and emits 13
    log-band spectral energies; ``"auto"`` picks soundfile iff
    importable."""

    FEATURE_DIM = 13  # MFCC-coefficient-count stand-in

    def __init__(self, backend: str = "fake", id_col: str = "url", payload_col: str = "html"):
        self.id_col, self.payload_col = id_col, payload_col
        self.backend = resolve_backend(backend, "soundfile", "soundfile")
        if self.backend not in ("fake", "soundfile"):
            raise ValueError(backend)

    def _decode_soundfile(self, payloads):  # pragma: no cover - lib absent
        import io

        import soundfile as sf

        n = len(payloads)
        dur = np.empty(n, dtype=np.int64)
        ch = np.empty(n, dtype=np.int32)
        feats = np.empty((n, self.FEATURE_DIM), dtype=np.float32)
        for i, p in enumerate(payloads):
            data, sr = sf.read(io.BytesIO(bytes(p)), always_2d=True)
            dur[i] = int(len(data) / sr * 1000)
            ch[i] = data.shape[1]
            mono = data.mean(axis=1)
            # 13 log-energies over equal FFT bands — MFCC-ish summary
            spec = np.abs(np.fft.rfft(mono)) ** 2
            bands = np.array_split(spec, self.FEATURE_DIM)
            feats[i] = np.log1p([b.sum() for b in bands]).astype(np.float32)
        return dur, ch, feats

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
        if self.backend == "soundfile":  # pragma: no cover - lib absent
            dur, ch, feats = self._decode_soundfile(payloads)
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


def sample_video_frames(ds, id_col="url", payload_col="html", concurrency=None, batch_size=32, backend="fake"):
    """Actor-pool frame sampling (exploded rows). Smaller batches than
    image features: output rows multiply per input."""
    return ds.select_columns([id_col, payload_col]).map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"id_col": id_col, "payload_col": payload_col, "backend": backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or pool_concurrency(),
    )


def extract_audio_features(ds, id_col="url", payload_col="html", concurrency=None, batch_size=64, backend="fake"):
    return ds.select_columns([id_col, payload_col]).map_batches(
        AudioFeatureExtractor,
        fn_constructor_kwargs={"id_col": id_col, "payload_col": payload_col, "backend": backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or pool_concurrency(),
    )


def resize_images(ds, target_w=224, target_h=224, id_col="url", payload_col="html",
                  concurrency=None, batch_size=64, backend="fake"):
    return ds.select_columns([id_col, payload_col]).map_batches(
        ImageResizer,
        fn_constructor_kwargs={
            "target_w": target_w,
            "target_h": target_h,
            "id_col": id_col,
            "payload_col": payload_col,
            "backend": backend,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or pool_concurrency(),
    )
