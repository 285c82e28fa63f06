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
  falls back to the fake (the guard path a mixed fleet wants);
* a VENDORED real codec (``"bmp"`` for images, ``"wav"`` for audio,
  ``"bmps"`` for video — :mod:`kgraft.codecs`) — always available,
  no import guard: actual byte parsing -> pixels/samples -> features,
  so a real-decode path executes in every environment (r4 VERDICT
  next #4). Output schemas are identical across fake, vendored and
  library backends — asserted in tests/test_multimodal.py.

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
    if requested in ("bmp", "wav", "bmps"):  # vendored codecs: always real
        return requested
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
        elif self.backend == "bmp":
            self.decode = self._bmp_decode
        elif self.backend == "pil":  # pragma: no cover - no PIL in sandbox
            self.decode = self._pil_decode
        else:
            raise ValueError(backend)

    def _bmp_decode(self, payloads):
        """Vendored REAL decode: BMP bytes -> pixels -> ITU-R 601-2
        grayscale -> 4x2 block-mean feature in [0, 1] (the same
        feature geometry as the PIL/av paths)."""
        from .codecs import decode_bmp

        n = len(payloads)
        widths = np.empty(n, dtype=np.int32)
        heights = np.empty(n, dtype=np.int32)
        feats = np.empty((n, self.FEATURE_DIM), dtype=np.float32)
        for i, p in enumerate(payloads):
            img = decode_bmp(p)
            hh, ww = img.shape[:2]
            widths[i], heights[i] = ww, hh
            gray = (
                img[:, :, 0] * 299.0 + img[:, :, 1] * 587.0 + img[:, :, 2] * 114.0
            ) / 1000.0
            blocks = gray[: hh - hh % 2, : ww - ww % 4]
            feats[i] = (
                blocks.reshape(2, max(hh // 2, 1), 4, max(ww // 4, 1))
                .mean(axis=(1, 3))
                .reshape(-1)
                / 255.0
            )
        return widths, heights, feats

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
        if self.backend not in ("fake", "pil", "bmp"):
            raise ValueError(backend)

    def _resize_bmp(self, payloads):
        """Vendored REAL resize: decode BMP, nearest-neighbor resample
        via numpy index maps (no per-pixel Python), re-encode BMP."""
        from .codecs import decode_bmp, encode_bmp

        out = []
        for p in payloads:
            img = decode_bmp(p)
            hh, ww = img.shape[:2]
            ri = (np.arange(self.th) * hh) // self.th
            ci = (np.arange(self.tw) * ww) // self.tw
            out.append(encode_bmp(img[ri][:, ci]))
        return out

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
        if self.backend == "pil":  # pragma: no cover - no PIL in sandbox
            out_bytes = self._resize_pil(payloads)
        elif self.backend == "bmp":
            out_bytes = self._resize_bmp(payloads)
        else:
            out_bytes = self._resize_fake(payloads)
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
        if self.backend not in ("fake", "av", "bmps"):
            raise ValueError(backend)

    def _sample_bmps(self, vid, payload):
        """Vendored REAL sampling: BMPS container -> per-frame BMP
        decode at ~1 fps (keep the first frame of each second — the
        same cadence rule and 4x2 block-mean feature as the av path)."""
        from .codecs import decode_bmps

        frames, fps = decode_bmps(payload)
        rows = []
        next_t, idx = 0.0, 0
        for k, img in enumerate(frames):
            t_sec = k / fps
            if t_sec + 1e-9 < next_t:
                continue
            gray = (
                img[:, :, 0] * 299.0 + img[:, :, 1] * 587.0
                + img[:, :, 2] * 114.0
            ).astype(np.float32) / 1000.0
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
        if payloads and self.backend in ("av", "bmps"):
            sample = self._sample_av if self.backend == "av" else self._sample_bmps
            for vid, p in zip(ids, payloads):
                for idx, ts_ms, feat in sample(vid, p):
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
        if self.backend not in ("fake", "soundfile", "wav"):
            raise ValueError(backend)

    def _spectral_summary(self, data, sr):
        """Shared real-path feature: 13 log-energies over equal FFT
        bands of the mono mix (used by BOTH the soundfile and the
        vendored wav decoders — one spectral code path)."""
        mono = data.mean(axis=1)
        spec = np.abs(np.fft.rfft(mono)) ** 2
        bands = np.array_split(spec, self.FEATURE_DIM)
        return (
            int(len(data) / sr * 1000),
            data.shape[1],
            np.log1p([b.sum() for b in bands]).astype(np.float32),
        )

    def _decode_real(self, payloads):
        """Real decode: stdlib-wave (vendored codec) or libsndfile —
        identical downstream feature code."""
        import io

        if self.backend == "wav":
            from .codecs import decode_wav as _read

            reader = lambda p: _read(p)  # noqa: E731
        else:  # pragma: no cover - soundfile absent in this sandbox
            import soundfile as sf

            reader = lambda p: sf.read(io.BytesIO(bytes(p)), always_2d=True)  # noqa: E731

        n = len(payloads)
        dur = np.empty(n, dtype=np.int64)
        ch = np.empty(n, dtype=np.int32)
        feats = np.empty((n, self.FEATURE_DIM), dtype=np.float32)
        for i, p in enumerate(payloads):
            data, sr = reader(p)
            dur[i], ch[i], feats[i] = self._spectral_summary(data, sr)
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
        if self.backend in ("soundfile", "wav"):
            dur, ch, feats = self._decode_real(payloads)
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
