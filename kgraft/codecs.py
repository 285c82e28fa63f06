"""Vendored minimal codecs so a REAL decode path executes in any
environment (r4 VERDICT next #4: the PIL/av/soundfile backends are
import-guarded and this sandbox ships none of the three, so only the
hash-seeded fake backend had ever run).

* BMP — uncompressed 24-bit ``BI_RGB`` (the format's trivial core:
  fixed 54-byte header, BGR rows bottom-up, 4-byte row padding),
  decoded with numpy slicing — no Python per-pixel loop.
* WAV — PCM via the stdlib ``wave`` module + ``np.frombuffer``
  (16-bit and 8-bit), normalized to float in [-1, 1).
* BMPS — a length-prefixed concatenation of BMP frames with a tiny
  ``(magic, fps, n_frames)`` header: the simplest container that lets
  the video frame-sampler exercise real per-frame byte parsing and
  1-fps sampling (the real-world slot is an ffmpeg/PyAV demuxer; the
  per-frame DECODE here is the real BMP path above).

Encoders exist so tests can synthesize payloads; pipelines only
decode. Everything is deterministic and dependency-free.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_bmp",
    "decode_bmp",
    "encode_wav",
    "decode_wav",
    "encode_bmps",
    "decode_bmps",
]

_BMPS_MAGIC = b"BMPS"


def encode_bmp(arr: np.ndarray) -> bytes:
    """RGB uint8 (H, W, 3) -> uncompressed 24-bit BI_RGB BMP bytes
    (bottom-up rows, BGR channel order, rows padded to 4 bytes)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8, got {arr.shape}")
    h, w, _ = arr.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    img_size = (row_bytes + pad) * h
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    rows[:, :row_bytes] = arr[::-1, :, ::-1].reshape(h, row_bytes)  # bottom-up BGR
    return header + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP bytes -> RGB uint8 (H, W, 3).
    Supports bottom-up (positive height) and top-down (negative)."""
    data = bytes(data)
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload (missing BM magic)")
    (offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    bpp, comp = struct.unpack_from("<HI", data, 28)[0], struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp}, comp={comp})")
    h = abs(h_signed)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    px = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = px.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if h_signed > 0:
        rows = rows[::-1]  # bottom-up -> top-down
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 (n,) or (n, ch) PCM -> WAV bytes via the stdlib writer."""
    import io
    import wave

    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(s.shape[1])
        f.setsampwidth(2)
        f.setframerate(int(sample_rate))
        f.writeframes(np.ascontiguousarray(s).tobytes())
    return buf.getvalue()


def decode_wav(data: bytes):
    """WAV bytes -> (float64 (n, ch) in [-1, 1), sample_rate) — the
    ``soundfile.read(always_2d=True)`` contract, stdlib-decoded."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(data)), "rb") as f:
        ch = f.getnchannels()
        width = f.getsampwidth()
        sr = f.getframerate()
        raw = f.readframes(f.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return x.reshape(-1, ch), sr


def encode_bmps(frames, fps: int = 4) -> bytes:
    """List of RGB uint8 (H, W, 3) frames -> BMPS container bytes."""
    blobs = [encode_bmp(f) for f in frames]
    head = _BMPS_MAGIC + struct.pack("<II", int(fps), len(blobs))
    return head + b"".join(struct.pack("<I", len(b)) + b for b in blobs)


def decode_bmps(data: bytes):
    """BMPS container bytes -> (list of RGB frames, fps)."""
    data = bytes(data)
    if data[:4] != _BMPS_MAGIC:
        raise ValueError("not a BMPS payload (missing magic)")
    fps, n = struct.unpack_from("<II", data, 4)
    frames, pos = [], 12
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", data, pos)
        pos += 4
        frames.append(decode_bmp(data[pos : pos + ln]))
        pos += ln
    return frames, fps
