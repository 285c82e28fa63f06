"""Fixed, versioned hashing primitives (SURVEY.md §2.2 scalar inventory).

Everything here must be deterministic across processes, machines and runs
(no randomized ``hash()``), because hashes drive shuffle keys (LSH bands,
salted entity hashes, dedup keys) and golden comparisons.

Reference seed: the reference normalizes markup to save tokens
(``tools/entrez.py:59-68``) but has no hashing at all; these primitives are
new, required by the north rule (MinHash-LSH blocking, salted entity
hashes).
"""

from __future__ import annotations

import numpy as np

HASH_VERSION = 1

# splitmix64 constants — public-domain PRNG finalizer (Steele et al. 2014).
_SM64_1 = np.uint64(0xBF58476D1CE4E5B9)
_SM64_2 = np.uint64(0x94D049BB133111EB)
_SM64_G = np.uint64(0x9E3779B97F4A7C15)

_MERSENNE61 = (1 << 61) - 1


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array. Deterministic.

    The mod-2^64 wraparound of the multiplies is the algorithm; numpy
    arrays wrap unsigned silently but 0-d/scalar inputs raise a
    RuntimeWarning for the same (intended) overflow — suppressed so a
    scalar call (e.g. per-round salts) stays warning-clean."""
    with np.errstate(over="ignore"):
        z = (x + _SM64_G).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * _SM64_1
        z = (z ^ (z >> np.uint64(27))) * _SM64_2
        return z ^ (z >> np.uint64(31))


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)

# cap on the padded scratch matrix (rows x maxlen bytes) per chunk, so
# hashing a batch of multi-MB documents never allocates a giant buffer
_HASH_CHUNK_BYTES = 64 << 20


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Stable 64-bit hash of a sequence of strings -> uint64 ndarray.

    FNV-1a over UTF-8 bytes, then splitmix64 finalize with ``seed`` mixed
    in. Vectorized ACROSS strings: rows are sorted by length descending,
    so at byte position ``j`` the still-active strings are a prefix slice
    and each step is one uint64 xor-multiply over that slice — total work
    is sum(len) vectorized element-ops, never a Python per-byte loop.
    Used for shuffle keys, dedup keys and partition ids on the hot path.
    """
    n = len(values)
    out = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n:
        enc = [
            v.encode("utf-8") if isinstance(v, str) else bytes(v) for v in values
        ]
        lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
        maxlen = int(lens.max())
        if maxlen:
            # longest-first so the active set at each byte position is a
            # contiguous prefix (slice, not boolean mask)
            order = np.argsort(-lens, kind="stable")
            sorted_lens = lens[order]
            h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
            chunk_rows = max(1, _HASH_CHUNK_BYTES // max(maxlen, 1))
            with np.errstate(over="ignore"):
                for c0 in range(0, n, chunk_rows):
                    c1 = min(n, c0 + chunk_rows)
                    rows = order[c0:c1]
                    clens = sorted_lens[c0:c1]
                    cmax = int(clens[0])
                    if cmax == 0:
                        continue
                    mat = np.zeros((c1 - c0, cmax), dtype=np.uint8)
                    for i, r in enumerate(rows):
                        b = enc[r]
                        if b:
                            mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
                    hc = h[c0:c1]
                    # count of active rows per byte position (descending lens
                    # -> prefix): active[j] = #rows with len > j
                    active = np.searchsorted(-clens, -np.arange(cmax), side="left")
                    for j in range(cmax):
                        k = active[j]
                        if k == 0:
                            break
                        hc[:k] = (hc[:k] ^ mat[:k, j].astype(np.uint64)) * _FNV_PRIME
                    h[c0:c1] = hc
            out[order] = h
    if seed:
        out = out ^ np.uint64(seed & ((1 << 64) - 1))
    return splitmix64(out)


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of all k-character shingles of ``text`` -> uint64 ndarray.

    Fully vectorized: view the UTF-8 bytes as a uint8 array, build a
    sliding-window polynomial hash with numpy strides. Deterministic.
    Returns the *unique* shingle hashes (set semantics for Jaccard).
    """
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)), constant_values=0)
    n = len(data) - k + 1
    windows = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    weights = np.uint64(31) ** np.arange(k, dtype=np.uint64)
    raw = (windows * weights).sum(axis=1, dtype=np.uint64)
    return np.unique(splitmix64(raw[:n]))


class MinHasher:
    """MinHash signatures via ``num_perm`` multiply-permutations.

    ``sig[i] = min over shingles s of (a_i * h(s) + b_i mod 2^64)`` with
    random ODD ``a_i`` — multiplication by an odd constant is a bijection
    on uint64, so each (a_i, b_i) is a genuine permutation of the hash
    space, computed with natural overflow (no 64-bit modulo, which is
    ~100x slower than multiply and dominated the original mod-prime
    construction). Signatures are mergeable (element-wise min), so
    per-batch partial signatures compose across blocks. Deterministic:
    fixed-seed parameter draw.
    """

    def __init__(self, num_perm: int = 128, seed: int = 1001, shingle_k: int = 3):
        rng = np.random.RandomState(seed)
        # 32-bit permutation space: uint32 multiplies vectorize (AVX2);
        # numpy's uint64 multiply is scalar and ~10x slower. 2^-32
        # per-shingle collision probability is ample for MinHash.
        a = rng.randint(0, 2**31, size=num_perm, dtype=np.uint32)
        self.a = (a << np.uint32(1)) | np.uint32(1)  # odd -> bijection
        self.b = rng.randint(0, 2**31, size=num_perm, dtype=np.uint32)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        """(num_perm,) uint64-widened signature of ``text``'s shingles."""
        return self.signatures([text])[0]

    def signatures(self, texts) -> np.ndarray:
        """(n, num_perm) uint64 signatures for a batch of texts.

        Vectorized across the whole batch: all texts' shingle hashes are
        concatenated (folded to uint32), ALL permutations are applied in
        one (num_perm × total_shingles) pass of overflowing multiply-adds,
        and per-text minima come from ``np.minimum.reduceat`` at the
        text boundaries — no per-text Python beyond shingling.
        """
        n = len(texts)
        out = np.full((n, self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        if n == 0:
            return out
        k = self.shingle_k
        # ONE flat byte buffer for the whole batch (strings shorter than k
        # zero-padded, matching shingle_hashes' per-string padding); the
        # per-string Python of the old implementation (sliding_window_view
        # + unique per string) cost 40s on a 150k-alias table. Dropping
        # the per-string unique is exact: the min over a multiset equals
        # the min over its distinct values.
        bufs = [t.encode("utf-8") for t in texts]
        pad = b"\x00" * k
        bufs = [b if len(b) >= k else b + pad[: k - len(b)] for b in bufs]
        lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
        data = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        offs = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        counts = lens - k + 1  # valid window starts per string (>= 1)

        # polynomial shingle hash via shifted sums — no (positions, k)
        # window matrix; chunked so temporaries stay bounded
        weights = np.uint64(31) ** np.arange(k, dtype=np.uint64)
        n_pos = len(data) - k + 1
        sh = np.empty(n_pos, dtype=np.uint64)
        step = 1 << 24
        for p0 in range(0, n_pos, step):
            p1 = min(p0 + step, n_pos)
            acc = data[p0:p1].astype(np.uint64) * weights[0]
            for j in range(1, k):
                acc += data[p0 + j : p1 + j].astype(np.uint64) * weights[j]
            sh[p0:p1] = splitmix64(acc)

        # keep only windows fully inside one string (positions past
        # offs[i] + counts[i] - 1 straddle a boundary)
        pos = np.arange(n_pos, dtype=np.int64)
        tid = np.searchsorted(offs, pos, side="right") - 1
        flat64 = sh[pos < offs[tid] + counts[tid]]
        flat = (flat64 ^ (flat64 >> np.uint64(32))).astype(np.uint32)

        # chunk so the (num_perm × shingles) product matrix stays ~100 MB:
        # one unchunked pass over a 150k-string batch allocated a >1 GB
        # temporary (twice) and ran 2.5x slower than the sum of its chunks
        max_shingles = max(1, (1 << 24) // self.num_perm * 2)
        starts_all = np.zeros(n, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts_all[1:])
        csum = np.cumsum(counts)
        lo = 0
        while lo < n:
            base = csum[lo - 1] if lo else 0
            hi = int(np.searchsorted(csum, base + max_shingles, side="left")) + 1
            hi = min(max(hi, lo + 1), n)
            seg = flat[base : csum[hi - 1]]
            with np.errstate(over="ignore"):
                prods = self.a[:, None] * seg[None, :] + self.b[:, None]
            mins = np.minimum.reduceat(prods, starts_all[lo:hi] - base, axis=1)
            out[lo:hi] = mins.T.astype(np.uint64)
            lo = hi
        return out

    def band_hashes(self, sigs: np.ndarray, num_bands: int) -> np.ndarray:
        """(n, num_bands) uint64 — one hash per LSH band of each signature.

        Rows sharing ``(band_id, band_hash)`` are LSH candidates; that pair
        is the shuffle key for candidate generation (SURVEY.md §2.2 st.6).
        """
        n, p = sigs.shape
        rows_per_band = p // num_bands
        trimmed = sigs[:, : num_bands * rows_per_band]
        bands = trimmed.reshape(n, num_bands, rows_per_band)
        weights = np.uint64(0x9E3779B97F4A7C15) ** np.arange(
            rows_per_band, dtype=np.uint64
        )
        mixed = (bands * weights).sum(axis=2, dtype=np.uint64)
        band_salt = splitmix64(np.arange(num_bands, dtype=np.uint64))
        return splitmix64(mixed ^ band_salt[None, :])


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact character-k-gram Jaccard similarity (candidate verification)."""
    sa = shingle_hashes(text_a, k)
    sb = shingle_hashes(text_b, k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 0.0


def simhash64(text: str, k: int = 3) -> int:
    """64-bit SimHash over k-gram shingle hashes (near-dup fingerprint)."""
    h = shingle_hashes(text, k)
    if len(h) == 0:
        return 0
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    return int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
