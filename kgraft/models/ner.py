"""Stage 4: mention detection — gazetteer actor pool.

Re-expresses the reference's "Named Entity" head extraction (the LLM is
asked for entities matching typed column heads,
``modules/PubMedFlow.py:213-218``) as a deterministic gazetteer matcher:

    segments.map_batches(MentionDetector, concurrency=(lo, hi),
                         batch_size=B, batch_format="pyarrow")

The alias dictionary is **broadcast once** via ``ray.put`` on the driver
and read in ``__init__`` (once per actor) — never re-shipped per batch.

Matching is a vectorized hashed-token-n-gram lookup (the Aho-Corasick
replacement the r1 verdict prescribed, in array form — a Python AC
automaton would walk the text char-by-char in Python, which is the exact
loop shape being removed):

1. ``__init__`` tokenizes every normalized alias into ``[\\w-]+`` runs and
   stores one SORTED uint64 array of combined token-hashes per n-gram
   length — O(vocabulary) once per actor, scales to multi-million-alias
   dictionaries (the lookup is ``np.searchsorted``, not a giant
   alternation regex).
2. ``__call__`` tokenizes each segment once (compiled ``[\\w-]+``
   finditer — C loop), hashes ALL tokens in one vectorized
   :func:`kgraft.hashing.hash_strings` call, combines shifted hash
   slices into n-gram hashes per length, and membership-tests them
   against the alias arrays with ``np.isin`` — no per-token Python in
   the match loop.
3. Surviving candidates (≈ number of true mentions, not tokens) go
   through hash-collision verification + a greedy leftmost-longest
   non-overlapping sweep that reproduces the alternation-regex
   semantics exactly: matches start/end on ``[\\w-]`` boundaries, the
   longest alias wins at each start, and scanning resumes after each
   match.

The partitioning assumption is none: mention detection is
embarrassingly parallel over segment rows.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray

from ..hashing import _FNV_OFFSET, _FNV_PRIME, hash_strings, splitmix64

_TOKEN_RE = re.compile(r"[\w-]+")
_COMBINE_SALT = np.uint64(0x9E3779B97F4A7C15)

# ASCII [\w-] classifier (python re's \w on ASCII = [a-zA-Z0-9_])
_WORD_LUT = np.zeros(256, dtype=bool)
for _c in b"0123456789_-":
    _WORD_LUT[_c] = True
for _c in range(ord("a"), ord("z") + 1):
    _WORD_LUT[_c] = True
for _c in range(ord("A"), ord("Z") + 1):
    _WORD_LUT[_c] = True


def _hash_token_slices(
    lower: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """FNV-1a + splitmix64 over byte slices of ``lower`` — bit-identical
    to :func:`kgraft.hashing.hash_strings` on the equivalent lowercase
    strings, without materializing per-token Python strings."""
    n = len(starts)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n:
        maxlen = int(lens.max())
        with np.errstate(over="ignore"):
            for j in range(maxlen):
                act = lens > j
                if not act.any():
                    break
                b = lower[starts[act] + j].astype(np.uint64)
                h[act] = (h[act] ^ b) * _FNV_PRIME
    return splitmix64(h)


def _fast_tokenize(texts: list):
    """Byte-domain tokenizer for ASCII segments: one numpy pass finds all
    ``[\\w-]+`` runs across the concatenated corpus (rows separated by
    two NUL bytes, which are non-word and break single-space adjacency).
    Returns (row, start, end, sep_ok, token_hash) arrays — the exact
    quantities the per-token Python loop produced, with zero per-token
    Python work."""
    joined = "\x00\x00".join(texts)
    data = np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
    w = _WORD_LUT[data]
    dw = np.diff(w.astype(np.int8), prepend=np.int8(0), append=np.int8(0))
    starts = np.flatnonzero(dw == 1)
    ends = np.flatnonzero(dw == -1)
    if not len(starts):
        e = np.array([], dtype=np.int64)
        return e, e, e, np.array([], dtype=bool), e.astype(np.uint64)
    lens_rows = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    row_starts = np.concatenate(([0], np.cumsum(lens_rows[:-1] + 2)))
    rows = np.searchsorted(row_starts, starts, side="right") - 1
    starts_local = starts - row_starts[rows]
    ends_local = ends - row_starts[rows]
    # token i followed by exactly one char, a space, then token i+1, same row
    sep_ok = np.zeros(len(starts), dtype=bool)
    if len(starts) > 1:
        sep_ok[:-1] = (
            (starts[1:] - ends[:-1] == 1)
            & (rows[1:] == rows[:-1])
            & (data[ends[:-1]] == 32)
        )
    lower = np.where((data >= 65) & (data <= 90), data + 32, data)
    th = _hash_token_slices(lower, starts, ends - starts)
    return rows, starts_local, ends_local, sep_ok, th


def _combine_step(acc: np.ndarray, nxt: np.ndarray) -> np.ndarray:
    """Order-sensitive combine of token-hash arrays (vectorized)."""
    with np.errstate(over="ignore"):
        return splitmix64((acc * _COMBINE_SALT) ^ nxt)


class MentionDetector:
    """Actor: segments -> MENTIONS schema rows via broadcast gazetteer."""

    def __init__(self, alias_ref) -> None:
        aliases = ray.get(alias_ref)  # dict[str, int] normalized alias -> id
        self.token_re = _TOKEN_RE
        by_len: dict[int, list] = {}
        irregular = []
        for a in aliases:
            toks = _TOKEN_RE.findall(a)
            if not toks:
                # a token-less alias (empty/punctuation-only string) can
                # never match and L=0 would crash the stride slicing below
                continue
            if " ".join(toks) != a:
                # alias not reconstructible from single-space-joined
                # [\w-]+ tokens (punctuation inside) — rare; handled by a
                # small fallback alternation regex below
                irregular.append(a)
                continue
            by_len.setdefault(len(toks), []).append((a, toks))
        self.ngram_hashes: dict[int, np.ndarray] = {}
        self.hash_to_alias: dict[int, dict[int, str]] = {}
        for L, items in by_len.items():
            flat = [t for _, toks in items for t in toks]
            th = hash_strings(flat)
            acc = th[0::L].copy()
            for k in range(1, L):
                acc = _combine_step(acc, th[k::L])
            self.ngram_hashes[L] = np.sort(acc)
            self.hash_to_alias[L] = {
                int(h): a for h, (a, _) in zip(acc, items)
            }
        self.lengths = sorted(self.ngram_hashes, reverse=True)
        self.irregular_rx = (
            re.compile(
                r"(?<![\w-])("
                + "|".join(
                    re.escape(a) for a in sorted(irregular, key=len, reverse=True)
                )
                + r")(?![\w-])",
                re.IGNORECASE,
            )
            if irregular
            else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["seg_text"].to_pylist()
        n_rows = len(texts)
        # an all-irregular dictionary (no hashable aliases) must still run
        # the regex fallback below, not bail out (review r2)
        if n_rows == 0 or (not self.lengths and self.irregular_rx is None):
            return _empty_mentions()

        # 1+2. tokenize + hash. ASCII rows (virtually all of a normalized
        # web corpus) go through the byte-domain numpy tokenizer — zero
        # per-token Python; rows with non-ASCII word chars fall back to
        # the reference-semantics Python finditer loop (unicode \w).
        fast_ids, slow_ids = [], []
        for i, t in enumerate(texts):
            (fast_ids if t.isascii() else slow_ids).append(i)
        parts = []
        if fast_ids:
            r_f, s_f, e_f, sep_f, th_f = _fast_tokenize([texts[i] for i in fast_ids])
            if len(r_f):
                parts.append(
                    (np.asarray(fast_ids, dtype=np.int64)[r_f], s_f, e_f, sep_f, th_f)
                )
        if slow_ids:
            tok_low: list = []
            starts_l: list = []
            ends_l: list = []
            rows_l: list = []
            sep_l: list = []
            for r in slow_ids:
                text = texts[r]
                prev_end = None
                for m in self.token_re.finditer(text):
                    s, e = m.start(), m.end()
                    if prev_end is not None:
                        sep_l.append(s - prev_end == 1 and text[prev_end] == " ")
                    tok_low.append(m.group(0).lower())
                    starts_l.append(s)
                    ends_l.append(e)
                    rows_l.append(r)
                    prev_end = e
                if prev_end is not None:
                    sep_l.append(False)  # last token of the row
            if tok_low:
                parts.append(
                    (
                        np.asarray(rows_l, dtype=np.int64),
                        np.asarray(starts_l, dtype=np.int64),
                        np.asarray(ends_l, dtype=np.int64),
                        np.asarray(sep_l, dtype=bool),
                        hash_strings(tok_low),
                    )
                )
        if not parts:
            return _empty_mentions()
        rows = np.concatenate([p[0] for p in parts])
        starts = np.concatenate([p[1] for p in parts])
        ends = np.concatenate([p[2] for p in parts])
        sep_ok = np.concatenate([p[3] for p in parts])
        th = np.concatenate([p[4] for p in parts])
        n_tok = len(rows)
        if len(parts) > 1:
            # restore (row, start) order; tokens of one row all come from
            # one path, so row-internal order (and sep flags) survive
            order = np.lexsort((starts, rows))
            rows, starts, ends = rows[order], starts[order], ends[order]
            sep_ok, th = sep_ok[order], th[order]
        sep_ok &= np.r_[rows[1:] == rows[:-1], False]

        # 3. n-gram membership per alias length
        cands: list = []  # (row, start_char, end_char, ngram_hash, L)
        sep_cum = np.concatenate(([0], np.cumsum(sep_ok)))
        for L in self.lengths:
            if L > n_tok:
                continue
            m = n_tok - L + 1
            if L == 1:
                adjacent = np.ones(m, dtype=bool)
            else:
                # all L-1 separators inside the window are single spaces
                adjacent = (sep_cum[L - 1 :] - sep_cum[: -L + 1]) == L - 1
                adjacent = adjacent[:m]
            acc = th[:m].copy()
            for k in range(1, L):
                acc = _combine_step(acc, th[k : k + m])
            hit = adjacent & np.isin(acc, self.ngram_hashes[L])
            for i in np.flatnonzero(hit):
                cands.append(
                    (
                        int(rows[i]),
                        int(starts[i]),
                        int(ends[i + L - 1]),
                        int(acc[i]),
                        L,
                    )
                )

        # 4. irregular-alias fallback (usually empty)
        if self.irregular_rx is not None:
            for r, text in enumerate(texts):
                for m in self.irregular_rx.finditer(text):
                    cands.append((r, m.start(1), m.end(1), None, 0))

        if not cands:
            return _empty_mentions()

        # 5. collision verify + greedy leftmost-longest non-overlap sweep
        cands.sort(key=lambda c: (c[0], c[1], -c[2]))
        urls = batch["url"].to_pylist()
        segi = batch["seg_idx"].to_pylist()
        o_url, o_seg, o_surf, o_start, o_end = [], [], [], [], []
        cur_row, cur_pos = -1, 0
        for r, s, e, h, L in cands:
            if r != cur_row:
                cur_row, cur_pos = r, 0
            if s < cur_pos:
                continue
            surface = texts[r][s:e]
            if L:  # hashed-path candidate: verify against the real alias
                if self.hash_to_alias[L].get(h) != surface.lower():
                    continue
            o_url.append(urls[r])
            o_seg.append(segi[r])
            o_surf.append(surface)
            o_start.append(s)
            o_end.append(e)
            cur_pos = e
        return pa.table(
            {
                "url": pa.array(o_url, pa.string()),
                "seg_idx": pa.array(o_seg, pa.int32()),
                "surface": pa.array(o_surf, pa.string()),
                "start": pa.array(o_start, pa.int32()),
                "end": pa.array(o_end, pa.int32()),
            }
        )


def _empty_mentions() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([], pa.string()),
            "seg_idx": pa.array([], pa.int32()),
            "surface": pa.array([], pa.string()),
            "start": pa.array([], pa.int32()),
            "end": pa.array([], pa.int32()),
        }
    )
