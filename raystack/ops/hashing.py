"""Shared vectorized hashing primitives for the dedup/text ops.

Everything operates on the flattened byte buffer of a string column (one
contiguous numpy pass, no per-row Python): rolling 8-byte window hashes with
row-boundary masking, per-row segment reductions via ``np.minimum.reduceat``
/ ``np.add.reduceat``, and the splitmix64 finalizer for mixing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs.fsst import _flatten

_U64 = np.uint64
_MAXU64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(h: np.ndarray) -> np.ndarray:
    h = h.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        h ^= h >> _U64(30)
        h *= _U64(0xBF58476D1CE4E5B9)
        h ^= h >> _U64(27)
        h *= _U64(0x94D049BB133111EB)
        h ^= h >> _U64(31)
    return h


def _unxorshift(h: np.ndarray, s: int) -> np.ndarray:
    """Invert ``y = x ^ (x >> s)``: iterate ``x = y ^ (x >> s)`` until the
    recovered high bits have propagated the full word."""
    x = h.copy()
    for _ in range(1, -(-64 // s)):
        x = h ^ (x >> _U64(s))
    return x


#: modular inverses (mod 2**64) of splitmix64's odd multipliers —
#: computed, not transcribed: pow(c, -1, 2**64)
_INV1 = _U64(pow(0xBF58476D1CE4E5B9, -1, 2**64))
_INV2 = _U64(pow(0x94D049BB133111EB, -1, 2**64))


def unsplitmix64(h: np.ndarray) -> np.ndarray:
    """Exact inverse of :func:`splitmix64` (the finalizer is a bijection:
    xorshifts invert by re-application, odd multipliers by their modular
    inverse). Lets a shuffle RANK ``splitmix64(id ^ seed)`` be mapped
    back to the id with no join: ``id = unsplitmix64(rank) ^ seed``."""
    h = h.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        h = _unxorshift(h, 31)
        h *= _INV2
        h = _unxorshift(h, 27)
        h *= _INV1
        h = _unxorshift(h, 30)
    return h


def flatten_column(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat uint8 data, row_starts int64, row_lengths int64); nulls → empty."""
    import pyarrow.compute as pc
    if arr.null_count:
        arr = pc.fill_null(arr, "" if pa.types.is_string(arr.type)
                           or pa.types.is_large_string(arr.type) else b"")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    data, lengths = _flatten(arr)
    if not len(lengths):  # empty column: no phantom [0] start row
        return data, np.zeros(0, np.int64), lengths.astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
    return data, starts, lengths.astype(np.int64)


def list_to_matrix(col, dtype=None) -> np.ndarray:
    """Arrow list<T> column of UNIFORM row length → (n, d) numpy matrix,
    zero-copy flatten + reshape (ragged or null rows raise). Replaces the
    ``np.stack(col.to_pandas())`` pattern, which materializes n Python
    objects per batch."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if arr.null_count:
        raise ValueError("list column contains nulls")
    offsets = np.asarray(arr.offsets)
    widths = np.diff(offsets)
    if len(widths) == 0:
        out = np.empty((0, 0))
        return out if dtype is None else out.astype(dtype)
    d = int(widths[0])
    if not (widths == d).all():
        raise ValueError("ragged list rows")
    flat = np.asarray(arr.values)[offsets[0]:offsets[-1]]
    out = flat.reshape(len(widths), d)
    return out if dtype is None else out.astype(dtype, copy=False)


def window_hashes(data: np.ndarray, window: int = 8) -> np.ndarray:
    """Rolling ``window``-byte hashes over the flat buffer (length =
    len(data); the last window-1 positions hash a zero-padded tail)."""
    n = len(data)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    padded = np.zeros(n + window - 1, dtype=np.uint8)
    padded[:n] = data
    # little-endian uint64 view of each 8-byte window via stride tricks
    if window == 8:
        win = np.lib.stride_tricks.sliding_window_view(padded, 8)[:n]
        h = win.copy().view(np.uint64).ravel()
    else:
        win = np.lib.stride_tricks.sliding_window_view(padded, window)[:n]
        h = np.zeros(n, dtype=np.uint64)
        for i in range(window):
            with np.errstate(over="ignore"):
                h = h * _U64(257) + win[:, i]
    return splitmix64(h)


def tail_hash8(data: np.ndarray, starts: np.ndarray,
               lengths: np.ndarray) -> np.ndarray:
    """Per-row hash of the last ≤8 bytes (covers values shorter than the
    8-byte shingle window). Fully vectorized gather."""
    n = len(starts)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    ends = starts + lengths
    take = np.minimum(lengths, 8).astype(np.int64)
    out = np.zeros((n, 8), dtype=np.uint8)
    total = int(take.sum())
    if total:
        off = np.concatenate([[0], np.cumsum(take)[:-1]])
        pos = np.arange(total) - np.repeat(off, take)
        idx = np.repeat(ends - take, take) + pos
        rows = np.repeat(np.arange(n), take)
        out[rows, pos] = data[idx]
    # salt so an 8-byte value's tail hash differs from its (identical-input)
    # shingle window hash — otherwise x ^ tail self-cancels to 0
    return splitmix64(out.view(np.uint64).ravel()
                      ^ np.uint64(0xA0761D6478BD642F))


def row_valid_mask(starts: np.ndarray, lengths: np.ndarray, total: int,
                   window: int) -> np.ndarray:
    """Vectorized version of the window-validity mask (no per-row loop)."""
    if total == 0:
        return np.zeros(0, dtype=bool)
    counts = np.maximum(lengths - window + 1, 0)
    delta = np.zeros(total + 1, dtype=np.int64)
    np.add.at(delta, starts, counts > 0)
    np.subtract.at(delta, starts + counts, counts > 0)
    return np.cumsum(delta[:-1]) > 0


def min_hash_per_row(h: np.ndarray, starts: np.ndarray, lengths: np.ndarray,
                     valid: np.ndarray, a: int, b: int,
                     window: int = 8,
                     tail: np.ndarray | None = None) -> np.ndarray:
    """min over each row's valid window hashes of (h*a+b). Rows with no
    valid window (shorter than the shingle) are seeded from their per-row
    ``tail`` hash (tail_hash8) permuted by (a, b) — so distinct short docs
    get distinct signatures while identical short docs still agree exactly.
    Without a ``tail``, shingle-less rows fall back to the MAX sentinel
    (legacy behavior: all short docs collide)."""
    counts = np.maximum(lengths - window + 1, 0)
    if tail is not None:
        with np.errstate(over="ignore"):
            short_fill = splitmix64(tail * _U64(a) + _U64(b))
    else:
        short_fill = np.full(len(starts), _MAXU64, dtype=np.uint64)
    if len(h) == 0:
        return short_fill.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        ph = h * _U64(a) + _U64(b)
    ph = np.where(valid, ph, _MAXU64)
    mins = np.minimum.reduceat(ph, np.minimum(starts, len(ph) - 1))
    mins = mins.astype(np.uint64)
    none = counts == 0  # reduceat artifacts on empty segments
    mins[none] = short_fill[none]
    return mins


def tokenize_words(texts, lowercase: bool = True):
    """(token strings as an object array, doc ordinal per token) —
    lowercase + ``\\W+`` split with empties dropped. The ONE tokenizer
    the contamination check, the inverted text index and their DuckDB
    oracle mirrors (``string_split_regex(lower(text), '\\W+')``) share;
    fixing it here keeps them in lockstep."""
    import pyarrow.compute as pc
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    s = pc.cast(pc.fill_null(texts, ""), pa.string())
    if lowercase:
        s = pc.utf8_lower(s)
    toks = pc.split_pattern_regex(s, r"\W+")
    counts = np.diff(np.asarray(toks.offsets))
    flat = toks.flatten()
    keep = np.asarray(pc.utf8_length(flat)) > 0
    doc = np.repeat(np.arange(len(s)), counts)[keep]
    vals = flat.to_numpy(zero_copy_only=False)[keep]
    return vals, doc
