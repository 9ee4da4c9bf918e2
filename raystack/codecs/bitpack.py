"""Vectorized bit-packing for unsigned integers.

numpy-only: pack n values of ``width`` bits each into a contiguous byte
buffer (MSB-first within each value, values concatenated bit-by-bit).
Used by the frame-of-reference, dictionary-index and FSST token codecs.
"""

from __future__ import annotations

import numpy as np


def bits_needed(max_value: int) -> int:
    """Minimal bit width to represent values in [0, max_value]."""
    if max_value < 0:
        raise ValueError("bits_needed expects a non-negative max_value")
    if max_value == 0:
        return 0
    return int(max_value).bit_length()


def _word(width: int) -> tuple[str, int]:
    """Smallest big-endian word dtype holding ``width`` bits."""
    for dt, bits in ((">u1", 8), (">u2", 16), (">u4", 32), (">u8", 64)):
        if width <= bits:
            return dt, bits
    raise ValueError(f"width {width} > 64")


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack uint64 values into ``width``-bit fields. width==0 → empty buffer.

    Works through the smallest word size that holds ``width`` bits, so the
    transient unpacked-bit buffer stays proportional to the packed size (the
    naive 64-bit path would allocate 64 bytes per value regardless of width)."""
    n = len(values)
    if width == 0 or n == 0:
        return b""
    dt, bits = _word(width)
    v = np.ascontiguousarray(values, dtype=np.uint64)
    words = v.astype(dt).view(np.uint8).reshape(n, bits // 8)
    unpacked = np.unpackbits(words, axis=1)  # MSB-first per value
    return np.packbits(unpacked[:, bits - width:].ravel()).tobytes()


def unpack(data: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack`. Returns uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    dt, bits = _word(width)
    unpacked = np.unpackbits(np.frombuffer(data, dtype=np.uint8), count=n * width)
    full = np.zeros((n, bits), dtype=np.uint8)
    full[:, bits - width:] = unpacked.reshape(n, width)
    return np.packbits(full, axis=1).view(dt).ravel().astype(np.uint64)
