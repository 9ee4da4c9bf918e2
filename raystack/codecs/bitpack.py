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


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack uint64 values into ``width``-bit fields. width==0 → empty buffer."""
    n = len(values)
    if width == 0 or n == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    # big-endian byte view → unpackbits gives MSB-first bits per value
    bits = np.unpackbits(v.astype(">u8").view(np.uint8).reshape(n, 8), axis=1)
    return np.packbits(bits[:, 64 - width:].ravel()).tobytes()


def unpack(data: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack`. Returns uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), count=n * width)
    full = np.zeros((n, 64), dtype=np.uint8)
    full[:, 64 - width:] = bits.reshape(n, width)
    return np.packbits(full, axis=1).view(">u8").ravel().astype(np.uint64)
