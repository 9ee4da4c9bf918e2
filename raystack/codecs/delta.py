"""Delta + zigzag + bit-pack for integers/timestamps, and byte-stream split
for floats.

- :class:`DeltaBitpackCodec`: store the first value and zigzag-encoded
  consecutive deltas bit-packed to the minimal width — the right codec for
  near-monotone sequences (crawl timestamps, auto-increment ids) where
  frame-of-reference still sees a wide range but deltas are tiny.
- :class:`ByteSplitCodec`: transpose the value bytes so each byte plane is
  contiguous (Parquet's BYTE_STREAM_SPLIT), then DEFLATE — exponent/
  mantissa-high planes compress well for doubles.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from . import bitpack
from .base import Codec, EncodedChunk, apply_validity, split_validity
from .forbp import _from_int64, _to_int64, is_supported as _int_supported


class DeltaBitpackCodec(Codec):
    name = "delta_bitpack"

    def encode(self, arr: pa.Array) -> EncodedChunk:
        if not _int_supported(arr.type):
            raise TypeError(f"delta_bitpack does not support {arr.type}")
        validity, filled = split_validity(arr)
        v = _to_int64(filled)
        if len(v) == 0:
            first, width, packed = 0, 0, b""
        else:
            first = int(v[0])
            with np.errstate(over="ignore"):
                deltas = np.diff(v)
                zig = ((deltas << 1) ^ (deltas >> 63)).astype(np.uint64)
            width = bitpack.bits_needed(int(zig.max())) if len(zig) else 0
            packed = bitpack.pack(zig, width)
        return EncodedChunk(codec=self.name, type=arr.type, length=len(arr),
                            buffers=[packed, validity],
                            meta={"first": first, "width": width})

    def decode(self, chunk: EncodedChunk) -> pa.Array:
        n = chunk.length
        if n == 0:
            vals = np.zeros(0, dtype=np.int64)
        else:
            zig = bitpack.unpack(chunk.buffers[0], n - 1, chunk.meta["width"])
            deltas = (zig >> np.uint64(1)).astype(np.int64) ^ \
                -(zig & np.uint64(1)).astype(np.int64)
            vals = np.empty(n, dtype=np.int64)
            vals[0] = chunk.meta["first"]
            if n > 1:
                with np.errstate(over="ignore"):
                    np.cumsum(deltas, out=vals[1:])
                    vals[1:] += chunk.meta["first"]
        arr = _from_int64(vals, chunk.type)
        return apply_validity(arr, chunk.buffers[1], n)


class ByteSplitCodec(Codec):
    name = "bytesplit"
    _LEVEL = 1

    def encode(self, arr: pa.Array) -> EncodedChunk:
        t = arr.type
        if not pa.types.is_floating(t):
            raise TypeError(f"bytesplit does not support {t}")
        validity, filled = split_validity(arr)
        width = 8 if t == pa.float64() else 4
        raw = np.asarray(filled).view(np.uint8).reshape(-1, width)
        planes = np.ascontiguousarray(raw.T)  # byte-plane transpose
        packed = zlib.compress(planes.tobytes(), self._LEVEL)
        return EncodedChunk(codec=self.name, type=t, length=len(arr),
                            buffers=[packed, validity], meta={"width": width})

    def decode(self, chunk: EncodedChunk) -> pa.Array:
        n, width = chunk.length, chunk.meta["width"]
        planes = np.frombuffer(zlib.decompress(chunk.buffers[0]),
                               dtype=np.uint8).reshape(width, n)
        raw = np.ascontiguousarray(planes.T).reshape(-1)
        dt = np.float64 if width == 8 else np.float32
        arr = pa.array(raw.view(dt))
        if arr.type != chunk.type:
            arr = arr.cast(chunk.type)
        return apply_validity(arr, chunk.buffers[1], n)
