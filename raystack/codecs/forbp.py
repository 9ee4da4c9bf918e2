"""Frame-of-reference + bit-packing for integers / timestamps / dates / bools.

Per chunk: subtract the minimum value, bit-pack the non-negative deltas to the
minimal width (SURVEY.md §2.10 "codec: frame-of-reference + bit-pack";
targets ``warc_ts`` / TPC-H key columns). Vectorized numpy throughout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import bitpack
from .base import Codec, EncodedChunk, apply_validity, split_validity

_INT_KINDS = (pa.types.is_integer, pa.types.is_temporal, pa.types.is_boolean)


def is_supported(t: pa.DataType) -> bool:
    return any(f(t) for f in _INT_KINDS)


def _to_int64(arr: pa.Array) -> np.ndarray:
    t = arr.type
    if pa.types.is_boolean(t):
        return np.asarray(arr).astype(np.int64)
    if pa.types.is_temporal(t):
        bits = t.bit_width
        return np.asarray(arr.view(pa.int32() if bits == 32 else pa.int64())).astype(np.int64)
    return np.asarray(arr).astype(np.int64)


def _from_int64(vals: np.ndarray, t: pa.DataType) -> pa.Array:
    if pa.types.is_boolean(t):
        return pa.array(vals.astype(bool), type=t)
    if pa.types.is_temporal(t):
        bits = t.bit_width
        phys = pa.array(vals.astype(np.int32 if bits == 32 else np.int64))
        return phys.view(t)
    if t == pa.uint64():
        # uint64 travels through the int64 pipeline MODULO 2^64 (numpy
        # wraps silently at every step, which is bijective) — reinterpret
        # back instead of a checked cast, which raised on any chunk whose
        # values crossed 2^63 AFTER encode had already succeeded: pages
        # that could never be decoded
        return pa.array(vals.astype(np.uint64), type=t)
    return pa.array(vals, type=pa.int64()).cast(t)


class ForBitpackCodec(Codec):
    name = "for_bitpack"

    def encode(self, arr: pa.Array) -> EncodedChunk:
        if not is_supported(arr.type):
            raise TypeError(f"for_bitpack does not support {arr.type}")
        validity, filled = split_validity(arr)
        v = _to_int64(filled)
        if len(v) == 0:
            ref, width, packed = 0, 0, b""
        else:
            ref = int(v.min())
            deltas = (v - ref).astype(np.uint64)
            width = bitpack.bits_needed(int(deltas.max()))
            packed = bitpack.pack(deltas, width)
        return EncodedChunk(
            codec=self.name, type=arr.type, length=len(arr),
            buffers=[packed, validity],
            meta={"ref": ref, "width": width})

    def decode(self, chunk: EncodedChunk) -> pa.Array:
        n = chunk.length
        deltas = bitpack.unpack(chunk.buffers[0], n, chunk.meta["width"])
        vals = deltas.astype(np.int64) + chunk.meta["ref"]
        arr = _from_int64(vals, chunk.type)
        return apply_validity(arr, chunk.buffers[1], n)
