"""Run-length encoding: (run values, run lengths) for any Arrow type.

Run detection is a vectorized shifted-inequality on the filled values; run
values are stored through a nested codec (plain by default — for strings the
``dict->rle`` composition in :mod:`raystack.select` usually wins instead),
run lengths are frame-of-reference bit-packed (SURVEY.md §2.10 "codec: RLE",
targets ``lang`` and sorted/flag columns).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import bitpack
from .base import Codec, EncodedChunk, apply_validity, split_validity
from .plain import PlainCodec


class RleCodec(Codec):
    name = "rle"

    def __init__(self, values_codec: Codec | None = None):
        self.values_codec = values_codec or PlainCodec()
        if self.values_codec.name != "plain":
            self.name = f"rle->{self.values_codec.name}"

    def encode(self, arr: pa.Array) -> EncodedChunk:
        validity, filled = split_validity(arr)
        n = len(filled)
        if n == 0:
            starts = np.zeros(0, dtype=np.int64)
        else:
            if pa.types.is_floating(arr.type):
                # bitwise comparison: NaN runs compress, -0.0 != 0.0
                # preserved. View width follows the ELEMENT size — a
                # hardcoded uint32 reinterpreted float16 pairs as single
                # values, silently corrupting the run boundaries
                fv = np.asarray(filled)
                view = {2: np.uint16, 4: np.uint32,
                        8: np.uint64}[fv.dtype.itemsize]
                v = fv.view(view)
                neq = v[1:] != v[:-1]
            else:
                neq = pc.not_equal(filled.slice(1), filled.slice(0, n - 1))
                # null comparison results (shouldn't occur post-fill) = changed
                neq = np.asarray(pc.fill_null(neq, True))
            starts = np.concatenate([[0], np.flatnonzero(neq) + 1]).astype(np.int64)
        run_values = filled.take(pa.array(starts)) if n else filled
        lengths = (np.diff(np.concatenate([starts, [n]])) if n
                   else np.zeros(0, dtype=np.int64))
        # lengths >= 1 → store length-1 bit-packed
        width = bitpack.bits_needed(int(lengths.max() - 1)) if n else 0
        packed = bitpack.pack((lengths - 1).astype(np.uint64), width) if n else b""
        values_blob = self.values_codec.encode(run_values).to_bytes()
        return EncodedChunk(
            codec=self.name, type=arr.type, length=len(arr),
            buffers=[packed, values_blob, validity],
            meta={"width": width, "runs": int(len(starts))})

    def decode(self, chunk: EncodedChunk) -> pa.Array:
        n, runs = chunk.length, chunk.meta["runs"]
        lengths = bitpack.unpack(chunk.buffers[0], runs, chunk.meta["width"]).astype(np.int64) + 1
        run_values = self.values_codec.decode(EncodedChunk.from_bytes(chunk.buffers[1]))
        if runs:
            idx = np.repeat(np.arange(runs, dtype=np.int64), lengths)
            arr = pc.take(run_values, pa.array(idx))
        else:
            arr = pa.array([], type=chunk.type)
        if arr.type != chunk.type:
            arr = arr.cast(chunk.type)
        return apply_validity(arr, chunk.buffers[2], n)
