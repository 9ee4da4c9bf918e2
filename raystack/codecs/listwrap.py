"""Structural codec for list columns: ``list-><child codec>``.

Embedding vectors (``list<float32>``), token-id sequences (``list<int32>``,
the BPE tokenizer's output) and token-string lists are first-class columns
in a training-data store, but they previously fell through to the ``plain``
IPC floor. :class:`ListCodec` splits a list column into its structure and
its values and gives each the codec it deserves:

- **values**: the flattened child array, encoded with any registered child
  codec (``alprd`` for embeddings, ``for_bitpack`` for token ids, ``fsst``
  for token strings) — the child sees one plain primitive array, so every
  existing codec composes unchanged;
- **structure**: per-row value counts, frame-of-reference bit-packed (a
  fixed-length embedding column packs to 0 bits per row);
- **validity**: a bitmap distinguishing null lists from empty lists.

Supports ``list``, ``large_list`` and ``fixed_size_list``; nested lists
compose as ``list->list->...``. Decode is bit-identical including NaN
payloads in float children (verified with ``arrays_bit_identical`` on the
flattened values).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import bitpack
from .base import Codec, EncodedChunk


def is_supported(t: pa.DataType) -> bool:
    return (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t))


def _offsets_dtype(t: pa.DataType):
    return np.int64 if pa.types.is_large_list(t) else np.int32


class ListCodec(Codec):
    def __init__(self, values_codec: Codec | None = None):
        from .plain import PlainCodec
        self.values_codec = values_codec or PlainCodec()
        self.name = f"list->{self.values_codec.name}"

    def encode(self, arr: pa.Array) -> EncodedChunk:
        t = arr.type
        if not is_supported(t):
            raise TypeError(f"list codec does not support {t}")
        n = len(arr)
        valid = np.asarray(arr.is_valid()) if arr.null_count else \
            np.ones(n, dtype=bool)
        validity = np.packbits(valid, bitorder="little").tobytes() \
            if arr.null_count else b""
        if pa.types.is_fixed_size_list(t):
            # the child buffer keeps null slots' values in place — encode it
            # whole (bit-preserving even under nulls), no counts needed
            size = t.list_size
            values = arr.values.slice(arr.offset * size, n * size)
            if isinstance(values, pa.ChunkedArray):
                values = values.combine_chunks()
            child = self.values_codec.encode(values)
            return EncodedChunk(
                codec=self.name, type=t, length=n,
                buffers=[child.to_bytes(), b"", validity],
                meta={"ref": size, "width": 0})
        # per-row counts (null rows -> 0); flatten() drops null slots'
        # values in the same convention
        counts = np.asarray(pc.fill_null(pc.list_value_length(arr), 0),
                            dtype=np.int64)
        values = arr.flatten()
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        child = self.values_codec.encode(values)
        if n:
            ref = int(counts.min())
            width = bitpack.bits_needed(int(counts.max()) - ref)
            packed = bitpack.pack((counts - ref).astype(np.uint64), width)
        else:
            ref, width, packed = 0, 0, b""
        return EncodedChunk(
            codec=self.name, type=t, length=n,
            buffers=[child.to_bytes(), packed, validity],
            meta={"ref": ref, "width": width})

    def decode(self, chunk: EncodedChunk) -> pa.Array:
        from . import decode_blob
        t, n = chunk.type, chunk.length
        values = decode_blob(chunk.buffers[0])
        counts = bitpack.unpack(chunk.buffers[1], n, chunk.meta["width"]) \
            .astype(np.int64) + chunk.meta["ref"]
        validity = chunk.buffers[2]
        if validity:
            valid = np.unpackbits(np.frombuffer(validity, dtype=np.uint8),
                                  count=n, bitorder="little").astype(bool)
        else:
            valid = None
        if pa.types.is_fixed_size_list(t):
            vbuf = pa.py_buffer(validity) if validity else None
            nc = 0 if valid is None else int((~valid).sum())
            return pa.Array.from_buffers(t, n, [vbuf], null_count=nc,
                                         children=[values])
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        odt = _offsets_dtype(t)
        vbuf = pa.py_buffer(validity) if validity else None
        nc = 0 if valid is None else int((~valid).sum())
        obuf = pa.py_buffer(np.ascontiguousarray(offsets.astype(odt)))
        return pa.Array.from_buffers(t, n, [vbuf, obuf], null_count=nc,
                                     children=[values])
