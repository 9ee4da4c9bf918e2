"""Dictionary codec: distinct values + bit-packed indices.

Per column chunk: dictionary-encode (pyarrow kernel builds the value set; the
engine owns the stored layout — bit-packed index buffer + a nested-codec blob
for the dictionary values). ``values_codec`` composes cascades: dict→fsst
encodes the dictionary values with the FSST-style codec (SURVEY.md §2.10
"codec: cascade dict→FSST", targets ``lang`` / ``html``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import bitpack
from .base import Codec, EncodedChunk, apply_validity, split_validity
from .plain import PlainCodec


class DictionaryCodec(Codec):
    name = "dict"

    def __init__(self, values_codec: Codec | None = None):
        self.values_codec = values_codec or PlainCodec()
        if self.values_codec.name != "plain":
            self.name = f"dict->{self.values_codec.name}"

    def encode(self, arr: pa.Array) -> EncodedChunk:
        validity, filled = split_validity(arr)
        if isinstance(filled, pa.ChunkedArray):  # defensive
            filled = filled.combine_chunks()
        denc = pc.dictionary_encode(filled)
        indices = denc.indices
        if indices.null_count:
            # types split_validity has no fill default for (e.g.
            # decimal128) arrive with nulls INLINE: record the validity
            # bitmap from the null indices here — np.asarray would turn
            # them into NaN and NaN.astype(uint64) is garbage codes
            # (silent corruption on decode)
            validity = np.packbits(np.asarray(indices.is_valid()),
                                   bitorder="little").tobytes()
            indices = pc.fill_null(indices, 0)
        codes = np.asarray(indices).astype(np.uint64)
        dictionary = denc.dictionary
        if not len(dictionary) and len(arr):
            # all-null unfillable column: a 1-slot null dictionary keeps
            # decode's take() valid (validity re-nulls every slot anyway)
            dictionary = pa.nulls(1, filled.type)
        width = bitpack.bits_needed(max(0, len(dictionary) - 1))
        packed = bitpack.pack(codes, width) if len(codes) else b""
        dict_blob = self.values_codec.encode(dictionary).to_bytes()
        return EncodedChunk(
            codec=self.name, type=arr.type, length=len(arr),
            buffers=[packed, dict_blob, validity],
            meta={"width": width, "cardinality": len(dictionary)})

    def decode(self, chunk: EncodedChunk) -> pa.Array:
        n = chunk.length
        codes = bitpack.unpack(chunk.buffers[0], n, chunk.meta["width"]).astype(np.int64)
        dictionary = self.values_codec.decode(EncodedChunk.from_bytes(chunk.buffers[1]))
        arr = pc.take(dictionary, pa.array(codes)) if n else pa.array([], type=chunk.type)
        if arr.type != chunk.type:
            arr = arr.cast(chunk.type)
        return apply_validity(arr, chunk.buffers[2], n)
