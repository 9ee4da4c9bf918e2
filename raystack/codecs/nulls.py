"""All-null codec: a page that stores no value bytes at all.

Emitted only for ranges known to be entirely null — the schema-drift
append path (:func:`raystack.pipeline.encode_append` with
``schema="union"``) back-fills a newly-appearing column over a layout's
existing rows with one of these pages. The chunk records just
``(type, length)``; decode materializes ``pa.nulls(length, type)``.
Never a candidate in codec auto-selection (an all-null *input* column
still round-trips bit-identically through the regular codecs' validity
bitmap, at a few bytes — this codec exists for pages synthesized without
any input array at hand).
"""

from __future__ import annotations

import pyarrow as pa

from .base import Codec, EncodedChunk


class NullsCodec(Codec):
    name = "nulls"

    def encode(self, arr: pa.Array) -> EncodedChunk:
        if arr.null_count != len(arr):
            raise ValueError("nulls codec requires an all-null array")
        return EncodedChunk(codec=self.name, type=arr.type,
                            length=len(arr), buffers=[])

    def decode(self, chunk: EncodedChunk) -> pa.Array:
        return pa.nulls(chunk.length, type=chunk.type)
