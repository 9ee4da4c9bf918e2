"""General-purpose entropy/LZ stage cascaded over any light codec.

Parquet applies snappy on top of its own light encodings (dict/RLE/bit-pack);
the apples-to-apples equivalent here is an optional DEFLATE (stdlib zlib)
stage over a codec's serialized chunk — ``fsst+z``, ``dict+z`` etc. — chosen
by the same sampling cost model as everything else. FSST+LZ composition is
the combination the FSST paper itself evaluates. Level 1 keeps the stage
fast; the light codec underneath has already removed most structure.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

from .base import Codec, EncodedChunk

_LEVEL = 1


class ZlibWrapCodec(Codec):
    def __init__(self, inner: Codec):
        self.inner = inner
        self.name = inner.name + "+z"

    def encode(self, arr: pa.Array) -> EncodedChunk:
        blob = self.inner.encode(arr).to_bytes()
        return EncodedChunk(codec=self.name, type=arr.type, length=len(arr),
                            buffers=[zlib.compress(blob, _LEVEL)])

    def decode(self, chunk: EncodedChunk) -> pa.Array:
        inner_chunk = EncodedChunk.from_bytes(zlib.decompress(chunk.buffers[0]))
        return self.inner.decode(inner_chunk)
