"""Plain codec: Arrow IPC serialization of the column chunk.

The bit-identical floor every other codec is measured against (SURVEY.md §7
step 2). Handles every Arrow type, nulls inline, zero transformation cost.
"""

from __future__ import annotations

import pyarrow as pa

from .base import Codec, EncodedChunk


def _ipc_serialize(arr: pa.Array) -> bytes:
    batch = pa.record_batch([arr], names=["c"])
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, batch.schema) as w:
        w.write_batch(batch)
    return sink.getvalue().to_pybytes()


def _ipc_deserialize(data: bytes) -> pa.Array:
    table = pa.ipc.open_stream(pa.BufferReader(data)).read_all()
    return table.column(0).combine_chunks()


class PlainCodec(Codec):
    name = "plain"

    def encode(self, arr: pa.Array) -> EncodedChunk:
        return EncodedChunk(codec=self.name, type=arr.type, length=len(arr),
                            buffers=[_ipc_serialize(arr)])

    def decode(self, chunk: EncodedChunk) -> pa.Array:
        return _ipc_deserialize(chunk.buffers[0])
