"""Codec interface + EncodedChunk container.

An :class:`EncodedChunk` is the unit the encode pipeline stores: one column
chunk encoded by one codec, serializable to a single ``bytes`` blob that is
written into the ``data`` column of the encoded-pages table
(SURVEY.md §2.10, §7 step 4). Decode is bit-identical: ``decode(encode(a))``
satisfies ``a.equals(decoded)`` including nulls, empty strings and non-UTF8
binary.

Null handling is factored out once: every codec encodes the *filled* values
(nulls replaced by a type default) and the validity bitmap travels as a
dedicated buffer, re-applied on decode.
"""

from __future__ import annotations

import base64
import json
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

_MAGIC = b"RSC1"

# ---------------------------------------------------------------------------
# Arrow type <-> JSON (covers every type the engine meets; IPC fallback for
# anything exotic)
# ---------------------------------------------------------------------------

_SIMPLE_TYPES = {
    "bool": pa.bool_(),
    "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(), "int64": pa.int64(),
    "uint8": pa.uint8(), "uint16": pa.uint16(), "uint32": pa.uint32(), "uint64": pa.uint64(),
    "float32": pa.float32(), "float64": pa.float64(),
    "string": pa.string(), "large_string": pa.large_string(),
    "binary": pa.binary(), "large_binary": pa.large_binary(),
    "date32": pa.date32(), "date64": pa.date64(),
}
_SIMPLE_NAMES = {v: k for k, v in _SIMPLE_TYPES.items()}


def type_to_json(t: pa.DataType) -> dict:
    if t in _SIMPLE_NAMES:
        return {"kind": _SIMPLE_NAMES[t]}
    if pa.types.is_timestamp(t):
        return {"kind": "timestamp", "unit": t.unit, "tz": t.tz}
    if pa.types.is_duration(t):
        return {"kind": "duration", "unit": t.unit}
    if pa.types.is_time32(t) or pa.types.is_time64(t):
        return {"kind": "time", "bits": t.bit_width, "unit": t.unit}
    # fallback: embed the schema via Arrow IPC
    empty = pa.table({"c": pa.array([], type=t)})
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, empty.schema) as w:
        w.write_table(empty)
    return {"kind": "ipc", "b64": base64.b64encode(sink.getvalue().to_pybytes()).decode()}


def type_from_json(d: dict) -> pa.DataType:
    kind = d["kind"]
    if kind in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[kind]
    if kind == "timestamp":
        return pa.timestamp(d["unit"], tz=d.get("tz"))
    if kind == "duration":
        return pa.duration(d["unit"])
    if kind == "time":
        return pa.time32(d["unit"]) if d["bits"] == 32 else pa.time64(d["unit"])
    if kind == "ipc":
        buf = base64.b64decode(d["b64"])
        return pa.ipc.open_stream(pa.BufferReader(buf)).schema.field(0).type
    raise ValueError(f"unknown type kind {kind!r}")


# ---------------------------------------------------------------------------
# EncodedChunk
# ---------------------------------------------------------------------------

@dataclass
class EncodedChunk:
    codec: str
    type: pa.DataType
    length: int
    buffers: list[bytes]
    meta: dict = field(default_factory=dict)

    @property
    def nbytes(self) -> int:
        return sum(len(b) for b in self.buffers)

    def to_bytes(self) -> bytes:
        header = json.dumps({
            "codec": self.codec,
            "type": type_to_json(self.type),
            "length": self.length,
            "buflens": [len(b) for b in self.buffers],
            "meta": self.meta,
        }, separators=(",", ":")).encode()
        parts = [_MAGIC, len(header).to_bytes(4, "little"), header, *self.buffers]
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes | memoryview) -> "EncodedChunk":
        blob = memoryview(blob)
        if bytes(blob[:4]) != _MAGIC:
            raise ValueError("bad EncodedChunk magic")
        hlen = int.from_bytes(blob[4:8], "little")
        header = json.loads(bytes(blob[8:8 + hlen]))
        off = 8 + hlen
        buffers = []
        for ln in header["buflens"]:
            buffers.append(bytes(blob[off:off + ln]))
            off += ln
        return cls(codec=header["codec"], type=type_from_json(header["type"]),
                   length=header["length"], buffers=buffers, meta=header["meta"])


# ---------------------------------------------------------------------------
# Validity (null bitmap) helpers
# ---------------------------------------------------------------------------

def split_validity(arr: pa.Array) -> tuple[bytes, pa.Array]:
    """Return (validity_buffer, filled_array). validity_buffer is b"" when the
    array has no nulls. The filled array replaces null slots with a type
    default so value codecs never see nulls."""
    import pyarrow.compute as pc
    if arr.null_count == 0:
        return b"", arr
    mask = np.asarray(arr.is_valid())  # bool array
    validity = np.packbits(mask, bitorder="little").tobytes()
    t = arr.type
    if pa.types.is_floating(t):
        fill = pa.scalar(0.0, type=t)
    elif (pa.types.is_integer(t) or pa.types.is_temporal(t) or pa.types.is_boolean(t)):
        fill = pa.scalar(0, type=t) if not pa.types.is_boolean(t) else pa.scalar(False)
        if pa.types.is_temporal(t):
            # 32-bit temporal types (date32/time32) reject an int64 cast
            src = pa.int32() if t.bit_width == 32 else pa.int64()
            fill = pa.array([0], type=src).cast(t)[0]
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        fill = pa.scalar("", type=t)
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        fill = pa.scalar(b"", type=t)
    else:
        # generic: first valid value or cast of 0 — plain codec keeps nulls inline
        fill = None
    if fill is None:
        return b"", arr  # codec must handle nulls itself (plain does)
    return validity, pc.fill_null(arr, fill)


def apply_validity(arr: pa.Array, validity: bytes, length: int) -> pa.Array:
    """Re-apply a validity bitmap produced by :func:`split_validity`."""
    if not validity:
        return arr
    import pyarrow.compute as pc
    mask = np.unpackbits(np.frombuffer(validity, dtype=np.uint8),
                         count=length, bitorder="little").astype(bool)
    return pc.if_else(pa.array(mask), arr, pa.scalar(None, type=arr.type))


def arrays_bit_identical(a: pa.Array, b: pa.Array) -> bool:
    """Bit-identical equality: same type, same null mask, same value bits.
    Unlike ``pa.Array.equals`` this treats NaN == NaN and distinguishes
    -0.0 from 0.0 (the decode contract is *bit*-identical)."""
    import pyarrow.compute as pc
    if a.type != b.type or len(a) != len(b):
        return False
    if not np.array_equal(np.asarray(a.is_valid()), np.asarray(b.is_valid())):
        return False
    if pa.types.is_floating(a.type):
        # null masks already matched above, so comparing the VALID slots'
        # bits suffices — drop_null keeps their order and sidesteps
        # fill_null kernels float16 doesn't have. View width follows the
        # element size (float16 bits live in uint16)
        fa = np.asarray(a.drop_null())
        fb = np.asarray(b.drop_null())
        view = {2: np.uint16, 4: np.uint32,
                8: np.uint64}[fa.dtype.itemsize]
        return np.array_equal(fa.view(view), fb.view(view))
    if pa.types.is_list(a.type) or pa.types.is_large_list(a.type) \
            or pa.types.is_fixed_size_list(a.type):
        # nested floats would hit Arrow's structural equals below, where
        # NaN != NaN — recurse instead: per-row lengths must match
        # (null-vs-empty already separated by the validity check above),
        # then the flattened children compare bit-identically. flatten()
        # applies offsets and skips null rows' slots on both sides alike
        if not pa.types.is_fixed_size_list(a.type):
            la = pc.fill_null(pc.list_value_length(a), -1)
            lb = pc.fill_null(pc.list_value_length(b), -1)
            if not np.array_equal(np.asarray(la), np.asarray(lb)):
                return False
        fa, fb = a.flatten(), b.flatten()
        if isinstance(fa, pa.ChunkedArray):
            fa = fa.combine_chunks()
        if isinstance(fb, pa.ChunkedArray):
            fb = fb.combine_chunks()
        return arrays_bit_identical(fa, fb)
    return a.equals(b)


class Codec:
    """Base codec: encode(pa.Array) -> EncodedChunk, decode -> pa.Array."""

    name: str = "base"

    def encode(self, arr: pa.Array) -> EncodedChunk:  # pragma: no cover
        raise NotImplementedError

    def decode(self, chunk: EncodedChunk) -> pa.Array:  # pragma: no cover
        raise NotImplementedError
