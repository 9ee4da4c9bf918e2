"""Codec registry. ``get_codec(name)`` resolves every codec the engine
emits, including cascades; ``decode_blob`` is the single entry point the
decode pipeline uses on stored page bytes."""

from __future__ import annotations

import pyarrow as pa

from .alp import AlpCodec, AlpRdCodec
from .base import Codec, EncodedChunk, apply_validity, split_validity  # noqa: F401
from .delta import ByteSplitCodec, DeltaBitpackCodec
from .dictionary import DictionaryCodec
from .forbp import ForBitpackCodec
from .fsst import FsstCodec
from .nulls import NullsCodec
from .plain import PlainCodec
from .rle import RleCodec
from .zwrap import ZlibWrapCodec, ZstdWrapCodec


def get_codec(name: str) -> Codec:
    if name.endswith("+zs"):
        return ZstdWrapCodec(get_codec(name[:-3]))
    if name.endswith("+z"):
        return ZlibWrapCodec(get_codec(name[:-2]))
    if name.startswith("list->"):
        from .listwrap import ListCodec
        return ListCodec(get_codec(name[len("list->"):]))
    if name == "plain":
        return PlainCodec()
    if name == "nulls":
        return NullsCodec()
    if name == "dict":
        return DictionaryCodec()
    if name == "dict->fsst":
        return DictionaryCodec(values_codec=FsstCodec())
    if name == "rle":
        return RleCodec()
    if name == "rle->dict":
        return RleCodec(values_codec=DictionaryCodec())
    if name == "rle->dict->fsst":
        return RleCodec(values_codec=DictionaryCodec(values_codec=FsstCodec()))
    if name == "for_bitpack":
        return ForBitpackCodec()
    if name == "delta_bitpack":
        return DeltaBitpackCodec()
    if name == "bytesplit":
        return ByteSplitCodec()
    if name == "alp":
        return AlpCodec()
    if name == "alprd":
        return AlpRdCodec()
    if name == "fsst":
        return FsstCodec()
    if name == "fc":
        from .fc import FrontCodingCodec
        return FrontCodingCodec()
    raise KeyError(f"unknown codec {name!r}")


def decode_blob(blob: bytes) -> pa.Array:
    chunk = EncodedChunk.from_bytes(blob)
    return get_codec(chunk.codec).decode(chunk)


ALL_CODECS = ["plain", "dict", "dict->fsst", "rle", "rle->dict",
              "for_bitpack", "delta_bitpack", "bytesplit", "alp", "alprd",
              "fsst", "fc", "fc+zs", "plain+zs", "dict+zs", "fsst+zs",
              "plain+z"]
