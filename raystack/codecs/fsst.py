"""FSST-style string/binary compression: static symbol table, vectorized.

Semantics follow FSST (Boncz, Neumann, Leis: "FSST: Fast Random Access String
Compression", VLDB 2020, public paper): a small static symbol table (≤255
symbols, each ≤8 bytes) is trained on a sample and every value is rewritten
as a sequence of symbol codes, with unmatched bytes passed through as
literals. The implementation is numpy-vectorized: symbols are built by
iterative rounds of byte-pair merging (so a round-3 symbol covers up to 8
source bytes), encoding applies each round's merge table with a greedy
non-overlapping vectorized pass, and the final token stream (256 literal ids
+ ≤255 symbol ids) is bit-packed. Decode expands tokens through a flat
symbol-bytes buffer with a repeat/gather — bit-identical, no per-row Python.

The whole column chunk is one concatenated byte buffer; per-value offsets are
stored as FOR+bit-packed lengths, so symbols may span value boundaries
without affecting losslessness (offsets slice the reconstructed buffer).
Targets ``url`` / ``text`` (and dictionary values via the dict->fsst cascade,
SURVEY.md §2.10).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import bitpack
from .base import Codec, EncodedChunk, apply_validity, split_validity

_LITERALS = 256
_MAX_SYMBOL_LEN = 8
_SAMPLE_BYTES = 1 << 18
_MIN_COUNT = 4
_ROUNDS = 6


# ---------------------------------------------------------------------------
# symbol table
# ---------------------------------------------------------------------------

_KEY_BITS = 10  # token ids < 1024 (256 literals + ≤255 symbols)


def _pair_lut(pairs: list[tuple[int, int]], first_id: int) -> np.ndarray:
    """Direct-index lookup table: (left << 10 | right) -> new id, else -1."""
    lut = np.full(1 << (2 * _KEY_BITS), -1, dtype=np.int32)
    for i, (l, r) in enumerate(pairs):
        lut[(l << _KEY_BITS) | r] = first_id + i
    return lut


def _apply_merges(tokens: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """One greedy non-overlapping merge pass via direct LUT gather."""
    if len(tokens) < 2:
        return tokens
    t32 = tokens.astype(np.int32)
    keys = (t32[:-1] << _KEY_BITS) | t32[1:]
    ids = lut[keys]
    midx = np.flatnonzero(ids >= 0)
    if len(midx) == 0:
        return tokens
    # greedy left-to-right: within each run of consecutive match positions,
    # keep every other one (a merge consumes position i and i+1)
    gap = np.diff(midx) > 1
    run_id = np.concatenate([[0], np.cumsum(gap)])
    run_first = np.concatenate([[0], np.flatnonzero(gap) + 1])
    within = np.arange(len(midx)) - run_first[run_id]
    sel = midx[within % 2 == 0]
    out = tokens.copy()
    out[sel] = ids[sel].astype(tokens.dtype)
    keep = np.ones(len(tokens), dtype=bool)
    keep[sel + 1] = False
    return out[keep]


class SymbolTable:
    """merges: flat list of (left, right) token-id pairs; id of merges[i] is
    256+i. ``round_sizes`` partitions the list into encode passes."""

    def __init__(self, merges: list[tuple[int, int]], round_sizes: list[int]):
        self.merges = merges
        self.round_sizes = round_sizes
        # expansion table: flat byte buffer + (offset, length) per token id
        sym: list[bytes] = [bytes([i]) for i in range(_LITERALS)]
        for left, right in merges:
            sym.append(sym[left] + sym[right])
        flat = b"".join(sym)
        lens = np.array([len(s) for s in sym], dtype=np.int64)
        self._flat = np.frombuffer(flat, dtype=np.uint8)
        self._lens = lens
        self._offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
        # per-round LUTs for encoding (built once, reused for every chunk)
        self._rounds: list[np.ndarray] = []
        start = 0
        for size in round_sizes:
            self._rounds.append(_pair_lut(merges[start:start + size],
                                          _LITERALS + start))
            start += size

    @property
    def n_tokens(self) -> int:
        return _LITERALS + len(self.merges)

    @property
    def token_width(self) -> int:
        return bitpack.bits_needed(max(1, self.n_tokens - 1))

    def to_meta(self) -> dict:
        return {"merges": [[l, r] for l, r in self.merges],
                "rounds": self.round_sizes}

    @classmethod
    def from_meta(cls, meta: dict) -> "SymbolTable":
        return cls([tuple(p) for p in meta["merges"]], list(meta["rounds"]))

    # -- train ------------------------------------------------------------
    @classmethod
    def train(cls, sample: np.ndarray, max_symbols: int = 255,
              rounds: int = _ROUNDS, min_count: int = _MIN_COUNT) -> "SymbolTable":
        tokens = sample.astype(np.uint16)
        merges: list[tuple[int, int]] = []
        round_sizes: list[int] = []
        sym_len = np.ones(_LITERALS + max_symbols, dtype=np.int64)
        for r in range(rounds):
            remaining = max_symbols - len(merges)
            if remaining <= 0 or len(tokens) < 2:
                break
            quota = max(1, remaining // (rounds - r))
            keys = (tokens[:-1].astype(np.uint32) << np.uint32(16)) | tokens[1:]
            uniq, counts = np.unique(keys, return_counts=True)
            order = np.argsort(counts)[::-1]
            picked: list[tuple[int, int]] = []
            # scan at most 8x the quota — beyond that the counts are too low
            # to matter and the Python loop would walk millions of pairs
            for i in order[:max(quota * 8, 256)]:
                if counts[i] < min_count or len(picked) >= quota:
                    break
                left = int(uniq[i] >> 16)
                right = int(uniq[i] & 0xFFFF)
                if sym_len[left] + sym_len[right] > _MAX_SYMBOL_LEN:
                    continue
                picked.append((left, right))
            if not picked:
                break
            for left, right in picked:
                sym_len[_LITERALS + len(merges)] = sym_len[left] + sym_len[right]
                merges.append((left, right))
            round_sizes.append(len(picked))
            lut = _pair_lut(picked, _LITERALS + len(merges) - len(picked))
            tokens = _apply_merges(tokens, lut)
        return cls(merges, round_sizes)

    # -- encode / decode one byte buffer ----------------------------------
    def encode_tokens(self, data: np.ndarray) -> np.ndarray:
        tokens = data.astype(np.uint16)
        for lut in self._rounds:
            tokens = _apply_merges(tokens, lut)
        return tokens

    def decode_tokens(self, tokens: np.ndarray) -> np.ndarray:
        if len(tokens) == 0:
            return np.zeros(0, dtype=np.uint8)
        t = tokens.astype(np.int64)
        lens = self._lens[t]
        starts = self._offs[t]
        total = int(lens.sum())
        out_off = np.concatenate([[0], np.cumsum(lens)[:-1]])
        idx = np.repeat(starts - out_off, lens) + np.arange(total)
        return self._flat[idx]


def _train_sample(data: np.ndarray, limit: int = _SAMPLE_BYTES) -> np.ndarray:
    """Deterministic sample: 16 evenly-spaced slices totaling ≤limit bytes."""
    if len(data) <= limit:
        return data
    k = 16
    step = len(data) // k
    take = limit // k
    parts = [data[i * step: i * step + take] for i in range(k)]
    return np.concatenate(parts)


# ---------------------------------------------------------------------------
# codec over string/binary arrays
# ---------------------------------------------------------------------------

def _flatten(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Return (data bytes uint8, per-value lengths int64) of a string/binary
    array with no nulls."""
    lb = pc.cast(arr, pa.large_binary())
    bufs = lb.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int64)[lb.offset: lb.offset + len(lb) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8)[off[0]: off[-1]] if bufs[2] is not None \
        else np.zeros(0, dtype=np.uint8)
    return data, np.diff(off)


def _rebuild(data: np.ndarray, lengths: np.ndarray, t: pa.DataType) -> pa.Array:
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
    arr = pa.Array.from_buffers(
        pa.large_binary(), len(lengths),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())])
    return pc.cast(arr, t) if t != pa.large_binary() else arr


def is_supported(t: pa.DataType) -> bool:
    return (pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t) or pa.types.is_large_binary(t))


class FsstCodec(Codec):
    name = "fsst"

    def __init__(self, table: SymbolTable | None = None):
        self.table = table  # pre-trained (per-partition) or per-chunk

    def encode(self, arr: pa.Array) -> EncodedChunk:
        if not is_supported(arr.type):
            raise TypeError(f"fsst does not support {arr.type}")
        validity, filled = split_validity(arr)
        if isinstance(filled, pa.ChunkedArray):
            filled = filled.combine_chunks()
        data, lengths = _flatten(filled)
        table = self.table or SymbolTable.train(_train_sample(data))
        tokens = table.encode_tokens(data)
        width = table.token_width
        packed = bitpack.pack(tokens.astype(np.uint64), width)
        len_ref = int(lengths.min()) if len(lengths) else 0
        len_width = bitpack.bits_needed(int(lengths.max() - len_ref)) if len(lengths) else 0
        packed_lens = bitpack.pack((lengths - len_ref).astype(np.uint64), len_width)
        return EncodedChunk(
            codec=self.name, type=arr.type, length=len(arr),
            buffers=[packed, packed_lens, validity],
            meta={"table": table.to_meta(), "n_tokens": int(len(tokens)),
                  "token_width": width, "len_ref": len_ref, "len_width": len_width})

    def decode(self, chunk: EncodedChunk) -> pa.Array:
        table = SymbolTable.from_meta(chunk.meta["table"])
        tokens = bitpack.unpack(chunk.buffers[0], chunk.meta["n_tokens"],
                                chunk.meta["token_width"])
        data = table.decode_tokens(tokens)
        lengths = (bitpack.unpack(chunk.buffers[1], chunk.length,
                                  chunk.meta["len_width"]).astype(np.int64)
                   + chunk.meta["len_ref"])
        arr = _rebuild(data, lengths, chunk.type)
        return apply_validity(arr, chunk.buffers[2], chunk.length)
