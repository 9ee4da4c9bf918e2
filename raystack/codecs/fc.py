"""Front coding ("fc") for prefix-heavy string/binary columns.

Each value stores only (shared-prefix length vs the previous value,
suffix bytes) — Parquet's DELTA_BYTE_ARRAY idea, classic for sorted or
clustered key columns. On url columns clustered by host (the engine's
partitioning) consecutive rows share long ``https://host/path`` prefixes,
and an encode with ``sort_by="url"`` makes the column near-sorted inside
every page, where front coding approaches its ideal rate.

Both directions are block-vectorized numpy — no per-row Python:

- **encode**: rows scatter into a padded (rows × maxlen) byte matrix;
  one elementwise compare with the row above + ``logical_and.accumulate``
  yields every shared-prefix length at once.
- **decode**: the inverse uses the *writer trick*: byte ``j`` of row ``i``
  was last written by the latest row ``k ≤ i`` whose suffix covers ``j``
  (``prefix_len[k] ≤ j``); ``np.maximum.accumulate`` over the block gives
  that writer for every (row, column) in one pass, then a single fancy
  gather rebuilds the block. A carry row chains blocks.

Blocks are sized to a byte budget so wide values (html) can't blow up the
padded matrix. Prefix/suffix lengths travel bit-packed; suffix bytes are
raw (cascade ``fc+zs`` for an LZ stage over what remains).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import bitpack
from .base import Codec, EncodedChunk, apply_validity, split_validity
from .fsst import _flatten, _rebuild, is_supported

_BLOCK_BUDGET = 4 * 1024 * 1024  # padded-matrix bytes per block (the
# decode writer matrix is int32, 4x this; kept small so allocation churn
# doesn't trigger THP compaction stalls on first touch)
_MAX_BLOCK_ROWS = 4096
_MIN_BLOCK_ROWS = 16


def _block_rows(max_len: int) -> int:
    m = _BLOCK_BUDGET // max(max_len, 1)
    return int(min(_MAX_BLOCK_ROWS, max(_MIN_BLOCK_ROWS, m)))


def _scatter(flat: np.ndarray, starts: np.ndarray, lens: np.ndarray,
             ncols: int) -> np.ndarray:
    """Pack variable-length rows (flat[starts[k]:starts[k]+lens[k]]) into a
    zero-padded (len(lens) × ncols) uint8 matrix, fully vectorized."""
    m = len(lens)
    out = np.zeros((m, ncols), dtype=np.uint8)
    total = int(lens.sum())
    if total:
        rows = np.repeat(np.arange(m), lens)
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
        cols = np.arange(total) - np.repeat(offs, lens)
        src = np.repeat(starts, lens) + cols
        out[rows, cols] = flat[src]
    return out


class FrontCodingCodec(Codec):
    name = "fc"

    def encode(self, arr: pa.Array) -> EncodedChunk:
        t = arr.type
        if not is_supported(t):
            raise TypeError(f"fc does not support {t}")
        validity, filled = split_validity(arr)
        data, lengths = _flatten(filled)
        n = len(lengths)
        offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
        plens = np.zeros(n, dtype=np.int64)
        if n:
            blk = _block_rows(int(lengths.max()))
            carry_start, carry_len = 0, 0  # previous row (empty before row 0)
            for a in range(0, n, blk):
                b = min(a + blk, n)
                lens_b = np.concatenate([[carry_len], lengths[a:b]])
                starts_b = np.concatenate([[carry_start], offsets[a:b]])
                ncols = int(lens_b.max())
                if ncols:
                    mat = _scatter(data, starts_b, lens_b, ncols)
                    eq = np.logical_and.accumulate(mat[1:] == mat[:-1],
                                                   axis=1)
                    full = eq.sum(axis=1)
                else:
                    full = np.zeros(b - a, dtype=np.int64)
                plens[a:b] = np.minimum(
                    full, np.minimum(lens_b[1:], lens_b[:-1]))
                carry_start, carry_len = int(offsets[b - 1]), int(lengths[b - 1])
        slens = lengths - plens
        # suffix byte gather
        total_s = int(slens.sum())
        if total_s:
            s_offs = np.concatenate([[0], np.cumsum(slens)[:-1]])
            cols = np.arange(total_s) - np.repeat(s_offs, slens)
            src = np.repeat(offsets[:-1] + plens, slens) + cols
            sfx = np.ascontiguousarray(data[src]).tobytes()
        else:
            sfx = b""
        wp = bitpack.bits_needed(int(plens.max())) if n else 0
        ws = bitpack.bits_needed(int(slens.max())) if n else 0
        return EncodedChunk(
            codec=self.name, type=t, length=n,
            buffers=[bitpack.pack(plens.astype(np.uint64), wp),
                     bitpack.pack(slens.astype(np.uint64), ws),
                     sfx, validity],
            meta={"wp": wp, "ws": ws})

    def decode(self, chunk: EncodedChunk) -> pa.Array:
        t, n = chunk.type, chunk.length
        plens = bitpack.unpack(chunk.buffers[0], n,
                               chunk.meta["wp"]).astype(np.int64)
        slens = bitpack.unpack(chunk.buffers[1], n,
                               chunk.meta["ws"]).astype(np.int64)
        sfx = np.frombuffer(chunk.buffers[2], dtype=np.uint8)
        lengths = plens + slens
        out = np.empty(int(lengths.sum()), dtype=np.uint8)
        if n:
            s_offsets = np.concatenate([[0], np.cumsum(slens)]).astype(np.int64)
            o_offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
            blk = _block_rows(int(lengths.max()) if len(lengths) else 1)
            carry = np.zeros(0, dtype=np.uint8)
            for a in range(0, n, blk):
                b = min(a + blk, n)
                m = b - a + 1  # + carry row
                p_b = np.concatenate([[0], plens[a:b]])
                s_b = np.concatenate([[len(carry)], slens[a:b]])
                l_b = p_b + s_b
                ncols = int(l_b.max()) if m else 0
                if ncols == 0:
                    continue
                # suffix bytes scatter at ABSOLUTE columns p[k] + t
                suf_mat = np.zeros((m, ncols), dtype=np.uint8)
                tot = int(s_b.sum())
                if tot:
                    rows = np.repeat(np.arange(m), s_b)
                    offs = np.concatenate([[0], np.cumsum(s_b)[:-1]])
                    cols = np.arange(tot) - np.repeat(offs, s_b)
                    flat_src = np.concatenate(
                        [carry, sfx[s_offsets[a]: s_offsets[b]]])
                    suf_mat[rows, np.repeat(p_b, s_b) + cols] = flat_src
                # writer[i, j] = latest row k <= i with p[k] <= j
                grid = np.arange(ncols, dtype=np.int32)[None, :]
                ids = np.arange(m, dtype=np.int32)[:, None]
                writer = np.where(p_b[:, None] <= grid, ids, np.int32(-1))
                np.maximum.accumulate(writer, axis=0, out=writer)
                out_mat = suf_mat[writer, grid]
                # flat-extract rows 1..m (skip carry) up to each length
                lens_x = l_b[1:]
                tot_x = int(lens_x.sum())
                if tot_x:
                    rows_x = np.repeat(np.arange(1, m), lens_x)
                    offs_x = np.concatenate([[0], np.cumsum(lens_x)[:-1]])
                    cols_x = np.arange(tot_x) - np.repeat(offs_x, lens_x)
                    out[o_offsets[a]: o_offsets[b]] = out_mat[rows_x, cols_x]
                last = out_mat[m - 1, : l_b[m - 1]]
                carry = np.ascontiguousarray(last)
        arr = _rebuild(out, lengths, t)
        return apply_validity(arr, chunk.buffers[3], n)
