"""ALP-family float codecs — implemented from the public paper
"ALP: Adaptive Lossless floating-Point Compression" (Afroozeh & Boncz,
SIGMOD 2024), numpy throughout. No code is taken from any existing
implementation; only the published algorithm ideas are used.

- :class:`AlpCodec` (``alp``): decimal-scaled integer transform. Most
  "float" columns in the wild are decimals (prices, ratings, rounded
  measurements): ``v == round(v * 10^k) / 10^k`` for some small ``k``.
  Encode picks the net decimal exponent ``k`` on a deterministic sample,
  stores ``I = rint(v * 10^k)`` frame-of-reference bit-packed, and keeps
  the rare non-conforming values (NaN/inf/true reals/overflow) as
  position+raw-bits exception patches. A TPC-H price column (2 decimals)
  packs to ~3 bytes/value instead of 8.
- :class:`AlpRdCodec` (``alprd``): for "real" doubles (embeddings,
  physical measurements) where no decimal exponent fits. Splits each
  value's bits at position ``r``: the left (sign + exponent + top
  mantissa, ≤16 bits) part clusters heavily and is dictionary-encoded;
  the right ``r`` noise bits are bit-packed raw. Pure bit manipulation —
  lossless for every pattern including NaN payloads, by construction.

Both are bit-identical on decode (the encoder verifies candidates with
the exact decode expression, so float rounding can never desynchronize
encode and decode).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import bitpack
from .base import Codec, EncodedChunk, apply_validity, split_validity

_SAMPLE = 256
_SAFE_INT = float(2 ** 51)  # rint results beyond this lose integer exactness


def is_supported(t: pa.DataType) -> bool:
    return t in (pa.float32(), pa.float64())


def _np_dtypes(t: pa.DataType) -> tuple[np.dtype, np.dtype]:
    """(float dtype, same-width unsigned dtype) for an arrow float type."""
    if t == pa.float64():
        return np.dtype(np.float64), np.dtype(np.uint64)
    return np.dtype(np.float32), np.dtype(np.uint32)


def _stride_sample(v: np.ndarray, k: int = _SAMPLE) -> np.ndarray:
    if len(v) <= k:
        return v
    step = len(v) // k
    return v[:: step][:k]


# ---------------------------------------------------------------------------
# ALP (decimal)
# ---------------------------------------------------------------------------

def _scaled(v64: np.ndarray, k: int) -> np.ndarray:
    """I as float64: rint(v * 10^k). 10^k is exact in float64 for |k|<=22."""
    with np.errstate(over="ignore", invalid="ignore"):
        if k >= 0:
            return np.rint(v64 * (10.0 ** k))
        return np.rint(v64 / (10.0 ** (-k)))


def _unscaled(i64: np.ndarray, k: int) -> np.ndarray:
    """The decode expression: int64 -> float64 values."""
    f = i64.astype(np.float64)
    if k >= 0:
        return f / (10.0 ** k)
    return f * (10.0 ** (-k))


def _alp_pass(v: np.ndarray, k: int, fdt: np.dtype, udt: np.dtype):
    """Return (I int64, ok bool mask) for exponent k over float array v."""
    v64 = v.astype(np.float64, copy=False)
    If = _scaled(v64, k)
    with np.errstate(invalid="ignore"):
        ok = np.isfinite(If) & (np.abs(If) <= _SAFE_INT)
    I = np.where(ok, If, 0.0).astype(np.int64)
    recon64 = _unscaled(I, k)
    recon = recon64.astype(fdt, copy=False) if fdt != np.float64 else recon64
    ok &= recon.view(udt) == v.view(udt)
    return I, ok


class AlpCodec(Codec):
    name = "alp"

    #: net decimal exponents searched (I = rint(v * 10^k))
    _EXPS_F64 = tuple(range(-3, 17))
    _EXPS_F32 = tuple(range(-3, 11))

    def encode(self, arr: pa.Array) -> EncodedChunk:
        t = arr.type
        if not is_supported(t):
            raise TypeError(f"alp does not support {t}")
        fdt, udt = _np_dtypes(t)
        validity, filled = split_validity(arr)
        v = np.ascontiguousarray(np.asarray(filled), dtype=fdt)
        n = len(v)
        exps = self._EXPS_F64 if t == pa.float64() else self._EXPS_F32
        if n == 0:
            return EncodedChunk(codec=self.name, type=t, length=0,
                                buffers=[b"", b"", b"", validity],
                                meta={"k": 0, "ref": 0, "width": 0})
        # pick k on a deterministic stride sample: cost = packed ints +
        # exception patches
        sample = _stride_sample(v)
        exc_bytes = 4 + udt.itemsize
        best_k, best_cost = exps[0], float("inf")
        for k in exps:
            I, ok = _alp_pass(sample, k, fdt, udt)
            n_ok = int(ok.sum())
            if n_ok:
                good = I[ok]
                width = bitpack.bits_needed(int(good.max()) - int(good.min()))
            else:
                width = 0
            cost = width * len(sample) / 8 + (len(sample) - n_ok) * exc_bytes
            if cost < best_cost:
                best_k, best_cost = k, cost
        k = best_k
        I, ok = _alp_pass(v, k, fdt, udt)
        exc_idx = np.flatnonzero(~ok)
        if len(exc_idx) < n:
            fill = int(I[ok][0])
            I[exc_idx] = fill
        ref = int(I.min())
        width = bitpack.bits_needed(int(I.max()) - ref)
        packed = bitpack.pack((I - ref).astype(np.uint64), width)
        exc_pos = exc_idx.astype("<u4").tobytes()
        exc_raw = np.ascontiguousarray(v[exc_idx]).view(udt).astype(
            udt.newbyteorder("<")).tobytes()
        return EncodedChunk(codec=self.name, type=t, length=n,
                            buffers=[packed, exc_pos, exc_raw, validity],
                            meta={"k": k, "ref": ref, "width": width})

    def decode(self, chunk: EncodedChunk) -> pa.Array:
        t, n = chunk.type, chunk.length
        fdt, udt = _np_dtypes(t)
        deltas = bitpack.unpack(chunk.buffers[0], n, chunk.meta["width"])
        vals = deltas.astype(np.int64) + chunk.meta["ref"]
        out64 = _unscaled(vals, chunk.meta["k"])
        out = out64.astype(fdt) if fdt != np.float64 else out64
        exc_pos = np.frombuffer(chunk.buffers[1], dtype="<u4")
        if len(exc_pos):
            raw = np.frombuffer(chunk.buffers[2],
                                dtype=udt.newbyteorder("<")).astype(udt)
            out[exc_pos] = raw.view(fdt)
        arr = pa.array(out, type=t)
        return apply_validity(arr, chunk.buffers[3], n)


# ---------------------------------------------------------------------------
# ALP-RD (real doubles)
# ---------------------------------------------------------------------------

class AlpRdCodec(Codec):
    name = "alprd"

    _DICT_CAP = 1024  # left-part dictionary entries (codes bit-packed)

    def encode(self, arr: pa.Array) -> EncodedChunk:
        t = arr.type
        if not is_supported(t):
            raise TypeError(f"alprd does not support {t}")
        fdt, udt = _np_dtypes(t)
        total_bits = udt.itemsize * 8
        validity, filled = split_validity(arr)
        v = np.ascontiguousarray(np.asarray(filled), dtype=fdt)
        bits = v.view(udt).astype(np.uint64)
        n = len(bits)
        if n == 0:
            return EncodedChunk(codec=self.name, type=t, length=0,
                                buffers=[b"", b"", b"", b"", b"", validity],
                                meta={"r": total_bits - 1, "code_width": 0})
        # choose the split point r on a sample: left width <= 16 so the
        # dictionary entries are uint16
        sample = _stride_sample(bits)
        sn = len(sample)
        best_r, best_cost = total_bits - 1, float("inf")
        for r in range(total_bits - 16, total_bits):
            left = sample >> np.uint64(r)
            c = len(np.unique(left))
            code_width = bitpack.bits_needed(min(c, self._DICT_CAP) - 1)
            exc_est = max(0, c - self._DICT_CAP) / max(c, 1) * sn
            cost = (r + code_width) * sn / 8 + c * 2 + exc_est * 6
            if cost < best_cost:
                best_r, best_cost = r, cost
        r = best_r
        left = (bits >> np.uint64(r)).astype(np.uint16)
        counts = np.bincount(left)
        present = np.flatnonzero(counts)
        # order by (count desc, value asc) — deterministic
        order = np.lexsort((present, -counts[present]))
        dict_vals = present[order][: self._DICT_CAP].astype(np.uint16)
        lut = np.full(1 << 16, -1, dtype=np.int32)
        lut[dict_vals] = np.arange(len(dict_vals), dtype=np.int32)
        codes = lut[left]
        exc_idx = np.flatnonzero(codes < 0)
        codes[exc_idx] = 0
        code_width = bitpack.bits_needed(len(dict_vals) - 1)
        packed_codes = bitpack.pack(codes.astype(np.uint64), code_width)
        right = bits & np.uint64((1 << r) - 1)
        packed_right = bitpack.pack(right, r)
        return EncodedChunk(
            codec=self.name, type=t, length=n,
            buffers=[packed_right, packed_codes,
                     dict_vals.astype("<u2").tobytes(),
                     exc_idx.astype("<u4").tobytes(),
                     left[exc_idx].astype("<u2").tobytes(), validity],
            meta={"r": r, "code_width": code_width})

    def decode(self, chunk: EncodedChunk) -> pa.Array:
        t, n = chunk.type, chunk.length
        fdt, udt = _np_dtypes(t)
        r, code_width = chunk.meta["r"], chunk.meta["code_width"]
        right = bitpack.unpack(chunk.buffers[0], n, r)
        codes = bitpack.unpack(chunk.buffers[1], n, code_width).astype(np.int64)
        dict_vals = np.frombuffer(chunk.buffers[2], dtype="<u2").astype(np.uint16)
        if len(dict_vals) == 0:
            dict_vals = np.zeros(1, dtype=np.uint16)
        left = dict_vals[codes].astype(np.uint64)
        exc_pos = np.frombuffer(chunk.buffers[3], dtype="<u4")
        if len(exc_pos):
            left[exc_pos] = np.frombuffer(chunk.buffers[4],
                                          dtype="<u2").astype(np.uint64)
        bits = (left << np.uint64(r)) | right
        out = bits.astype(udt).view(fdt)
        arr = pa.array(out, type=t)
        return apply_validity(arr, chunk.buffers[5], n)
