"""Baseline JPEG decode + encode, library-free (stdlib + numpy).

Completes the :mod:`raystack.ops.multimodal` real-decoder tier with the
most common web-crawl image format. Everything here follows the
published JPEG standard (ITU-T T.81):

- :func:`decode_jpeg` — sequential DCT (SOF0/SOF1) AND progressive
  (SOF2, huffman: spectral selection + successive approximation per
  Annex G — multi-scan coefficient accumulation, EOB runs, refinement
  correction bits, per-scan restart markers), 8-bit samples, grayscale
  or YCbCr, any integer subsampling (4:4:4 / 4:2:2 / 4:2:0 / 4:4:0),
  DRI/RSTn. Arithmetic coding, 12-bit, lossless, hierarchical and
  CMYK streams raise ``ValueError`` — never wrong pixels. The hot
  loops are numpy: huffman decoding uses a flat 16-bit prefix LUT per
  table, and dequantize + IDCT + plane assembly run as single
  vectorized einsum/matmul passes over every block at once.
- :func:`encode_jpeg` — the fixture writer (inverse path): Annex K
  quantization tables scaled by the IJG quality formula, Annex K
  standard huffman tables, 4:4:4 or 4:2:0, optional restart markers.
  Entropy coding is lossless, so two encodes of the same image that
  differ only in ``restart_interval`` must decode bit-identically —
  the tests assert exactly that.
- :func:`encode_jpeg_progressive` — progressive fixture writer with a
  parameterized scan script (DC/AC successive-approximation depths,
  spectral band split, EOB-run cap, restarts). Both entropy layers
  are lossless over the same quantized coefficients, so progressive
  and baseline encodes of an image must DECODE identically — the
  tests assert pixel equality plus a coefficient-level property
  sweep.

Reference semantics parity: the reference repo has no media decode at
all; this is graft capability (multimodal binary columns for a
training-data pipeline, see SURVEY.md §2 "multimodal").
"""

from __future__ import annotations

import struct

import numpy as np

# row-major index of each position in zigzag scan order (T.81 Figure A.6)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], np.int64)

# Annex K.1 example quantization tables (row-major)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int64)

# Annex K.3 typical huffman tables: (bits[1..16], values)
HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
HUFF_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa])
HUFF_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa])


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis matrix ``C``: forward DCT is
    ``C @ block @ C.T``, inverse is ``C.T @ coef @ C``."""
    n = np.arange(8)
    C = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    C *= np.sqrt(2.0 / 8.0)
    C[0] *= np.sqrt(0.5)
    return C


_DCT_C = _dct_basis()

# JPEG "modes of operation" SOFn codes this decoder refuses (T.81 Table B.1)
_SOF_UNSUPPORTED = {
    0xC3: "lossless", 0xC5: "differential sequential",
    0xC6: "differential progressive", 0xC7: "differential lossless",
    0xC9: "arithmetic sequential", 0xCA: "arithmetic progressive",
    0xCB: "arithmetic lossless", 0xCD: "differential arithmetic sequential",
    0xCE: "differential arithmetic progressive",
    0xCF: "differential arithmetic lossless",
}


def _build_huff_lut(bits, vals):
    """Canonical huffman table → flat 16-bit-prefix lookup arrays
    ``(symbol, code_length)``; one vectorized peek per decoded symbol."""
    lut_sym = np.full(1 << 16, -1, np.int16)
    lut_len = np.zeros(1 << 16, np.uint8)
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            if k >= len(vals) or code >= (1 << ln):
                raise ValueError("corrupt huffman table")
            lo = code << (16 - ln)
            hi = lo + (1 << (16 - ln))
            lut_sym[lo:hi] = vals[k]
            lut_len[lo:hi] = ln
            code += 1
            k += 1
        code <<= 1
    return lut_sym, lut_len


class _BitReader:
    """MSB-first bit reader over one destuffed entropy segment; reads
    past the end see zero bits (the spec's 1-padding only ever pads the
    final EOB, which we never over-read because MCU counts are known)."""

    __slots__ = ("d", "i", "acc", "n")

    def __init__(self, d: bytes):
        self.d = d
        self.i = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        self.acc &= (1 << self.n) - 1
        while self.n <= 24:
            b = self.d[self.i] if self.i < len(self.d) else 0
            self.i += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def peek16(self) -> int:
        if self.n < 16:
            self._fill()
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def skip(self, k: int):
        self.n -= k

    def receive(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill()
        self.n -= k
        return (self.acc >> self.n) & ((1 << k) - 1)


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude code."""
    return v - ((1 << t) - 1) if v < (1 << (t - 1)) else v


def _hdecode(br: _BitReader, lut_sym, lut_len) -> int:
    v = br.peek16()
    ln = lut_len[v]
    if ln == 0:
        raise ValueError("bad huffman code in JPEG entropy stream")
    br.skip(int(ln))
    return int(lut_sym[v])


def _decode_block(br, dc_lut, ac_lut, out, pred):
    """Entropy-decode one 8×8 block into ``out`` (row-major, dezigzagged
    at write time). Returns the new DC prediction."""
    t = _hdecode(br, *dc_lut)
    pred += _extend(br.receive(t), t) if t else 0
    out[0] = pred
    k = 1
    while k < 64:
        rs = _hdecode(br, *ac_lut)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC coefficient index out of range")
        out[ZIGZAG[k]] = _extend(br.receive(s), s)
        k += 1
    return pred


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → ``(h, w, 1|3)`` uint8 array (gray / RGB) — REAL
    decode, stdlib + numpy only, per the published JPEG standard
    (ITU-T T.81). See the module docstring for the supported envelope;
    anything outside it raises ``ValueError`` instead of producing
    wrong pixels."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    i = 2
    qt = {}
    hdc = {}
    hac = {}
    dri = 0
    sof = None
    scan = None
    progressive = False
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise ValueError("JPEG marker expected")
        while i < n and payload[i] == 0xFF:
            i += 1  # fill bytes
        if i >= n:
            raise ValueError("truncated JPEG")
        code = payload[i]
        i += 1
        if code == 0xD9:
            raise ValueError("JPEG EOI before any scan")
        if code == 0x01 or 0xD0 <= code <= 0xD7:
            continue  # standalone markers
        if i + 2 > n:
            raise ValueError("truncated JPEG segment")
        (ln,) = struct.unpack_from(">H", payload, i)
        seg = payload[i + 2: i + ln]
        if len(seg) != ln - 2:
            raise ValueError("truncated JPEG segment")
        i += ln
        if code in (0xC0, 0xC1, 0xC2):  # sequential huffman / progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"JPEG precision {prec} unsupported")
            if h == 0 or w == 0:
                raise ValueError("bad JPEG dimensions")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 1 + 5 + c * 3)
                comps.append((cid, hv >> 4, hv & 15, tq))
            sof = (h, w, comps)
            progressive = code == 0xC2
        elif code in _SOF_UNSUPPORTED:
            raise ValueError(
                f"JPEG {_SOF_UNSUPPORTED[code]} mode unsupported "
                "(baseline sequential only)")
        elif code == 0xC4:  # DHT — may carry several tables
            p = 0
            while p < len(seg):
                tc_th = seg[p]
                bits = list(seg[p + 1: p + 17])
                nvals = sum(bits)
                vals = list(seg[p + 17: p + 17 + nvals])
                if len(vals) != nvals:
                    raise ValueError("truncated DHT")
                lut = _build_huff_lut(bits, vals)
                (hdc if (tc_th >> 4) == 0 else hac)[tc_th & 15] = lut
                p += 17 + nvals
        elif code == 0xDB:  # DQT — may carry several tables
            p = 0
            while p < len(seg):
                pq, tq_ = seg[p] >> 4, seg[p] & 15
                if pq == 0:
                    tab = np.frombuffer(seg, np.uint8, 64, p + 1) \
                        .astype(np.int64)
                    p += 65
                else:
                    tab = np.frombuffer(seg, ">u2", 64, p + 1) \
                        .astype(np.int64)
                    p += 129
                dz = np.zeros(64, np.int64)
                dz[ZIGZAG] = tab  # store row-major
                qt[tq_] = dz
        elif code == 0xDD:
            (dri,) = struct.unpack(">H", seg)
        elif code == 0xDA:  # SOS
            ns = seg[0]
            sel = []
            for c in range(ns):
                cs, tdta = struct.unpack_from(">BB", seg, 1 + c * 2)
                sel.append((cs, tdta >> 4, tdta & 15))
            ss, se, ahal = struct.unpack_from(">BBB", seg, 1 + ns * 2)
            scan = (sel, ss, se, ahal >> 4, ahal & 15)
            break
        # APPn / COM / DNL etc.: skipped
    if sof is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps = sof
    if len(comps) not in (1, 3):
        raise ValueError(f"{len(comps)}-component JPEG unsupported")

    if progressive:
        return _decode_progressive(payload, i, qt, hdc, hac, dri, sof, scan)
    scan = scan[0]  # baseline: only the component selectors matter

    # destuff entropy data, split at restart markers
    segments, i = _destuff(payload, i)

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("bad JPEG sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    geo = []  # per component: (H, V, blocks_wide, coef array)
    for cid, H, V, tq_ in comps:
        if hmax % H or vmax % V:
            raise ValueError("non-integer JPEG subsampling ratio")
        bw = mcux * H
        bh = mcuy * V
        geo.append((H, V, bw, np.zeros((bh * bw, 64), np.int32)))
    # scan selector order must follow frame component order (baseline
    # interleaved single-scan)
    by_id = {c[0]: k for k, c in enumerate(comps)}
    order = []
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError("SOS references unknown component")
        k = by_id[cs]
        if td not in hdc or ta not in hac:
            raise ValueError("SOS references missing huffman table")
        order.append((k, hdc[td], hac[ta]))
    if len(order) != len(comps):
        raise ValueError("partial (non-interleaved) JPEG scan unsupported")

    total = mcux * mcuy
    per_seg = dri if dri else total
    br = _BitReader(bytes(segments[0]))
    seg_idx = 0
    preds = [0] * len(comps)
    for mcu in range(total):
        if mcu and mcu % per_seg == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("JPEG restart segment missing")
            br = _BitReader(bytes(segments[seg_idx]))
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for k, dc_lut, ac_lut in order:
            H, V, bw, coefs = geo[k]
            for v in range(V):
                for hh in range(H):
                    bi = (my * V + v) * bw + (mx * H + hh)
                    preds[k] = _decode_block(br, dc_lut, ac_lut,
                                             coefs[bi], preds[k])

    return _reconstruct(comps, geo, qt, h, w, hmax, vmax)


def _destuff(payload: bytes, i: int):
    """Destuff one scan's entropy data starting at ``i``, split at
    restart markers. Returns ``(segments, i_after)`` with ``i_after``
    pointing at the 0xFF of the terminating marker."""
    n = len(payload)
    segments = [bytearray()]
    while i < n:
        b = payload[i]
        if b != 0xFF:
            segments[-1].append(b)
            i += 1
            continue
        m = payload[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            segments[-1].append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segments.append(bytearray())
            i += 2
        else:
            break  # EOI or next real marker
    return segments, i


def _reconstruct(comps, geo, qt, h, w, hmax, vmax) -> np.ndarray:
    """Shared decoder tail: dequantize + IDCT + assemble + upsample,
    vectorized per component. ``geo`` holds per-component
    ``(H, V, blocks_wide, (nblocks, 64) int32 coefficients)``."""
    planes = []
    for (cid, H, V, tq_), (H2, V2, bw, coefs) in zip(comps, geo):
        if tq_ not in qt:
            raise ValueError("SOF references missing quant table")
        blocks = (coefs.astype(np.float64) * qt[tq_]).reshape(-1, 8, 8)
        spatial = np.einsum("ij,bjk,kl->bil", _DCT_C.T, blocks, _DCT_C)
        bh = blocks.shape[0] // bw
        plane = spatial.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(bh * 8, bw * 8)
        plane = np.clip(np.round(plane) + 128.0, 0, 255)
        cw = -(-w * H // hmax)
        ch = -(-h * V // vmax)
        plane = plane[:ch, :cw]
        if H != hmax or V != vmax:
            plane = plane.repeat(vmax // V, 0).repeat(hmax // H, 1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0].astype(np.uint8)[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive mode (SOF2, huffman): T.81 Annex G — spectral selection +
# successive approximation, multi-scan coefficient accumulation
# ---------------------------------------------------------------------------

def _ac_first_block(br, ac_lut, coef, ss, se, al, eobrun):
    """AC first scan (Ah=0) for one block (T.81 G.2.2): run/size coding
    of the band's point-transformed coefficients with end-of-band runs.
    Returns the new ``eobrun``."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _hdecode(br, *ac_lut)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r < 15:  # EOBn
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.receive(r)
                break
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("JPEG AC coefficient index out of band")
            coef[ZIGZAG[k]] = _extend(br.receive(s), s) << al
            k += 1
    return eobrun


def _ac_refine_block(br, ac_lut, coef, ss, se, al, eobrun):
    """AC refinement scan (Ah=Al+1) for one block (T.81 G.1.2.3):
    newly-significant coefficients arrive as ±1<<Al; every already-
    nonzero coefficient passed on the way receives one correction bit.
    Returns the new ``eobrun``."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _hdecode(br, *ac_lut)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:  # EOBn — includes THIS block
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                val = 0  # ZRL: 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad JPEG AC refinement code")
                val = p1 if br.receive(1) else m1
            # advance over r zero-history slots, applying correction
            # bits to every nonzero-history coefficient on the way
            while k <= se:
                z = ZIGZAG[k]
                if coef[z] != 0:
                    if br.receive(1) and (coef[z] & p1) == 0:
                        coef[z] += p1 if coef[z] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val != 0:
                if k > se:
                    raise ValueError("JPEG AC refinement overruns band")
                coef[ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # tail of the current block: corrections only
            z = ZIGZAG[k]
            if coef[z] != 0:
                if br.receive(1) and (coef[z] & p1) == 0:
                    coef[z] += p1 if coef[z] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(payload, i, qt, hdc, hac, dri, sof, scan):
    """Multi-scan progressive decode loop: each SOS refines the shared
    per-component coefficient arrays; reconstruction happens once at
    EOI. Entry: ``i`` points at the first scan's entropy data and
    ``scan`` holds its parsed header."""
    h, w, comps = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("bad JPEG sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    geo = []  # (H, V, padded blocks_wide, nbw, nbh, coefs)
    for cid, H, V, tq_ in comps:
        if hmax % H or vmax % V:
            raise ValueError("non-integer JPEG subsampling ratio")
        bw = mcux * H
        bh = mcuy * V
        cw = -(-w * H // hmax)
        ch = -(-h * V // vmax)
        geo.append((H, V, bw, -(-cw // 8), -(-ch // 8),
                    np.zeros((bh * bw, 64), np.int32)))
    by_id = {c[0]: k for k, c in enumerate(comps)}

    n = len(payload)
    while True:
        segments, i = _destuff(payload, i)
        _prog_scan(scan, segments, geo, hdc, hac, dri, mcux, mcuy, by_id)
        # markers between scans: DHT/DQT/DRI may change, next SOS or EOI
        scan = None
        while i < n:
            while i < n and payload[i] == 0xFF:
                i += 1
            if i >= n:
                break
            code = payload[i]
            i += 1
            if code == 0xD9:  # EOI
                break
            if code == 0x01 or 0xD0 <= code <= 0xD7:
                continue
            if i + 2 > n:
                raise ValueError("truncated JPEG segment")
            (ln,) = struct.unpack_from(">H", payload, i)
            seg = payload[i + 2: i + ln]
            if len(seg) != ln - 2:
                raise ValueError("truncated JPEG segment")
            i += ln
            if code == 0xC4:
                p = 0
                while p < len(seg):
                    tc_th = seg[p]
                    bits = list(seg[p + 1: p + 17])
                    nvals = sum(bits)
                    vals = list(seg[p + 17: p + 17 + nvals])
                    if len(vals) != nvals:
                        raise ValueError("truncated DHT")
                    lut = _build_huff_lut(bits, vals)
                    (hdc if (tc_th >> 4) == 0 else hac)[tc_th & 15] = lut
                    p += 17 + nvals
            elif code == 0xDB:
                p = 0
                while p < len(seg):
                    pq, tq_ = seg[p] >> 4, seg[p] & 15
                    if pq == 0:
                        tab = np.frombuffer(seg, np.uint8, 64, p + 1) \
                            .astype(np.int64)
                        p += 65
                    else:
                        tab = np.frombuffer(seg, ">u2", 64, p + 1) \
                            .astype(np.int64)
                        p += 129
                    dz = np.zeros(64, np.int64)
                    dz[ZIGZAG] = tab
                    qt[tq_] = dz
            elif code == 0xDD:
                (dri,) = struct.unpack(">H", seg)
            elif code == 0xDA:
                ns = seg[0]
                sel = []
                for c in range(ns):
                    cs, tdta = struct.unpack_from(">BB", seg, 1 + c * 2)
                    sel.append((cs, tdta >> 4, tdta & 15))
                ss, se, ahal = struct.unpack_from(">BBB", seg, 1 + ns * 2)
                scan = (sel, ss, se, ahal >> 4, ahal & 15)
                break
            elif code in (0xC0, 0xC1, 0xC2) or code in _SOF_UNSUPPORTED:
                raise ValueError("second SOF in JPEG stream")
            # APPn / COM: skipped
        if scan is None:
            break

    geo_out = [(H, V, bw, coefs) for H, V, bw, _, _, coefs in geo]
    return _reconstruct(comps, geo_out, qt, h, w, hmax, vmax)


def _prog_scan(scan, segments, geo, hdc, hac, dri, mcux, mcuy, by_id):
    """Decode one progressive scan into the coefficient arrays."""
    sel, ss, se, ah, al = scan
    if ss > 63 or se > 63 or se < ss:
        raise ValueError("bad JPEG spectral band")
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("progressive JPEG scan mixes DC and AC")
    if not is_dc and len(sel) != 1:
        raise ValueError("progressive JPEG AC scan must be single-component")
    order = []
    for cs, td, ta in sel:
        if cs not in by_id:
            raise ValueError("SOS references unknown component")
        k = by_id[cs]
        if is_dc and ah == 0 and td not in hdc:
            raise ValueError("SOS references missing huffman table")
        if not is_dc and ta not in hac:
            raise ValueError("SOS references missing huffman table")
        order.append((k, hdc.get(td), hac.get(ta)))

    interleaved = len(sel) > 1
    if interleaved:
        total = mcux * mcuy
    else:
        k0 = order[0][0]
        total = geo[k0][3] * geo[k0][4]  # nbw * nbh
    per_seg = dri if dri else total

    br = _BitReader(bytes(segments[0]))
    seg_idx = 0
    preds = {k: 0 for k, _, _ in order}
    eobrun = 0
    for unit in range(total):
        if unit and unit % per_seg == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("JPEG restart segment missing")
            br = _BitReader(bytes(segments[seg_idx]))
            preds = {k: 0 for k, _, _ in order}
            eobrun = 0
        if interleaved:  # DC scan over MCUs
            my, mx = divmod(unit, mcux)
            for k, dc_lut, _ in order:
                H, V, bw, _, _, coefs = geo[k]
                for v in range(V):
                    for hh in range(H):
                        bi = (my * V + v) * bw + (mx * H + hh)
                        preds[k] = _dc_prog_block(
                            br, dc_lut, coefs[bi], ah, al, preds[k])
        else:
            k, dc_lut, ac_lut = order[0]
            H, V, bw, nbw, nbh, coefs = geo[k]
            bi = (unit // nbw) * bw + (unit % nbw)
            if is_dc:
                preds[k] = _dc_prog_block(br, dc_lut, coefs[bi], ah, al,
                                          preds[k])
            elif ah == 0:
                eobrun = _ac_first_block(br, ac_lut, coefs[bi], ss, se,
                                         al, eobrun)
            else:
                eobrun = _ac_refine_block(br, ac_lut, coefs[bi], ss, se,
                                          al, eobrun)


def _dc_prog_block(br, dc_lut, coef, ah, al, pred):
    """DC coefficient, first (Ah=0: diff coding of the point-transformed
    value) or refinement (one raw bit) pass."""
    if ah == 0:
        t = _hdecode(br, *dc_lut)
        pred += _extend(br.receive(t), t) if t else 0
        coef[0] = pred << al
    else:
        if br.receive(1):
            coef[0] |= 1 << al
    return pred


# ---------------------------------------------------------------------------
# encoder (fixture writer — inverse path)
# ---------------------------------------------------------------------------

class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing (T.81 B.1.1.5)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, ln: int):
        self.acc = (self.acc << ln) | code
        self.n += ln
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0)
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _huff_encode_table(bits, vals):
    """Canonical table → {symbol: (code, length)}."""
    enc = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            enc[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return enc


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality→quant-table scaling."""
    q = min(max(int(quality), 1), 100)
    sf = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * sf + 50) // 100, 1, 255).astype(np.int64)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw_, blk_zz, pred, dc_enc, ac_enc):
    """Huffman-encode one quantized block (zigzag order). Returns the
    new DC prediction."""
    diff = int(blk_zz[0]) - pred
    t = _category(diff)
    code, ln = dc_enc[t]
    bw_.write(code, ln)
    if t:
        bw_.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    nz = np.nonzero(blk_zz[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(blk_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            bw_.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_enc[(run << 4) | s]
        bw_.write(code, ln)
        bw_.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_enc[0x00]  # EOB
        bw_.write(code, ln)
    return int(blk_zz[0])


def _plane_to_blocks(plane: np.ndarray, bw: int, bh: int) -> np.ndarray:
    """Edge-pad a float plane to ``(bh*8, bw*8)`` and cut into
    ``(bh*bw, 64)`` row-major blocks (MCU scan order handled by caller)."""
    h, w = plane.shape
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    return padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) \
        .reshape(bh * bw, 8, 8)


_SUBSAMPLE_LUMA = {"444": (1, 1), "422": (2, 1), "440": (1, 2),
                   "420": (2, 2)}


def _quantize_planes(img: np.ndarray, quality: int, subsample):
    """Shared encoder front: color transform + subsample + forward DCT +
    quantize. Returns ``(quantized, samps, qids, qtabs, h, w, mcux,
    mcuy)`` with ``quantized`` per-component ``(H, V, blocks_wide,
    (nblocks, 64) int32 zigzag coefficients)``."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    if nch not in (1, 3):
        raise ValueError("encode_jpeg wants gray or RGB input")
    if nch == 1:
        planes = [img[:, :, 0].astype(np.float64)]
        samps = [(1, 1)]
        qids = [0]
        hids = [(0, 0)]
        qtabs = [_quality_scale(QUANT_LUMA, quality)]
    else:
        rgb = img.astype(np.float64)
        y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
             + 0.114 * rgb[..., 2])
        cb = (-0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1]
              + 0.5 * rgb[..., 2] + 128.0)
        cr = (0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1]
              - 0.081312 * rgb[..., 2] + 128.0)
        mode = {False: "444", True: "420"}.get(subsample, subsample)
        if mode not in _SUBSAMPLE_LUMA:
            raise ValueError(f"unknown subsample mode {subsample!r}")
        sh, sv = _SUBSAMPLE_LUMA[mode]
        if (sh, sv) != (1, 1):
            # box-average sh×sv (pad with edge replication first)
            def dsx(p):
                ph = np.pad(p, ((0, -p.shape[0] % sv), (0, -p.shape[1] % sh)),
                            mode="edge")
                return ph.reshape(ph.shape[0] // sv, sv,
                                  ph.shape[1] // sh, sh).mean(axis=(1, 3))
            planes = [y, dsx(cb), dsx(cr)]
            samps = [(sh, sv), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]
        qids = [0, 1, 1]
        hids = [(0, 0), (1, 1), (1, 1)]
        qtabs = [_quality_scale(QUANT_LUMA, quality),
                 _quality_scale(QUANT_CHROMA, quality)]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # forward DCT + quantize, vectorized per component
    quantized = []  # (H, V, bw, (nblocks, 64) int32 in zigzag order)
    for plane, (H, V), qid in zip(planes, samps, qids):
        bw = mcux * H
        bh = mcuy * V
        blocks = _plane_to_blocks(plane - 128.0, bw, bh)
        coefs = np.einsum("ij,bjk,kl->bil", _DCT_C, blocks, _DCT_C.T)
        qz = np.round(coefs.reshape(-1, 64) / qtabs[qid]) \
            .astype(np.int32)[:, ZIGZAG]
        quantized.append((H, V, bw, qz))
    return quantized, samps, qids, qtabs, h, w, mcux, mcuy


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample=False, restart_interval: int = 0) -> bytes:
    """(h, w[, 1|3]) uint8 gray/RGB → baseline JPEG bytes (fixture
    writer; lossy inverse of :func:`decode_jpeg`). ``subsample`` is
    ``False``/``"444"``, ``True``/``"420"``, ``"422"`` or ``"440"``
    (chroma box-averaged by the luma sampling factor);
    ``restart_interval`` emits DRI + RSTn markers so tests can exercise
    the decoder's restart path."""
    quantized, samps, qids, qtabs, h, w, mcux, mcuy = \
        _quantize_planes(img, quality, subsample)
    hids = ([(0, 0)] if len(quantized) == 1
            else [(0, 0), (1, 1), (1, 1)])

    dc_tabs = [_huff_encode_table(*HUFF_DC_LUMA),
               _huff_encode_table(*HUFF_DC_CHROMA)]
    ac_tabs = [_huff_encode_table(*HUFF_AC_LUMA),
               _huff_encode_table(*HUFF_AC_CHROMA)]

    bw_ = _BitWriter()
    entropy = bytearray()
    preds = [0] * len(quantized)
    total = mcux * mcuy
    for mcu in range(total):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw_.flush()
            entropy += bw_.out
            entropy += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1)
                                            & 7)])
            bw_ = _BitWriter()
            preds = [0] * len(quantized)
        my, mx = divmod(mcu, mcux)
        for k, (H, V, bwk, qz) in enumerate(quantized):
            td, ta = hids[k]
            for v in range(V):
                for hh in range(H):
                    bi = (my * V + v) * bwk + (mx * H + hh)
                    preds[k] = _encode_block(bw_, qz[bi], preds[k],
                                             dc_tabs[td], ac_tabs[ta])
    bw_.flush()
    entropy += bw_.out

    def seg(code: int, body: bytes) -> bytes:
        return bytes([0xFF, code]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for qid, tab in enumerate(qtabs):
        out += seg(0xDB, bytes([qid])
                   + bytes(int(x) for x in tab[ZIGZAG]))
    sof_body = struct.pack(">BHHB", 8, h, w, len(quantized))
    for k, (H, V) in enumerate(samps):
        sof_body += bytes([k + 1, (H << 4) | V, qids[k]])
    out += seg(0xC0, sof_body)
    huff_sets = {(0, 0): HUFF_DC_LUMA, (0, 1): HUFF_DC_CHROMA,
                 (1, 0): HUFF_AC_LUMA, (1, 1): HUFF_AC_CHROMA}
    used = sorted({(0, hid[0]) for hid in hids[:len(quantized)]}
                  | {(1, hid[1]) for hid in hids[:len(quantized)]})
    for tc, th in used:
        bits, vals = huff_sets[(tc, th)]
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits)
                   + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos_body = bytes([len(quantized)])
    for k in range(len(quantized)):
        td, ta = hids[k]
        sos_body += bytes([k + 1, (td << 4) | ta])
    sos_body += bytes([0, 63, 0])
    out += seg(0xDA, sos_body)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (fixture writer for the Annex G decoder paths)
# ---------------------------------------------------------------------------

# fixture tables that cover every progressive symbol: DC categories 0-11
# as 4-bit codes; ALL 256 run/size bytes (incl. EOBn 0x10..0xE0 and ZRL)
# as 9-bit codes — wasteful but canonical-valid, and the decoder builds
# its LUT from the DHT segment like for any stream
_PROG_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_PROG_DC_VALS = list(range(12))
_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_PROG_AC_VALS = list(range(256))


class _ProgScanWriter:
    """One scan's entropy writer: bit writing + RSTn framing + shared
    end-of-band run state (AC scans)."""

    def __init__(self, eobrun_cap: int, ac_enc):
        self.bw = _BitWriter()
        self.out = bytearray()
        self.rst = 0
        self.eobrun = 0
        self.br: list[int] = []
        self.cap = eobrun_cap
        self.ac_enc = ac_enc

    def flush_eob(self):
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, ln = self.ac_enc[r << 4]
            self.bw.write(code, ln)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            for b in self.br:
                self.bw.write(b, 1)
            self.br = []
            self.eobrun = 0

    def restart(self):
        self.flush_eob()
        self.bw.flush()
        self.out += self.bw.out
        self.out += bytes([0xFF, 0xD0 + (self.rst & 7)])
        self.rst += 1
        self.bw = _BitWriter()

    def finish(self) -> bytes:
        self.flush_eob()
        self.bw.flush()
        self.out += self.bw.out
        return bytes(self.out)


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90,
                            subsample=False, *, dc_al: int = 1,
                            ac_al: int = 1, band_split: int = 5,
                            restart_interval: int = 0,
                            eobrun_cap: int = 32767) -> bytes:
    """(h, w[, 1|3]) uint8 gray/RGB → progressive JPEG (SOF2) bytes —
    the fixture writer for :func:`decode_jpeg`'s Annex G paths. Scan
    script: interleaved DC first scan at Al=``dc_al`` + DC refinement
    bit scans down to 0; per component, AC first scans at Al=``ac_al``
    over the spectral bands (1..``band_split``, ``band_split``+1..63)
    + AC refinement scans down to 0. Quantized coefficients are
    IDENTICAL to :func:`encode_jpeg` at the same quality/subsampling,
    and all scans together are lossless over them — so the progressive
    and baseline encodes of an image must DECODE identically (the
    tests assert exactly that). ``eobrun_cap`` bounds end-of-band run
    accumulation (small caps exercise the decoder's multi-EOBn path);
    ``restart_interval`` is in MCUs for the DC scans and blocks for the
    AC scans, per T.81."""
    if not (0 <= dc_al <= 13 and 0 <= ac_al <= 13):
        raise ValueError("bad successive-approximation depth")
    if not 1 <= band_split <= 63:
        raise ValueError("band_split must be in 1..63")
    if not 1 <= eobrun_cap <= 32767:
        raise ValueError("eobrun_cap must be in 1..32767")
    quantized, samps, qids, qtabs, h, w, mcux, mcuy = \
        _quantize_planes(img, quality, subsample)
    ncomp = len(quantized)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    dims = []  # per comp: (nbw, nbh) — ceil over the UNPADDED comp size
    for H, V in samps:
        cw = -(-w * H // hmax)
        ch = -(-h * V // vmax)
        dims.append((-(-cw // 8), -(-ch // 8)))
    dc_enc = _huff_encode_table(_PROG_DC_BITS, _PROG_DC_VALS)
    ac_enc = _huff_encode_table(_PROG_AC_BITS, _PROG_AC_VALS)

    def dc_scan(ah, al) -> bytes:
        ws = _ProgScanWriter(eobrun_cap, ac_enc)
        preds = [0] * ncomp
        total = mcux * mcuy
        per = restart_interval or total
        for mcu in range(total):
            if mcu and mcu % per == 0:
                ws.restart()
                preds = [0] * ncomp
            my, mx = divmod(mcu, mcux)
            for k in range(ncomp):
                H, V, bwk, qz = quantized[k]
                for v in range(V):
                    for hh in range(H):
                        bi = (my * V + v) * bwk + (mx * H + hh)
                        dc = int(qz[bi][0])
                        if ah == 0:
                            d = dc >> al  # arithmetic shift (T.81 A.4.1)
                            diff = d - preds[k]
                            preds[k] = d
                            t = _category(diff)
                            code, ln = dc_enc[t]
                            ws.bw.write(code, ln)
                            if t:
                                ws.bw.write(
                                    diff if diff > 0
                                    else diff + (1 << t) - 1, t)
                        else:
                            ws.bw.write((dc >> al) & 1, 1)
        return ws.finish()

    def ac_first_scan(k, ss, se, al) -> bytes:
        H, V, bw_pad, qz = quantized[k]
        nbw, nbh = dims[k]
        ws = _ProgScanWriter(eobrun_cap, ac_enc)
        per = restart_interval or (nbw * nbh)
        for u in range(nbw * nbh):
            if u and u % per == 0:
                ws.restart()
            blk = qz[(u // nbw) * bw_pad + (u % nbw)]
            r = 0
            wrote = False
            for kk in range(ss, se + 1):
                v = int(blk[kk])
                v = (abs(v) >> al) * (1 if v > 0 else -1)  # toward zero
                if v == 0:
                    r += 1
                    continue
                ws.flush_eob()
                while r > 15:
                    code, ln = ac_enc[0xF0]
                    ws.bw.write(code, ln)
                    r -= 16
                s = _category(v)
                code, ln = ac_enc[(r << 4) | s]
                ws.bw.write(code, ln)
                ws.bw.write(v if v > 0 else v + (1 << s) - 1, s)
                r = 0
                wrote = True
            if r > 0 or not wrote:  # band tail (or whole band) is zero
                ws.eobrun += 1
                if ws.eobrun >= min(eobrun_cap, 32767):
                    ws.flush_eob()
        return ws.finish()

    def ac_refine_scan(k, ss, se, al) -> bytes:
        H, V, bw_pad, qz = quantized[k]
        nbw, nbh = dims[k]
        ws = _ProgScanWriter(eobrun_cap, ac_enc)
        per = restart_interval or (nbw * nbh)
        p_bits = 1
        for u in range(nbw * nbh):
            if u and u % per == 0:
                ws.restart()
            blk = qz[(u // nbw) * bw_pad + (u % nbw)]
            tv = [abs(int(blk[kk])) >> al for kk in range(ss, se + 1)]
            # last newly-significant position: ZRLs may only be emitted
            # up to here — beyond it, zero runs fold into the EOB run
            eobpos = max((kk for idx, kk in enumerate(range(ss, se + 1))
                          if tv[idx] == 1), default=ss - 1)
            brblock: list[int] = []
            r = 0
            for idx, kk in enumerate(range(ss, se + 1)):
                t = tv[idx]
                if t == 0:
                    r += 1
                    continue
                # drain pending 16-zero runs BEFORE buffering this
                # position's bit, so correction bits stay in positional
                # order relative to the ZRLs the decoder advances over
                while r > 15 and kk <= eobpos:
                    ws.flush_eob()
                    code, ln = ac_enc[0xF0]
                    ws.bw.write(code, ln)
                    for b in brblock:
                        ws.bw.write(b, p_bits)
                    brblock = []
                    r -= 16
                if t > 1:  # history-significant: one correction bit
                    brblock.append(t & 1)
                    continue
                ws.flush_eob()
                code, ln = ac_enc[(r << 4) | 1]
                ws.bw.write(code, ln)
                ws.bw.write(1 if int(blk[kk]) > 0 else 0, 1)
                for b in brblock:
                    ws.bw.write(b, p_bits)
                brblock = []
                r = 0
            if r > 0 or brblock:
                ws.eobrun += 1
                ws.br.extend(brblock)
                if ws.eobrun >= min(eobrun_cap, 32767) or len(ws.br) > 900:
                    ws.flush_eob()
        return ws.finish()

    # ---- assemble the stream
    def seg(code: int, body: bytes) -> bytes:
        return bytes([0xFF, code]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for qid, tab in enumerate(qtabs):
        out += seg(0xDB, bytes([qid]) + bytes(int(x) for x in tab[ZIGZAG]))
    sof_body = struct.pack(">BHHB", 8, h, w, ncomp)
    for k, (H, V) in enumerate(samps):
        sof_body += bytes([k + 1, (H << 4) | V, qids[k]])
    out += seg(0xC2, sof_body)
    out += seg(0xC4, bytes([0x00]) + bytes(_PROG_DC_BITS)
               + bytes(_PROG_DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_PROG_AC_BITS)
               + bytes(_PROG_AC_VALS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    def sos(sel_comps, ss, se, ah, al, body: bytes) -> bytes:
        hdr = bytes([len(sel_comps)])
        for k in sel_comps:
            hdr += bytes([k + 1, 0x00])  # DC table 0, AC table 0
        hdr += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, hdr) + body

    # DC: first scan + bitwise refinements down to full precision
    out += sos(list(range(ncomp)), 0, 0, 0, dc_al, dc_scan(0, dc_al))
    for al in range(dc_al - 1, -1, -1):
        out += sos(list(range(ncomp)), 0, 0, al + 1, al, dc_scan(al + 1, al))
    # AC: per component, banded first scans then refinements
    bands = [(1, band_split)]
    if band_split < 63:
        bands.append((band_split + 1, 63))
    for k in range(ncomp):
        for ss, se in bands:
            out += sos([k], ss, se, 0, ac_al, ac_first_scan(k, ss, se, ac_al))
    for al in range(ac_al - 1, -1, -1):
        for k in range(ncomp):
            for ss, se in bands:
                out += sos([k], ss, se, al + 1, al,
                           ac_refine_scan(k, ss, se, al))
    out += b"\xff\xd9"
    return bytes(out)
