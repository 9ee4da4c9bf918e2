"""GIF decode + encode, library-free (pure Python LZW + numpy).

Completes the :mod:`raystack.ops.multimodal` real-decoder tier for the
third common web-crawl image format, per the published GIF89a
specification:

- :func:`decode_gif` — first frame composited onto the logical screen
  as ``(h, w, 3|4)`` uint8 (alpha only when the stream uses
  transparency). Global/local color tables, interlacing, transparency
  and disposal methods 0–2 are honored.
- :func:`decode_gif_frames` — every-nth-frame sampling over animated
  streams (the real counterpart of the video frame-sample stage that
  stays ffmpeg-gated for MP4).
- :func:`encode_gif` — fixture writer: LZW compression with
  variable-width codes + dictionary resets, sub-block framing,
  interlacing, per-frame local palettes, transparency and disposal.

The LZW pair round-trips bit-exact (palette indices in → identical
indices out), so the decode tests are exact, not tolerance-based.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    """GIF-flavor LZW (LSB-first variable-width codes, CLEAR/EOI,
    dictionary capped at 4096 entries) → palette index bytes."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad GIF LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    dict_ = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev = None
    while True:
        while nbits < code_size and pos < len(data):
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < code_size:
            break  # stream exhausted without EOI (tolerated, like readers do)
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            dict_ = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(dict_) and code != eoi and code != clear:
            entry = dict_[code]
        elif code == len(dict_) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        if prev is not None and len(dict_) < 4096:
            dict_.append(prev + entry[:1])
            if len(dict_) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


class _LZWWriter:
    """LSB-first bit packer for the encoder."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def emit(self, code: int, size: int):
        self.acc |= code << self.n
        self.n += size
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self):
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Inverse of :func:`_lzw_decode` (same growth/reset discipline)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w_ = _LZWWriter()
    code_size = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    w_.emit(clear, code_size)
    wbuf = b""
    for ch in indices:
        wc = wbuf + bytes([ch])
        if wc in table:
            wbuf = wc
            continue
        w_.emit(table[wbuf], code_size)
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            # the decoder's dict lags this table by one entry (it appends
            # on the NEXT code), so it bumps width when its len — our
            # next_code - 1 — hits 1<<code_size
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        else:
            w_.emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            code_size = min_code_size + 1
            next_code = eoi + 1
        wbuf = bytes([ch])
    if wbuf:
        w_.emit(table[wbuf], code_size)
    w_.emit(eoi, code_size)
    w_.flush()
    return bytes(w_.out)


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """Reorder GIF 4-pass interlaced rows to display order."""
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _GIF_INTERLACE_PASSES:
        n = len(range(start, h, step))
        out[start::step] = rows[src: src + n]
        src += n
    return out


def _interlace(rows: np.ndarray) -> np.ndarray:
    """Display order → GIF 4-pass interlaced storage order."""
    return np.concatenate([rows[start::step]
                           for start, step in _GIF_INTERLACE_PASSES])


def _parse_gif(payload: bytes):
    """Yield raw frames: (left, top, w, h, palette, trans_idx, disposal,
    index array). Shared by the one-frame and frame-sampling decoders."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w, h, flags, bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, i).reshape(n, 3)
        i += n * 3
    trans_idx = None
    disposal = 0
    frames = []
    while i < len(payload):
        b = payload[i]
        i += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[i]
            i += 1
            if label == 0xF9:  # graphic control
                sz = payload[i]
                gflags, _delay, tidx = struct.unpack_from("<BHB",
                                                          payload, i + 1)
                trans_idx = tidx if gflags & 1 else None
                disposal = (gflags >> 2) & 7
                i += 1 + sz
                if payload[i] != 0:
                    raise ValueError("unterminated GIF extension")
                i += 1
            else:  # skip sub-blocks of any other extension
                while True:
                    sz = payload[i]
                    i += 1 + sz
                    if sz == 0:
                        break
        elif b == 0x2C:  # image descriptor
            left, top, fw, fh, iflags = struct.unpack_from("<HHHHB",
                                                           payload, i)
            i += 9
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = np.frombuffer(payload, np.uint8, n * 3, i) \
                    .reshape(n, 3)
                i += n * 3
            if pal is None:
                raise ValueError("GIF frame has no color table")
            mcs = payload[i]
            i += 1
            data = bytearray()
            while True:
                sz = payload[i]
                i += 1
                data += payload[i: i + sz]
                i += sz
                if sz == 0:
                    break
            idx = np.frombuffer(bytes(_lzw_decode(bytes(data), mcs)),
                                np.uint8)
            if len(idx) < fw * fh:
                raise ValueError("GIF frame pixel data too short")
            rows = idx[: fw * fh].reshape(fh, fw)
            if iflags & 0x40:
                rows = _deinterlace(rows)
            if int(rows.max(initial=0)) >= len(pal):
                raise ValueError("GIF palette index out of range")
            frames.append((left, top, fw, fh, pal, trans_idx, disposal,
                           rows))
            trans_idx = None
            disposal = 0
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF stream has no image frames")
    return w, h, bg, gct, frames


def decode_gif_frames(payload: bytes, every_n: int = 1,
                      max_frames: int | None = None) -> list[np.ndarray]:
    """Animated GIF → every ``every_n``-th frame composited onto the
    logical screen, each ``(h, w, 3|4)`` uint8 (alpha channel present
    iff the stream uses transparency). Disposal methods: 0/1 leave the
    canvas, 2 restores the frame's region to background/transparent."""
    w, h, bg, gct, frames = _parse_gif(payload)
    any_trans = any(f[5] is not None for f in frames)
    canvas = np.zeros((h, w, 3), np.uint8)
    alpha = np.zeros((h, w), bool)  # True = opaque
    if gct is not None and not any_trans:
        canvas[:] = gct[min(bg, len(gct) - 1)]
        alpha[:] = True
    out = []
    for k, (left, top, fw, fh, pal, tidx, disposal, rows) in \
            enumerate(frames):
        # clamp at 0: a frame placed entirely past the logical screen
        # contributes nothing (negative slice bounds would desync the
        # region/canvas shapes and raise)
        fh_c = max(0, min(fh, h - top))
        fw_c = max(0, min(fw, w - left))
        region = rows[:fh_c, :fw_c]
        rgb = pal[region]
        vis = np.ones(region.shape, bool) if tidx is None \
            else region != tidx
        sub_c = canvas[top: top + fh_c, left: left + fw_c]
        sub_a = alpha[top: top + fh_c, left: left + fw_c]
        saved = (sub_c.copy(), sub_a.copy()) if disposal == 3 else None
        sub_c[vis] = rgb[vis]
        sub_a[vis] = True
        if k % every_n == 0:
            frame = np.dstack([canvas,
                               np.where(alpha, 255, 0).astype(np.uint8)]) \
                if any_trans else canvas.copy()
            out.append(np.ascontiguousarray(frame))
            if max_frames is not None and len(out) >= max_frames:
                break
        if disposal == 2:  # restore to background (transparent canvas)
            sub_c[:] = 0 if any_trans or gct is None \
                else gct[min(bg, len(gct) - 1)]
            sub_a[:] = not any_trans
        elif disposal == 3 and saved is not None:  # restore previous
            sub_c[:] = saved[0]
            sub_a[:] = saved[1]
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF → first frame as ``(h, w, 3|4)`` uint8 — REAL decode, pure
    Python LZW + numpy, per the published GIF89a spec."""
    return decode_gif_frames(payload, max_frames=1)[0]


def encode_gif(frames, palette: np.ndarray, interlace: bool = False,
               transparent: int | None = None,
               disposal: int = 0) -> bytes:
    """Palette-index frames ``[(h, w) uint8, ...]`` (or one array) +
    ``(n, 3)`` palette → GIF89a bytes (fixture writer; inverse of
    :func:`decode_gif_frames`). All frames are full-canvas with the
    global palette; ``transparent``/``disposal`` write a graphic
    control extension per frame."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    h, w = frames[0].shape
    npal = len(palette)
    pal_bits = max(1, (npal - 1).bit_length())
    pal_size = 1 << pal_bits
    pad = np.zeros((pal_size - npal, 3), np.uint8)
    pal_bytes = np.vstack([np.asarray(palette, np.uint8), pad]).tobytes()
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += pal_bytes
    mcs = max(2, pal_bits)
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("encode_gif frames must share the canvas")
        if transparent is not None or disposal:
            gflags = (disposal & 7) << 2 | (1 if transparent is not None
                                            else 0)
            out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, gflags, 0,
                               transparent or 0, 0)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                           0x40 if interlace else 0)
        rows = _interlace(fr) if interlace else fr
        data = _lzw_encode(rows.astype(np.uint8).tobytes(), mcs)
        out.append(mcs)
        for off in range(0, len(data), 255):
            blk = data[off: off + 255]
            out.append(len(blk))
            out += blk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
