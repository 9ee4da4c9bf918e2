"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Decode support has two tiers:

- **Real decoders** for formats that need no external library:
  binary PPM/PGM images (:func:`decode_pnm` — header parse +
  ``np.frombuffer``, plus :func:`resize_nearest`), uncompressed BMP
  (:func:`decode_bmp` — BITMAPINFOHEADER, 24/32-bit, row padding + BGR
  + bottom-up normalized), PNG (:func:`decode_png` — stdlib ``zlib``
  inflate + all five scanline filters; the full static format: every
  legal depth 1/2/4/8/16 × color type, Adam7 interlace, tRNS
  transparency),
  baseline JPEG (:mod:`raystack.ops.jpeg` — huffman entropy decode +
  vectorized IDCT + chroma upsampling, subsampling + restart markers),
  GIF incl. animation (:mod:`raystack.ops.gif` — pure-Python LZW,
  interlace, transparency, disposal; :class:`GifFrameSampler` explodes
  animated streams into PNG frame rows)
  and PCM WAV audio (:func:`decode_wav` — stdlib ``wave``). :class:`MediaDecoder` sniffs each payload's magic
  bytes and emits real width/height/channels or
  sample-rate/duration/RMS features.
- **STUBS** for library-bound formats (MP4 codec decode needs ffmpeg,
  which this container doesn't ship — clearly marked below). Everything
  Ray-side is real and tested either way: the media schema, actor-pool
  ``map_batches`` stages with small batch sizes (large binary payloads),
  the per-actor one-time setup, and the output layout. Formats the
  from-scratch decoders don't cover fall back to the probe/fake tier;
  swap :func:`decode_image_any` for a PIL/ffmpeg call on a cluster that
  has them and nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.large_binary()),
    ("mime", pa.string()),
    ("meta", pa.string()),  # JSON: source-specific metadata
])

#: small batches — payload bytes dominate block size
MEDIA_BATCH_SIZE = 64


# ---------------------------------------------------------------------------
# real, library-free decoders: PPM/PGM (netpbm binary) + PCM WAV
# ---------------------------------------------------------------------------

_PNM_WS = b" \t\r\n"


def decode_pnm(payload: bytes) -> np.ndarray:
    """Binary netpbm image → ``(h, w, c)`` array. ``P6`` (PPM, RGB) and
    ``P5`` (PGM, gray); comments and 16-bit maxval per the published
    netpbm format spec. Real decode, no external library."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM payload: {magic!r}")
    toks, i = [], 2
    while len(toks) < 3:
        while i < len(payload) and payload[i:i + 1] in _PNM_WS:
            i += 1
        if payload[i:i + 1] == b"#":  # comment to end of line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and payload[j:j + 1] not in _PNM_WS:
            j += 1
        toks.append(payload[i:j])
        i = j
    w, h, maxval = int(toks[0]), int(toks[1]), int(toks[2])
    i += 1  # exactly one whitespace byte separates header and raster
    c = 3 if magic == b"P6" else 1
    dt = np.dtype(np.uint8) if maxval < 256 else np.dtype(">u2")
    arr = np.frombuffer(payload, dtype=dt, count=w * h * c, offset=i)
    return arr.reshape(h, w, c)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via pure index gather (the thumbnailing
    kernel a curation pipeline runs before feature extraction)."""
    h, w = img.shape[:2]
    yi = np.arange(out_h) * h // out_h
    xi = np.arange(out_w) * w // out_w
    return img[yi][:, xi]


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed Windows BMP (BITMAPINFOHEADER+, 24/32-bit ``BI_RGB``)
    → ``(h, w, 3|4)`` uint8 RGB(A). Rows are 4-byte aligned and stored
    bottom-up (top-down when the height field is negative), pixels BGR —
    both normalized here. Real decode per the published BMP file-format
    spec, no external library."""
    import struct
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMPs unsupported")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if comp != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={comp}")
    top_down, h = h < 0, abs(h)
    nch = bpp // 8
    row_bytes = (w * nch + 3) & ~3
    raw = np.frombuffer(payload, np.uint8, count=row_bytes * h,
                        offset=data_off)
    rows = raw.reshape(h, row_bytes)[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(
        rows[..., [2, 1, 0, 3] if nch == 4 else [2, 1, 0]])


def encode_bmp(img: np.ndarray, top_down: bool = False) -> bytes:
    """(h, w, 3|4) uint8 RGB(A) → BMP bytes (fixture writer for tests;
    inverse of :func:`decode_bmp`)."""
    import struct
    h, w, nch = img.shape
    bpp = nch * 8
    row_bytes = (w * nch + 3) & ~3
    bgr = img[..., [2, 1, 0, 3] if nch == 4 else [2, 1, 0]]
    if not top_down:
        bgr = bgr[::-1]
    rows = np.zeros((h, row_bytes), np.uint8)
    rows[:, : w * nch] = bgr.reshape(h, w * nch)
    body = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h, 1,
                       bpp, 0, len(body), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0,
                         14 + 40)
    return header + info + body


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(payload: bytes):
    """Yield (type, data) for each chunk of a PNG stream (layout per the
    published PNG spec: 4-byte big-endian length, 4-byte type, data,
    4-byte CRC)."""
    import struct
    i = 8
    while i + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, i)
        ctype = payload[i + 4: i + 8]
        data = payload[i + 8: i + 8 + ln]
        if len(data) != ln:
            raise ValueError("truncated PNG chunk")
        yield ctype, data
        i += 12 + ln
        if ctype == b"IEND":
            return
    raise ValueError("PNG stream ended without IEND")


def _png_unfilter(raw: np.ndarray, h: int, stride: int,
                  bpp: int) -> np.ndarray:
    """Reverse the five PNG scanline filters (None/Sub/Up/Average/Paeth,
    filter method 0). ``raw`` is the decompressed stream: ``h`` rows of
    (1 filter byte + ``stride`` data bytes). Vectorized per row for
    None/Sub/Up (Sub is a modular cumsum over the pixel axis); Average
    and Paeth carry a true per-pixel left dependency and loop over pixels
    with the channel axis vectorized."""
    rows = raw.reshape(h, 1 + stride)
    ftypes = rows[:, 0]
    if ftypes.max(initial=0) > 4:
        raise ValueError(f"bad PNG filter type {int(ftypes.max())}")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    npix = stride // bpp
    for y in range(h):
        f = int(ftypes[y])
        cur = rows[y, 1:].astype(np.int32)
        if f == 0:
            line = cur
        elif f == 1:   # Sub: modular prefix sum over pixels, per channel
            line = np.cumsum(cur.reshape(npix, bpp),
                             axis=0, dtype=np.int64).reshape(stride) & 0xFF
            line = line.astype(np.int32)
        elif f == 2:   # Up
            line = (cur + prev) & 0xFF
        else:          # Average (3) / Paeth (4): left-dependent
            line = cur
            left = np.zeros(bpp, np.int32)
            for x in range(0, stride, bpp):
                up = prev[x: x + bpp]
                if f == 3:
                    line[x: x + bpp] = (line[x: x + bpp]
                                        + ((left + up) >> 1)) & 0xFF
                else:
                    ul = prev[x - bpp: x] if x else np.zeros(bpp, np.int32)
                    p = left + up - ul
                    pa_, pb, pc_ = (np.abs(p - left), np.abs(p - up),
                                    np.abs(p - ul))
                    pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                                    np.where(pb <= pc_, up, ul))
                    line[x: x + bpp] = (line[x: x + bpp] + pred) & 0xFF
                left = line[x: x + bpp]
        out[y] = line
        prev = line
    return out


#: Adam7 pass layout: (x offset, y offset, x step, y step)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

#: legal (color type → bit depths) combinations per the PNG spec
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}


def _png_stride(w: int, depth: int, nch: int) -> int:
    return (w * depth * nch + 7) // 8


def _unpack_scanlines(raw: np.ndarray, h: int, w: int, depth: int,
                      nch: int) -> np.ndarray:
    """Filtered scanline bytes (``h`` rows of 1 filter byte + stride) →
    ``(h, w, nch)`` raw channel samples: uint16 for depth 16, uint8
    otherwise (sub-byte samples NOT yet scaled to 8-bit — palette
    indices and tRNS keys compare in original depth range)."""
    if h == 0 or w == 0:
        return np.zeros((h, w, nch), np.uint8)
    stride = _png_stride(w, depth, nch)
    fbpp = max(1, depth * nch // 8)
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG pixel data length mismatch")
    data = _png_unfilter(raw, h, stride, fbpp)
    if depth == 8:
        return data[:, : w * nch].reshape(h, w, nch)
    if depth == 16:
        b = data[:, : w * nch * 2].reshape(h, w, nch, 2).astype(np.uint16)
        return (b[..., 0] << 8) | b[..., 1]
    # 1/2/4-bit (gray or palette indices; nch == 1)
    bits = np.unpackbits(data, axis=1)[:, : w * depth]
    weights = 1 << np.arange(depth - 1, -1, -1)
    vals = (bits.reshape(h, w, depth) * weights).sum(axis=2)
    return vals.astype(np.uint8)[:, :, None]


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → ``(h, w, c)`` array — REAL decode, stdlib only (``zlib``
    inflate + the five scanline filters per the published PNG spec).
    Full coverage of the static-image format: every legal bit depth
    (1/2/4/8/16) × color type (gray / RGB / palette / gray+alpha /
    RGBA), Adam7 interlacing, and tRNS transparency (palette alpha and
    gray/RGB color keys → an alpha channel). Output dtype is uint8,
    except 16-bit streams which return uint16 (samples kept exact, not
    squashed); sub-byte grays are scaled to 8-bit."""
    import struct
    import zlib
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    trns = None
    idat = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if color not in _PNG_DEPTHS:
        raise ValueError(f"bad PNG color type {color}")
    if depth not in _PNG_DEPTHS[color]:
        raise ValueError(f"illegal PNG depth {depth} for color {color}")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if interlace == 0:
        img = _unpack_scanlines(raw, h, w, depth, nch)
    elif interlace == 1:
        img = np.zeros((h, w, nch),
                       np.uint16 if depth == 16 else np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            nbytes = hp * (1 + _png_stride(wp, depth, nch))
            img[y0::dy, x0::dx] = _unpack_scanlines(
                raw[pos: pos + nbytes], hp, wp, depth, nch)
            pos += nbytes
        if pos != len(raw):
            raise ValueError("PNG pixel data length mismatch")
    else:
        raise ValueError(f"bad PNG interlace method {interlace}")

    maxv = (1 << depth) - 1
    if color == 3:  # palette (+ optional per-entry alpha)
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = img[..., 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            a = np.frombuffer(trns, np.uint8)
            alpha[: len(a)] = a
            return np.ascontiguousarray(np.dstack([rgb, alpha[idx]]))
        return np.ascontiguousarray(rgb)
    if color == 0 and trns is not None and len(trns) == 2:
        key = struct.unpack(">H", trns)[0]
        alpha = np.where(img[..., 0] == key, 0, maxv).astype(img.dtype)
        img = np.dstack([img[..., 0], alpha])
    elif color == 2 and trns is not None and len(trns) == 6:
        key = np.array(struct.unpack(">HHH", trns), img.dtype)
        alpha = np.where((img == key).all(axis=2), 0, maxv) \
            .astype(img.dtype)
        img = np.dstack([img, alpha])
    if depth < 8:  # scale sub-byte gray (and its alpha) to 8-bit
        img = (img.astype(np.uint16) * (255 // maxv)).astype(np.uint8)
    return np.ascontiguousarray(img)


_PNG_COLOR_BY_NCH = {1: 0, 2: 4, 3: 2, 4: 6}


def _pack_rows(samples: np.ndarray, depth: int) -> np.ndarray:
    """(h, w, nch) raw channel samples → (h, stride) packed scanline
    bytes (inverse of the unpack step in :func:`_unpack_scanlines`)."""
    h, w, nch = samples.shape
    if depth == 8:
        return samples.astype(np.uint8).reshape(h, w * nch)
    if depth == 16:
        s = samples.astype(np.uint16)
        b = np.stack([(s >> 8) & 0xFF, s & 0xFF], axis=-1)
        return b.astype(np.uint8).reshape(h, w * nch * 2)
    bits = ((samples[:, :, 0, None].astype(np.uint8)
             >> np.arange(depth - 1, -1, -1)) & 1)
    return np.packbits(bits.reshape(h, w * depth), axis=1)


def _filter_rows(rows: np.ndarray, fbpp: int, ftype: int) -> bytearray:
    """Apply one PNG scanline filter to every packed row (fixture-side
    inverse of :func:`_png_unfilter`; byte-level, any depth)."""
    h, stride = rows.shape
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        cur = rows[y].astype(np.int32)
        left = np.zeros(stride, np.int32)
        left[fbpp:] = cur[:-fbpp] if stride > fbpp else 0
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            enc = cur - left
        elif ftype == 2:
            enc = cur - prev
        elif ftype == 3:
            enc = cur - ((left + prev) >> 1)
        else:  # Paeth
            ul = np.zeros(stride, np.int32)
            ul[fbpp:] = prev[:-fbpp] if stride > fbpp else 0
            p = left + prev - ul
            pa_, pb, pc_ = (np.abs(p - left), np.abs(p - prev),
                            np.abs(p - ul))
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, prev, ul))
            enc = cur - pred
        out += bytes([ftype])
        out += (enc & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    return out


def encode_png(img: np.ndarray, filter_type: int = 0, depth: int = 8,
               interlace: bool = False, palette: np.ndarray = None,
               trns: bytes = None) -> bytes:
    """(h, w[, c]) raw channel samples → PNG bytes (fixture writer;
    inverse of :func:`decode_png`). ``filter_type`` applies one of the
    five scanline filters to every row so tests can exercise each
    unfilter path; ``depth``/``interlace``/``palette``/``trns`` cover
    the full decoder envelope (16-bit, sub-byte gray, Adam7, palette
    and transparency). With ``palette`` the image carries indices."""
    import struct
    import zlib
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    color = 3 if palette is not None else _PNG_COLOR_BY_NCH[nch]
    if depth not in _PNG_DEPTHS[color]:
        raise ValueError(f"illegal PNG depth {depth} for color {color}")
    fbpp = max(1, depth * nch // 8)

    def pack(sub: np.ndarray) -> bytearray:
        return _filter_rows(_pack_rows(sub, depth), fbpp, filter_type)

    if interlace:
        body = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                body += pack(sub)
    else:
        body = pack(img)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                       1 if interlace else 0)
    out = _PNG_SIG + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    if trns is not None:
        out += chunk(b"tRNS", trns)
    return out + chunk(b"IDAT", zlib.compress(bytes(body))) \
        + chunk(b"IEND", b"")


def decode_wav(payload: bytes):
    """PCM WAV → (samples ``(n, channels)`` float64 in [-1, 1], rate).
    Stdlib ``wave`` container parse + ``np.frombuffer`` sample decode;
    8/16/32-bit PCM. Real decode, no external library."""
    import io
    import wave
    with wave.open(io.BytesIO(payload)) as w:
        nch, sw, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(w.getnframes())
    if sw == 1:  # unsigned 8-bit
        s = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        s = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        s = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    return s.reshape(-1, nch), rate


def probe_webp(payload: bytes) -> dict:
    """WebP dimensions probe (public container spec): RIFF/WEBP with a
    VP8 (lossy: frame tag + 14-bit dims), VP8L (lossless: 14-bit packed
    dims) or VP8X (extended: 24-bit canvas) first chunk. Metadata only —
    pixel decode needs a VP8 codec and stays honestly out of scope."""
    b = payload
    if b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    fourcc = bytes(b[12:16])
    if fourcc == b"VP8 ":
        # key frame: 3-byte frame tag, sync 9D 01 2A, then 2x16-bit dims
        if b[23:26] != b"\x9d\x01\x2a":
            raise ValueError("VP8 sync code not found (not a key frame?)")
        w = int.from_bytes(b[26:28], "little") & 0x3FFF
        h = int.from_bytes(b[28:30], "little") & 0x3FFF
        return {"format": "vp8", "width": w, "height": h, "alpha": False}
    if fourcc == b"VP8L":
        if b[20] != 0x2F:
            raise ValueError("VP8L signature byte missing")
        bits = int.from_bytes(b[21:25], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        alpha = bool((bits >> 28) & 1)
        return {"format": "vp8l", "width": w, "height": h, "alpha": alpha}
    if fourcc == b"VP8X":
        flags = b[20]
        w = int.from_bytes(b[24:27], "little") + 1
        h = int.from_bytes(b[27:30], "little") + 1
        return {"format": "vp8x", "width": w, "height": h,
                "alpha": bool(flags & 0x10),
                "animated": bool(flags & 0x02)}
    raise ValueError(f"unknown WebP chunk {fourcc!r}")


# Max pixels the pure-Python VP8L reference decoder will attempt
# (~100k px/s, ~8 B/px working set): beyond this, untrusted payloads
# get the dims-probe tier instead of a pinned actor.
VP8L_PIXEL_BUDGET = 4_000_000


def decode_image_any(payload) -> np.ndarray | None:
    """Sniff the payload's magic bytes and run the matching REAL image
    decoder (PNM/BMP/PNG/JPEG/GIF/TIFF); ``None`` when the payload is not a
    recognized still-image format. Malformed bodies raise (callers
    decide whether to flag or skip)."""
    head = bytes(payload[:12])
    if head[:2] in (b"P5", b"P6"):
        return decode_pnm(payload)
    if head[:2] == b"BM":
        return decode_bmp(payload)
    if head[:8] == _PNG_SIG:
        return decode_png(payload)
    if head[:2] == b"\xff\xd8":
        from raystack.ops.jpeg import decode_jpeg
        return decode_jpeg(payload)
    if head[:4] == b"GIF8":
        from raystack.ops.gif import decode_gif
        return decode_gif(payload)
    if head[:4] in (b"II*\x00", b"MM\x00*"):
        from raystack.ops.tiff import decode_tiff
        return decode_tiff(payload)
    if head[:4] == b"RIFF" and bytes(payload[8:16]) == b"WEBPVP8L":
        # lossless WebP: real from-scratch decode; a stream the decoder
        # can't finish (truncated, or a feature beyond the implemented
        # envelope) falls back to MediaDecoder's dims-probe tier instead
        # of losing the metadata — same None contract as unknown magic.
        # Untrusted-crawl guard: the per-pixel reference decoder is
        # O(w*h) Python — a few-KB crafted header can declare up to
        # 16383x16383 (~268M px, fillable via LZ77 runs) and pin an
        # actor for hours. Parse the 14-bit dims FIRST and route
        # oversized images to the probe tier (dims only, decoded=False).
        b = bytes(payload[:25])
        if len(b) >= 25 and b[20] == 0x2F:
            bits = int.from_bytes(b[21:25], "little")
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            if w * h > VP8L_PIXEL_BUDGET:
                return None
        from raystack.ops.vp8l import Vp8lError, decode_webp
        try:
            return decode_webp(bytes(payload))
        except Vp8lError:
            return None
    return None


class MediaDecoder:
    """Actor-pool decode stage: sniff each payload's magic bytes and run
    the REAL decoder where one exists (PPM/PGM, BMP, PNG, JPEG, GIF, TIFF,
    lossless WebP/VP8L, PCM WAV), else mark the
    row undecoded (library-bound formats are the documented stub tier).
    The per-payload loop is intentional — each payload is one multi-KB
    media file and the heavy work inside (pixel/sample math) is numpy;
    batches are small (``MEDIA_BATCH_SIZE``) because payload bytes
    dominate block size."""

    def __init__(self):
        # one-time per-actor setup slot (real decoders need none; a model
        # or codec table would load here)
        pass

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        kind = np.full(n, "unknown", dtype=object)
        width = np.zeros(n, np.int64)
        height = np.zeros(n, np.int64)
        channels = np.zeros(n, np.int64)
        sample_rate = np.zeros(n, np.int64)
        duration_s = np.zeros(n, np.float64)
        mean_level = np.zeros(n, np.float64)
        decoded = np.zeros(n, bool)
        payloads = t["payload"]
        import struct
        import wave
        import zlib
        for i in range(n):
            p = payloads[i].as_py()
            if p is None:
                continue
            head = bytes(p[:12])
            try:
                img = decode_image_any(p)
                if img is not None:
                    height[i], width[i], channels[i] = img.shape
                    mean_level[i] = float(img.mean()) / \
                        (255.0 if img.dtype == np.uint8 else 65535.0)
                    kind[i], decoded[i] = "image", True
                elif head[:4] == b"RIFF" and head[8:12] == b"WEBP":
                    # lossy VP8 / VP8X: dims without pixel decode
                    # (lossless VP8L decoded for real above)
                    wp = probe_webp(p)
                    width[i], height[i] = wp["width"], wp["height"]
                    channels[i] = 4 if wp.get("alpha") else 3
                    kind[i], decoded[i] = "image", True
                elif head[:4] == b"RIFF" and head[8:12] == b"WAVE":
                    from raystack.ops.audioprobe import decode_wav_any
                    samples, rate = decode_wav_any(p)  # PCM + G.711 u/A-law
                    sample_rate[i] = rate
                    channels[i] = samples.shape[1]
                    duration_s[i] = samples.shape[0] / rate if rate else 0.0
                    mean_level[i] = float(np.sqrt((samples ** 2).mean())) \
                        if samples.size else 0.0
                    kind[i], decoded[i] = "audio", True
                else:
                    from raystack.ops.audioprobe import probe_audio
                    meta_a = probe_audio(p)  # mp3/flac/ogg: metadata tier
                    if meta_a is not None:
                        sample_rate[i] = meta_a["sample_rate"]
                        channels[i] = meta_a["channels"]
                        duration_s[i] = meta_a["duration_s"]
                        kind[i], decoded[i] = "audio", True
            except (ValueError, EOFError, IndexError, wave.Error,
                    struct.error, zlib.error):
                pass  # sniffed magic but malformed body → stays undecoded
        return pa.table({
            "media_id": t["media_id"],
            "kind": pa.array(kind, pa.string()),
            "width": pa.array(width), "height": pa.array(height),
            "channels": pa.array(channels),
            "sample_rate": pa.array(sample_rate),
            "duration_s": pa.array(duration_s),
            "mean_level": pa.array(mean_level),
            "decoded": pa.array(decoded),
        })


def decode_media(ds, concurrency=(1, 4), batch_size: int = MEDIA_BATCH_SIZE):
    """Actor-pool media decode over a :data:`MEDIA_SCHEMA`-shaped dataset:
    real PPM/PGM + BMP + WAV decoding, unknown formats flagged not decoded."""
    return ds.map_batches(MediaDecoder, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


def _fake_decode_shape(payload_lens: np.ndarray, hashes: np.ndarray = None):
    """Deterministic fake decode: (w, h, c) derived from the payload byte
    length via SQL-expressible int64 arithmetic (so the driver's DuckDB
    oracle can recompute it). Stands in for the real decoder so the
    pipeline plumbing is testable end-to-end."""
    L = payload_lens.astype(np.int64)
    w = (L * 40503 % 65536) % 1920 + 16
    h = (L * 9973 % 65536) % 1080 + 16
    c = np.full(len(L), 3, dtype=np.int64)
    return w, h, c


class ImageFeatureExtractor:
    """Actor-pool stage: histogram features + decoded dimensions.

    Real plumbing: one-time setup in ``__init__`` (histogram bin edges /
    would-be model load), vectorized per-batch work, list<float> feature
    output. ``use_real_decode=True`` routes each payload through the
    shared magic-byte sniffer (:func:`decode_image_any` — the module's
    from-scratch PNM/BMP/PNG/JPEG/GIF/TIFF/VP8L decoders): decodable
    rows get TRUE dimensions and a pixel-value histogram; unrecognized
    or malformed payloads fall back per-row to the byte-histogram +
    deterministic fake-dims tier, so the output schema is identical
    either way."""

    def __init__(self, n_bins: int = 16, use_real_decode: bool = False):
        self.n_bins = n_bins
        self.use_real_decode = use_real_decode
        self.edges = np.linspace(0, 256, n_bins + 1)

    def _real_rows(self, payloads, n):
        """Per-row real decode; returns (w, h, c, feats, decoded_mask).
        The per-payload loop is intentional — each payload is one media
        file and the heavy work inside (pixel math) is numpy."""
        w = np.zeros(n, np.int64)
        h = np.zeros(n, np.int64)
        c = np.zeros(n, np.int64)
        feats = np.zeros((n, self.n_bins), np.float64)
        ok = np.zeros(n, bool)
        for i in range(n):
            p = payloads[i].as_py()
            if p is None:
                continue
            try:
                img = decode_image_any(p)
            except Exception:
                img = None  # malformed body → fake tier, never a crash
            if img is None:
                continue
            h[i], w[i], c[i] = img.shape
            px = img.ravel().astype(np.int64)
            if img.dtype != np.uint8:  # 16-bit PNG → 8-bit bins
                px >>= 8
            counts = np.bincount((px * self.n_bins) >> 8,
                                 minlength=self.n_bins)
            feats[i] = counts / max(px.size, 1)
            ok[i] = True
        return w, h, c, feats, ok

    def __call__(self, t: pa.Table) -> pa.Table:
        from .hashing import flatten_column
        data, starts, lengths = flatten_column(t["payload"])
        # histogram per row via reduceat over NON-EMPTY rows only: a
        # trailing empty row's clamped start index used to steal the
        # previous row's last byte, and reduceat's repeated-index
        # semantics make empty segments return data[start], not 0.
        # Bin index (byte * n_bins) >> 8 stays in [0, n_bins) for ANY
        # n_bins (integer division by 256//n_bins dropped the top bytes
        # whenever n_bins didn't divide 256)
        bins = ((data.astype(np.int64) * self.n_bins) >> 8)
        onehot_sum = np.zeros((len(lengths), self.n_bins),
                              dtype=np.float64)
        nz = lengths > 0
        if nz.any():
            s_nz = starts[nz]
            for b in range(self.n_bins):
                ind = (bins == b).astype(np.float64)
                onehot_sum[nz, b] = np.add.reduceat(ind, s_nz)
        norm = np.maximum(lengths, 1).astype(np.float64)
        feats = onehot_sum / norm[:, None]
        w, h, c = _fake_decode_shape(lengths)
        if self.use_real_decode:
            rw, rh, rc, rfeats, ok = self._real_rows(t["payload"],
                                                     t.num_rows)
            w = np.where(ok, rw, w)
            h = np.where(ok, rh, h)
            c = np.where(ok, rc, c)
            feats = np.where(ok[:, None], rfeats, feats)
        return pa.table({
            "media_id": t["media_id"].combine_chunks()
            if isinstance(t["media_id"], pa.ChunkedArray) else t["media_id"],
            "width": pa.array(w), "height": pa.array(h),
            "channels": pa.array(c),
            "features": pa.array(list(feats), type=pa.list_(pa.float64())),
        })


def extract_image_features(ds, concurrency=(1, 4),
                           batch_size: int = MEDIA_BATCH_SIZE,
                           use_real_decode: bool = False):
    return ds.map_batches(ImageFeatureExtractor, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs={
                              "use_real_decode": use_real_decode})


class GifFrameSampler:
    """Actor-pool stage: REAL frame sampling over animated GIF payloads
    (the one motion format decodable without ffmpeg — see
    :mod:`raystack.ops.gif`). Each media row explodes into every-nth
    composited frame, re-encoded as PNG (library-free, lossless) so the
    output column is a storable image payload, not raw pixels. MP4
    stays honestly stub-gated in :func:`frame_sample_stub`."""

    def __init__(self, every_n: int = 1, max_frames: int = 8):
        from raystack.ops.gif import decode_gif_frames  # once per actor
        self._decode = decode_gif_frames
        self.every_n = every_n
        self.max_frames = max_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        import struct
        mids, fidx, w_, h_, payloads = [], [], [], [], []
        col = t["payload"]
        ids = t["media_id"]
        for i in range(t.num_rows):
            p = col[i].as_py()
            if p is None or bytes(p[:4]) != b"GIF8":
                continue
            try:
                frames = self._decode(p, every_n=self.every_n,
                                      max_frames=self.max_frames)
            except (ValueError, IndexError, struct.error):
                continue
            for k, fr in enumerate(frames):
                mids.append(ids[i].as_py())
                fidx.append(k * self.every_n)
                h_.append(fr.shape[0])
                w_.append(fr.shape[1])
                payloads.append(encode_png(fr))
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int64()),
            "width": pa.array(w_, pa.int64()),
            "height": pa.array(h_, pa.int64()),
            "frame": pa.array(payloads, pa.large_binary()),
        })


def sample_gif_frames(ds, every_n: int = 1, max_frames: int = 8,
                      concurrency=(1, 4),
                      batch_size: int = MEDIA_BATCH_SIZE):
    """Explode animated GIF media rows into sampled frame rows (PNG
    payloads) via an actor pool; non-GIF rows drop out."""
    return ds.map_batches(GifFrameSampler, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs={
                              "every_n": every_n,
                              "max_frames": max_frames})


def frame_sample_stub(ds, every_n: int = 30):
    """Video frame sampling stub: real plumbing (flat_map-style explode of
    one media row into frame rows with frame_idx), fake frame payloads
    (64-byte slices of the source bytes). Fully vectorized: the explode,
    the per-frame byte gather and the output offsets are numpy over the
    flattened payload buffer — no per-row Python."""
    def fn(t: pa.Table) -> pa.Table:
        from .hashing import flatten_column
        data, starts, lengths = flatten_column(t["payload"])
        mids = np.asarray(t["media_id"]).astype(np.int64)
        n_frames = np.clip(lengths // (every_n * 64), 1, 8).astype(np.int64)
        total = int(n_frames.sum())
        row_rep = np.repeat(np.arange(len(mids)), n_frames)
        fi = (np.arange(total)
              - np.repeat(np.cumsum(n_frames) - n_frames, n_frames))
        f_start = starts[row_rep] + fi * 64
        f_end = np.minimum(f_start + 64, starts[row_rep] + lengths[row_rep])
        span = np.arange(64)
        gather = f_start[:, None] + span  # (total, 64)
        valid = gather < f_end[:, None]
        buf = data[gather[valid]] if total else np.empty(0, np.uint8)
        out_lens = valid.sum(axis=1) if total else np.empty(0, np.int64)
        offsets = np.concatenate([[0], np.cumsum(out_lens)]).astype(np.int64)
        frames = pa.Array.from_buffers(
            pa.large_binary(), total,
            [None, pa.py_buffer(offsets.tobytes()),
             pa.py_buffer(buf.tobytes())])
        return pa.table({"media_id": pa.array(mids[row_rep], pa.int64()),
                         "frame_idx": pa.array(fi, pa.int64()),
                         "frame": frames})
    return ds.map_batches(fn, batch_format="pyarrow",
                          batch_size=MEDIA_BATCH_SIZE)
