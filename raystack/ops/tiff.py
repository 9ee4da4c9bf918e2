"""Library-free baseline TIFF decode (TIFF 6.0 spec, public): both byte
orders, 8-bit grayscale (incl. WhiteIsZero) and RGB/extra-sample images,
strip layout, uncompressed (Compression=1) and PackBits (32773). Tiled,
planar, palette, and LZW/JPEG-compressed files raise — never wrong
pixels. :func:`encode_tiff` is the symmetric fixture writer.

TIFF scans are the one still-image crawl format the media tier lacked;
``decode_image_any`` sniffs the ``II*\\0`` / ``MM\\0*`` magic and routes
here.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_TILE_WIDTH = 322

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_ifd(buf: memoryview, off: int, e: str) -> dict[int, list[int]]:
    (count,) = struct.unpack_from(e + "H", buf, off)
    tags: dict[int, list[int]] = {}
    for i in range(count):
        base = off + 2 + 12 * i
        tag, typ, n = struct.unpack_from(e + "HHI", buf, base)
        size = _TYPE_SIZE.get(typ, 1) * n
        if size <= 4:
            voff = base + 8
        else:
            (voff,) = struct.unpack_from(e + "I", buf, base + 8)
        if typ == 3:
            vals = list(struct.unpack_from(e + f"{n}H", buf, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(e + f"{n}I", buf, voff))
        elif typ == 1:
            vals = list(bytes(buf[voff:voff + n]))
        else:  # rational/ascii etc. — not needed for the baseline tags
            vals = [0]
        tags[tag] = vals
    return tags


def _unpackbits(data: bytes, expected: int) -> bytes:
    """PackBits (Apple RLE, TIFF 6.0 §9): [0,127]=copy n+1 literals,
    [-127,-1]=repeat next byte 1-n times, -128=noop."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1
            out += data[i:i + c + 1]
            i += c + 1
        elif c == 128:  # noop
            continue
        else:  # repeat next byte 257-c times
            if i >= n:
                raise ValueError("truncated PackBits stream")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    if len(out) < expected:
        raise ValueError("short PackBits strip")
    return bytes(out[:expected])


def decode_tiff(payload: bytes) -> np.ndarray:
    """TIFF → (h, w) grayscale or (h, w, s) uint8 array."""
    buf = memoryview(payload)
    head = bytes(buf[:4])
    if head == b"II*\x00":
        e = "<"
    elif head == b"MM\x00*":
        e = ">"
    else:
        raise ValueError(f"not a TIFF payload: {head!r}")
    (ifd_off,) = struct.unpack_from(e + "I", buf, 4)
    tags = _read_ifd(buf, ifd_off, e)
    if _TAG_TILE_WIDTH in tags:
        raise ValueError("tiled TIFF not supported (strip layout only)")
    w = tags[_TAG_WIDTH][0]
    h = tags[_TAG_HEIGHT][0]
    spp = tags.get(_TAG_SPP, [1])[0]
    bits = tags.get(_TAG_BITS, [8])
    if any(b != 8 for b in bits):
        raise ValueError(f"only 8-bit samples supported, got {bits}")
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    if comp not in (1, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    if tags.get(_TAG_PLANAR, [1])[0] != 1:
        raise ValueError("planar (separated) TIFF not supported")
    photo = tags.get(_TAG_PHOTOMETRIC, [1])[0]
    if photo not in (0, 1, 2):
        raise ValueError(f"unsupported photometric {photo}")
    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags[_TAG_STRIP_COUNTS]
    rps = tags.get(_TAG_ROWS_PER_STRIP, [h])[0] or h
    row_bytes = w * spp
    parts = []
    rows_left = h
    for s, (o, c) in enumerate(zip(offsets, counts)):
        strip_rows = min(rps, rows_left)
        raw = bytes(buf[o:o + c])
        if len(raw) < c:
            raise ValueError("truncated TIFF strip")
        if comp == 32773:
            raw = _unpackbits(raw, strip_rows * row_bytes)
        elif len(raw) < strip_rows * row_bytes:
            raise ValueError("short TIFF strip")
        parts.append(np.frombuffer(raw[: strip_rows * row_bytes],
                                   dtype=np.uint8))
        rows_left -= strip_rows
    flat = np.concatenate(parts)
    img = flat.reshape(h, w, spp) if spp > 1 else flat.reshape(h, w)
    if photo == 0:  # WhiteIsZero: invert to the BlackIsZero convention
        img = (255 - img.astype(np.int16)).astype(np.uint8)
    return np.ascontiguousarray(img)


def _packbits(row: bytes) -> bytes:
    """PackBits encoder: repeat packets for runs >= 3, literal otherwise."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
        else:
            # literal packet: extend until a >=3 run starts or the 128 cap
            j = i + 1
            while j < n and (j - i) < 128:
                if j + 2 < n and row[j] == row[j + 1] == row[j + 2]:
                    break
                j += 1
            out += bytes([j - i - 1]) + row[i:j]
            i = j
    return bytes(out)


def encode_tiff(img: np.ndarray, compression: str = "none",
                byteorder: str = "<", white_is_zero: bool = False,
                rows_per_strip: int | None = None) -> bytes:
    """Minimal strip-layout TIFF writer (fixture twin of
    :func:`decode_tiff`)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w, spp = img.shape[0], img.shape[1], 1
        flat = img
    else:
        h, w, spp = img.shape
        flat = img.reshape(h, w * spp)
    if white_is_zero:
        if spp != 1:
            raise ValueError("WhiteIsZero is a grayscale convention")
        flat = (255 - flat.astype(np.int16)).astype(np.uint8)
    e = byteorder
    if e not in ("<", ">"):
        raise ValueError("byteorder must be '<' or '>'")
    rps = rows_per_strip or h
    strips = []
    for r0 in range(0, h, rps):
        raw = np.ascontiguousarray(flat[r0:r0 + rps]).tobytes()
        strips.append(_packbits(raw) if compression == "packbits" else raw)
    comp = 32773 if compression == "packbits" else 1
    photo = 0 if white_is_zero else (2 if spp > 1 else 1)

    header = struct.pack(e + "2sHI", b"II" if e == "<" else b"MM", 42, 8)
    n_strips = len(strips)
    # layout: header(8) | IFD | [offsets arrays] | bits array | strip data
    tag_list = [(_TAG_WIDTH, 3, 1), (_TAG_HEIGHT, 3, 1),
                (_TAG_BITS, 3, spp), (_TAG_COMPRESSION, 3, 1),
                (_TAG_PHOTOMETRIC, 3, 1), (_TAG_STRIP_OFFSETS, 4, n_strips),
                (_TAG_SPP, 3, 1), (_TAG_ROWS_PER_STRIP, 3, 1),
                (_TAG_STRIP_COUNTS, 4, n_strips)]
    ifd_size = 2 + 12 * len(tag_list) + 4
    extra_off = 8 + ifd_size
    extra = bytearray()

    def place(fmt_char, vals):
        nonlocal extra
        size = {"H": 2, "I": 4}[fmt_char] * len(vals)
        if size <= 4:
            packed = struct.pack(e + f"{len(vals)}{fmt_char}", *vals)
            return None, packed + b"\x00" * (4 - size)
        off = extra_off + len(extra)
        extra += struct.pack(e + f"{len(vals)}{fmt_char}", *vals)
        return off, None

    # strip offsets depend on total metadata size — compute in two passes
    bits_off, bits_inline = place("H", [8] * spp)
    counts_vals = [len(s) for s in strips]
    counts_off, counts_inline = place("I", counts_vals)
    offs_off, offs_inline = place("I", [0] * n_strips)  # patched below
    data_start = extra_off + len(extra)
    strip_offs = []
    pos = data_start
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)
    if offs_off is not None:
        struct.pack_into(e + f"{n_strips}I", extra,
                         offs_off - extra_off, *strip_offs)
        offs_inline = None
    else:
        offs_inline = struct.pack(e + f"{n_strips}I", *strip_offs) + \
            b"\x00" * (4 - 4 * n_strips)

    values = {
        _TAG_WIDTH: (None, struct.pack(e + "H", w) + b"\x00\x00"),
        _TAG_HEIGHT: (None, struct.pack(e + "H", h) + b"\x00\x00"),
        _TAG_BITS: (bits_off, bits_inline),
        _TAG_COMPRESSION: (None, struct.pack(e + "H", comp) + b"\x00\x00"),
        _TAG_PHOTOMETRIC: (None, struct.pack(e + "H", photo) + b"\x00\x00"),
        _TAG_STRIP_OFFSETS: (offs_off, offs_inline),
        _TAG_SPP: (None, struct.pack(e + "H", spp) + b"\x00\x00"),
        _TAG_ROWS_PER_STRIP: (None, struct.pack(e + "H", rps) + b"\x00\x00"),
        _TAG_STRIP_COUNTS: (counts_off, counts_inline),
    }
    ifd = bytearray(struct.pack(e + "H", len(tag_list)))
    for tag, typ, count in tag_list:
        off, inline = values[tag]
        ifd += struct.pack(e + "HHI", tag, typ, count)
        ifd += inline if off is None else struct.pack(e + "I", off)
    ifd += struct.pack(e + "I", 0)  # no next IFD
    assert len(ifd) == ifd_size
    return header + bytes(ifd) + bytes(extra) + b"".join(strips)

