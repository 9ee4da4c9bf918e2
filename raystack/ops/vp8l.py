"""From-scratch VP8L (lossless WebP) decoder + fixture encoder.

Implements the public "WebP Lossless Bitstream Specification": LSB-first
bit reading, canonical prefix codes (simple 1/2-symbol and
code-length-coded forms), the LZ77 backward-reference + color-cache
pixel stream, meta prefix-code groups (entropy image), and all four
transforms (predictor, color, subtract-green, color-indexing incl.
sub-byte pixel bundling) inverted in reverse order.

Scope and honesty: this is a REFERENCE decoder — a clear, pure-Python
bit-by-bit implementation meant for correctness (the per-pixel loop is
Python, not numpy, so throughput is ~100k pixels/s; crawl thumbnails
decode in milliseconds, don't put a 50-megapixel PNG-replacement
through it). Lossy VP8 stays a metadata probe (`probe_webp`) — a VP8
intra-prediction + boolean-coder decode is out of scope without a
codec library.

The fixture encoder (`encode_vp8l`) emits legal streams exercising
every decode path we claim: literals under real code-length-coded
prefix codes, simple codes (constant images), LZ77 run backrefs
through both the distance-code neighbor map and the direct form, the
color cache (encoder and decoder share the hash), subtract-green,
single-tile predictor and color transforms, and palettes with and
without pixel bundling. Roundtrips are bit-exact.
"""

from __future__ import annotations

import struct

import numpy as np

# order in which code-length-code lengths are stored
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
              14, 15]

#: distance-code → (dx, dy) neighbor map (codes 1..120); code > 120 is
#: the literal distance - 120. From the spec's table.
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (8, 3), (-8, 3), (5, 7), (-5, 7), (7, 5),
    (-7, 5), (8, 4), (3, 8), (-3, 8), (8, 5), (-8, 5), (8, 6), (4, 8),
    (-4, 8), (8, 7), (-8, 7), (8, 8)]


class Vp8lError(ValueError):
    pass


# ---------------------------------------------------------------------------
# bit I/O (LSB-first within each byte; prefix-code bits MSB-of-code first)
# ---------------------------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.n = len(data) * 8

    def bit(self) -> int:
        p = self.pos
        if p >= self.n:
            raise Vp8lError("bitstream truncated")
        self.pos = p + 1
        return (self.d[p >> 3] >> (p & 7)) & 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.n:
            raise Vp8lError("bitstream truncated")
        byte = self.pos >> 3
        chunk = int.from_bytes(self.d[byte:byte + 7], "little")
        v = (chunk >> (self.pos & 7)) & ((1 << n) - 1)
        self.pos += n
        return v

    def peek(self, n: int) -> int:
        """Next ``n`` stream bits without consuming (zero-padded past the
        end — the consumer checks its own code length against ``n``)."""
        byte = self.pos >> 3
        chunk = int.from_bytes(self.d[byte:byte + 7], "little")
        return (chunk >> (self.pos & 7)) & ((1 << n) - 1)


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, v: int, n: int) -> None:
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def put_code(self, code: int, length: int) -> None:
        # prefix-code bits go MSB-first into the LSB-first stream
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------

def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical assignment (shorter codes
    first; ties by symbol order)."""
    pairs = sorted((ln, s) for s, ln in enumerate(lengths) if ln > 0)
    codes = {}
    code, prev_len = 0, pairs[0][0] if pairs else 0
    for ln, s in pairs:
        code <<= (ln - prev_len)
        codes[s] = (code, ln)
        code += 1
        prev_len = ln
    return codes


class _Tree:
    """Flat-LUT decoder for a canonical prefix code (the jpeg.py trick):
    peek ``bits`` stream bits, one table lookup gives (symbol, length).
    Table index low bits = first-read bits = the canonical code reversed,
    so each code fills every index sharing its reversed prefix."""

    __slots__ = ("sym", "ln", "bits", "leaf")

    def __init__(self):
        self.leaf = None

    @classmethod
    def from_lengths(cls, lengths: list[int]) -> "_Tree":
        used = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
        root = cls()
        if len(used) == 1:  # degenerate: zero bits read, always symbol
            root.leaf = used[0][0]
            return root
        bits = max(ln for _, ln in used)
        root.bits = bits
        root.sym = np.zeros(1 << bits, dtype=np.int32)
        root.ln = np.zeros(1 << bits, dtype=np.uint8)
        for s, (code, ln) in _canonical_codes(lengths).items():
            rev = 0
            for i in range(ln):
                rev |= ((code >> i) & 1) << (ln - 1 - i)
            idx = np.arange(rev, 1 << bits, 1 << ln)
            root.sym[idx] = s
            root.ln[idx] = ln
        return root

    def decode(self, br: _BitReader) -> int:
        if self.leaf is not None:
            return self.leaf
        idx = br.peek(self.bits)
        ln = int(self.ln[idx])
        if ln == 0 or br.pos + ln > br.n:
            raise Vp8lError("invalid prefix code or truncated stream")
        br.pos += ln
        return int(self.sym[idx])


def _read_code_lengths(br: _BitReader, alphabet: int) -> list[int]:
    """The code-length-coded (normal) prefix-code form."""
    num_clc = 4 + br.read(4)
    clc_len = [0] * 19
    for i in range(num_clc):
        clc_len[_CLC_ORDER[i]] = br.read(3)
    clc_tree = _Tree.from_lengths(clc_len)
    max_symbol = alphabet
    if br.bit():  # use_max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet:
            raise Vp8lError("max_symbol exceeds alphabet")
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < max_symbol:
        sym = clc_tree.decode(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < alphabet:
                    lengths[i] = prev
                i += 1
        elif sym == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    if i > alphabet:
        raise Vp8lError("code lengths overflow alphabet")
    return lengths


def _read_prefix_code(br: _BitReader, alphabet: int) -> _Tree:
    if br.bit():  # simple code: 1 or 2 symbols
        num_symbols = br.read(1) + 1
        if br.bit():  # first symbol is 8 bits
            s0 = br.read(8)
        else:
            s0 = br.read(1)
        lengths = [0] * alphabet
        if num_symbols == 1:
            lengths[s0] = 1  # degenerate (0-bit) code
            t = _Tree()
            t.leaf = s0
            return t
        s1 = br.read(8)
        lengths[s0] = 1
        lengths[s1] = 1
        return _Tree.from_lengths(lengths)
    return _Tree.from_lengths(_read_code_lengths(br, alphabet))


def _prefix_value(code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decoding."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


# ---------------------------------------------------------------------------
# spatially-coded image (the entropy-coded pixel stream)
# ---------------------------------------------------------------------------

def _cache_index(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _decode_entropy_image(br: _BitReader, w: int, h: int,
                          top_level: bool = False):
    """Decode one entropy-coded image (the spec's decode_image_stream
    minus transforms): optional color cache, optional meta prefix codes
    (top level only), pixel stream. Returns uint32 ARGB array (h, w)."""
    cache_bits = br.read(4) if br.bit() else 0
    if cache_bits and not (1 <= cache_bits <= 11):
        raise Vp8lError("bad color cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta = None
    meta_bits = 0
    n_groups = 1
    if top_level and br.bit():  # meta prefix codes
        meta_bits = 3 + br.read(3)
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta = _decode_entropy_image(br, mw, mh)
        n_groups = int(((meta >> 8) & 0xFFFF).max()) + 1

    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append((_read_prefix_code(br, green_alpha),
                       _read_prefix_code(br, 256),
                       _read_prefix_code(br, 256),
                       _read_prefix_code(br, 256),
                       _read_prefix_code(br, 40)))

    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    total = w * h
    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            mp = int(meta[y >> meta_bits, x >> meta_bits])
            g = groups[(mp >> 8) & 0xFFFF]
        else:
            g = groups[0]
        green_t, red_t, blue_t, alpha_t, dist_t = g
        s = green_t.decode(br)
        if s < 256:  # literal
            red = red_t.decode(br)
            blue = blue_t.decode(br)
            alpha = alpha_t.decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache is not None:
                cache[_cache_index(px, cache_bits)] = px
            pos += 1
        elif s < 256 + 24:  # backward reference
            length = _prefix_value(s - 256, br)
            dcode = _prefix_value(dist_t.decode(br), br)
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > total:
                raise Vp8lError("backref out of range")
            for i in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache is not None:
                    cache[_cache_index(px, cache_bits)] = px
                pos += 1
        else:  # color cache hit
            if cache is None:
                raise Vp8lError("cache symbol without color cache")
            out[pos] = cache[s - 256 - 24]
            pos += 1
    return out.reshape(h, w)


# ---------------------------------------------------------------------------
# transforms (inverse, applied in reverse order of reading)
# ---------------------------------------------------------------------------

def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return ((a.astype(np.uint16) + b.astype(np.uint16)) >> 1) \
        .astype(np.uint8)


def _channels(px: np.ndarray):
    return ((px >> 24) & 0xFF).astype(np.uint8), \
        ((px >> 16) & 0xFF).astype(np.uint8), \
        ((px >> 8) & 0xFF).astype(np.uint8), \
        (px & 0xFF).astype(np.uint8)


def _pack(a, r, g, b) -> np.uint32:
    return ((a.astype(np.uint32) << 24) | (r.astype(np.uint32) << 16)
            | (g.astype(np.uint32) << 8) | b.astype(np.uint32))


def _predict_one(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    """One pixel's predictor (ints are packed ARGB)."""
    def ch(p):
        return ((p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF,
                p & 0xFF)

    def pk(c):
        return (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3]

    def avg(p, q):
        cp, cq = ch(p), ch(q)
        return pk(tuple((a + b) >> 1 for a, b in zip(cp, cq)))

    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return avg(avg(left, tr), top)
    if mode == 6:
        return avg(left, tl)
    if mode == 7:
        return avg(left, top)
    if mode == 8:
        return avg(tl, top)
    if mode == 9:
        return avg(top, tr)
    if mode == 10:
        return avg(avg(left, tl), avg(top, tr))
    if mode == 11:  # Select
        cl, ct, ctl = ch(left), ch(top), ch(tl)
        p = [a + b - c for a, b, c in zip(cl, ct, ctl)]
        pl = sum(abs(x - y) for x, y in zip(p, cl))
        pt = sum(abs(x - y) for x, y in zip(p, ct))
        return left if pl <= pt else top
    if mode == 12:  # ClampAddSubtractFull
        cl, ct, ctl = ch(left), ch(top), ch(tl)
        return pk(tuple(min(255, max(0, a + b - c))
                        for a, b, c in zip(cl, ct, ctl)))
    if mode == 13:  # ClampAddSubtractHalf
        cl, ct, ctl = ch(left), ch(top), ch(tl)
        ave = tuple((a + b) >> 1 for a, b in zip(cl, ct))
        return pk(tuple(min(255, max(0, a + int((a - c) / 2)))
                        for a, c in zip(ave, ctl)))
    raise Vp8lError(f"invalid predictor mode {mode}")


def _inv_predictor(px: np.ndarray, tiles: np.ndarray,
                   bits: int) -> np.ndarray:
    h, w = px.shape
    out = np.zeros_like(px)
    modes = (tiles >> 8) & 0xFF  # green channel holds the mode
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])        # mode 1 (L) on row 0
            elif x == 0:
                pred = int(out[y - 1, 0])        # mode 2 (T) on col 0
            else:
                mode = int(modes[y >> bits, x >> bits])
                left = int(out[y, x - 1])
                top = int(out[y - 1, x])
                tl = int(out[y - 1, x - 1])
                # At the right edge TR wraps in raster order to the
                # CURRENT row's leftmost pixel (RFC 9649 §4.2: pixel at
                # linear index pos-width+1 == out[y, 0], already decoded).
                tr = int(out[y - 1, x + 1]) if x + 1 < w \
                    else int(out[y, 0])
                pred = _predict_one(mode, left, top, tl, tr)
            v = int(px[y, x])
            out[y, x] = (((((v >> 24) + (pred >> 24)) & 0xFF) << 24)
                         | ((((v >> 16) + (pred >> 16)) & 0xFF) << 16)
                         | ((((v >> 8) + (pred >> 8)) & 0xFF) << 8)
                         | ((v + pred) & 0xFF))
    return out


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(int8(t) * int8(c)) >> 5, vectorized, result int16."""
    return ((t.astype(np.int8).astype(np.int16)
             * c.astype(np.int8).astype(np.int16)) >> 5)


def _inv_color_transform(px: np.ndarray, tiles: np.ndarray,
                         bits: int) -> np.ndarray:
    h, w = px.shape
    ys = (np.arange(h) >> bits)[:, None]
    xs = (np.arange(w) >> bits)[None, :]
    cte = tiles[ys, xs]
    g2r = (cte & 0xFF).astype(np.uint8)
    g2b = ((cte >> 8) & 0xFF).astype(np.uint8)
    r2b = ((cte >> 16) & 0xFF).astype(np.uint8)
    a, r, g, b = _channels(px)
    new_r = ((r.astype(np.int16) + _ct_delta(g2r, g)) & 0xFF) \
        .astype(np.uint8)
    new_b = ((b.astype(np.int16) + _ct_delta(g2b, g)
              + _ct_delta(r2b, new_r)) & 0xFF).astype(np.uint8)
    return _pack(a, new_r, g, new_b)


def _inv_subtract_green(px: np.ndarray) -> np.ndarray:
    a, r, g, b = _channels(px)
    r = ((r.astype(np.uint16) + g) & 0xFF).astype(np.uint8)
    b = ((b.astype(np.uint16) + g) & 0xFF).astype(np.uint8)
    return _pack(a, r, g, b)


def _palette_width_bits(size: int) -> int:
    if size <= 2:
        return 3
    if size <= 4:
        return 2
    if size <= 16:
        return 1
    return 0


def _inv_color_indexing(px: np.ndarray, palette: np.ndarray,
                        true_width: int) -> np.ndarray:
    h = px.shape[0]
    wb = _palette_width_bits(len(palette))
    if wb:  # unbundle sub-byte indices from the green channel
        per = 8 >> (3 - wb)              # pixels packed per byte
        ibits = 8 // per
        g = ((px >> 8) & 0xFF).astype(np.uint32)
        idx = np.zeros((h, true_width), dtype=np.int64)
        for i in range(per):
            cols = np.arange(i, true_width, per)
            src = g[:, (cols // per)]
            idx[:, cols] = (src >> (ibits * i)) & ((1 << ibits) - 1)
    else:
        idx = ((px >> 8) & 0xFF).astype(np.int64)
        idx = idx[:, :true_width]
    if idx.max(initial=0) >= len(palette):
        raise Vp8lError("palette index out of range")
    return palette[idx]


# ---------------------------------------------------------------------------
# public decode
# ---------------------------------------------------------------------------

def decode_vp8l(payload: bytes) -> np.ndarray:
    """Decode a raw VP8L payload (the bytes of the ``VP8L`` RIFF chunk)
    to an (h, w, 4) uint8 RGBA array."""
    if not payload or payload[0] != 0x2F:
        raise Vp8lError("bad VP8L signature")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)      # alpha hint
    if br.read(3) != 0:
        raise Vp8lError("unknown VP8L version")

    transforms = []  # applied in reverse after pixel decode
    xsize = w
    seen = set()
    while br.bit():
        ttype = br.read(2)
        if ttype in seen:
            raise Vp8lError("duplicate transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            bits = br.read(3) + 2
            tw = (xsize + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            tiles = _decode_entropy_image(br, tw, th)
            transforms.append(("pred", bits, tiles))
        elif ttype == 1:  # color transform
            bits = br.read(3) + 2
            tw = (xsize + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            tiles = _decode_entropy_image(br, tw, th)
            transforms.append(("color", bits, tiles))
        elif ttype == 2:  # subtract green
            transforms.append(("subgreen",))
        else:  # color indexing
            size = br.read(8) + 1
            pal_img = _decode_entropy_image(br, size, 1)[0]
            # palette entries are stored as component-wise deltas
            acc = np.zeros(size, dtype=np.uint32)
            prev = 0
            for i in range(size):
                v = int(pal_img[i])
                cur = ((((prev >> 24) + (v >> 24)) & 0xFF) << 24) \
                    | ((((prev >> 16) + (v >> 16)) & 0xFF) << 16) \
                    | ((((prev >> 8) + (v >> 8)) & 0xFF) << 8) \
                    | ((prev + v) & 0xFF)
                acc[i] = cur
                prev = cur
            wb = _palette_width_bits(size)
            transforms.append(("palette", acc, xsize))
            if wb:
                per = 8 >> (3 - wb)
                xsize = (xsize + per - 1) // per

    px = _decode_entropy_image(br, xsize, h, top_level=True)
    for t in reversed(transforms):
        if t[0] == "pred":
            px = _inv_predictor(px, t[2], t[1])
        elif t[0] == "color":
            px = _inv_color_transform(px, t[2], t[1])
        elif t[0] == "subgreen":
            px = _inv_subtract_green(px)
        else:
            px = _inv_color_indexing(px, t[1], t[2])

    a, r, g, b = _channels(px)
    return np.stack([r, g, b, a], axis=-1)


def decode_webp(data: bytes) -> np.ndarray:
    """Decode a lossless WebP file (RIFF container with a VP8L chunk) to
    (h, w, 4) uint8 RGBA. Lossy (VP8) and extended (VP8X-wrapped lossy)
    files raise — use :func:`raystack.ops.multimodal.probe_webp` for
    their metadata."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise Vp8lError("not a WebP file")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if tag == b"VP8L":
            return decode_vp8l(body)
        pos += 8 + size + (size & 1)
    raise Vp8lError("no VP8L chunk (lossy WebP is probe-only)")


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------

def _build_lengths(freqs: dict[int, int], alphabet: int,
                   max_len: int = 15) -> list[int]:
    """Huffman code lengths from frequencies (package-merge-free: plain
    huffman, then a flatten fallback if a length exceeds the limit)."""
    import heapq
    used = sorted(s for s, f in freqs.items() if f > 0)
    lengths = [0] * alphabet
    if not used:
        return lengths
    if len(used) == 1:
        lengths[used[0]] = 1
        return lengths
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(
        sorted(freqs.items())) if f > 0]
    heapq.heapify(heap)
    depth = {s: 0 for s in used}
    tick = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, tick, s1 + s2))
        tick += 1
    if max(depth.values()) > max_len:
        flat = max(1, (len(used) - 1).bit_length())
        for s in used:
            lengths[s] = flat
    else:
        for s, d in depth.items():
            lengths[s] = d
    return lengths


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> None:
    """Emit a prefix code: the simple form when ≤2 symbols are used,
    else the code-length-coded form (no run symbols — each length
    emitted directly under a CL code over the used length values)."""
    used = [s for s, ln in enumerate(lengths) if ln > 0]
    if len(used) <= 2 and (not used or max(used) < 256):
        bw.put(1, 1)                         # simple
        bw.put(len(used) - 1 if used else 0, 1)
        s0 = used[0] if used else 0
        if s0 > 1:
            bw.put(1, 1)
            bw.put(s0, 8)
        else:
            bw.put(0, 1)
            bw.put(s0, 1)
        if len(used) == 2:
            bw.put(used[1], 8)
        return
    bw.put(0, 1)                             # normal form
    # CL code over the sequence of per-symbol lengths (incl. zeros)
    upto = max(used) + 1
    clc_freq: dict[int, int] = {}
    for ln in lengths[:upto]:
        clc_freq[ln] = clc_freq.get(ln, 0) + 1
    clc_len = _build_lengths(clc_freq, 19, max_len=7)
    # num_code_lengths must cover every used CL symbol in _CLC_ORDER
    need = max(i for i, s in enumerate(_CLC_ORDER) if clc_len[s] > 0) + 1
    num_clc = max(4, need)
    bw.put(num_clc - 4, 4)
    for i in range(num_clc):
        bw.put(clc_len[_CLC_ORDER[i]], 3)
    clc_codes = _canonical_codes(clc_len)
    if upto < len(lengths):
        bw.put(1, 1)                         # use_max_symbol
        nbits = 2 + 2 * 7                    # 16-bit field: always fits
        bw.put(7, 3)
        bw.put(upto - 2, nbits)
    else:
        bw.put(0, 1)
    single_cl = len([v for v in clc_codes]) == 1
    for ln in lengths[:upto]:
        if not single_cl:
            c, cl = clc_codes[ln]
            bw.put_code(c, cl)
        # a single-symbol CL code is 0 bits (degenerate) — nothing to emit


def _sym_stream(img: np.ndarray, w: int, cache_bits: int,
                use_lz77: bool):
    """Plan the symbol stream for the fixture encoder: literals, run
    backrefs (dist 1 / dist w via the neighbor map) and cache hits.
    Returns a list of ops mirrored exactly by the decoder."""
    flat = img.reshape(-1)
    total = len(flat)
    cache = [None] * (1 << cache_bits) if cache_bits else None
    ops = []
    pos = 0
    while pos < total:
        px = int(flat[pos])
        if use_lz77 and pos:
            # run of the previous pixel → (length, dist=1) backref
            if px == int(flat[pos - 1]):
                run = 1
                while run < 4096 and pos + run < total \
                        and int(flat[pos + run]) == int(flat[pos - 1]):
                    run += 1
                ops.append(("ref", run, 1))
                if cache is not None:
                    cache[_cache_index(px, cache_bits)] = px
                pos += run
                continue
            if pos >= w and px == int(flat[pos - w]):
                run = 1
                while run < 4096 and pos + run < total \
                        and int(flat[pos + run]) \
                        == int(flat[pos + run - w]):
                    run += 1
                ops.append(("ref", run, w))
                for i in range(run):
                    if cache is not None:
                        c = int(flat[pos + i])
                        cache[_cache_index(c, cache_bits)] = c
                pos += run
                continue
        if cache is not None and cache[_cache_index(px, cache_bits)] == px:
            ops.append(("cache", _cache_index(px, cache_bits)))
            pos += 1
            continue
        ops.append(("lit", px))
        if cache is not None:
            cache[_cache_index(px, cache_bits)] = px
        pos += 1
    return ops


def _length_to_prefix(v: int):
    """Inverse of _prefix_value: value → (code, extra_bits, extra_val)."""
    if v <= 4:
        return v - 1, 0, 0
    bits = (v - 1).bit_length() - 1
    rem = v - 1 - (1 << bits)
    if rem < (1 << (bits - 1)):
        return 2 * bits, bits - 1, rem
    return 2 * bits + 1, bits - 1, rem - (1 << (bits - 1))


def _emit_entropy_image(bw: _BitWriter, img: np.ndarray, w: int,
                        cache_bits: int = 0, use_lz77: bool = False,
                        top_level: bool = False) -> None:
    if cache_bits:
        bw.put(1, 1)
        bw.put(cache_bits, 4)
    else:
        bw.put(0, 1)
    if top_level:
        bw.put(0, 1)  # no meta prefix codes
    ops = _sym_stream(img, w, cache_bits, use_lz77)

    gfreq: dict[int, int] = {}
    rfreq: dict[int, int] = {}
    bfreq: dict[int, int] = {}
    afreq: dict[int, int] = {}
    dfreq: dict[int, int] = {}
    for op in ops:
        if op[0] == "lit":
            px = op[1]
            gfreq[(px >> 8) & 0xFF] = gfreq.get((px >> 8) & 0xFF, 0) + 1
            rfreq[(px >> 16) & 0xFF] = rfreq.get((px >> 16) & 0xFF, 0) + 1
            bfreq[px & 0xFF] = bfreq.get(px & 0xFF, 0) + 1
            afreq[px >> 24] = afreq.get(px >> 24, 0) + 1
        elif op[0] == "ref":
            lcode = 256 + _length_to_prefix(op[1])[0]
            gfreq[lcode] = gfreq.get(lcode, 0) + 1
            # dist 1 → neighbor code 2; dist w → neighbor code 1;
            # everything else direct (code = dist + 120)
            dv = 2 if op[2] == 1 else (1 if op[2] == w else op[2] + 120)
            dcode = _length_to_prefix(dv)[0]
            dfreq[dcode] = dfreq.get(dcode, 0) + 1
        else:
            sym = 256 + 24 + op[1]
            gfreq[sym] = gfreq.get(sym, 0) + 1

    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    glen = _build_lengths(gfreq, green_alpha)
    rlen = _build_lengths(rfreq, 256)
    blen = _build_lengths(bfreq, 256)
    alen = _build_lengths(afreq, 256)
    dlen = _build_lengths(dfreq, 40)
    for ln in (glen, rlen, blen, alen, dlen):
        _write_prefix_code(bw, ln)
    gc, rc, bc = _canonical_codes(glen), _canonical_codes(rlen), \
        _canonical_codes(blen)
    ac, dc = _canonical_codes(alen), _canonical_codes(dlen)

    def emit(codes, s):
        if len(codes) == 1:  # degenerate 0-bit code
            return
        c, ln = codes[s]
        bw.put_code(c, ln)

    for op in ops:
        if op[0] == "lit":
            px = op[1]
            emit(gc, (px >> 8) & 0xFF)
            emit(rc, (px >> 16) & 0xFF)
            emit(bc, px & 0xFF)
            emit(ac, px >> 24)
        elif op[0] == "ref":
            lcode, lx, lv = _length_to_prefix(op[1])
            emit(gc, 256 + lcode)
            bw.put(lv, lx)
            dv = 2 if op[2] == 1 else (1 if op[2] == w else op[2] + 120)
            dcode, dx_, dv_ = _length_to_prefix(dv)
            emit(dc, dcode)
            bw.put(dv_, dx_)
        else:
            emit(gc, 256 + 24 + op[1])


def encode_vp8l(rgba: np.ndarray, *, subtract_green: bool = False,
                predictor: int | None = None,
                color_transform: tuple[int, int, int] | None = None,
                palette: bool = False, cache_bits: int = 0,
                use_lz77: bool = False) -> bytes:
    """Fixture encoder: (h, w, 4) uint8 RGBA → lossless WebP file bytes.
    Every option maps 1:1 to a decoder path; combinations compose in
    spec order (color-indexing ⊥ the pixel transforms here)."""
    h, w, _ = rgba.shape
    a = rgba[..., 3].astype(np.uint32)
    r = rgba[..., 0].astype(np.uint32)
    g = rgba[..., 1].astype(np.uint32)
    b = rgba[..., 2].astype(np.uint32)
    px = (a << 24) | (r << 16) | (g << 8) | b

    bw = _BitWriter()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(int((rgba[..., 3] != 255).any()), 1)
    bw.put(0, 3)  # version

    xsize = w
    if palette:
        if subtract_green or predictor is not None or color_transform:
            raise ValueError("fixture: palette composes alone")
        colors, inv = np.unique(px.reshape(-1), return_inverse=True)
        if len(colors) > 256:
            raise ValueError("palette fixture needs ≤256 colors")
        bw.put(1, 1)
        bw.put(3, 2)                          # color indexing
        bw.put(len(colors) - 1, 8)
        deltas = np.zeros(len(colors), dtype=np.uint32)
        prev = 0
        for i, c in enumerate(colors.tolist()):
            deltas[i] = ((((c >> 24) - (prev >> 24)) & 0xFF) << 24) \
                | ((((c >> 16) - (prev >> 16)) & 0xFF) << 16) \
                | ((((c >> 8) - (prev >> 8)) & 0xFF) << 8) \
                | ((c - prev) & 0xFF)
            prev = c
        _emit_entropy_image(bw, deltas.reshape(1, -1), len(colors))
        idx = inv.reshape(h, w)
        wb = _palette_width_bits(len(colors))
        if wb:
            per = 8 >> (3 - wb)
            ibits = 8 // per
            xsize = (w + per - 1) // per
            packed = np.zeros((h, xsize), dtype=np.uint32)
            for i in range(per):
                cols = np.arange(i, w, per)
                packed[:, cols // per] |= \
                    (idx[:, cols].astype(np.uint32) << np.uint32(ibits * i))
            px = (np.uint32(0xFF) << 24) | (packed << 8)
        else:
            xsize = w
            px = (np.uint32(0xFF) << 24) | (idx.astype(np.uint32) << 8)
    else:
        if predictor is not None:
            # single-tile predictor (size_bits chosen to cover the image)
            bits = max(2, (max(w, h) - 1).bit_length())
            bw.put(1, 1)
            bw.put(0, 2)
            bw.put(bits - 2, 3)
            tile = np.array([[0xFF000000 | (predictor << 8)]],
                            dtype=np.uint32)
            _emit_entropy_image(bw, tile, 1)
            res = np.zeros_like(px)
            dec = px  # true pixels (decoder reconstructs these)
            for y in range(h):
                for x in range(w):
                    if x == 0 and y == 0:
                        pred = 0xFF000000
                    elif y == 0:
                        pred = int(dec[0, x - 1])
                    elif x == 0:
                        pred = int(dec[y - 1, 0])
                    else:
                        left = int(dec[y, x - 1])
                        top = int(dec[y - 1, x])
                        tl = int(dec[y - 1, x - 1])
                        # right edge: TR wraps to the current row's
                        # leftmost pixel (see _inv_predictor)
                        tr = int(dec[y - 1, x + 1]) if x + 1 < w \
                            else int(dec[y, 0])
                        pred = _predict_one(predictor, left, top, tl, tr)
                    v = int(px[y, x])
                    res[y, x] = \
                        (((((v >> 24) - (pred >> 24)) & 0xFF) << 24)
                         | ((((v >> 16) - (pred >> 16)) & 0xFF) << 16)
                         | ((((v >> 8) - (pred >> 8)) & 0xFF) << 8)
                         | ((v - pred) & 0xFF))
            px = res
        if color_transform is not None:
            g2r, g2b, r2b = color_transform
            bits = max(2, (max(w, h) - 1).bit_length())
            bw.put(1, 1)
            bw.put(1, 2)
            bw.put(bits - 2, 3)
            cte = 0xFF000000 | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) \
                | (g2r & 0xFF)
            _emit_entropy_image(bw, np.array([[cte]], dtype=np.uint32), 1)
            aa, rr, gg, bb = _channels(px)
            g2r_a = np.full(px.shape, g2r & 0xFF, np.uint8)
            g2b_a = np.full(px.shape, g2b & 0xFF, np.uint8)
            r2b_a = np.full(px.shape, r2b & 0xFF, np.uint8)
            # forward transform: subtract the deltas (decoder adds)
            new_b = ((bb.astype(np.int16) - _ct_delta(g2b_a, gg)
                      - _ct_delta(r2b_a, rr)) & 0xFF).astype(np.uint8)
            new_r = ((rr.astype(np.int16) - _ct_delta(g2r_a, gg)) & 0xFF) \
                .astype(np.uint8)
            px = _pack(aa, new_r, gg, new_b)
        if subtract_green:
            bw.put(1, 1)
            bw.put(2, 2)
            aa, rr, gg, bb = _channels(px)
            rr = ((rr.astype(np.int16) - gg) & 0xFF).astype(np.uint8)
            bb = ((bb.astype(np.int16) - gg) & 0xFF).astype(np.uint8)
            px = _pack(aa, rr, gg, bb)
    bw.put(0, 1)  # end of transforms
    _emit_entropy_image(bw, px, xsize, cache_bits=cache_bits,
                        use_lz77=use_lz77, top_level=True)

    payload = b"\x2f" + bw.bytes()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
