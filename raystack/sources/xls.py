"""Minimal pure-stdlib legacy ``.xls`` (BIFF8) I/O — closes the last
Excel-surface gap vs the reference, whose test corpus and converters
accept both ``.xls`` and ``.xlsx`` (``/root/reference/d6tstack/
convert_xls.py:24-98``, ``reference/tests/test_xls.py:21-272`` build
their ``.xls`` fixtures with ``df.to_excel``/xlwt; no xlrd/xlwt ships in
this container).

Two public formats are implemented from their published specs:

- **[MS-CFB]** compound file binary container: FAT/miniFAT sector chains,
  DIFAT, directory entries — enough to locate and read the ``Workbook``
  stream (and to write a minimal single-stream container).
- **[MS-XLS]** BIFF8 record stream: workbook globals (BOUNDSHEET sheet
  directory, shared-string table incl. CONTINUE splits) and worksheet
  cell records (NUMBER, RK, MULRK, LABELSST, LABEL, BOOLERR, FORMULA
  cached values, BLANK).

Scope mirrors the sibling OOXML reader (`xlsx.py`). Date *styles* are
honored like the reference's pandas/xlrd stack: FORMAT + XF records map
each cell's ``ixfe`` to a number format, and date/time-formatted serials
come back as datetime/time values (builtin id table + custom format-code
classification in :mod:`.exceldates`; DATEMODE selects the 1904 epoch).
The writer emits NUMBER/LABELSST/BOOLERR cells with a shared-string
table (datetimes as date-styled NUMBER serials), padding the stream past
the 4096-byte mini cutoff so the container needs no miniFAT (the reader
supports miniFAT for externally produced files).

API: :func:`xls_sheet_names`, :func:`read_xls_grid`, :func:`write_xls` —
`xlsx.py` dispatches on the CFB magic so `read_excel_advanced`,
`XLSSniffer` and the CSV converters transparently accept both formats.
"""

from __future__ import annotations

import struct

from .exceldates import classify_fmt, py_to_serial, serial_to_py

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_ENDOFCHAIN = -2
_FREESECT = -1


# ---------------------------------------------------------------------------
# [MS-CFB] container: read
# ---------------------------------------------------------------------------

def _cfb_read_stream(data: bytes, stream_name: str) -> bytes:
    if data[:8] != CFB_MAGIC:
        raise ValueError("not a compound (CFB/OLE2) file")
    ssz = 1 << struct.unpack_from("<H", data, 30)[0]
    mssz = 1 << struct.unpack_from("<H", data, 32)[0]
    n_fat = struct.unpack_from("<I", data, 44)[0]
    dir_start = struct.unpack_from("<i", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    minifat_start = struct.unpack_from("<i", data, 60)[0]
    difat_start = struct.unpack_from("<i", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]
    difat = list(struct.unpack_from("<109i", data, 76))
    s = difat_start
    for _ in range(n_difat):  # extended DIFAT sectors
        # sector n starts at (n+1)*sector_size — the header occupies one
        # FULL sector, so this holds for BOTH v3 (512 B) and v4 (4096 B)
        # compound files ([MS-CFB] 2.1); 512 + n*ssz is a v3-only formula
        ent = struct.unpack_from(f"<{ssz // 4}i", data, (s + 1) * ssz)
        difat += ent[:-1]
        s = ent[-1]

    per = ssz // 4
    fat: list[int] = []
    for sid in difat[:n_fat]:
        if sid < 0:
            continue
        fat += struct.unpack_from(f"<{per}i", data, (sid + 1) * ssz)

    def read_chain(start: int, size: int) -> bytes:
        buf = bytearray()
        s = start
        seen = 0
        while s >= 0 and seen <= len(fat):
            buf += data[(s + 1) * ssz: (s + 2) * ssz]
            s = fat[s]
            seen += 1
        return bytes(buf[:size])

    dir_data = read_chain(dir_start, 1 << 31)
    entries = []
    for off in range(0, len(dir_data) - 127, 128):
        name_len = struct.unpack_from("<H", dir_data, off + 64)[0]
        etype = dir_data[off + 66]
        if name_len < 2 or etype == 0:
            continue
        ename = dir_data[off: off + name_len - 2].decode("utf-16-le")
        start = struct.unpack_from("<i", dir_data, off + 116)[0]
        size = struct.unpack_from("<I", dir_data, off + 120)[0]
        entries.append((ename, etype, start, size))

    target = next((e for e in entries if e[0] == stream_name
                   and e[1] == 2), None)
    if target is None:
        raise KeyError(f"no stream {stream_name!r}; have "
                       f"{[e[0] for e in entries]}")
    if target[3] >= mini_cutoff:
        return read_chain(target[2], target[3])
    # small stream: lives in the root entry's mini stream via the miniFAT
    root = next(e for e in entries if e[1] == 5)
    ministream = read_chain(root[2], root[3])
    mf_raw = read_chain(minifat_start, 1 << 31) if minifat_start >= 0 else b""
    minifat = struct.unpack(f"<{len(mf_raw) // 4}i", mf_raw)
    buf = bytearray()
    s = target[2]
    seen = 0
    while s >= 0 and seen <= len(minifat):
        buf += ministream[s * mssz: (s + 1) * mssz]
        s = minifat[s]
        seen += 1
    return bytes(buf[:target[3]])


# ---------------------------------------------------------------------------
# [MS-XLS] BIFF8 record stream: read
# ---------------------------------------------------------------------------

_BOF = 0x0809
_EOF = 0x000A
_BOUNDSHEET = 0x0085
_SST = 0x00FC
_CONTINUE = 0x003C
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_LABELSST = 0x00FD
_LABEL = 0x0204
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207
_FORMAT = 0x041E
_XF = 0x00E0
_DATEMODE = 0x0022


def _rk_value(v: int):
    mul = 0.01 if v & 1 else 1
    if v & 2:  # 30-bit signed integer
        iv = v >> 2
        if iv & (1 << 29):
            iv -= 1 << 30
        out = iv * mul
    else:  # top 30 bits of an IEEE double
        out = struct.unpack("<d",
                            struct.pack("<Q", (v & 0xFFFFFFFC) << 32))[0]
        out *= mul
    return out


def _norm_num(f: float):
    """Match the OOXML reader: integral doubles come back as int."""
    return int(f) if isinstance(f, float) and f.is_integer() else f


def _read_unistr(buf: bytes, pos: int, short_len: bool = False):
    """One BIFF8 unicode string fully contained in ``buf``."""
    if short_len:
        cch = buf[pos]
        pos += 1
    else:
        cch = struct.unpack_from("<H", buf, pos)[0]
        pos += 2
    flags = buf[pos]
    pos += 1
    rich = ext = 0
    if flags & 0x08:
        rich = struct.unpack_from("<H", buf, pos)[0]
        pos += 2
    if flags & 0x04:
        ext = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
    if flags & 0x01:
        s = buf[pos: pos + 2 * cch].decode("utf-16-le")
        pos += 2 * cch
    else:
        s = buf[pos: pos + cch].decode("latin-1")
        pos += cch
    return s, pos + rich * 4 + ext


class _PieceReader:
    """Cursor over the SST record body + its CONTINUE bodies. Character
    data split across a piece boundary restarts with a fresh flags byte
    ([MS-XLS] 2.5.293) — handled in :meth:`read_chars`."""

    def __init__(self, pieces: list[bytes]):
        self.pieces = pieces
        self.pi = 0
        self.pos = 0

    def _avail(self) -> int:
        return len(self.pieces[self.pi]) - self.pos

    def _advance(self):
        while self.pi < len(self.pieces) - 1 and self._avail() == 0:
            self.pi += 1
            self.pos = 0

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            self._advance()
            take = min(n, self._avail())
            p = self.pieces[self.pi]
            out += p[self.pos: self.pos + take]
            self.pos += take
            n -= take
            if take == 0:
                break
        return bytes(out)

    def read_chars(self, cch: int, wide: bool) -> str:
        out = []
        while cch > 0:
            self._advance()
            if self._avail() == 0:
                break
            if self.pos == 0 and self.pi > 0:
                # a char run in flight at the START of a CONTINUE piece is
                # preceded by a fresh option-flags byte ([MS-XLS] 2.5.293)
                # — including when the string's cch+flags HEADER ended
                # exactly at the previous piece's boundary (the old code
                # only re-read flags after consuming chars, so that grbit
                # byte was decoded as a character and every later SST
                # entry desynchronized)
                wide = bool(self.read(1)[0] & 0x01)
                if self._avail() == 0:
                    continue
            unit = 2 if wide else 1
            take = min(cch, self._avail() // unit)
            if take == 0:  # should not happen: strings split on char bounds
                break
            raw = self.read(take * unit)
            out.append(raw.decode("utf-16-le" if wide else "latin-1"))
            cch -= take
        return "".join(out)

    def read_string(self) -> str:
        cch = struct.unpack("<H", self.read(2))[0]
        flags = self.read(1)[0]
        rich = ext = 0
        if flags & 0x08:
            rich = struct.unpack("<H", self.read(2))[0]
        if flags & 0x04:
            ext = struct.unpack("<I", self.read(4))[0]
        s = self.read_chars(cch, bool(flags & 0x01))
        self.read(rich * 4 + ext)
        return s


def _records(stream: bytes, pos: int = 0):
    while pos + 4 <= len(stream):
        rid, ln = struct.unpack_from("<HH", stream, pos)
        if rid == 0:
            return
        yield rid, stream[pos + 4: pos + 4 + ln], pos
        pos += 4 + ln


def _parse_globals(stream: bytes):
    """Workbook-globals substream → (sheets [(name, stream_pos)], sst,
    xf_kinds, date1904). ``xf_kinds`` maps each XF record (in stream
    order — the index cells carry as ``ixfe``) to its date kind via the
    FORMAT records + builtin id table ([MS-XLS] 2.4.126/2.4.353)."""
    sheets: list[tuple[str, int]] = []
    sst: list[str] = []
    fmt_codes: dict[int, str] = {}
    xf_fmt_ids: list[int] = []
    date1904 = False

    def handle(rid: int, body: bytes) -> bool:
        """One non-SST record → True when the substream ends (EOF)."""
        nonlocal date1904
        if rid == _FORMAT:
            ifmt = struct.unpack_from("<H", body, 0)[0]
            code, _pos = _read_unistr(body, 2)
            fmt_codes[ifmt] = code
        elif rid == _XF:
            xf_fmt_ids.append(struct.unpack_from("<H", body, 2)[0])
        elif rid == _DATEMODE:
            date1904 = struct.unpack_from("<H", body, 0)[0] == 1
        elif rid == _BOUNDSHEET:
            spos = struct.unpack_from("<I", body, 0)[0]
            name, _ = _read_unistr(body, 6, short_len=True)
            sheets.append((name, spos))
        elif rid == _EOF:
            return True
        return False

    it = _records(stream)
    for rid, body, _ in it:
        if rid == _SST:
            n_unique = struct.unpack_from("<I", body, 4)[0]
            pieces = [body[8:]]
            # gather the SST's CONTINUE records before parsing strings;
            # the first non-CONTINUE record belongs to the outer loop —
            # re-dispatch it through the SAME handler (a DATEMODE or
            # XF/FORMAT ordered after the SST must not be dropped)
            for rid2, body2, _ in it:
                if rid2 != _CONTINUE:
                    leftover = (rid2, body2)
                    break
                pieces.append(body2)
            else:
                leftover = None
            rdr = _PieceReader(pieces)
            for _ in range(n_unique):
                sst.append(rdr.read_string())
            if leftover is not None and handle(*leftover):
                break
        elif handle(rid, body):
            break
    xf_kinds = [classify_fmt(i, fmt_codes) for i in xf_fmt_ids]
    return sheets, sst, xf_kinds, date1904


def _parse_sheet(stream: bytes, start: int, sst: list[str],
                 xf_kinds: list = (), date1904: bool = False):
    cells: dict[int, dict[int, object]] = {}
    max_col = -1

    def put(r, c, v):
        nonlocal max_col
        if v is not None:
            cells.setdefault(r, {})[c] = v
            max_col = max(max_col, c)

    def num(f: float, ixfe: int):
        kind = xf_kinds[ixfe] if ixfe < len(xf_kinds) else None
        return serial_to_py(f, kind, date1904) if kind else _norm_num(f)

    pending_formula_rc = None
    depth = 0
    for rid, body, _ in _records(stream, start):
        if rid == _BOF:
            depth += 1
            continue
        if rid == _EOF:
            depth -= 1
            if depth <= 0:
                break
            continue
        if rid == _NUMBER:
            r, c, ixfe = struct.unpack_from("<HHH", body, 0)
            put(r, c, num(struct.unpack_from("<d", body, 6)[0], ixfe))
        elif rid == _RK:
            r, c, ixfe = struct.unpack_from("<HHH", body, 0)
            put(r, c, num(
                _rk_value(struct.unpack_from("<I", body, 6)[0]), ixfe))
        elif rid == _MULRK:
            r, c0 = struct.unpack_from("<HH", body, 0)
            n = (len(body) - 6) // 6
            for i in range(n):
                ixfe, v = struct.unpack_from("<HI", body, 4 + 6 * i)
                put(r, c0 + i, num(_rk_value(v), ixfe))
        elif rid == _LABELSST:
            r, c = struct.unpack_from("<HH", body, 0)
            put(r, c, sst[struct.unpack_from("<I", body, 6)[0]])
        elif rid == _LABEL:
            r, c = struct.unpack_from("<HH", body, 0)
            s, _pos = _read_unistr(body, 6)
            put(r, c, s)
        elif rid == _BOOLERR:
            r, c = struct.unpack_from("<HH", body, 0)
            if body[7] == 0:  # value (not error)
                put(r, c, bool(body[6]))
        elif rid == _FORMULA:
            r, c, ixfe = struct.unpack_from("<HHH", body, 0)
            cached = body[6:14]
            if cached[6:8] == b"\xff\xff":
                kind = cached[0]
                if kind == 0:  # cached string follows in a STRING record
                    pending_formula_rc = (r, c)
                elif kind == 1:
                    put(r, c, bool(cached[2]))
            else:
                put(r, c, num(struct.unpack("<d", cached)[0], ixfe))
        elif rid == _STRING and pending_formula_rc is not None:
            s, _pos = _read_unistr(body, 0)
            put(*pending_formula_rc, s)
            pending_formula_rc = None
    if not cells:
        return []
    n_rows = max(cells) + 1
    return [[cells.get(r, {}).get(c) for c in range(max_col + 1)]
            for r in range(n_rows)]


def _workbook_stream(fname: str) -> bytes:
    with open(fname, "rb") as f:
        data = f.read()
    for name in ("Workbook", "Book"):  # "Book" = BIFF5/7 name, same stream
        try:
            return _cfb_read_stream(data, name)
        except KeyError:
            continue
    raise ValueError(f"{fname}: no Workbook stream")


def xls_sheet_names(fname: str) -> list[str]:
    sheets = _parse_globals(_workbook_stream(fname))[0]
    return [n for n, _ in sheets]


def read_xls_grid(fname: str, sheet_name: str | int = 0) -> list[list]:
    """One worksheet → dense list-of-rows grid (None-padded), same shape
    contract as ``xlsx.read_sheet_grid``."""
    stream = _workbook_stream(fname)
    sheets, sst, xf_kinds, date1904 = _parse_globals(stream)
    if isinstance(sheet_name, int):
        name, spos = sheets[sheet_name]
    else:
        match = [t for t in sheets if t[0] == sheet_name]
        if not match:
            raise KeyError(f"no sheet {sheet_name!r} in {fname}")
        name, spos = match[0]
    return _parse_sheet(stream, spos, sst, xf_kinds, date1904)


# ---------------------------------------------------------------------------
# write: minimal BIFF8 workbook in a minimal CFB container
# ---------------------------------------------------------------------------

def _rec(rid: int, body: bytes) -> bytes:
    return struct.pack("<HH", rid, len(body)) + body


def _unistr16(s: str) -> bytes:
    try:
        enc, flag = s.encode("latin-1"), 0
        cch = len(enc)
    except UnicodeEncodeError:
        enc, flag = s.encode("utf-16-le"), 1
        # BIFF8 cch counts UTF-16 CODE UNITS, not Python code points —
        # a non-BMP char (surrogate pair) counted as 1 would leave its
        # trailing surrogate parsed as the next string's header
        cch = len(enc) // 2
    return struct.pack("<H", cch) + bytes([flag]) + enc


# writer XF indices: 0-15 default (ifmt 0), 16 date (ifmt 14),
# 17 datetime (22), 18 time (21) — builtin ids, no FORMAT records needed
_XF_DATE, _XF_DT, _XF_TIME = 16, 17, 18


def write_xls(fname: str, sheets: dict[str, list[list]]) -> str:
    """Write a BIFF8 ``.xls``: NUMBER / LABELSST / BOOLERR cells, one SST;
    datetime/date/time values as date-styled NUMBER serials. Fixture-grade
    (SST must fit one record); readable by this module, xlrd and Excel."""
    import datetime as _dt
    strings: list[str] = []
    index: dict[str, int] = {}
    n_refs = 0

    def sidx(s: str) -> int:
        if s not in index:
            index[s] = len(strings)
            strings.append(s)
        return index[s]

    sheet_blobs = []
    for name, grid in sheets.items():
        recs = bytearray()
        recs += _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0010,
                                       0x0DBB, 0x07CC, 0, 0x0600))
        ncols = max((len(r) for r in grid), default=0)
        recs += _rec(0x0200, struct.pack("<IIHHH", 0, len(grid), 0,
                                         ncols, 0))  # DIMENSIONS
        for r, row in enumerate(grid):
            for c, v in enumerate(row):
                if v is None:
                    continue
                if isinstance(v, bool):
                    recs += _rec(_BOOLERR,
                                 struct.pack("<HHHBB", r, c, 15, int(v), 0))
                elif isinstance(v, (_dt.datetime, _dt.date, _dt.time)):
                    ixfe = (_XF_TIME if isinstance(v, _dt.time)
                            else _XF_DT if isinstance(v, _dt.datetime)
                            else _XF_DATE)
                    recs += _rec(_NUMBER, struct.pack("<HHH", r, c, ixfe)
                                 + struct.pack("<d", py_to_serial(v)))
                elif isinstance(v, (int, float)):
                    recs += _rec(_NUMBER, struct.pack("<HHH", r, c, 15)
                                 + struct.pack("<d", float(v)))
                else:
                    n_refs += 1
                    recs += _rec(_LABELSST,
                                 struct.pack("<HHHI", r, c, 15,
                                             sidx(str(v))))
        recs += _rec(_EOF, b"")
        sheet_blobs.append(bytes(recs))

    glob = bytearray()
    glob += _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0005,
                                   0x0DBB, 0x07CC, 0, 0x0600))
    glob += _rec(0x0042, struct.pack("<H", 1200))  # CODEPAGE: UTF-16
    glob += _rec(0x003D, struct.pack("<9H", 0x0168, 0x010E, 0x3A5C, 0x23C1,
                                     0x0038, 0, 0, 1, 0x0258))  # WINDOW1
    # XF table: 16 defaults, then the date/datetime/time cell XFs
    # (ifmt at body offset 2; remaining XF fields zero — fixture-grade)
    for ifmt in [0] * 16 + [14, 22, 21]:
        glob += _rec(_XF, struct.pack("<HH", 0, ifmt) + bytes(16))
    bs_patch = []
    for name in sheets:
        bs_patch.append(len(glob) + 4)  # offset of the u32 stream pos
        nb = name.encode("latin-1")
        glob += _rec(_BOUNDSHEET, struct.pack("<IBB", 0, 0, 0)
                     + bytes([len(nb), 0]) + nb)
    if strings:
        body = struct.pack("<II", n_refs, len(strings))
        for s in strings:
            body += _unistr16(s)
        if len(body) > 8224:
            raise ValueError("write_xls: SST exceeds one record "
                             "(fixture-grade writer)")
        glob += _rec(_SST, body)
    glob += _rec(_EOF, b"")

    stream = bytearray(glob)
    for blob, patch_off in zip(sheet_blobs, bs_patch):
        # each BOUNDSHEET's stream position = offset where its blob lands
        struct.pack_into("<I", stream, patch_off, len(stream))
        stream += blob
    _write_cfb(fname, bytes(stream))
    return fname


def _write_cfb(fname: str, workbook: bytes) -> None:
    """Single-stream [MS-CFB] container. The stream is padded past the
    4096-byte mini cutoff so no miniFAT is needed."""
    if len(workbook) < 4096:
        workbook = workbook + b"\x00" * (4096 - len(workbook))
    size = len(workbook)
    pad = (-size) % 512
    data_sectors = (size + pad) // 512
    # sector ids: [0..data) data, then 1 directory, then FAT sectors
    dir_sid = data_sectors
    n_total = data_sectors + 1  # + FAT sectors, solved iteratively
    n_fat = 1
    while (n_total + n_fat + 127) // 128 > n_fat:
        n_fat += 1
    fat_sids = [dir_sid + 1 + i for i in range(n_fat)]
    fat = [0] * (n_fat * 128)
    for i in range(data_sectors - 1):
        fat[i] = i + 1
    fat[data_sectors - 1] = _ENDOFCHAIN
    fat[dir_sid] = _ENDOFCHAIN
    for s in fat_sids:
        fat[s] = -3  # FATSECT
    for i in range(dir_sid + 1 + n_fat, len(fat)):
        fat[i] = _FREESECT

    header = bytearray(512)
    header[:8] = CFB_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)   # minor version
    struct.pack_into("<H", header, 26, 0x0003)   # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)   # little-endian
    struct.pack_into("<H", header, 30, 9)        # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)        # 64-byte mini sectors
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<i", header, 48, dir_sid)
    struct.pack_into("<I", header, 56, 4096)     # mini cutoff
    struct.pack_into("<i", header, 60, _ENDOFCHAIN)  # no miniFAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<i", header, 68, _ENDOFCHAIN)  # no extended DIFAT
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into("<i", header, 76 + 4 * i,
                         fat_sids[i] if i < n_fat else _FREESECT)

    def dir_entry(name: str, etype: int, start: int, sz: int,
                  child: int = -1) -> bytes:
        e = bytearray(128)
        nb = name.encode("utf-16-le") + b"\x00\x00"
        e[:len(nb)] = nb
        struct.pack_into("<H", e, 64, len(nb))
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<i", e, 68, -1)  # left
        struct.pack_into("<i", e, 72, -1)  # right
        struct.pack_into("<i", e, 76, child)
        struct.pack_into("<i", e, 116, start)
        struct.pack_into("<I", e, 120, sz)
        return bytes(e)

    directory = (dir_entry("Root Entry", 5, _ENDOFCHAIN, 0, child=1)
                 + dir_entry("Workbook", 2, 0, size)
                 + bytes(128) + bytes(128))
    fat_bytes = b"".join(struct.pack("<i", v) for v in fat)
    with open(fname, "wb") as f:
        f.write(bytes(header))
        f.write(workbook + b"\x00" * pad)
        f.write(directory)
        f.write(fat_bytes)
