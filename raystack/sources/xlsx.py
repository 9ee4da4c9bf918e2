"""Minimal pure-stdlib xlsx I/O (zipfile + xml.etree over ECMA-376 OOXML)
— un-gates the reference's Excel surface (S3/K14/M7) in a container that
ships no openpyxl/xlrd. Legacy BIFF8 ``.xls`` files are dispatched by
file magic to the sibling :mod:`raystack.sources.xls` module, so the
whole surface below accepts both formats (the reference's Excel corpus
is .xls + .xlsx, reference/tests/test_xls.py:21-272).

Implements the reference semantics of d6tstack/convert_xls.py:

- :func:`read_excel_advanced` — header cell ranges (single- AND multi-row,
  e.g. ``A4:B16``), blank row/column dropping, multi-row header collapse,
  preview mode (convert_xls.py:24-98);
- :class:`XLSSniffer` — per-file sheet inventory + agreement checks
  (convert_xls.py:124-213);
- :class:`XLStoCSVMultiFile` / :class:`XLStoCSVMultiSheet` — sheet→CSV
  converters with ``if_exists='skip'|'replace'`` and ``<fname>-<sheet>.csv``
  naming (convert_xls.py:216-437).

Also a minimal :func:`write_xlsx` (inline-string cells; dates as
date-styled serials) so fixtures and round-trip tests need no external
writer. The reader handles shared strings, inline strings, booleans,
numbers, and date-styled cells: ``xl/styles.xml`` numFmtIds (builtin
table + custom format-code classification, :mod:`.exceldates`) turn
serial numbers into datetime/time values like the reference's pandas
excel stack does, honoring ``workbookPr date1904``.
"""

from __future__ import annotations

import os
import re
import warnings
import zipfile
import xml.etree.ElementTree as ET

import pandas as pd

from .exceldates import classify_fmt, py_to_serial, serial_to_py

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NSR = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
        "relationships}")


# ---------------------------------------------------------------------------
# cell coordinates
# ---------------------------------------------------------------------------

def col_to_idx(col: str) -> int:
    """'A' -> 0, 'Z' -> 25, 'AA' -> 26 ..."""
    n = 0
    for ch in col.upper():
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def idx_to_col(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, r = divmod(idx - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def coordinate_from_string(ref: str) -> tuple[int, int]:
    """'B4' -> (col_idx 1, row 4). Row stays 1-based (reference uses
    openpyxl's coordinate_from_string the same way)."""
    m = re.fullmatch(r"([A-Za-z]+)(\d+)", ref.strip())
    if not m:
        raise ValueError(f"bad cell reference {ref!r}")
    return col_to_idx(m.group(1)), int(m.group(2))


# ---------------------------------------------------------------------------
# workbook reading
# ---------------------------------------------------------------------------

def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.findall(f"{_NS}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_targets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, zip member path)] in workbook order."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    rid_to_target = {r.get("Id"): r.get("Target")
                     for r in rels.findall(f"{rel_ns}Relationship")}
    out = []
    for sh in wb.find(f"{_NS}sheets").findall(f"{_NS}sheet"):
        target = rid_to_target[sh.get(f"{_NSR}id")]
        if target.startswith("/"):
            target = target[1:]
        elif not target.startswith("xl/"):
            target = "xl/" + target
        out.append((sh.get("name"), target))
    return out


def _style_kinds(zf: zipfile.ZipFile) -> list:
    """xl/styles.xml → per-cellXf date kind ("dt"/"time"/None), indexed
    by the cell's ``s`` attribute (ECMA-376 §18.8.10/§18.8.30)."""
    try:
        data = zf.read("xl/styles.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    custom = {}
    num_fmts = root.find(f"{_NS}numFmts")
    if num_fmts is not None:
        for nf in num_fmts.findall(f"{_NS}numFmt"):
            custom[int(nf.get("numFmtId"))] = nf.get("formatCode") or ""
    cell_xfs = root.find(f"{_NS}cellXfs")
    if cell_xfs is None:
        return []
    return [classify_fmt(int(xf.get("numFmtId", "0")), custom)
            for xf in cell_xfs.findall(f"{_NS}xf")]


def _date1904(zf: zipfile.ZipFile) -> bool:
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    pr = wb.find(f"{_NS}workbookPr")
    return pr is not None and pr.get("date1904", "0").lower() in ("1", "true")


def _is_biff(fname: str) -> bool:
    from .xls import CFB_MAGIC
    with open(fname, "rb") as f:
        return f.read(8) == CFB_MAGIC


def sheet_names(fname: str) -> list[str]:
    if _is_biff(fname):  # legacy .xls (BIFF8) — same API, sibling module
        from .xls import xls_sheet_names
        return xls_sheet_names(fname)
    with zipfile.ZipFile(fname) as zf:
        return [n for n, _ in _sheet_targets(zf)]


def _cell_value(c: ET.Element, shared: list[str],
                xf_kinds: list = (), date1904: bool = False):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        return "".join(x.text or "" for x in is_el.iter(f"{_NS}t")) \
            if is_el is not None else None
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return bool(int(v.text))
    # number: int when integral, float otherwise
    try:
        f = float(v.text)
    except ValueError:
        return v.text
    if t == "n":
        s = c.get("s")
        if s is not None:
            xf = int(s)
            kind = xf_kinds[xf] if xf < len(xf_kinds) else None
            if kind:  # date-styled serial → datetime/time
                return serial_to_py(f, kind, date1904)
    return int(f) if f.is_integer() and "e" not in v.text.lower() \
        and "." not in v.text else f


def read_sheet_grid(fname: str, sheet_name: str | int = 0) -> list[list]:
    """One worksheet → dense list-of-rows grid (None-padded; trailing
    all-empty rows kept as stored). Dispatches on the file magic: OOXML
    ``.xlsx`` here, legacy BIFF8 ``.xls`` via :mod:`raystack.sources.xls`
    — every consumer (``read_excel_advanced``, ``XLSSniffer``, the CSV
    converters) therefore accepts both formats, like the reference's
    pandas/xlrd stack (convert_xls.py:24-98)."""
    if _is_biff(fname):
        from .xls import read_xls_grid
        return read_xls_grid(fname, sheet_name)
    with zipfile.ZipFile(fname) as zf:
        targets = _sheet_targets(zf)
        if isinstance(sheet_name, int):
            name, member = targets[sheet_name]
        else:
            match = [t for t in targets if t[0] == sheet_name]
            if not match:
                raise KeyError(f"no sheet {sheet_name!r} in {fname}")
            name, member = match[0]
        shared = _shared_strings(zf)
        xf_kinds = _style_kinds(zf)
        d1904 = _date1904(zf)
        root = ET.fromstring(zf.read(member))
        rows: dict[int, dict[int, object]] = {}
        max_col = -1
        sheet_data = root.find(f"{_NS}sheetData")
        row_auto = 0
        for row in (sheet_data if sheet_data is not None else []):
            row_auto = int(row.get("r", row_auto + 1))
            cells: dict[int, object] = {}
            col_auto = -1
            for c in row.findall(f"{_NS}c"):
                ref = c.get("r")
                col_auto = col_to_idx(re.match(r"[A-Za-z]+", ref).group()) \
                    if ref else col_auto + 1
                val = _cell_value(c, shared, xf_kinds, d1904)
                if val is not None:
                    cells[col_auto] = val
                    max_col = max(max_col, col_auto)
            rows[row_auto - 1] = cells
    if not rows:
        return []
    n_rows = max(rows) + 1
    return [[rows.get(r, {}).get(c) for c in range(max_col + 1)]
            for r in range(n_rows)]


# ---------------------------------------------------------------------------
# minimal writer (fixtures / round-trip tests)
# ---------------------------------------------------------------------------

def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            .replace('"', "&quot;"))


# writer cell styles: s=1 date (numFmtId 14), s=2 datetime (22),
# s=3 time (21) — builtin ids, so no custom numFmts part is needed
_STYLES_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml'
    '/2006/main">'
    '<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font>'
    '</fonts>'
    '<fills count="1"><fill><patternFill patternType="none"/></fill></fills>'
    '<borders count="1"><border/></borders>'
    '<cellStyleXfs count="1"><xf numFmtId="0"/></cellStyleXfs>'
    '<cellXfs count="4">'
    '<xf numFmtId="0" xfId="0"/>'
    '<xf numFmtId="14" applyNumberFormat="1" xfId="0"/>'
    '<xf numFmtId="22" applyNumberFormat="1" xfId="0"/>'
    '<xf numFmtId="21" applyNumberFormat="1" xfId="0"/>'
    "</cellXfs></styleSheet>")


def write_xlsx(fname: str, sheets: dict[str, list[list]]) -> str:
    """dict of sheet_name → rows (lists of
    str/int/float/bool/datetime/date/time/None) → a valid minimal .xlsx
    (inline-string cells; dates as date-styled serials)."""
    import datetime as _dt
    names = list(sheets)
    sheet_xml = {}
    for si, nm in enumerate(names, 1):
        rows_xml = []
        for ri, row in enumerate(sheets[nm], 1):
            cells = []
            for ci, val in enumerate(row):
                if val is None:
                    continue
                ref = f"{idx_to_col(ci)}{ri}"
                if isinstance(val, bool):
                    cells.append(f'<c r="{ref}" t="b"><v>{int(val)}</v></c>')
                elif isinstance(val, (_dt.datetime, _dt.date, _dt.time)):
                    s = (3 if isinstance(val, _dt.time)
                         else 2 if isinstance(val, _dt.datetime) else 1)
                    cells.append(f'<c r="{ref}" s="{s}">'
                                 f"<v>{py_to_serial(val)!r}</v></c>")
                elif isinstance(val, (int, float)):
                    cells.append(f'<c r="{ref}"><v>{val!r}</v></c>')
                else:
                    cells.append(f'<c r="{ref}" t="inlineStr"><is><t'
                                 f' xml:space="preserve">{_esc(str(val))}'
                                 f"</t></is></c>")
            rows_xml.append(f'<row r="{ri}">' + "".join(cells) + "</row>")
        sheet_xml[si] = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>'
            + "".join(rows_xml) + "</sheetData></worksheet>")
    wb_sheets = "".join(
        f'<sheet name="{_esc(nm)}" sheetId="{i}" r:id="rId{i}"/>'
        for i, nm in enumerate(names, 1))
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml'
        '/2006/main" xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships"><sheets>'
        + wb_sheets + "</sheets></workbook>")
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package'
        '/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i}" Type="http://schemas.'
            f'openxmlformats.org/officeDocument/2006/relationships/'
            f'worksheet" Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, len(names) + 1))
        + f'<Relationship Id="rId{len(names) + 1}" Type="http://schemas.'
          'openxmlformats.org/officeDocument/2006/relationships/styles" '
          'Target="styles.xml"/>'
        + "</Relationships>")
    types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/styles.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
            f'"application/vnd.openxmlformats-officedocument.spreadsheetml.'
            f'worksheet+xml"/>' for i in range(1, len(names) + 1))
        + "</Types>")
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package'
        '/2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships/'
        'officeDocument" Target="xl/workbook.xml"/></Relationships>')
    os.makedirs(os.path.dirname(os.path.abspath(fname)), exist_ok=True)
    with zipfile.ZipFile(fname, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/styles.xml", _STYLES_XML)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i in range(1, len(names) + 1):
            zf.writestr(f"xl/worksheets/sheet{i}.xml", sheet_xml[i])
    return fname


# ---------------------------------------------------------------------------
# read_excel_advanced (reference convert_xls.py:24-98)
# ---------------------------------------------------------------------------

def read_excel_advanced(fname: str, remove_blank_cols: bool = True,
                        remove_blank_rows: bool = True,
                        collapse_header: bool = True,
                        header_xls_range: str | None = None,
                        header_xls_start: str | None = None,
                        header_xls_end: str | None = None,
                        is_preview: bool = False, nrows_preview: int = 3,
                        sheet_name: str | int = 0) -> pd.DataFrame:
    """Advanced workbook read with header cell ranges — reference
    semantics (convert_xls.py:24-98) over the stdlib grid reader."""
    if header_xls_range:
        if header_xls_start or header_xls_end:
            raise ValueError("Parameter conflict. Can only pass "
                             "header_xls_range or header_xls_start with "
                             "header_xls_end")
        header_xls_start, header_xls_end = header_xls_range.split(":")
    elif bool(header_xls_start) != bool(header_xls_end):
        # one without the other was silently IGNORED (full-sheet read)
        raise ValueError("header_xls_start and header_xls_end must be "
                         "passed together (or use header_xls_range)")

    grid = read_sheet_grid(fname, sheet_name)

    if header_xls_start and header_xls_end:
        scol, srow = coordinate_from_string(header_xls_start)
        ecol, erow = coordinate_from_string(header_xls_end)
        n_hdr = erow - srow + 1
        n_cols = ecol - scol + 1
        rows = []
        for r in grid[srow - 1:]:
            seg = r[scol:ecol + 1]
            rows.append(seg + [None] * (n_cols - len(seg)))
        hdr_rows = rows[:n_hdr]
        data = rows[n_hdr:]
        if n_hdr == 1:
            names = [str(hdr_rows[0][j]) if hdr_rows[0][j] is not None
                     else f"Unnamed: {j}" for j in range(n_cols)]
        else:
            names = [tuple(str(hdr_rows[k][j]) if hdr_rows[k][j] is not None
                           else f"Unnamed: {j}_level_{k}"
                           for k in range(n_hdr)) for j in range(n_cols)]
    else:
        if not grid:
            return pd.DataFrame()
        n_cols = max(len(r) for r in grid)
        rows = [r + [None] * (n_cols - len(r)) for r in grid]
        names = [str(rows[0][j]) if rows[0][j] is not None
                 else f"Unnamed: {j}" for j in range(n_cols)]
        data = rows[1:]
        n_hdr = 1

    df = pd.DataFrame(data, columns=range(len(names)))
    df.columns = pd.Index(names) if n_hdr == 1 else \
        pd.MultiIndex.from_tuples(names)
    # infer numeric dtypes column-wise (pd.read_excel analog) —
    # but never coerce date-styled cells (to_numeric would turn
    # datetimes into epoch nanoseconds)
    import datetime as _dtm
    for i in range(df.shape[1]):
        # positional access: df[name] returns a DATAFRAME when header
        # labels repeat (messy spreadsheets), and `if DataFrame.any():`
        # raises — iloc is unambiguous
        col = df.iloc[:, i]
        if col.map(lambda v: isinstance(
                v, (_dtm.datetime, _dtm.date, _dtm.time))).any():
            continue
        try:
            df.isetitem(i, pd.to_numeric(col))
        except (ValueError, TypeError):
            pass

    # remove blank cols and rows (convert_xls.py:78-81 — M7)
    if remove_blank_cols:
        df = df.dropna(axis="columns", how="all")
    if remove_blank_rows:
        df = df.dropna(axis="rows", how="all")

    # clean up header (convert_xls.py:86-92 — M8)
    if collapse_header:
        if n_hdr > 1:
            df.columns = [" ".join(s for s in col if "Unnamed" not in s)
                          .strip().replace("\n", " ")
                          for col in df.columns.values]
            df = df.reset_index(drop=True)
        else:
            df = df.rename(columns=lambda x: str(x).strip()
                           .replace("\n", " "))

    if is_preview:
        df = df.head(nrows_preview)
    return df.reset_index(drop=True)


# ---------------------------------------------------------------------------
# XLSSniffer (convert_xls.py:124-213)
# ---------------------------------------------------------------------------

class XLSSniffer:
    """Sheet inventory across MULTIPLE workbooks + agreement checks."""

    def __init__(self, fname_list: list[str], logger=None):
        if not fname_list:
            raise ValueError("Filename list should not be empty")
        for f in fname_list:
            if not f.lower().endswith((".xls", ".xlsx")):
                raise IOError("Only .xls or .xlsx files can be combined")
            if not os.path.exists(f):
                raise FileNotFoundError(f)
        self.fname_list = fname_list
        self.logger = logger
        self.sniff()

    def sniff(self) -> bool:
        xls_sheets = {}
        for fname in self.fname_list:
            if self.logger:
                self.logger.send_log(
                    "sniffing sheets in " + os.path.basename(fname), "ok")
            names = sheet_names(fname)
            xls_sheets[fname] = {
                "file_name": os.path.basename(fname),
                "sheets_names": names,
                "sheets_count": len(names),
                "sheets_idx": list(range(len(names))),
            }
        self.xls_sheets = xls_sheets
        self.dict_xls_sheets = xls_sheets
        self.df_xls_sheets = pd.DataFrame(xls_sheets).T
        self.df_xls_sheets.index.names = ["file_path"]
        return True

    def all_contain_sheetname(self, sheet_name: str) -> bool:
        return all(sheet_name in d["sheets_names"]
                   for d in self.dict_xls_sheets.values())

    def all_have_idx(self, sheet_idx: int) -> bool:
        return all(sheet_idx <= d["sheets_count"] - 1
                   for d in self.dict_xls_sheets.values())

    def all_same_count(self) -> bool:
        first = next(iter(self.dict_xls_sheets.values()))
        return all(first["sheets_count"] == d["sheets_count"]
                   for d in self.dict_xls_sheets.values())

    def all_same_names(self) -> bool:
        first = next(iter(self.dict_xls_sheets.values()))
        return all(first["sheets_names"] == d["sheets_names"]
                   for d in self.dict_xls_sheets.values())


# ---------------------------------------------------------------------------
# converters (convert_xls.py:216-437)
# ---------------------------------------------------------------------------

class XLStoBase:
    def __init__(self, if_exists: str = "skip", output_dir: str | None = None,
                 logger=None):
        if if_exists not in ("skip", "replace"):
            raise ValueError("Possible value of 'if_exists' are 'skip' and "
                             "'replace'")
        self.if_exists = if_exists
        self.output_dir = output_dir
        self.logger = logger
        if self.output_dir:
            os.makedirs(self.output_dir, exist_ok=True)

    def _get_output_filename(self, fname: str) -> tuple[str, bool]:
        if self.output_dir:
            fname_out = os.path.join(self.output_dir,
                                     os.path.basename(fname))
        else:
            fname_out = fname
        is_skip = self.if_exists == "skip" and os.path.isfile(fname_out)
        return fname_out, is_skip

    def convert_single(self, fname: str, sheet_name, **kwds) -> str:
        if self.logger:
            self.logger.send_log(
                "converting file: " + os.path.basename(fname)
                + " | sheet: " + str(sheet_name), "ok")
        fname_out = fname + "-" + str(sheet_name) + ".csv"
        fname_out, is_skip = self._get_output_filename(fname_out)
        if not is_skip:
            df = read_excel_advanced(fname, sheet_name=sheet_name, **kwds)
            df.to_csv(fname_out, index=False)
        else:
            warnings.warn(f"File {fname_out} exists, skipping")
        return fname_out


class XLStoCSVMultiFile(XLStoBase):
    """One selected sheet per workbook → CSV each."""

    def __init__(self, fname_list: list[str],
                 cfg_xls_sheets_sel_mode: str = "idx_global",
                 cfg_xls_sheets_sel=0, output_dir: str | None = None,
                 if_exists: str = "skip", logger=None):
        super().__init__(if_exists, output_dir, logger)
        if not fname_list:
            raise ValueError("Filename list should not be empty")
        self.set_files(fname_list)
        self.set_select_mode(cfg_xls_sheets_sel_mode, cfg_xls_sheets_sel)

    def set_files(self, fname_list: list[str]):
        # reference convert_xls.py:121 runs check_valid_xls (equal
        # extensions, xls/xlsx only); raystack dispatches on magic bytes
        # so MIXED .xls + .xlsx lists are fine — only non-Excel names
        # are rejected here
        from ..helpers import file_extensions_get
        bad = [e for e in file_extensions_get(fname_list)
               if e not in (".xls", ".xlsx")]
        if bad or not fname_list:
            raise IOError("Only .xls, .xlsx files can be processed")
        self.fname_list = fname_list
        self.xlsSniffer = XLSSniffer(fname_list)

    def set_select_mode(self, cfg_xls_sheets_sel_mode: str,
                        cfg_xls_sheets_sel):
        assert cfg_xls_sheets_sel_mode in ("name", "idx", "name_global",
                                           "idx_global")
        sheets = self.xlsSniffer.dict_xls_sheets
        if cfg_xls_sheets_sel_mode == "name_global":
            cfg_xls_sheets_sel_mode = "name"
            cfg_xls_sheets_sel = dict.fromkeys(self.fname_list,
                                               cfg_xls_sheets_sel)
        elif cfg_xls_sheets_sel_mode == "idx_global":
            cfg_xls_sheets_sel_mode = "idx"
            cfg_xls_sheets_sel = dict.fromkeys(self.fname_list,
                                               cfg_xls_sheets_sel)
        if set(cfg_xls_sheets_sel) != set(sheets):
            raise ValueError("Need to select a sheet from every file")
        if cfg_xls_sheets_sel_mode == "name":
            if not all(cfg_xls_sheets_sel[f] in sheets[f]["sheets_names"]
                       for f in self.fname_list):
                raise ValueError("Invalid sheet name selected in one of "
                                 "the files")
        else:
            if not all(0 <= cfg_xls_sheets_sel[f]
                       < sheets[f]["sheets_count"]
                       for f in self.fname_list):
                raise ValueError("Invalid index selected in one of the files")
        self.cfg_xls_sheets_sel_mode = cfg_xls_sheets_sel_mode
        self.cfg_xls_sheets_sel = cfg_xls_sheets_sel

    def convert_all(self, **kwds) -> list[str]:
        return [self.convert_single(f, self.cfg_xls_sheets_sel[f], **kwds)
                for f in self.fname_list]


class XLStoCSVMultiSheet(XLStoBase):
    """ALL (or selected) sheets of ONE workbook → CSV each."""

    def __init__(self, fname: str, sheet_names_sel: list | None = None,
                 output_dir: str | None = None, if_exists: str = "skip",
                 logger=None):
        super().__init__(if_exists, output_dir, logger)
        self.fname = fname
        if sheet_names_sel:
            if not isinstance(sheet_names_sel, (list, str)):
                raise ValueError("sheet_names needs to be a list")
            if isinstance(sheet_names_sel, str):
                # a bare string would be iterated CHARACTER by character
                sheet_names_sel = [sheet_names_sel]
            self.sheet_names = sheet_names_sel
        else:
            self.sheet_names = sheet_names(fname)

    def convert_single(self, sheet_name, **kwds) -> str:
        return super().convert_single(self.fname, sheet_name, **kwds)

    def convert_all(self, **kwds) -> list[str]:
        return [self.convert_single(s, **kwds) for s in self.sheet_names]
