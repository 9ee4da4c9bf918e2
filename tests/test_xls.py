"""Legacy .xls (BIFF8) reader/writer tests — mirrors the reference's dual
.xls/.xlsx Excel corpus (reference/tests/test_xls.py:21-272): the same
advanced-read / sniff / convert surface must work on BIFF8 files."""

import struct

import pandas as pd
import pytest

from raystack.sources.xls import (_cfb_read_stream, _parse_globals,
                                  read_xls_grid, write_xls,
                                  xls_sheet_names)
from raystack.sources.xlsx import (XLSSniffer, XLStoCSVMultiFile,
                                   XLStoCSVMultiSheet, read_excel_advanced,
                                   read_sheet_grid, sheet_names)

GRID = [["date", "sales", "cost", "profit"],
        ["2011-01-01", 100, -80, 20],
        ["2011-01-02", 200, -90.5, True],
        [None, "naïve ünïcode", None, 3.14]]


@pytest.fixture
def xls_file(tmp_path):
    p = str(tmp_path / "wb.xls")
    write_xls(p, {"Sheet1": GRID})
    return p


def test_roundtrip_values_and_types(xls_file):
    assert read_xls_grid(xls_file) == GRID
    assert xls_sheet_names(xls_file) == ["Sheet1"]


def test_dispatch_from_xlsx_module(xls_file):
    # the OOXML module's entry points transparently route BIFF8 files
    assert sheet_names(xls_file) == ["Sheet1"]
    assert read_sheet_grid(xls_file, 0) == GRID
    assert read_sheet_grid(xls_file, "Sheet1") == GRID


def test_multisheet(tmp_path):
    p = str(tmp_path / "multi.xls")
    write_xls(p, {"Sheet1": [["a"], [1]], "Sheet2": [["b"], [2]],
                  "Third": [["c"], [3]]})
    assert xls_sheet_names(p) == ["Sheet1", "Sheet2", "Third"]
    assert read_xls_grid(p, "Third") == [["c"], [3]]
    assert read_xls_grid(p, 1) == [["b"], [2]]
    with pytest.raises(KeyError):
        read_xls_grid(p, "Nope")


def test_read_excel_advanced_on_xls(tmp_path):
    # header at an offset cell range, exactly like the reference's
    # to_excel(startrow=1, startcol=1) fixtures (test_xls.py:74)
    grid = [[None, None, None, None],
            [None, "date", "sales", "cost"],
            [None, "2011-01-01", 100, -80],
            [None, "2011-01-02", 200, -90]]
    p = str(tmp_path / "adv.xls")
    write_xls(p, {"Sheet1": grid})
    df = read_excel_advanced(p, header_xls_range="B2:D2")
    assert list(df.columns) == ["date", "sales", "cost"]
    assert df["sales"].tolist() == [100, 200]


def test_sniffer_mixed_formats(tmp_path):
    from raystack.sources.xlsx import write_xlsx
    p_old = str(tmp_path / "a.xls")
    p_new = str(tmp_path / "b.xlsx")
    write_xls(p_old, {"Sheet1": [["x"], [1]]})
    write_xlsx(p_new, {"Sheet1": [["x"], [2]]})
    sn = XLSSniffer([p_old, p_new])
    assert sn.all_same_names() and sn.all_same_count()
    assert sn.all_contain_sheetname("Sheet1")


def test_converters_accept_xls(tmp_path):
    files = []
    for i in range(2):
        p = str(tmp_path / f"m{i}.xls")
        write_xls(p, {"Sheet1": [["date", "sales"],
                                 [f"2011-0{i + 1}-01", 100 + i]]})
        files.append(p)
    conv = XLStoCSVMultiFile(files, output_dir=str(tmp_path))
    outs = conv.convert_all()
    assert len(outs) == 2
    df = pd.read_csv(outs[0])
    assert list(df.columns) == ["date", "sales"]

    p = str(tmp_path / "ms.xls")
    write_xls(p, {"S1": [["a"], [1]], "S2": [["a"], [2]]})
    outs = XLStoCSVMultiSheet(p, output_dir=str(tmp_path)).convert_all()
    assert len(outs) == 2


def test_sst_continue_split(tmp_path):
    # hand-build a workbook stream whose SST char data crosses a CONTINUE
    # boundary (what xlrd/xlwt produce for big string tables): the
    # continuation restarts with a fresh flags byte per [MS-XLS] 2.5.293
    def rec(rid, body):
        return struct.pack("<HH", rid, len(body)) + body

    s1, s2 = "alpha", "omega-" + "z" * 10
    # piece 1 carries s1 and the header+first 3 chars of s2
    p1 = (struct.pack("<II", 2, 2)
          + struct.pack("<H", len(s1)) + b"\x00" + s1.encode()
          + struct.pack("<H", len(s2)) + b"\x00" + s2[:3].encode())
    p2 = b"\x00" + s2[3:].encode()  # fresh flags byte, compressed
    glob = (rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
            + rec(0x0085, struct.pack("<IBB", 0, 0, 0) + b"\x06\x00Sheet1")
            + rec(0x00FC, p1) + rec(0x003C, p2) + rec(0x000A, b""))
    sheets, sst, _xf, _d1904 = _parse_globals(glob)
    assert [n for n, _ in sheets] == ["Sheet1"]
    assert sst == [s1, s2]


def test_cfb_stream_lookup_errors(xls_file):
    with open(xls_file, "rb") as f:
        data = f.read()
    with pytest.raises(KeyError):
        _cfb_read_stream(data, "NoSuchStream")
    with pytest.raises(ValueError):
        _cfb_read_stream(b"not a cfb file" * 40, "Workbook")


def test_parse_globals_record_after_sst_not_dropped():
    # regression: the first non-CONTINUE record after the SST was only
    # re-dispatched for EOF/BOUNDSHEET — a DATEMODE ordered after the
    # SST was silently discarded, shifting every date by 1462 days
    import struct
    from raystack.sources import xls as X

    sst_body = struct.pack("<II", 1, 1) + X._unistr16("hello")
    stream = (X._rec(X._SST, sst_body)
              + X._rec(X._DATEMODE, struct.pack("<H", 1))
              + X._rec(X._BOUNDSHEET,
                       struct.pack("<IBB", 0, 0, 0)
                       + bytes([2, 0]) + b"S1")
              + X._rec(X._EOF, b""))
    sheets, sst, xf_kinds, date1904 = X._parse_globals(stream)
    assert sst == ["hello"]
    assert date1904 is True  # was silently False before the fix
    assert [n for n, _ in sheets] == ["S1"]


def test_sst_continue_split_after_header():
    # regression: a string whose cch+flags header ends exactly at the
    # record boundary starts its chars in the CONTINUE behind a fresh
    # grbit byte — the old reader decoded that byte as a character and
    # desynchronized every later SST entry
    import struct
    from raystack.sources import xls as X
    first = "ab"
    # SST body piece 1 ends right after the second string's header
    p1 = (struct.pack("<II", 2, 2)
          + struct.pack("<H", len(first)) + b"\x00" + first.encode()
          + struct.pack("<H", 5) + b"\x00")  # header only: cch=5, flags
    p2 = b"\x00" + b"hello"  # CONTINUE: fresh grbit (compressed) + chars
    rdr = X._PieceReader([p1[8:], p2])
    assert rdr.read_string() == "ab"
    assert rdr.read_string() == "hello"


def test_unistr16_counts_utf16_code_units(tmp_path):
    # regression: cch counted Python code points; a non-BMP char
    # (surrogate pair) desynced the written SST
    from raystack.sources.xls import read_xls_grid, write_xls
    p = str(tmp_path / "w.xls")
    write_xls(p, {"S": [["note"], ["violin \U0001d11e clef"], ["next"]]})
    grid = read_xls_grid(p, "S")
    assert grid[1][0] == "violin \U0001d11e clef"
    assert grid[2][0] == "next"  # following string still intact


def test_xls_string_roundtrip_property(tmp_path):
    # property sweep after the SST bug streak: arbitrary unicode —
    # latin-1, wide BMP, non-BMP surrogate pairs, empties — must survive
    # the writer→reader round trip with following cells intact
    from hypothesis import given, settings, strategies as st
    from raystack.sources.xls import read_xls_grid, write_xls

    texts = st.lists(
        st.text(st.one_of(st.characters(min_codepoint=32,
                                        max_codepoint=0xFF),
                          st.characters(min_codepoint=0x100,
                                        max_codepoint=0x2FFF),
                          st.characters(min_codepoint=0x10000,
                                        max_codepoint=0x10FFF)),
                min_size=0, max_size=40),
        min_size=1, max_size=12)

    @settings(max_examples=30, deadline=None)
    @given(texts=texts)
    def run(texts):
        p = str(tmp_path / "prop.xls")
        grid = [["col"]] + [[s] for s in texts] + [["sentinel"]]
        write_xls(p, {"S": grid})
        back = read_xls_grid(p, "S")
        got = [r[0] for r in back[1:]]
        # verbatim round trip; the trailing sentinel proves no desync
        assert got[:-1] == list(texts)
        assert got[-1] == "sentinel"

    run()
