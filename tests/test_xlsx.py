"""xlsx source tests — modeled on the reference's tests/test_xls.py:21-272
(header cell ranges, blank row/col drop, multi-row header collapse, sheet
sniffing, multi-file and multi-sheet CSV converters). Fixtures are written
by the module's own minimal stdlib writer (the container ships no
openpyxl), so every test is a full write→read round trip."""

import os

import pandas as pd
import pytest

from raystack.sources.xlsx import (XLSSniffer, XLStoCSVMultiFile,
                                   XLStoCSVMultiSheet, col_to_idx,
                                   coordinate_from_string, idx_to_col,
                                   read_excel_advanced, read_sheet_grid,
                                   sheet_names, write_xlsx)

_ROWS = [["date", "sales", "cost", "profit"],
         ["2011-01-01", 100, -80, 20],
         ["2011-01-02", 200, -90, 110],
         ["2011-01-03", 300, -100, 200]]


@pytest.fixture()
def wb(tmp_path):
    p = str(tmp_path / "data.xlsx")
    write_xlsx(p, {"Sheet1": _ROWS})
    return p


@pytest.fixture()
def wb_offset(tmp_path):
    """Header at B3:E3 with junk above and a blank column A + blank row —
    the reference's header-range fixture shape (tests/test_xls.py)."""
    rows = [["junk title"],
            [],
            [None, "date", "sales", "cost", "profit"],
            [None, "2011-01-01", 100, -80, 20],
            [None, "2011-01-02", 200, -90, 110],
            [],
            [None, "2011-01-03", 300, -100, 200]]
    p = str(tmp_path / "offset.xlsx")
    write_xlsx(p, {"Sheet1": rows})
    return p


def test_coords():
    assert col_to_idx("A") == 0 and col_to_idx("AA") == 26
    assert idx_to_col(0) == "A" and idx_to_col(26) == "AA"
    assert coordinate_from_string("B4") == (1, 4)


def test_grid_roundtrip(wb):
    grid = read_sheet_grid(wb)
    assert grid[0] == ["date", "sales", "cost", "profit"]
    assert grid[2] == ["2011-01-02", 200, -90, 110]


def test_read_simple(wb):
    df = read_excel_advanced(wb)
    assert list(df.columns) == ["date", "sales", "cost", "profit"]
    assert len(df) == 3
    assert df["sales"].tolist() == [100, 200, 300]
    assert df["cost"].dtype.kind == "i"


def test_read_header_range(wb_offset):
    df = read_excel_advanced(wb_offset, header_xls_range="B3:E3")
    assert list(df.columns) == ["date", "sales", "cost", "profit"]
    # blank row dropped (M7)
    assert len(df) == 3
    assert df["profit"].tolist() == [20, 110, 200]


def test_read_header_start_end(wb_offset):
    df = read_excel_advanced(wb_offset, header_xls_start="B3",
                             header_xls_end="E3")
    assert list(df.columns) == ["date", "sales", "cost", "profit"]
    with pytest.raises(ValueError):
        read_excel_advanced(wb_offset, header_xls_range="B3:E3",
                            header_xls_start="B3")


def test_blank_col_kept_when_disabled(wb_offset):
    df = read_excel_advanced(wb_offset, header_xls_range="A3:E3",
                             remove_blank_cols=False)
    assert len(df.columns) == 5
    df2 = read_excel_advanced(wb_offset, header_xls_range="A3:E3")
    assert list(df2.columns) == ["date", "sales", "cost", "profit"]


def test_multirow_header_collapse(tmp_path):
    rows = [["group A", "group A", None, "group B"],
            ["x", "y", "z", "w"],
            [1, 2, 3, 4],
            [5, 6, 7, 8]]
    p = str(tmp_path / "multi.xlsx")
    write_xlsx(p, {"Sheet1": rows})
    df = read_excel_advanced(p, header_xls_range="A1:D2")
    assert list(df.columns) == ["group A x", "group A y", "z", "group B w"]
    assert df["group A x"].tolist() == [1, 5]


def test_preview(wb):
    df = read_excel_advanced(wb, is_preview=True, nrows_preview=2)
    assert len(df) == 2


def test_sniffer(tmp_path):
    p1 = str(tmp_path / "a.xlsx")
    p2 = str(tmp_path / "b.xlsx")
    write_xlsx(p1, {"Sheet1": _ROWS, "extra": [["x"], [1]]})
    write_xlsx(p2, {"Sheet1": _ROWS})
    assert sheet_names(p1) == ["Sheet1", "extra"]
    sn = XLSSniffer([p1, p2])
    assert sn.all_contain_sheetname("Sheet1")
    assert not sn.all_contain_sheetname("extra")
    assert sn.all_have_idx(0) and not sn.all_have_idx(1)
    assert not sn.all_same_count() and not sn.all_same_names()
    with pytest.raises(IOError):
        XLSSniffer([str(tmp_path / "a.csv")])


def test_multifile_converter(tmp_path):
    paths = []
    for i in range(2):
        p = str(tmp_path / f"f{i}.xlsx")
        write_xlsx(p, {"Sheet1": _ROWS})
        paths.append(p)
    out_dir = str(tmp_path / "out")
    conv = XLStoCSVMultiFile(paths, output_dir=out_dir, if_exists="replace")
    outs = conv.convert_all()
    assert all(os.path.exists(o) for o in outs)
    df = pd.read_csv(outs[0])
    assert list(df.columns) == ["date", "sales", "cost", "profit"]
    assert len(df) == 3
    # name_global mode + invalid selection validation
    conv2 = XLStoCSVMultiFile(paths, cfg_xls_sheets_sel_mode="name_global",
                              cfg_xls_sheets_sel="Sheet1",
                              output_dir=out_dir, if_exists="replace")
    assert len(conv2.convert_all()) == 2
    with pytest.raises(ValueError):
        XLStoCSVMultiFile(paths, cfg_xls_sheets_sel_mode="name_global",
                          cfg_xls_sheets_sel="NoSuch", output_dir=out_dir)


def test_multisheet_converter_and_skip(tmp_path):
    p = str(tmp_path / "m.xlsx")
    write_xlsx(p, {"alpha": _ROWS, "beta": _ROWS})
    out_dir = str(tmp_path / "out")
    conv = XLStoCSVMultiSheet(p, output_dir=out_dir, if_exists="replace")
    outs = conv.convert_all()
    assert [os.path.basename(o) for o in outs] == ["m.xlsx-alpha.csv",
                                                   "m.xlsx-beta.csv"]
    mtimes = [os.path.getmtime(o) for o in outs]
    # if_exists='skip' leaves existing outputs untouched (file-level resume)
    conv_skip = XLStoCSVMultiSheet(p, output_dir=out_dir, if_exists="skip")
    with pytest.warns(UserWarning):
        conv_skip.convert_all()
    assert [os.path.getmtime(o) for o in outs] == mtimes


def test_stacker_reads_converted_csvs(ray_session, tmp_path):
    """End-to-end: workbooks → CSV conversion → the CSV align pipeline
    (the reference's xls→csv→combine flow)."""
    from raystack.sources.csv import read_aligned_csv
    paths = []
    for i in range(2):
        p = str(tmp_path / f"wb{i}.xlsx")
        rows = [r[:] for r in _ROWS]
        if i == 1:  # drift: renamed column
            rows[0] = ["date", "revenue", "cost", "profit"]
        write_xlsx(p, {"Sheet1": rows})
        paths.append(p)
    conv = XLStoCSVMultiFile(paths, output_dir=str(tmp_path / "csv"),
                             if_exists="replace")
    csvs = conv.convert_all()
    ds = read_aligned_csv(csvs, columns_rename={"revenue": "sales"},
                          add_filename=False)
    df = ds.to_pandas()
    assert len(df) == 6
    assert set(df.columns) == {"date", "sales", "cost", "profit"}
    assert df["sales"].notna().all()


def test_duplicate_header_labels(tmp_path):
    # regression: df[label] on repeated headers returns a DataFrame and
    # the datetime guard crashed with "truth value ambiguous"
    from raystack.sources.xlsx import read_excel_advanced, write_xlsx
    p = str(tmp_path / "dup.xlsx")
    write_xlsx(p, {"S": [["Q1", "Q1", "n"], ["a", "b", 1], ["c", "d", 2]]})
    df = read_excel_advanced(p)
    assert list(df.columns) == ["Q1", "Q1", "n"]
    assert df["n"].tolist() == [1, 2]


def test_multisheet_accepts_bare_string(tmp_path):
    from raystack.sources.xlsx import XLStoCSVMultiSheet, write_xlsx
    p = str(tmp_path / "wb.xlsx")
    write_xlsx(p, {"Sheet1": [["a"], [1]], "Sheet2": [["b"], [2]]})
    conv = XLStoCSVMultiSheet(p, sheet_names_sel="Sheet1",
                              output_dir=str(tmp_path))
    outs = conv.convert_all()
    assert len(outs) == 1 and outs[0].endswith("-Sheet1.csv")


def test_sheet_index_validation_bounds(tmp_path):
    import pytest
    from raystack.sources.xlsx import XLStoCSVMultiFile, write_xlsx
    p = str(tmp_path / "wb.xlsx")
    write_xlsx(p, {"S1": [["a"], [1]], "S2": [["b"], [2]]})
    with pytest.raises(ValueError, match="Invalid index"):
        XLStoCSVMultiFile([p], cfg_xls_sheets_sel_mode="idx_global",
                          cfg_xls_sheets_sel=2)
    with pytest.raises(ValueError, match="Invalid index"):
        XLStoCSVMultiFile([p], cfg_xls_sheets_sel_mode="idx_global",
                          cfg_xls_sheets_sel=-1)


def test_header_start_requires_end(tmp_path):
    import pytest
    from raystack.sources.xlsx import read_excel_advanced, write_xlsx
    p = str(tmp_path / "wb.xlsx")
    write_xlsx(p, {"S": [["a"], [1]]})
    with pytest.raises(ValueError, match="together"):
        read_excel_advanced(p, header_xls_start="A1")
