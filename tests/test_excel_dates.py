"""Excel date-style tests (both formats): date/time-formatted serial
numbers must come back as datetime/time values, matching the reference's
pandas excel stack (reference/d6tstack/convert_xls.py:24-98, whose test
frames carry a date column via df.to_excel)."""

import datetime as dt
import zipfile

import pytest

from raystack.sources.exceldates import (classify_fmt, classify_fmt_code,
                                         py_to_serial, serial_to_py)
from raystack.sources.xls import read_xls_grid, write_xls
from raystack.sources.xlsx import (read_excel_advanced, read_sheet_grid,
                                   write_xlsx)

VALUES = [["when", "day", "clock", "n"],
          [dt.datetime(2011, 1, 2, 13, 30, 45), dt.date(2011, 1, 2),
           dt.time(13, 30, 45), 42.5]]
# dates round-trip as datetimes (pandas read_excel semantics)
EXPECT = [["when", "day", "clock", "n"],
          [dt.datetime(2011, 1, 2, 13, 30, 45), dt.datetime(2011, 1, 2),
           dt.time(13, 30, 45), 42.5]]


@pytest.mark.parametrize("writer,ext", [(write_xlsx, "xlsx"),
                                        (write_xls, "xls")])
def test_date_roundtrip_both_formats(tmp_path, writer, ext):
    p = str(tmp_path / f"wb.{ext}")
    writer(p, {"Sheet1": VALUES})
    assert read_sheet_grid(p) == EXPECT


@pytest.mark.parametrize("writer,ext", [(write_xlsx, "xlsx"),
                                        (write_xls, "xls")])
def test_leap_bug_1900(tmp_path, writer, ext):
    # serials 59/61 straddle the phantom 1900-02-29 (Lotus bug)
    p = str(tmp_path / f"wb.{ext}")
    days = [[dt.datetime(1900, 2, 28)], [dt.datetime(1900, 3, 1)],
            [dt.datetime(1900, 1, 1)]]
    writer(p, {"S": days})
    assert read_sheet_grid(p) == days


def test_read_excel_advanced_keeps_datetimes(tmp_path):
    p = str(tmp_path / "wb.xlsx")
    write_xlsx(p, {"Sheet1": VALUES})
    df = read_excel_advanced(p)
    assert df.loc[0, "when"] == dt.datetime(2011, 1, 2, 13, 30, 45)
    assert df.loc[0, "day"] == dt.datetime(2011, 1, 2)
    assert df.loc[0, "clock"] == dt.time(13, 30, 45)
    assert df.loc[0, "n"] == 42.5


def test_classify_fmt_code():
    assert classify_fmt_code("yyyy-mm-dd") == "dt"
    assert classify_fmt_code("m/d/yy h:mm") == "dt"
    assert classify_fmt_code("mmm yyyy") == "dt"
    assert classify_fmt_code("mm") == "dt"            # bare m = month
    assert classify_fmt_code("h:mm:ss") == "time"
    assert classify_fmt_code("mm:ss.0") == "time"     # m next to s = minute
    assert classify_fmt_code("[h]:mm") == "time"      # elapsed hours kept
    assert classify_fmt_code("h:mm AM/PM") == "time"  # AM/PM not a month
    assert classify_fmt_code("General") is None
    assert classify_fmt_code("#,##0.00") is None
    assert classify_fmt_code('0.0 "meters"') is None  # quoted literal
    assert classify_fmt_code("[Red]0.0") is None      # color bracket
    assert classify_fmt_code('[$-409]0.0') is None    # locale bracket


def test_classify_fmt_builtin_and_custom():
    assert classify_fmt(14, {}) == "dt"     # builtin date
    assert classify_fmt(22, {}) == "dt"     # builtin datetime
    assert classify_fmt(21, {}) == "time"   # builtin time
    assert classify_fmt(2, {}) is None      # builtin numeric
    assert classify_fmt(164, {164: "yyyy\\-mm"}) == "dt"
    assert classify_fmt(164, {164: "0.00"}) is None
    # a custom table may shadow a builtin id
    assert classify_fmt(14, {14: "0.00"}) is None


def test_serial_conversions_1904():
    d = dt.datetime(2011, 1, 2, 12, 0)
    s = py_to_serial(d, date1904=True)
    assert serial_to_py(s, "dt", date1904=True) == d
    assert serial_to_py(0.0, "dt", date1904=True) == dt.datetime(1904, 1, 1)


def test_date1904_workbook_flag(tmp_path):
    # rewrite the writer's workbook.xml with the 1904 epoch flag; the
    # same serial must shift by the epoch difference
    p = str(tmp_path / "wb.xlsx")
    write_xlsx(p, {"S": [[dt.datetime(2011, 1, 2)]]})
    with zipfile.ZipFile(p) as zf:
        parts = {n: zf.read(n) for n in zf.namelist()}
    parts["xl/workbook.xml"] = parts["xl/workbook.xml"].replace(
        b"<sheets>", b'<workbookPr date1904="1"/><sheets>')
    p2 = str(tmp_path / "wb1904.xlsx")
    with zipfile.ZipFile(p2, "w") as zf:
        for n, b in parts.items():
            zf.writestr(n, b)
    [[v]] = read_sheet_grid(p2)
    assert v == dt.datetime(2011, 1, 2) + (dt.datetime(1904, 1, 1)
                                           - dt.datetime(1899, 12, 31)
                                           + dt.timedelta(days=1))


def test_unstyled_numbers_unchanged(tmp_path):
    # plain numbers must stay numbers in both formats
    for writer, ext in [(write_xlsx, "xlsx"), (write_xls, "xls")]:
        p = str(tmp_path / f"plain.{ext}")
        writer(p, {"S": [[1, 2.5, "x", True]]})
        assert read_sheet_grid(p) == [[1, 2.5, "x", True]]


# --- property tests (hypothesis) ------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.datetimes(min_value=dt.datetime(1900, 1, 1),
                    max_value=dt.datetime(2200, 12, 31)))
def test_serial_roundtrip_property(d):
    d = d.replace(microsecond=(d.microsecond // 1000) * 1000)  # ms precision
    assert serial_to_py(py_to_serial(d), "dt") == d


@settings(max_examples=100, deadline=None)
@given(st.datetimes(min_value=dt.datetime(1904, 1, 1),
                    max_value=dt.datetime(2200, 12, 31)))
def test_serial_roundtrip_property_1904(d):
    d = d.replace(microsecond=(d.microsecond // 1000) * 1000)
    assert serial_to_py(py_to_serial(d, date1904=True), "dt",
                        date1904=True) == d


@settings(max_examples=100, deadline=None)
@given(st.times())
def test_time_roundtrip_property(t):
    t = t.replace(microsecond=(t.microsecond // 1000) * 1000)
    assert serial_to_py(py_to_serial(t), "time") == t
