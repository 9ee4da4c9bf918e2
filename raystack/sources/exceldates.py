"""Shared Excel number-format / date-serial logic for the OOXML
(``xlsx.py``) and BIFF8 (``xls.py``) readers and fixture writers.

Built from public spec knowledge only: ECMA-376 §18.8.30 builtin
``numFmtId`` table (BIFF8 reuses the same ids, [MS-XLS] 2.4.126) and the
documented Lotus-1-2-3 1900 leap-year bug (serial 60 = the phantom
1900-02-29). Closes the reference-parity gap where d6tstack's pandas
excel stack returns datetimes for date-styled cells
(reference/d6tstack/convert_xls.py:24-98) while our stdlib readers used
to return raw serial numbers.

Kinds: ``"dt"`` → ``datetime.datetime``, ``"time"`` → ``datetime.time``,
``None`` → plain number.
"""

from __future__ import annotations

import datetime as _dt
import re

# ECMA-376 §18.8.30 builtin ids. 14-17/22/27-36/50-58 carry a date part
# (27-36 and 50-58 are the locale calendar variants); 18-21/45-47 are
# time-only.
_DATE_IDS = (frozenset(range(14, 18)) | {22}
             | frozenset(range(27, 37)) | frozenset(range(50, 59)))
_TIME_IDS = frozenset(range(18, 22)) | frozenset(range(45, 48))

# strip what is NOT a format token: quoted literals, AM/PM markers,
# backslash-escaped chars, and bracket sections that are colors/locales
# ([Red], [$-409]) — but keep elapsed-time brackets [h] [m] [s].
_STRIP = re.compile(r'"[^"]*"'
                    r"|AM/PM|A/P"
                    r"|\\."
                    r"|\[(?![HhMmSs]+\])[^\]]*\]", re.I)


def classify_fmt_code(code: str | None) -> str | None:
    """Custom format code → "dt" / "time" / None. ``m`` is ambiguous
    (month vs minute): it means minute only in a format that also has
    h/s tokens and no y/d — the same disambiguation Excel itself uses."""
    if not code or code.strip().lower() == "general":
        return None
    c = _STRIP.sub("", code)
    has_ymd = re.search(r"[yd]", c, re.I) is not None
    has_hs = re.search(r"[hs]", c, re.I) is not None
    has_m = re.search(r"m", c, re.I) is not None
    if has_ymd:
        return "dt"
    if has_hs:
        return "time"
    return "dt" if has_m else None  # bare m* = month (e.g. "mmm")


def classify_fmt(fmt_id: int, custom: dict[int, str]) -> str | None:
    """numFmtId (+ custom id→code table) → "dt" / "time" / None."""
    if fmt_id in custom:  # a file may shadow builtin ids
        return classify_fmt_code(custom[fmt_id])
    if fmt_id in _DATE_IDS:
        return "dt"
    if fmt_id in _TIME_IDS:
        return "time"
    return None


_EPOCH_1900 = _dt.datetime(1899, 12, 31)  # serial 1 = 1900-01-01
_EPOCH_1904 = _dt.datetime(1904, 1, 1)    # serial 0 = 1904-01-01


def serial_to_py(v: float, kind: str, date1904: bool = False):
    """Excel serial number → datetime/time, millisecond precision
    (Excel's own storage precision). Handles the 1900-system phantom
    leap day: serials ≥ 60 are one day ahead of reality."""
    if kind == "time":
        ms = round((v % 1.0) * 86400_000)
        return (_dt.datetime(1970, 1, 1)
                + _dt.timedelta(milliseconds=ms)).time()
    if date1904:
        base = _EPOCH_1904
    else:
        base = _EPOCH_1900
        if v >= 60:
            v -= 1
    return base + _dt.timedelta(milliseconds=round(v * 86400_000))


def py_to_serial(value, date1904: bool = False) -> float:
    """datetime / date / time → Excel serial (inverse of
    :func:`serial_to_py`, including the phantom-leap-day shift)."""
    if isinstance(value, _dt.time):
        return (value.hour * 3600 + value.minute * 60 + value.second
                + value.microsecond / 1e6) / 86400.0
    if isinstance(value, _dt.date) and not isinstance(value, _dt.datetime):
        value = _dt.datetime(value.year, value.month, value.day)
    base = _EPOCH_1904 if date1904 else _EPOCH_1900
    v = (value - base).total_seconds() / 86400.0
    if not date1904 and v >= 60:
        v += 1
    return v
