"""Excel ingestion parity (reference convert_xls.py).

The container ships no Excel reader (openpyxl/xlrd), so workbook I/O is
gated; the pure logic the reference implements around it IS here and
tested:

- :func:`parse_header_range` — ``'A4:B16'`` → header row index, skiprows,
  usecols (reference read_excel_advanced, convert_xls.py:51-73);
- :func:`collapse_multi_header` — multi-row header tuples → single names
  (convert_xls.py:86-92);
- :func:`output_filename` — ``<fname>-<sheet>.csv`` naming + ``if_exists``
  skip semantics (convert_xls.py:238-245).
"""

from __future__ import annotations

import os
import re


def _col_to_idx(col: str) -> int:
    """'A' -> 0, 'Z' -> 25, 'AA' -> 26 ..."""
    n = 0
    for ch in col.upper():
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def parse_header_range(header_xls_range: str) -> dict:
    """'B2:E2' → {'header': 0-based header row, 'skiprows': rows to skip,
    'usecols': [first_col_idx, last_col_idx]} — the prep the reference does
    before pd.read_excel (convert_xls.py:51-73)."""
    m = re.fullmatch(r"([A-Za-z]+)(\d+):([A-Za-z]+)(\d+)",
                     header_xls_range.strip())
    if not m:
        raise ValueError(f"bad header range {header_xls_range!r}")
    c1, r1, c2, r2 = m.group(1), int(m.group(2)), m.group(3), int(m.group(4))
    if r1 != r2:
        raise ValueError("header range must be a single row")
    return {"header": r1 - 1, "skiprows": r1 - 1,
            "usecols": [_col_to_idx(c1), _col_to_idx(c2)]}


def collapse_multi_header(columns: list[tuple]) -> list[str]:
    """Join multi-row header tuples, dropping pandas 'Unnamed:' fillers and
    newlines (convert_xls.py:86-92)."""
    out = []
    for col in columns:
        parts = [str(p) for p in (col if isinstance(col, tuple) else (col,))
                 if str(p) and not str(p).startswith("Unnamed:")]
        out.append(" ".join(parts).replace("\n", " ").strip())
    return out


def output_filename(fname: str, sheet_name: str, output_dir: str | None = None
                    ) -> str:
    base = os.path.splitext(os.path.basename(fname))[0]
    out = f"{base}-{sheet_name}.csv"
    return os.path.join(output_dir, out) if output_dir else out


def convert_excel(fname: str, sheet_name=0, output_dir: str | None = None,
                  if_exists: str = "replace", **kwargs) -> str:
    """Workbook sheet → CSV via the stdlib OOXML reader
    (:mod:`raystack.sources.xlsx` — no openpyxl needed for .xlsx)."""
    from .xlsx import XLStoBase
    return XLStoBase(if_exists=if_exists, output_dir=output_dir) \
        .convert_single(fname, sheet_name, **kwargs)
