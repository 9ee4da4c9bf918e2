"""File-list and column-list validation utilities.

Reference parity: ``d6tstack/helpers.py:13-116`` — the reference
validates input lists by file EXTENSION before touching any file
(``check_valid_xls`` at ``convert_xls.py:121``; the extension getters
feed the combiners). raystack additionally dispatches by magic bytes at
read time (``sources/xlsx.py``), so these are fail-fast pre-flight
guards: a mixed ``.csv`` + ``.xlsx`` input list dies here with a clear
message instead of deep inside a reader.
"""

from __future__ import annotations

import os

#: the reference's valid set (helpers.py:49-62) + the engine's native
#: formats
VALID_EXTENSIONS = [".csv", ".txt", ".tsv", ".xls", ".xlsx",
                    ".parquet", ".pq"]


def file_extensions_get(fname_list: list[str]) -> list[str]:
    """Lower-cased extension per file (reference helpers.py:13-22)."""
    return [os.path.splitext(f)[-1].lower() for f in fname_list]


def file_extensions_all_equal(ext_list: list[str]) -> bool:
    """All extensions equal? (reference helpers.py:25-34)."""
    return len(set(ext_list)) == 1


def file_extensions_valid(ext_list: list[str]) -> bool:
    """First extension in the valid set (reference helpers.py:49-62;
    like the reference this assumes ``file_extensions_all_equal`` was
    checked first)."""
    return bool(ext_list) and ext_list[0] in VALID_EXTENSIONS


def check_valid_extensions(fname_list: list[str]) -> bool:
    """Fail-fast input-list guard (reference check_valid_xls flow,
    helpers.py:106-116, generalized to every supported format)."""
    ext_list = file_extensions_get(fname_list)
    if not ext_list:
        raise ValueError("Filename list should not be empty")
    if not file_extensions_all_equal(ext_list):
        raise IOError("All file types and extensions have to be equal")
    if not file_extensions_valid(ext_list):
        raise IOError(f"Unsupported file extension {ext_list[0]!r}; "
                      f"supported: {VALID_EXTENSIONS}")
    return True


def check_valid_xls(fname_list: list[str]) -> bool:
    """Reference helpers.py:106-116 verbatim semantics: equal extensions
    AND one of .xls/.xlsx."""
    ext_list = file_extensions_get(fname_list)
    if not file_extensions_all_equal(ext_list):
        raise IOError("All file types and extensions have to be equal")
    if ext_list[0] not in (".xls", ".xlsx"):
        raise IOError("Only .xls, .xlsx files can be processed")
    return True


def columns_all_equal(col_list: list[list[str]]) -> bool:
    """All column lists identical (reference helpers.py:65-74; the plan
    layer exposes the same fact as ``AlignPlan.is_all_equal``)."""
    return all(c == col_list[0] for c in col_list)
