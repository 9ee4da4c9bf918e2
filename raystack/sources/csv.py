"""CSV ingestion with dialect sniffing — the reference's front door
re-expressed for Ray Data.

Sniffing semantics follow the reference (d6tstack/sniffer.py):

- per file, read the top ``nlines`` raw lines (sniffer.py:52-56);
- detect a delimiter per line (candidate set, most-frequent-count majority
  vote across lines — sniffer.py:58-98);
- ``skiprows`` = leading lines whose delimiter disagrees with the majority
  (title/junk lines, sniffer.py:107-117);
- header presence: no header iff **every** sampled row (including the
  first) has a numeric-looking cell (sniffer.py:119-143);
- all files must agree on the dialect, else ``NotImplementedError``
  (CSVSnifferList.get_all, sniffer.py:162-172).

The full-size read is ``ray.data.read_csv`` per schema group with explicit
Arrow parse/read/convert options (delimiter, skip_rows, column names,
unified column types so per-file inference can't diverge), feeding the same
align ``map_batches`` stage as Parquet inputs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.csv as pacsv

from ..plan import AlignPlan, plan_from_schemas

_DELIM_CANDIDATES = [",", ";", "\t", "|"]
_NLINES = 10
_PREVIEW_ROWS = 10


@dataclass
class CsvDialect:
    delim: str
    skiprows: int
    has_header: bool


def _read_top_lines(path: str, nlines: int = _NLINES) -> list[str]:
    lines = []
    with open(path, "r", errors="replace") as f:
        for _ in range(nlines):
            line = f.readline()
            if not line:
                break
            lines.append(line.rstrip("\r\n"))
    return lines


def _line_delim(line: str) -> str | None:
    counts = {d: line.count(d) for d in _DELIM_CANDIDATES}
    best = max(counts, key=counts.get)  # type: ignore[arg-type]
    return best if counts[best] > 0 else None


def _numeric_cell(cell: str) -> bool:
    cell = cell.strip().strip('"')
    if not cell:
        return False
    try:
        float(cell)
        return True
    except ValueError:
        return False


def sniff_dialect(path: str, nlines: int = _NLINES) -> CsvDialect:
    lines = _read_top_lines(path, nlines)
    if not lines:
        raise ValueError(f"empty file {path}")
    per_line = [_line_delim(l) for l in lines]
    votes: dict[str, int] = {}
    for d in per_line:
        if d:
            votes[d] = votes.get(d, 0) + 1
    if not votes:
        # delimiter-free file → single column; the leading-disagreement scan
        # would count EVERY line as junk (and silently drop data), so skip it
        # (the reference raises IOError here, sniffer.py:107-117 — we accept
        # the file as one column instead, which is strictly more useful)
        delim = ","
        skiprows = 0
    else:
        delim = max(votes, key=votes.get)  # type: ignore[arg-type]
        # skiprows = lines up to and including the LAST line whose
        # delimiter disagrees (reference count_skiprows, sniffer.py:107-117
        # — a junk line sandwiched mid-preview skips everything above it)
        disagree = [d != delim for d in per_line]
        if not any(disagree):
            skiprows = 0
        else:
            skiprows = len(disagree) - list(reversed(disagree)).index(True)
    data_lines = lines[skiprows:]
    # no header iff every sampled row has a numeric-looking cell
    def has_numeric(line: str) -> bool:
        return any(_numeric_cell(c) for c in line.split(delim))
    has_header = not all(has_numeric(l) for l in data_lines if l)
    return CsvDialect(delim=delim, skiprows=skiprows, has_header=has_header)


def sniff_dialect_all(paths: list[str], nlines: int = _NLINES) -> CsvDialect:
    """All files must agree (CSVSnifferList semantics, sniffer.py:162-172)."""
    dialects = [sniff_dialect(p, nlines) for p in paths]
    first = dialects[0]
    for p, d in zip(paths[1:], dialects[1:]):
        if d != first:
            raise NotImplementedError(
                f"CSV files disagree on dialect: {paths[0]}={first} vs {p}={d}")
    return first


def _csv_options(dialect: CsvDialect, column_names: list[str] | None = None,
                 column_types: dict | None = None):
    read_opts = pacsv.ReadOptions(skip_rows=dialect.skiprows)
    if not dialect.has_header:
        read_opts = pacsv.ReadOptions(
            skip_rows=dialect.skiprows,
            column_names=column_names,
            autogenerate_column_names=column_names is None)
    parse_opts = pacsv.ParseOptions(delimiter=dialect.delim)
    convert_opts = pacsv.ConvertOptions(column_types=column_types or {})
    return read_opts, parse_opts, convert_opts


def sniff_csv_schema(path: str, dialect: CsvDialect,
                     nrows: int = _PREVIEW_ROWS) -> pa.Schema:
    """Head-read with the sniffed dialect → inferred Arrow schema (the
    reference's nrows_preview column sniff, combine_csv.py:108-179)."""
    read_opts, parse_opts, convert_opts = _csv_options(dialect)
    with pacsv.open_csv(path, read_options=read_opts,
                        parse_options=parse_opts,
                        convert_options=convert_opts) as reader:
        batch = reader.read_next_batch()
    t = pa.Table.from_batches([batch]).slice(0, nrows)
    if not dialect.has_header:
        # stable generated names col0..colN (arrow autogenerates f0..fN)
        t = t.rename_columns([f"col{i}" for i in range(t.num_columns)])
    return t.schema


def build_csv_plan(paths: list[str],
                   columns_select: list[str] | None = None,
                   columns_select_common: bool = False,
                   columns_rename: dict[str, str] | None = None,
                   add_filename: bool = True,
                   nlines: int = _NLINES) -> tuple[AlignPlan, CsvDialect]:
    paths = sorted(paths)
    dialect = sniff_dialect_all(paths, nlines)
    schemas = {p: sniff_csv_schema(p, dialect) for p in paths}
    plan = plan_from_schemas(paths, schemas,
                             columns_select=columns_select,
                             columns_select_common=columns_select_common,
                             columns_rename=columns_rename,
                             add_filename=add_filename)
    return plan, dialect


def read_aligned_csv(paths: list[str],
                     columns_select: list[str] | None = None,
                     columns_select_common: bool = False,
                     columns_rename: dict[str, str] | None = None,
                     add_filename: bool = True,
                     apply_after_read=None,
                     plan: AlignPlan | None = None,
                     dialect: CsvDialect | None = None,
                     **read_kwargs):
    """Drifting CSV files → one aligned Dataset (lazy). Same align stage as
    Parquet; the reader gets explicit dialect + unified column types so
    Arrow's per-file inference can't diverge across blocks. A pre-built
    (plan, dialect) may cover a superset of ``paths`` (per-file sinks)."""
    import ray.data

    from ..align import make_align_fn

    if plan is None or dialect is None:
        plan, dialect = build_csv_plan(
            paths, columns_select=columns_select,
            columns_select_common=columns_select_common,
            columns_rename=columns_rename, add_filename=add_filename)

    want = set(paths)
    planned = {p for g in plan.schema_groups.values() for p in g}
    unknown = sorted(want - planned)
    if unknown:
        # a path absent from the plan would otherwise be FILTERED OUT
        # silently — its rows just missing from the result
        raise ValueError(f"read_aligned_csv: path(s) {unknown} are not in "
                         "the supplied plan; rebuild the plan over the "
                         "full file list")
    parts = []
    for group in plan.schema_groups.values():
        group = [p for p in group if p in want]
        if not group:
            continue
        g_schema = plan.file_schemas[group[0]]
        rename = plan.rename_by_file[group[0]]
        target_types = {}
        for f in g_schema:
            tgt = rename.get(f.name, f.name)
            tf = (plan.unified_schema.field(tgt)
                  if tgt in plan.unified_schema.names else None)
            if tf is not None:
                target_types[f.name] = tf.type
        column_names = None
        if not dialect.has_header:
            column_names = list(g_schema.names)
        read_opts, parse_opts, convert_opts = _csv_options(
            dialect, column_names=column_names, column_types=target_types)
        ds = ray.data.read_csv(group,
                               read_options=read_opts,
                               parse_options=parse_opts,
                               convert_options=convert_opts,
                               include_paths=plan.add_filename,
                               **read_kwargs)
        parts.append(ds.map_batches(make_align_fn(plan, group[0]),
                                    batch_format="pyarrow"))
    out = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    if apply_after_read is not None:
        out = out.map_batches(apply_after_read, batch_format="pandas")
    return out
