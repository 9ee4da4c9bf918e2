"""Plan-time schema sniffing + unification over Parquet footers.

Re-expresses ``CombinerCSV.sniff_columns`` / ``_columns_reindex_prep``
(reference d6tstack/combine_csv.py:108-179, 268-309) for Parquet inputs:
instead of head-reading 3 rows per CSV, read each file's Parquet footer
schema (metadata-only, cheap). Produces an :class:`AlignPlan` — a frozen,
broadcast-safe plan object that the align ``map_batches`` stage consumes.

Semantics preserved from the reference:
- ``columns_all``  = union of per-file columns, ordered by **modal position**
  across files, tie-broken by mode count then first-seen order
  (combine_csv.py:160-171).
- ``columns_common`` = intersection, ``columns_unique`` = union − intersection
  (helpers.py:77-90).
- presence matrix file × column (combine_csv.py:147-152);
  ``is_all_equal`` (helpers.py:65-74).
- per-file rename maps with conflict resolution: rename pairs whose target
  collides with an existing column in that file are dropped with a warning
  (combine_csv.py:274-292).
- target column list = columns_select ∨ columns_common ∨ columns_all, after
  rename, duplicates removed preserving order (combine_csv.py:294-305).
- columns selected but present in no file surface as all-null float64 —
  mirroring the reference's all-NaN float64 columns
  (tests/test_combine_csv.py:366,382).
"""

from __future__ import annotations

import warnings
from collections import Counter
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

PROVENANCE_COLS = ("filepath", "filename")


def sniff_parquet_schemas(paths: list[str]) -> dict[str, pa.Schema]:
    """Footer-only schema read per file (the Parquet analog of the
    reference's 3-row head sniff). Driver-side metadata reads, thread-pooled
    — at many files the serial footer loop becomes measurable fixed cost."""
    if len(paths) <= 4:
        return {p: pq.read_schema(p) for p in paths}
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=min(16, len(paths))) as ex:
        schemas = list(ex.map(pq.read_schema, paths))
    return dict(zip(paths, schemas))


def _modal_order(file_columns: list[list[str]]) -> list[str]:
    """Union of columns ordered by modal position across files
    (combine_csv.py:160-171 semantics)."""
    first_seen: dict[str, int] = {}
    positions: dict[str, list[int]] = {}
    for cols in file_columns:
        for pos, c in enumerate(cols):
            if c not in first_seen:
                first_seen[c] = len(first_seen)
            positions.setdefault(c, []).append(pos)
    def key(c: str):
        counts = Counter(positions[c])
        # scipy.stats.mode picks the smallest value on count ties
        mode, cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return (mode, -cnt, first_seen[c])
    return sorted(positions, key=key)


@dataclass
class AlignPlan:
    paths: list[str]
    file_schemas: dict[str, pa.Schema]
    columns_all: list[str]
    columns_common: list[str]
    columns_unique: list[str]
    is_all_equal: bool
    presence: dict[str, dict[str, bool]]          # path -> column -> present
    rename_by_file: dict[str, dict[str, str]]     # path -> {old: new}
    target_columns: list[str]                     # post-rename, pre-provenance
    unified_schema: pa.Schema                     # target columns w/ types
    add_filename: bool = True
    schema_groups: dict[str, list[str]] = field(default_factory=dict)

    @property
    def output_schema(self) -> pa.Schema:
        """unified schema + provenance columns when enabled."""
        s = self.unified_schema
        if self.add_filename:
            for c in PROVENANCE_COLS:
                s = s.append(pa.field(c, pa.string()))
        return s


def build_plan(paths: list[str],
               columns_select: list[str] | None = None,
               columns_select_common: bool = False,
               columns_rename: dict[str, str] | None = None,
               add_filename: bool = True) -> AlignPlan:
    """Plan over Parquet inputs (footer sniff). CSV inputs go through
    :func:`plan_from_schemas` with schemas sniffed by
    :mod:`raystack.sources.csv`."""
    paths = sorted(paths)  # lexicographic file order (combine_csv.py:62)
    return plan_from_schemas(paths, sniff_parquet_schemas(paths),
                             columns_select=columns_select,
                             columns_select_common=columns_select_common,
                             columns_rename=columns_rename,
                             add_filename=add_filename)


def plan_from_schemas(paths: list[str], schemas: dict[str, pa.Schema],
                      columns_select: list[str] | None = None,
                      columns_select_common: bool = False,
                      columns_rename: dict[str, str] | None = None,
                      add_filename: bool = True) -> AlignPlan:
    if columns_select and len(columns_select) != len(set(columns_select)):
        raise ValueError("duplicate entries in columns_select")  # combine_csv.py:89-91
    file_cols = [list(schemas[p].names) for p in paths]

    columns_all = _modal_order(file_cols)
    common = set(file_cols[0]) if file_cols else set()
    for cols in file_cols[1:]:
        common &= set(cols)
    columns_common = [c for c in columns_all if c in common]
    columns_unique = [c for c in columns_all if c not in common]
    is_all_equal = all(cols == file_cols[0] for cols in file_cols)
    presence = {p: {c: (c in schemas[p].names) for c in columns_all} for p in paths}

    columns_rename = dict(columns_rename or {})
    targets = list(columns_rename.values())
    if len(set(targets)) != len(targets):
        # two renames onto one target would later make the aligned
        # batch carry duplicate column labels (batch.column(name) raises)
        raise ValueError("columns_rename maps two columns to the same "
                         "target name")
    rename_by_file: dict[str, dict[str, str]] = {}
    for p in paths:
        names = set(schemas[p].names)
        applicable = {o: n for o, n in columns_rename.items() if o in names}
        # conflict resolution: a rename whose target already exists in this
        # file would collide — drop it, warn (combine_csv.py:280-289)
        conflicts = [o for o, n in applicable.items() if n in names]
        for o in conflicts:
            warnings.warn(
                f"rename {o!r}->{applicable[o]!r} conflicts with existing "
                f"column in {p}; ignored", UserWarning)
            del applicable[o]
        rename_by_file[p] = applicable

    # post-rename column universe for target selection: recompute union /
    # intersection over the per-file *renamed* column lists, so a rename that
    # repairs drift (body→text) makes the column common again
    renamed_file_cols = [
        [rename_by_file[p].get(c, c) for c in schemas[p].names] for p in paths]
    renamed_all = _modal_order(renamed_file_cols)
    rcommon = set(renamed_file_cols[0]) if renamed_file_cols else set()
    for cols in renamed_file_cols[1:]:
        rcommon &= set(cols)
    renamed_common = [c for c in renamed_all if c in rcommon]

    if columns_select:
        target = list(dict.fromkeys(columns_select))
    elif columns_select_common:
        target = renamed_common
    else:
        target = renamed_all

    # unified types: permissive promotion across files that carry the column
    fields: list[pa.Field] = []
    for c in target:
        types: list[pa.DataType] = []
        for p in paths:
            rename = rename_by_file[p]
            for f in schemas[p]:
                if rename.get(f.name, f.name) == c:
                    types.append(f.type)
        if not types:
            fields.append(pa.field(c, pa.float64()))  # all-NaN float64 analog
            continue
        if all(t == types[0] for t in types):
            fields.append(pa.field(c, types[0]))
        else:
            one_field = [pa.schema([pa.field(c, t)]) for t in types]
            unified = pa.unify_schemas(one_field, promote_options="permissive")
            fields.append(unified.field(0))
    unified_schema = pa.schema(fields)

    # group files by (ordered column list, types, rename map) — one Ray read
    # per group; files in a group share the exact align transform
    groups: dict[str, list[str]] = {}
    for p in paths:
        fp = repr((tuple((f.name, str(f.type)) for f in schemas[p]),
                   tuple(sorted(rename_by_file[p].items()))))
        groups.setdefault(fp, []).append(p)

    return AlignPlan(paths=paths, file_schemas=schemas, columns_all=columns_all,
                     columns_common=columns_common, columns_unique=columns_unique,
                     is_all_equal=is_all_equal, presence=presence,
                     rename_by_file=rename_by_file, target_columns=target,
                     unified_schema=unified_schema, add_filename=add_filename,
                     schema_groups=groups)
