"""The align stage: drifting-schema Parquet partitions → one unified Dataset.

Ray-Data shape (SURVEY.md §7 step 1): files are grouped by exact schema
fingerprint at plan time (drift classes are few, so this is a handful of
groups); each group gets one ``ray.data.read_parquet`` (with column pruning —
only columns that survive into the target schema are read) and one
vectorized ``map_batches`` align fn (rename → null-fill missing → reorder →
cast → provenance), then the groups are unioned. This reproduces the
reference's rename/reindex/astype chunk chain
(d6tstack/combine_csv.py:93-106, 268-305, 473-480) without ever leaving
Arrow.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

from .plan import AlignPlan, build_plan

_PATH_COL = "path"  # added by read_parquet(include_paths=True)


def make_align_fn(plan: AlignPlan, group_path: str) -> Callable[[pa.Table], pa.Table]:
    """Vectorized per-batch align for one schema group. ``group_path`` is any
    file of the group (they share rename map + schema)."""
    rename = plan.rename_by_file[group_path]
    target = plan.unified_schema
    add_prov = plan.add_filename

    def align(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        names = [rename.get(c, c) for c in batch.schema.names]
        batch = batch.rename_columns(names)
        cols, fields = [], []
        for f in target:
            if f.name in batch.schema.names:
                col = batch.column(f.name)
                if col.type != f.type:
                    col = col.cast(f.type)
                cols.append(col)
            else:
                cols.append(pa.nulls(n, f.type))  # missing → null-filled
            fields.append(f)
        if add_prov:
            paths = batch.column(_PATH_COL)
            if paths.type != pa.string():
                paths = paths.cast(pa.string())
            cols.append(paths)
            fields.append(pa.field("filepath", pa.string()))
            cols.append(pc.replace_substring_regex(paths, r"^.*/", ""))
            fields.append(pa.field("filename", pa.string()))
        return pa.table(cols, schema=pa.schema(fields))

    return align


def make_unified_align_fn(plan: AlignPlan,
                          post_align: Callable | None = None
                          ) -> Callable[[pa.Table], pa.Table]:
    """Align for the single-read layout: batches carry a ``path`` column
    and may (rarely) mix files, so rows are routed to their file's
    rename/select mapping per batch. Missing source columns arrive
    null-filled by the scanner's unified schema."""
    # target field -> source column, per file (plan-time, tiny)
    src_of: dict[str, dict[str, str]] = {}
    for p, schema in plan.file_schemas.items():
        rename = plan.rename_by_file[p]
        src_of[p] = {rename.get(c, c): c for c in schema.names}
    target = plan.unified_schema
    add_prov = plan.add_filename

    def align_one(sub: pa.Table, path: str) -> pa.Table:
        n = sub.num_rows
        src = src_of[path]
        cols, fields = [], []
        for f in target:
            s = src.get(f.name)
            if s is not None and s in sub.schema.names:
                col = sub.column(s)
                if col.type != f.type:
                    col = col.cast(f.type)
                cols.append(col)
            else:
                cols.append(pa.nulls(n, f.type))
            fields.append(f)
        if add_prov:
            paths_arr = pa.array([path] * n, pa.string())
            cols.append(paths_arr)
            fields.append(pa.field("filepath", pa.string()))
            cols.append(pc.replace_substring_regex(paths_arr, r"^.*/", ""))
            fields.append(pa.field("filename", pa.string()))
        return pa.table(cols, schema=pa.schema(fields))

    def align(batch: pa.Table) -> pa.Table:
        import numpy as np
        pcol = batch[_PATH_COL]
        if isinstance(pcol, pa.ChunkedArray):
            pcol = pcol.combine_chunks()
        denc = pc.dictionary_encode(pcol)
        uniq = denc.dictionary.to_pylist()
        if len(uniq) == 1:
            out = align_one(batch, uniq[0])
        else:
            codes = np.asarray(denc.indices)
            parts = [align_one(batch.filter(pa.array(codes == i)), p)
                     for i, p in enumerate(uniq)]
            out = pa.concat_tables(parts)
        return post_align(out) if post_align is not None else out

    return align


def read_aligned(paths: list[str],
                 columns_select: list[str] | None = None,
                 columns_select_common: bool = False,
                 columns_rename: dict[str, str] | None = None,
                 add_filename: bool = True,
                 apply_after_read: Callable | None = None,
                 plan: AlignPlan | None = None,
                 ordered: bool = False,
                 post_align: Callable[[pa.Table], pa.Table] | None = None,
                 unified_read: bool = False,
                 **read_kwargs):
    """Build the aligned Dataset (lazy). ``apply_after_read`` mirrors the
    reference's per-chunk UDF hook (combine_csv.py:101-102): a pandas
    DataFrame → DataFrame function applied after alignment.

    ``ordered=True`` reproduces the reference's global row order (sorted
    file order × in-file row order, combine_csv.py:62): one read per file,
    unioned in path order — pair with
    ``DataContext.execution_options.preserve_order`` (see
    ``Stacker.to_pandas(ordered=True)``). Default is the faster
    schema-grouped layout with order-insensitive (keyed) semantics.

    ``post_align`` is applied per branch BEFORE the union so Ray fuses it
    into the read task chain — a downstream ``map_batches`` placed after
    the union cannot fuse across it, and every batch would cross the
    object store once more (measured: the encode pipeline's keyer+pack
    stage moves the full uncompressed table through plasma without
    this).

    ``unified_read=True``: ONE ``read_parquet`` over all files with an
    explicit unified source schema (the scanner null-fills drifted
    columns) and a path-routed align fn. Useful when the drift produces
    MANY schema groups (the union operator's per-branch overhead grows
    with group count); on the 4-group bench corpus the grouped layout
    measured ~30% faster, so it stays the default."""
    import ray.data

    if plan is None:
        plan = build_plan(paths, columns_select=columns_select,
                          columns_select_common=columns_select_common,
                          columns_rename=columns_rename,
                          add_filename=add_filename)

    want = set(paths)
    if unified_read and not ordered:
        use = [p for p in plan.paths if p in want]
        # union of per-file needed source columns, types unified (promote)
        fields: dict[str, pa.DataType] = {}
        for p in use:
            rename = plan.rename_by_file[p]
            fschema = plan.file_schemas[p]
            for f in fschema:
                if rename.get(f.name, f.name) in set(plan.target_columns):
                    prev = fields.get(f.name)
                    if prev is None:
                        fields[f.name] = f.type
                    elif prev != f.type:
                        fields[f.name] = pa.unify_schemas(
                            [pa.schema([(f.name, prev)]),
                             pa.schema([(f.name, f.type)])],
                            promote_options="permissive").field(f.name).type
        src_schema = pa.schema(sorted(fields.items()))
        kw = dict(read_kwargs)
        if "override_num_blocks" not in kw:
            import os as _os
            from ray.data import DataContext
            tgt = DataContext.get_current().target_max_block_size or (128 << 20)
            gbytes = sum(_os.path.getsize(p) for p in use
                         if _os.path.exists(p))
            kw["override_num_blocks"] = max(len(use), -(-gbytes // tgt))
        ds = ray.data.read_parquet(use, schema=src_schema,
                                   include_paths=True, **kw)
        out = ds.map_batches(make_unified_align_fn(plan, post_align),
                             batch_format="pyarrow")
        if apply_after_read is not None:
            out = out.map_batches(apply_after_read, batch_format="pandas")
        return out
    groups = ([[p] for p in plan.paths if p in want] if ordered
              else plan.schema_groups.values())
    parts = []
    for group in groups:
        # a caller may pass a pre-built plan with a subset of its files
        # (per-file aligned sinks) — read only the requested ones
        group = [p for p in group if p in want]
        if not group:
            continue
        rename = plan.rename_by_file[group[0]]
        avail = set(plan.file_schemas[group[0]].names)
        # prune at the read: only source columns that land in the target
        needed = [c for c in avail
                  if rename.get(c, c) in set(plan.target_columns)]
        kw = dict(read_kwargs)
        if "override_num_blocks" not in kw:
            # one block per file unless a file exceeds the target block size:
            # tiny auto-split blocks multiply per-block exchange overhead in
            # the downstream shuffle (measured ~1.8x on the encode pipeline)
            import os as _os

            from ray.data import DataContext
            target = DataContext.get_current().target_max_block_size or (128 << 20)
            gbytes = sum(_os.path.getsize(p) for p in group
                         if _os.path.exists(p))
            kw["override_num_blocks"] = max(len(group), -(-gbytes // target))
        ds = ray.data.read_parquet(group, columns=sorted(needed) or None,
                                   include_paths=plan.add_filename, **kw)
        branch = ds.map_batches(make_align_fn(plan, group[0]),
                                batch_format="pyarrow")
        if post_align is not None:
            branch = branch.map_batches(post_align, batch_format="pyarrow")
        parts.append(branch)
    if not parts:
        raise ValueError("read_aligned: no input files matched the plan — "
                         "pass the files the plan was built over")
    out = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    if apply_after_read is not None:
        out = out.map_batches(apply_after_read, batch_format="pandas")
    return out
