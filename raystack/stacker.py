"""API-parity facade: the reference's ``CombinerCSV`` surface on Parquet
inputs, Ray-Data-first (SURVEY.md §7 step 8).

Method map (reference d6tstack/combine_csv.py):
  columns()/is_all_equal()/is_column_present*  ← sniff_columns :108-179
  combine_preview(nrows)                       ← combine_preview :332-345
  to_pandas()                                  ← to_pandas :351-360
  dataset()                                    ← the chunk generator :93-106
  to_parquet_combine(dir)                      ← to_parquet_combine :486-504
  to_parquet_align(dir, prefix)                ← to_parquet_align :459-484
  to_csv_combine/align                         ← :436-457 / :406-434
  to_encoded(dir, ...)                         ← the graft's codec sink
  apply_after_read hook                        ← :101-102

Sniffing is metadata-only (Parquet footers); previews are driver-side head
reads (the reference's nrows_preview=3 analog); all full-size paths are lazy
Ray Datasets.
"""

from __future__ import annotations

import os
from typing import Callable

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .align import make_align_fn, read_aligned
from .plan import AlignPlan, build_plan
from .pipeline import encode_partitioned


class Stacker:
    """The reference's ``CombinerCSV`` surface (d6tstack
    combine_csv.py:57-504) on Parquet/CSV inputs: construct over a file
    list with the drift-repair options (``columns_select``,
    ``columns_select_common``, ``columns_rename``,
    ``apply_after_read``), inspect schema drift driver-side
    (footer-only sniff), then export through lazy Ray Datasets —
    ``to_parquet_combine/align``, ``to_csv_combine/align``,
    ``to_pandas``, or the codec engine via ``to_encoded``. Sniffing
    and previews are metadata/head reads; every full-size path streams
    through the Ray executor with per-file task parallelism."""

    def __init__(self, fname_list: list[str],
                 columns_select: list[str] | None = None,
                 columns_select_common: bool = False,
                 columns_rename: dict[str, str] | None = None,
                 add_filename: bool = True,
                 apply_after_read: Callable | None = None,
                 nrows_preview: int = 3):
        from .helpers import check_valid_extensions
        check_valid_extensions(fname_list)  # fail fast on mixed lists
        self.fname_list = sorted(fname_list)
        self.apply_after_read = apply_after_read
        self.nrows_preview = nrows_preview
        self._is_csv = all(p.lower().endswith((".csv", ".txt", ".tsv"))
                           for p in self.fname_list)
        self._dialect = None
        opts = dict(columns_select=columns_select,
                    columns_select_common=columns_select_common,
                    columns_rename=columns_rename, add_filename=add_filename)
        if self._is_csv:
            from .sources.csv import build_csv_plan
            self.plan, self._dialect = build_csv_plan(self.fname_list, **opts)
        else:
            self.plan: AlignPlan = build_plan(self.fname_list, **opts)
        self._opts = opts

    # -- inspection (plan-time, no Ray) -----------------------------------
    def columns(self) -> dict:
        p = self.plan
        return {"columns_all": p.columns_all, "columns_common": p.columns_common,
                "columns_unique": p.columns_unique}

    def is_all_equal(self) -> bool:
        return self.plan.is_all_equal

    def is_column_present(self) -> pd.DataFrame:
        df = pd.DataFrame(self.plan.presence).T
        df.index = [os.path.basename(p) for p in df.index]
        return df

    def is_column_present_unique(self) -> pd.DataFrame:
        return self.is_column_present()[self.plan.columns_unique]

    def is_column_present_common(self) -> pd.DataFrame:
        return self.is_column_present()[self.plan.columns_common]

    def sniff_results(self) -> dict:
        """The reference's sniff_columns result surface
        (combine_csv.py:174-177): column sets + presence + order report."""
        return {**self.columns(),
                "is_all_equal": self.is_all_equal(),
                "df_columns_present": self.is_column_present(),
                "files": [os.path.basename(p) for p in self.fname_list]}

    def preview_select(self) -> list[str]:
        """Final target column list after select/common/rename resolution
        (reference preview_select semantics, old API)."""
        return list(self.plan.target_columns)

    def preview_rename(self) -> dict[str, dict[str, str]]:
        """Per-file rename maps that will be applied (reference
        preview_rename semantics)."""
        return {os.path.basename(p): dict(m)
                for p, m in self.plan.rename_by_file.items() if m}

    # -- previews (driver-side head reads) --------------------------------
    def _head_table(self, path: str, nrows: int) -> pa.Table:
        if self._is_csv:
            import pyarrow.csv as pacsv

            from .sources.csv import _csv_options
            names = (list(self.plan.file_schemas[path].names)
                     if not self._dialect.has_header else None)
            ro, po, co = _csv_options(self._dialect, column_names=names)
            with pacsv.open_csv(path, read_options=ro, parse_options=po,
                                convert_options=co) as reader:
                t = pa.Table.from_batches([reader.read_next_batch()])
            t = t.slice(0, nrows)
        else:
            f = pq.ParquetFile(path)
            batch = next(f.iter_batches(batch_size=nrows), None)
            # a zero-row file is a legal input (to_parquet_align handles
            # them); preview it as its empty schema, don't crash
            t = pa.Table.from_batches([batch]).slice(0, nrows) \
                if batch is not None \
                else f.schema_arrow.empty_table()
        if self.plan.add_filename:
            t = t.append_column("path", pa.array([path] * t.num_rows))
        return t

    def combine_preview(self, nrows: int | None = None) -> pd.DataFrame:
        nrows = nrows or self.nrows_preview
        parts = []
        for p in self.fname_list:
            fn = make_align_fn(self.plan, p)
            parts.append(fn(self._head_table(p, nrows)).to_pandas())
        df = pd.concat(parts, ignore_index=True)
        if self.apply_after_read is not None:
            df = self.apply_after_read(df)
        return df

    # -- full-size paths (Ray Datasets) -----------------------------------
    def dataset(self, **read_kwargs):
        if self._is_csv:
            from .sources.csv import read_aligned_csv
            return read_aligned_csv(self.fname_list,
                                    apply_after_read=self.apply_after_read,
                                    **self._opts, **read_kwargs)
        return read_aligned(self.fname_list, plan=self.plan,
                            apply_after_read=self.apply_after_read,
                            **read_kwargs)

    def to_pandas(self, ordered: bool = False) -> pd.DataFrame:
        """``ordered=True`` reproduces the reference's global row order
        (sorted file order × in-file row order) via per-file reads +
        ``preserve_order`` execution."""
        if not ordered:
            return self.dataset().to_pandas()
        if self._is_csv:
            # per-file sequential reads in path order keep CSV rows ordered
            parts = [self._per_file_dataset(p).to_pandas()
                     for p in self.fname_list]
            return pd.concat(parts, ignore_index=True)
        from ray.data import DataContext
        opts = DataContext.get_current().execution_options
        prev = opts.preserve_order
        opts.preserve_order = True
        try:
            return read_aligned(self.fname_list, plan=self.plan, ordered=True,
                                apply_after_read=self.apply_after_read
                                ).to_pandas()
        finally:
            opts.preserve_order = prev

    def _per_file_dataset(self, path: str):
        """One input file read through the GLOBAL plan (unified schema)."""
        if self._is_csv:
            from .sources.csv import read_aligned_csv
            return read_aligned_csv([path], plan=self.plan,
                                    dialect=self._dialect,
                                    apply_after_read=self.apply_after_read)
        return read_aligned([path], plan=self.plan,
                            apply_after_read=self.apply_after_read)

    def to_parquet_combine(self, output_dir: str, **write_kwargs) -> str:
        self.dataset().write_parquet(output_dir, **write_kwargs)
        return output_dir

    def to_parquet_align(self, output_dir: str, prefix: str = "raystack-",
                         if_exists: str = "replace") -> list[str]:
        """One cleaned output file per input file, all on the unified schema
        (reference to_parquet_align semantics, combine_csv.py:459-484).
        ``if_exists='skip'`` keeps existing outputs (file-level resume, the
        reference's convert_xls.py:238-245 semantics)."""
        os.makedirs(output_dir, exist_ok=True)
        outs = []
        for p in self.fname_list:
            out = os.path.join(output_dir,
                               prefix + os.path.basename(p))
            if if_exists == "skip" and os.path.exists(out):
                outs.append(out)
                continue
            sub = self._per_file_dataset(p)
            # stream batches into one ParquetWriter per input file — the
            # reference's out-of-core semantics (combine_csv.py:459-484);
            # a drifting 50 GB input never materializes on the driver
            writer = None
            for batch in sub.iter_batches(batch_format="pyarrow",
                                          batch_size=65536):
                t = pa.Table.from_batches([batch]) \
                    if isinstance(batch, pa.RecordBatch) else batch
                if writer is None:
                    writer = pq.ParquetWriter(out, t.schema)
                writer.write_table(t)
            if writer is None:
                pq.write_table(self.plan.output_schema.empty_table(), out)
            else:
                writer.close()
            outs.append(out)
        return outs

    def to_csv_combine(self, output_dir: str, **write_kwargs) -> str:
        self.dataset().write_csv(output_dir, **write_kwargs)
        return output_dir

    def to_csv_align(self, output_dir: str, prefix: str = "raystack-",
                     if_exists: str = "replace") -> list[str]:
        """One cleaned CSV per input file on the unified schema
        (reference to_csv_align, combine_csv.py:406-434)."""
        os.makedirs(output_dir, exist_ok=True)
        outs = []
        for p in self.fname_list:
            base = os.path.splitext(os.path.basename(p))[0]
            out = os.path.join(output_dir, prefix + base + ".csv")
            if if_exists == "skip" and os.path.exists(out):
                outs.append(out)
                continue
            sub = self._per_file_dataset(p)
            # chunked append to one CSV per input (streamed, header once —
            # reference to_csv_align's open-handle semantics)
            first = True
            with open(out, "w", newline="") as f:
                for batch in sub.iter_batches(batch_format="pandas",
                                              batch_size=65536):
                    batch.to_csv(f, index=False, header=first)
                    first = False
                if first:
                    # header parity with non-empty outputs: include the
                    # provenance columns (plan.output_schema, not
                    # target_columns) or re-stacking reintroduces drift
                    pd.DataFrame(columns=self.plan.output_schema.names) \
                        .to_csv(f, index=False)
            outs.append(out)
        return outs

    def to_csv_head(self, output_dir: str) -> list[str]:
        """Per-file sniff-preview dump (reference to_csv_head,
        combine_csv.py:383-404) — debugging aid."""
        os.makedirs(output_dir, exist_ok=True)
        outs = []
        for p in self.fname_list:
            t = self._head_table(p, self.nrows_preview)
            base = os.path.splitext(os.path.basename(p))[0]
            out = os.path.join(output_dir, base + "-head.csv")
            t.to_pandas().to_csv(out, index=False)
            outs.append(out)
        return outs

    def to_sql_combine(self, uri: str | None = None,
                       table_name: str = "stacked",
                       schema_name: str | None = None,
                       if_exists: str = "fail",
                       return_create_sql: bool = False,
                       dialect: str = "postgres"):
        """SQL sink parity: ``return_create_sql=True`` yields the DDL for
        the unified schema without touching a DB (reference
        combine_csv.py:539-545); the executing path is gated on sqlalchemy.
        ``schema_name``/``if_exists`` apply to BOTH branches."""
        from .sources.sql import schema_to_ddl, write_sql_combine
        if return_create_sql:
            return schema_to_ddl(self.plan.output_schema, table_name,
                                 schema_name, dialect)
        return write_sql_combine(self.dataset(), uri, table_name,
                                 if_exists=if_exists,
                                 schema_name=schema_name)

    def to_encoded(self, output_dir: str, url_col: str | None = None,
                   num_partitions: int = 32, resume: bool = False,
                   method: str = "tasks",
                   zone_columns: list[str] | None = None,
                   sort_by: str | None = None) -> dict:
        """The graft sink: per-column codec encode with partitioning +
        manifest (replaces reference to_parquet_combine K5).
        ``method``: "tasks" (default — the deterministic raw-task exchange)
        or "groupby" (the Dataset shuffle path). ``zone_columns`` writes
        per-page min/max sidecars at encode time (:mod:`raystack.zones` —
        range queries then prune partitions/pages before decoding);
        ``sort_by`` clusters each partition on a column (tight zone
        pages — see pipeline.encode_partitioned_tasks)."""
        if url_col is None:
            url_col = "url" if "url" in self.plan.target_columns \
                else self.plan.target_columns[0]
        if method == "tasks":
            from .pipeline import encode_partitioned_tasks
            return encode_partitioned_tasks(
                self.fname_list, output_dir, url_col=url_col,
                num_partitions=num_partitions, resume=resume,
                plan=self.plan, dialect=self._dialect,
                zone_columns=zone_columns, sort_by=sort_by)
        # pruned hot-host pre-pass straight off the raw files when possible
        # (parquet only — the pre-pass reads with read_parquet)
        src = self.fname_list if (not self._is_csv and all(
            url_col in s.names for s in self.plan.file_schemas.values())) else None
        return encode_partitioned(self.dataset(), output_dir, url_col=url_col,
                                  num_partitions=num_partitions, resume=resume,
                                  source_paths=src, zone_columns=zone_columns,
                                  sort_by=sort_by)
