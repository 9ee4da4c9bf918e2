"""First-class ``ray.data`` Datasource over an encoded raystack layout.

:class:`RaystackDatasource` wraps the same routing :func:`raystack.pipeline.scan`
performs — partition-local streaming decode, zone-map page pruning for
``where=``, snapshot-log path resolution for ``snapshot=`` — but exposes it
through Ray Data's planner: projection and predicates are pushed down at
READ-TASK CREATION time (pruned partitions never become tasks; pruned pages
never leave the parquet reader), and every surviving task carries real
:class:`~ray.data.block.BlockMetadata` (row counts from the layout manifest,
byte sizes, input files) so the streaming executor sizes the read stage from
the layout's own statistics rather than guessing.

Use :func:`read_raystack` as the entry point::

    ds = read_raystack(out_dir, columns=["url", "n_chars"],
                       where={"n_chars": (100, None)})

is row-identical to ``scan(out_dir, columns=…, where=…)`` (equivalence-tested
in ``tests/test_datasource.py``, including zone-pruned and time-travel reads)
but composes as a genuine Ray Data source: downstream ``map_batches`` /
``groupby`` / ``write_parquet`` chain off it like any ``read_parquet``.

Scale shape: one read task per surviving ``part_key=`` directory (the
partition is the decode atom — a page group never spans partitions), each
task yielding page-group-sized blocks via
:func:`raystack.pipeline._decode_partition_stream` so block size is bounded
by the encoder's ``page_rows`` regardless of partition size. ``parallelism``
hints below the partition count coalesce several partitions into one task;
hints above it are ignored (a partition cannot split without an all-to-all).
"""
from __future__ import annotations

import json
import os
from typing import Iterable, List, Optional

import pyarrow as pa

from ray.data.block import BlockMetadata
from ray.data.datasource import Datasource
from ray.data import ReadTask


def _partition_size_on_disk(part_dir: str) -> int:
    """Bytes of the partition's live page files (cheap: stat only)."""
    try:
        with os.scandir(part_dir) as it:
            return sum(e.stat().st_size for e in it
                       if e.is_file() and e.name.endswith(".parquet"))
    except OSError:
        return 0


def _decode_stream_filtered(pages_root: str, dirname: str,
                            want: Optional[list[str]],
                            columns: Optional[list[str]],
                            ranges: Optional[dict],
                            whitelist, paths) -> Iterable[pa.Table]:
    """Per-partition read body shared by every routing mode: stream page
    groups, apply the exact predicate (zone pruning is advisory — the
    filter makes the result exact regardless of sidecar staleness), then
    project back to the caller's columns."""
    from .pipeline import _decode_partition_stream
    from .zones import predicate_mask

    for piece in _decode_partition_stream(
            os.path.join(pages_root, dirname), want,
            page_whitelist=whitelist, paths=paths):
        if not piece.num_rows:
            continue
        if ranges is not None:
            piece = piece.filter(predicate_mask(piece, ranges))
            if columns is not None:
                piece = piece.select(
                    [c for c in columns if c in piece.schema.names])
        if piece.num_rows:
            yield piece


class RaystackDatasource(Datasource):
    """``ray.data`` Datasource over one encoded layout directory.

    Parameters mirror :func:`raystack.pipeline.scan`:

    - ``columns``: projection — only these columns' pages are read
      (pushed into the per-partition parquet scan as a ``column IN``
      filter; with bounded row groups the unwanted pages' blob bytes
      never leave storage).
    - ``where``: ``{col: (lo, hi) | {"in": [...]}}`` predicate — zone
      sidecars prune partitions and pages at plan time
      (:func:`raystack.zones.zone_prune_plan`), the surviving rows get
      the exact filter, so the result equals unpruned-decode + filter
      whether or not sidecars exist or are stale.
    - ``snapshot``: time-travel to a snapshot id through the snapshot
      log; composes with ``columns`` but not ``where`` (zone sidecars
      describe the LIVE layout only — same contract as ``scan``).
    - ``keys``: point lookup — each key routes through the layout's
      persisted partition-key math, so only hash(|keys|) partitions
      become read tasks at all, and inside each the key column's
      per-page blooms cut decode to ~1 page per column per hit
      (:func:`raystack.pipeline.lookup_rows` semantics). Composes with
      ``columns`` only, like ``scan(keys=)``.
    """

    def __init__(self, out_dir: str, *, columns: Optional[list[str]] = None,
                 where: Optional[dict] = None,
                 snapshot: Optional[int] = None,
                 keys: Optional[list] = None):
        if where is not None and snapshot is not None:
            raise ValueError("where= reads the live zone sidecars — "
                             "read snapshot= unfiltered then filter for "
                             "historical states")
        if keys is not None and (where is not None or snapshot is not None):
            raise ValueError("keys= routes through the live layout's "
                             "blooms — it composes with neither where= "
                             "nor snapshot=")
        pages_root = os.path.join(out_dir, "pages")
        if not os.path.isdir(pages_root):
            raise FileNotFoundError(f"not an encoded layout: {out_dir!r} "
                                    f"(no pages/ directory)")
        self._out_dir = out_dir
        self._columns = list(columns) if columns is not None else None
        self._where = dict(where) if where is not None else None
        self._snapshot = snapshot
        self._keys = list(keys) if keys is not None else None

    def get_name(self) -> str:
        return "Raystack"

    # -- planning -----------------------------------------------------
    def _plan_items(self) -> list[dict]:
        """One dict per surviving partition: ``dirname``, optional page
        ``whitelist`` (zone pruning), optional snapshot ``paths``, plus
        manifest statistics for BlockMetadata."""
        from . import manifest as mf

        pages_root = os.path.join(self._out_dir, "pages")
        manifest = mf.load_manifest(self._out_dir)

        def stats_for(dirname: str) -> tuple[Optional[int], int]:
            key = dirname.split("=", 1)[1] if "=" in dirname else dirname
            row = manifest.get(key)
            if row is not None:
                return int(row.get("rows", 0)), int(
                    row.get("encoded_bytes",
                            _partition_size_on_disk(
                                os.path.join(pages_root, dirname))))
            return None, _partition_size_on_disk(
                os.path.join(pages_root, dirname))

        items: list[dict] = []
        if self._keys is not None:
            import numpy as np
            import pyarrow as pa_

            from .pipeline import compute_part_keys
            cfg = mf.load_config(self._out_dir)
            if not cfg:
                raise FileNotFoundError(
                    f"no partitioning config under {self._out_dir}")
            vals = pa_.array([str(v) for v in self._keys],
                             type=pa_.string())
            routed = np.unique(compute_part_keys(
                vals, cfg["num_partitions"], cfg.get("hot_hosts") or {},
                cfg.get("host_map")))
            for k in routed:
                d = f"part_key={int(k)}"
                if not os.path.isdir(os.path.join(pages_root, d)):
                    continue
                _, nbytes = stats_for(d)
                items.append({"dirname": d, "paths": None,
                              "whitelist": None, "rows": None,
                              "bytes": nbytes,
                              "files": [os.path.join(pages_root, d)]})
            return items

        if self._snapshot is not None:
            from .snapshots import resolve_snapshot_paths
            per_dir = resolve_snapshot_paths(self._out_dir, self._snapshot)
            if not per_dir:
                raise FileNotFoundError(
                    f"snapshot {self._snapshot} of {self._out_dir} lists "
                    f"no partitions")
            for d, paths in sorted(per_dir.items()):
                # manifest stats describe the LIVE layout; a snapshot may
                # differ, so rows are unknown (None) unless live ≡ snapshot
                live = sorted(
                    os.path.join(pages_root, d, f) for f in
                    os.listdir(os.path.join(pages_root, d))
                    if f.endswith(".parquet")
                ) if os.path.isdir(os.path.join(pages_root, d)) else []
                nrows, nbytes = stats_for(d)
                if live != sorted(paths):
                    nrows = None
                items.append({"dirname": d, "paths": list(paths),
                              "whitelist": None, "rows": nrows,
                              "bytes": nbytes, "files": list(paths)})
            return items

        if self._where is not None:
            from .zones import zone_prune_plan
            plan = zone_prune_plan(self._out_dir, self._where)
            for d, wl in sorted(plan.items()):
                _, nbytes = stats_for(d)
                if wl is not None and nbytes:
                    # scale the size estimate by the surviving page
                    # fraction so the planner sees the pruned volume; a
                    # sidecar holds one row per page, footer-only read
                    zdir = os.path.join(self._out_dir, "zones", d)
                    try:
                        import pyarrow.parquet as pq
                        with open(os.path.join(zdir, "meta.json")) as f:
                            cols = json.load(f).get("columns") or []
                        if cols:
                            total_pages = pq.ParquetFile(os.path.join(
                                zdir, f"{cols[0]}.parquet")
                            ).metadata.num_rows
                            if total_pages:
                                nbytes = max(
                                    1, nbytes * len(wl) // total_pages)
                    except (OSError, ValueError, KeyError):
                        pass
                items.append({"dirname": d, "paths": None,
                              "whitelist": wl, "rows": None,  # filtered
                              "bytes": nbytes,
                              "files": [os.path.join(pages_root, d)]})
            return items

        dirs = sorted(d for d in os.listdir(pages_root)
                      if d.startswith("part_key="))
        if not dirs:
            raise FileNotFoundError(
                f"no part_key= dirs under {pages_root}")
        for d in dirs:
            nrows, nbytes = stats_for(d)
            items.append({"dirname": d, "paths": None, "whitelist": None,
                          "rows": nrows, "bytes": nbytes,
                          "files": [os.path.join(pages_root, d)]})
        return items

    def estimate_inmemory_data_size(self) -> Optional[int]:
        """Decoded (raw) bytes from the manifest for surviving partitions;
        projection scales by the column fraction when the layout config
        records the schema. None when the manifest is absent."""
        from . import manifest as mf
        manifest = mf.load_manifest(self._out_dir)
        if not manifest:
            return None
        try:
            items = self._plan_items()
        except FileNotFoundError:
            return None
        total = 0
        for it in items:
            key = it["dirname"].split("=", 1)[1]
            row = manifest.get(key)
            if row is None:
                continue
            total += int(row.get("raw_bytes", 0))
        if self._columns is not None:
            cfg = mf.load_config(self._out_dir)
            schema_cols = cfg.get("schema_columns") or cfg.get("columns")
            if schema_cols:
                frac = len(self._columns) / max(1, len(schema_cols))
                total = int(total * min(1.0, frac))
        return total

    def get_read_tasks(self, parallelism: int) -> List[ReadTask]:
        items = self._plan_items()
        pages_root = os.path.join(self._out_dir, "pages")
        columns, ranges = self._columns, self._where
        lookup_keys = self._keys
        out_dir = self._out_dir
        want = columns
        if ranges is not None and want is not None:
            # predicate columns ride along for the exact filter, then the
            # projection drops them again inside the read task
            want = [*want, *[c for c in ranges if c not in want]]

        if not items:
            # fully pruned: one empty task keeps read_datasource happy and
            # the result row-identical to scan()'s empty dataset
            meta = BlockMetadata(num_rows=0, size_bytes=0, exec_stats=None,
                                 input_files=[])
            return [ReadTask(lambda: iter([pa.table({})]), meta)]

        # coalesce partitions into at most max(parallelism, 1) tasks when
        # the hint is below the partition count; never split a partition
        groups: list[list[dict]]
        if parallelism and 0 < parallelism < len(items):
            n = parallelism
            k, r = divmod(len(items), n)
            groups, pos = [], 0
            for i in range(n):
                size = k + (1 if i < r else 0)
                groups.append(items[pos:pos + size])
                pos += size
        else:
            groups = [[it] for it in items]

        tasks: list[ReadTask] = []
        for group in groups:
            rows = 0
            rows_known = True
            nbytes = 0
            files: list[str] = []
            for it in group:
                if it["rows"] is None:
                    rows_known = False
                else:
                    rows += it["rows"]
                nbytes += it["bytes"]
                files.extend(it["files"])
            meta = BlockMetadata(
                num_rows=rows if rows_known else None,
                size_bytes=nbytes or None, exec_stats=None,
                input_files=files)
            work = [(it["dirname"], it["whitelist"], it["paths"])
                    for it in group]

            if lookup_keys is not None:
                def read_fn(work=work) -> Iterable[pa.Table]:
                    import pyarrow.compute as pc

                    from . import manifest as mf
                    from .pipeline import _lookup_partition_dir
                    from .zones import ZONES_DIRNAME, bloom_hashes
                    url_col = mf.load_config(out_dir)["url_col"]
                    vals = pa.array([str(v) for v in lookup_keys],
                                    type=pa.string())
                    hashes = bloom_hashes(vals)
                    wcols = columns
                    if wcols is not None and url_col not in wcols:
                        wcols = [url_col, *wcols]
                    empty = True
                    for dirname, _, _ in work:
                        zdir = os.path.join(out_dir, ZONES_DIRNAME,
                                            dirname)
                        t = _lookup_partition_dir(
                            os.path.join(pages_root, dirname), zdir,
                            url_col, hashes, wcols)
                        if t is None or not t.num_rows:
                            continue
                        t = t.filter(pc.is_in(t[url_col], value_set=vals))
                        if columns is not None:
                            t = t.select([c for c in columns
                                          if c in t.schema.names])
                        if t.num_rows:
                            empty = False
                            yield t
                    if empty:
                        yield pa.table({})
            else:
                def read_fn(work=work) -> Iterable[pa.Table]:
                    empty = True
                    for dirname, wl, paths in work:
                        for piece in _decode_stream_filtered(
                                pages_root, dirname, want, columns,
                                ranges, wl, paths):
                            empty = False
                            yield piece
                    if empty:
                        yield pa.table({})

            tasks.append(ReadTask(read_fn, meta))
        return tasks


def read_raystack(out_dir: str, *, columns: Optional[list[str]] = None,
                  where: Optional[dict] = None,
                  snapshot: Optional[int] = None,
                  keys: Optional[list] = None,
                  parallelism: int = -1, **read_args):
    """Read an encoded raystack layout as a composable ``ray.data``
    Dataset, with projection (``columns=``), zone-pruned predicates
    (``where=``), time travel (``snapshot=``) and bloom point lookups
    (``keys=``) pushed down into the read tasks. Row-identical to
    :func:`raystack.pipeline.scan` with the same arguments; prefer this
    entry point when the decode feeds further Ray Data stages."""
    import ray.data
    return ray.data.read_datasource(
        RaystackDatasource(out_dir, columns=columns, where=where,
                           snapshot=snapshot, keys=keys),
        parallelism=parallelism, **read_args)
