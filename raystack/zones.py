"""Zone maps over the encoded pages layout: per-page min/max sidecars +
an exactly-filtered decode that skips whole partitions and pages before
any decode work.

The classic columnar-engine pattern (zone maps / small materialized
aggregates, Moerkotte VLDB'98; Parquet row-group statistics are the same
idea): at build time each page's min/max per column is recorded in a
sidecar tree ``<out_dir>/zones/part_key=K/<col>.parquet``; at query time
a range predicate prunes first partitions whose pages all fall outside
the range, then individual pages inside surviving partitions — the
pruned pages' bytes are never read past metadata, never decoded. The
final exact filter on the decoded values makes the result independent of
pruning (zone maps only save work, never change answers).

Build is one Ray task per partition directory (the same fan-out shape as
``decode_dir``), so at 100 TB it parallelizes per partition and can be
re-run for new columns without touching the pages. Page-level pruning is
only sound when every requested column shares the same page row
boundaries; the builder records that per partition (``uniform`` in
``meta.json``) and the planner falls back to partition-level pruning for
mixed layouts (the precoded heavy-column path).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .codecs import EncodedChunk, get_codec

ZONES_DIRNAME = "zones"

# ---------------------------------------------------------------------------
# per-page bloom filters (equality / point-lookup pruning)
#
# min/max zones prune RANGE predicates; for point lookups on high-
# cardinality string columns (url) min/max is near-useless once pages
# aren't sorted on the column. A small per-page bloom filter (the
# split-block/bloom row-group filter idea from Parquet, stored here as an
# extra `bloom` binary column in the same sidecar parquet) lets
# `lookup_rows` skip every page that provably lacks all queried keys —
# a false positive only decodes one extra page; false negatives are
# impossible because build and probe share the exact `_key_hashes`
# canonicalization the bloom join uses.
# ---------------------------------------------------------------------------

_BLOOM_BITS_PER_VALUE = 10
_BLOOM_N_HASHES = 4


def zorder_indices(t: pa.Table, cols: list[str]) -> np.ndarray:
    """Morton/Z-order clustering permutation over ``cols``. Each column's
    values are reduced to their partition-local RANK (``pc.sort_indices``
    order — type-generic, nulls last), ranks are scaled to a shared bit
    budget and bit-interleaved; sorting rows by the interleaved key gives
    EVERY listed column locally narrow value ranges per page, so zone
    maps prune range predicates on any of them (a single-column
    ``sort_by`` only tightens the first column's zones and leaves the
    others as wide as a shuffle). Rank-based, so no value-distribution
    assumptions; ties keep input order (stable)."""
    n = t.num_rows
    k = len(cols)
    if n == 0 or k == 0:
        return np.empty(0, dtype=np.int64)
    if k == 1:
        arr = t[cols[0]]
        return pc.sort_indices(
            arr.combine_chunks() if isinstance(arr, pa.ChunkedArray)
            else arr).to_numpy().astype(np.int64)
    bits = min(63 // k, max(1, int(n).bit_length()))
    top = np.uint64((1 << bits) - 1)
    key = np.zeros(n, dtype=np.uint64)
    for j, c in enumerate(cols):
        arr = t[c]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) \
            else arr
        order = pc.sort_indices(arr).to_numpy().astype(np.int64)
        rank = np.empty(n, dtype=np.uint64)
        rank[order] = np.arange(n, dtype=np.uint64)
        scaled = rank * top // np.uint64(max(n - 1, 1))
        for b in range(bits):
            key |= ((scaled >> np.uint64(b)) & np.uint64(1)) \
                << np.uint64(b * k + j)
    return np.argsort(key, kind="stable").astype(np.int64)


def _bloom_seeds() -> np.ndarray:
    from .ops.hashing import splitmix64
    return splitmix64(np.arange(1, _BLOOM_N_HASHES + 1, dtype=np.uint64))


def bloom_hashes(arr) -> np.ndarray:
    """uint64 key hashes with the SAME canonicalization on both the build
    and the probe side (pandas fixed-key siphash via the join module)."""
    from .ops.join import _key_hashes
    return _key_hashes(arr)


def _page_bloom(arr) -> bytes:
    """Bloom bitmap (little-endian uint64 words, power-of-two bit count)
    over one page's values. An empty page yields an all-zero minimal
    bitmap — every probe misses, the page prunes."""
    from .ops.hashing import splitmix64
    h = np.unique(bloom_hashes(arr))
    n = max(1, len(h))
    m_bits = 1 << int(np.ceil(np.log2(max(64, n * _BLOOM_BITS_PER_VALUE))))
    bloom = np.zeros(m_bits // 64, dtype=np.uint64)
    mask = np.uint64(m_bits - 1)
    for s in _bloom_seeds():
        idx = splitmix64(h ^ s) & mask
        w = (idx >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (idx & np.uint64(63))
        order = np.argsort(w, kind="stable")
        w, bit = w[order], bit[order]
        uw, starts = np.unique(w, return_index=True)
        bloom[uw] |= np.bitwise_or.reduceat(bit, starts)
    return bloom.astype("<u8").tobytes()


def _bloom_maybe_any(bloom_bytes, hashes: np.ndarray) -> bool:
    """True iff the page MIGHT contain at least one of the hashed keys."""
    from .ops.hashing import splitmix64
    if bloom_bytes is None or len(bloom_bytes) == 0:
        return True  # no bloom recorded for this page: cannot prune
    bloom = np.frombuffer(bloom_bytes, dtype="<u8")
    mask = np.uint64(len(bloom) * 64 - 1)
    hit = np.ones(len(hashes), dtype=bool)
    for s in _bloom_seeds():
        idx = splitmix64(hashes ^ s) & mask
        hit &= ((bloom[(idx >> np.uint64(6)).astype(np.int64)]
                 >> (idx & np.uint64(63))) & np.uint64(1)) > 0
        if not hit.any():
            return False
    return True


def bloom_prune_key_pages(zones_dir: str, col: str,
                          hashes: np.ndarray) \
        -> list[tuple[int, int, bool]] | None:
    """Probe one partition's per-page blooms for ``col``: returns
    ``[(page_idx, nrows, might_match), ...]`` sorted by page_idx, or
    ``None`` when pruning is unavailable (no sidecar / no bloom column).
    The caller maps surviving pages to ROW RANGES via the nrows cumsum
    (the column's pages concatenate in page_idx order), so pruning stays
    sound even on layouts whose other columns use different page
    boundaries — but MUST first verify the sidecar's (page_idx, nrows)
    exactly match the pages actually on disk (a stale or partial sidecar
    would otherwise drop matching rows). Runs inside the decode task so
    the sidecar read stays local to the partition's node."""
    import pyarrow.parquet as pq

    zf = os.path.join(zones_dir, f"{col}.parquet")
    if not os.path.exists(zf):
        return None
    z = pq.read_table(zf)
    if "bloom" not in z.schema.names:
        return None
    out = [(int(p), int(n), _bloom_maybe_any(b.as_py(), hashes))
           for p, n, b in zip(z["page_idx"].to_pylist(),
                              z["nrows"].to_pylist(), z["bloom"])]
    out.sort()
    return out


def _page_min_max(arr) -> tuple:
    """Per-page (min, max) sidecar stats. Floats route through numpy
    with NaN masked out: Arrow's ``min_max`` mishandles some NaN
    payloads (a page ``[0.0, sNaN]`` can read ``(inf, -inf)``, which
    would fabricate a DISJOINT proof and silently drop matching rows)
    and skips quiet NaN anyway — so float stats, by declared semantics,
    bound the page's non-NaN values (sound for disjoint proofs: a NaN
    row never matches any predicate; containment is separately disabled
    for floats in :func:`_page_classify`). A float page whose valid
    values are all NaN gets null stats → unknown → the planner keeps
    the page."""
    if pa.types.is_floating(arr.type):
        v = arr.drop_null()
        if len(v) == 0:
            return None, None
        x = np.asarray(v, dtype=np.float64)
        x = x[~np.isnan(x)]
        if x.size == 0:
            return None, None
        return float(np.min(x)), float(np.max(x))
    mm = pc.min_max(arr)
    return mm["min"].as_py(), mm["max"].as_py()


class _PageSums:
    """Per-page exact SUM accumulator for a sidecar column: numeric
    columns get a ``zsum`` sidecar column (``pc.sum`` semantics — nulls
    skipped, all-null page → null), non-summable types silently get
    none. ``sum_where`` reads ``zsum`` for contained pages the way
    ``count_where`` reads ``nrows``."""

    def __init__(self):
        self.vals: list = []
        self.ok = True

    def add(self, arr) -> None:
        if not self.ok:
            return
        try:
            self.vals.append(pc.sum(arr).as_py())
        except (pa.ArrowNotImplementedError, pa.ArrowInvalid,
                pa.ArrowTypeError):
            self.ok = False

    def column(self):
        if not self.ok:
            return None
        try:
            return pa.array(self.vals)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            return None


def _part_dirs(out_dir: str) -> list[str]:
    pages_root = os.path.join(out_dir, "pages")
    return sorted(d for d in os.listdir(pages_root)
                  if d.startswith("part_key="))


def _build_zone_partition(pages_dir: str, zones_dir: str,
                          columns: list[str],
                          bloom_columns: list[str] | None = None) -> dict:
    """Pure per-partition zone build: decode each wanted column's pages,
    write ``<col>.parquet`` (page_idx, nrows, zmin, zmax) + ``meta.json``
    with the layout-uniformity flag. ``bloom_columns`` additionally get a
    per-page ``bloom`` bitmap (point-lookup pruning); page boundaries come
    from the pages actually on disk, so this path is valid for ANY layout
    state (post-append, post-compact). Runs inside one Ray task."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    bloom_cols = set(bloom_columns or [])
    columns = list(dict.fromkeys([*columns, *sorted(bloom_cols)]))
    meta_t = pads.dataset(pages_dir).to_table(
        columns=["page_idx", "column", "nrows"])
    # layout uniformity across ALL stored columns: page pruning drops the
    # same rows from every column only if boundaries agree
    by_col: dict[str, list[tuple[int, int]]] = {}
    names = meta_t["column"].to_pylist()
    idxs = np.asarray(meta_t["page_idx"])
    nrows = np.asarray(meta_t["nrows"])
    for i, name in enumerate(names):
        by_col.setdefault(name, []).append((int(idxs[i]), int(nrows[i])))
    layouts = {tuple(sorted(v)) for v in by_col.values()}
    uniform = len(layouts) == 1

    data_t = pads.dataset(pages_dir).to_table(
        columns=["page_idx", "column", "data"],
        filter=pc.field("column").isin(list(columns)))
    os.makedirs(zones_dir, exist_ok=True)
    written = []
    for col in columns:
        sel = data_t.filter(pc.equal(data_t["column"], col))
        pages = sorted((int(p), i) for i, p in enumerate(
            np.asarray(sel["page_idx"])))
        rows = {"page_idx": [], "nrows": [], "nnull": [],
                "zmin": [], "zmax": []}
        blooms = [] if col in bloom_cols else None
        sums = _PageSums()
        ztype = None
        for p, i in pages:
            chunk = EncodedChunk.from_bytes(sel["data"][i].as_py())
            arr = get_codec(chunk.codec).decode(chunk)
            ztype = arr.type
            zlo, zhi = _page_min_max(arr)  # null/NaN-safe (see helper)
            rows["page_idx"].append(p)
            rows["nrows"].append(len(arr))
            rows["nnull"].append(arr.null_count)
            rows["zmin"].append(zlo)
            rows["zmax"].append(zhi)
            sums.add(arr)
            if blooms is not None:
                blooms.append(_page_bloom(arr))
        if ztype is None:
            continue
        cols = {"page_idx": pa.array(rows["page_idx"], pa.int64()),
                "nrows": pa.array(rows["nrows"], pa.int64()),
                "nnull": pa.array(rows["nnull"], pa.int64()),
                "zmin": pa.array(rows["zmin"], type=ztype),
                "zmax": pa.array(rows["zmax"], type=ztype)}
        zs = sums.column()
        if zs is not None:
            cols["zsum"] = zs
        if blooms is not None:
            cols["bloom"] = pa.array(blooms, pa.binary())
        t = pa.table(cols)
        pq.write_table(t, os.path.join(zones_dir, f"{col}.parquet"))
        written.append(col)
    with open(os.path.join(zones_dir, "meta.json"), "w") as f:
        json.dump({"uniform": uniform, "columns": written}, f)
    return {"dir": os.path.basename(pages_dir), "uniform": uniform,
            "columns": written}


def invalidate_zone_sidecar(out_dir: str, part_key: int) -> None:
    """Remove a partition's zone sidecar (called by the encode paths
    before rewriting that partition's pages — stale min/max would make
    pruning drop matching rows)."""
    import shutil
    shutil.rmtree(os.path.join(out_dir, ZONES_DIRNAME,
                               f"part_key={int(part_key)}"),
                  ignore_errors=True)


def zone_sidecar_from_table(zones_dir: str, table: pa.Table,
                            columns: list[str], page_rows: int,
                            uniform: bool = True,
                            bloom_columns: list[str] | None = None
                            ) -> list[str]:
    """Write one partition's zone sidecar from the partition table the
    encoder already holds in memory — zone maps for free at encode time
    (no decode pass; page boundaries = the encoder's ``page_rows``
    slicing, page_idx from 0). Columns whose type has no min/max kernel
    (lists, structs) are skipped. ``uniform=False`` (e.g. precoded heavy
    columns with their own page numbering) restricts the planner to
    partition-level pruning. Columns in ``bloom_columns`` additionally
    get a per-page ``bloom`` bitmap for point-lookup pruning
    (:func:`bloom_prune_key_pages`); they are written even when absent
    from ``columns``. ONLY valid for a partition whose page numbering
    starts at 0 (fresh part-0 writes — the append path invalidates the
    sidecar and defers to :func:`build_zone_maps`)."""
    import pyarrow.parquet as pq

    os.makedirs(zones_dir, exist_ok=True)
    written = []
    bloom_cols = set(bloom_columns or [])
    n = table.num_rows
    for col in list(dict.fromkeys([*columns, *sorted(bloom_cols)])):
        if col not in table.schema.names:
            continue
        arr = table[col]
        rows = {"page_idx": [], "nrows": [], "nnull": [],
                "zmin": [], "zmax": []}
        blooms = [] if col in bloom_cols else None
        sums = _PageSums()
        try:
            for pidx, lo in enumerate(range(0, max(n, 1), page_rows)):
                sl = arr.slice(lo, page_rows)
                zlo, zhi = _page_min_max(sl)
                rows["page_idx"].append(pidx)
                rows["nrows"].append(len(sl))
                rows["nnull"].append(sl.null_count)
                rows["zmin"].append(zlo)
                rows["zmax"].append(zhi)
                sums.add(sl)
                if blooms is not None:
                    blooms.append(_page_bloom(sl))
        except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
            continue
        cols = {"page_idx": pa.array(rows["page_idx"], pa.int64()),
                "nrows": pa.array(rows["nrows"], pa.int64()),
                "nnull": pa.array(rows["nnull"], pa.int64()),
                "zmin": pa.array(rows["zmin"], type=arr.type),
                "zmax": pa.array(rows["zmax"], type=arr.type)}
        zs = sums.column()
        if zs is not None:
            cols["zsum"] = zs
        if blooms is not None:
            cols["bloom"] = pa.array(blooms, pa.binary())
        t = pa.table(cols)
        pq.write_table(t, os.path.join(zones_dir, f"{col}.parquet"))
        written.append(col)
    with open(os.path.join(zones_dir, "meta.json"), "w") as f:
        json.dump({"uniform": uniform, "columns": written}, f)
    return written


def zone_sidecar_from_pages(zones_dir: str, col: str,
                            pages: list[tuple[int, pa.Array]],
                            bloom: bool = True) -> None:
    """Write/extend one partition's sidecar with a column whose pages are
    ALREADY decoded — ``pages`` is [(page_idx, values), ...] in row order.
    Used for map-side precoded (heavy) key columns whose page boundaries
    differ from the light table's: the sidecar records the column's OWN
    page numbering, which point lookups map to row ranges
    (:func:`bloom_prune_key_pages`). Merges the column into an existing
    ``meta.json`` (or creates one with ``uniform=False`` — page-level
    RANGE pruning across columns stays off, point lookups don't need
    it)."""
    import pyarrow.parquet as pq

    os.makedirs(zones_dir, exist_ok=True)
    rows = {"page_idx": [], "nrows": [], "nnull": [],
            "zmin": [], "zmax": []}
    blooms = [] if bloom else None
    sums = _PageSums()
    ztype = None
    for p, arr in sorted(pages, key=lambda x: x[0]):
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        ztype = arr.type
        zlo, zhi = _page_min_max(arr)
        rows["page_idx"].append(int(p))
        rows["nrows"].append(len(arr))
        rows["nnull"].append(arr.null_count)
        rows["zmin"].append(zlo)
        rows["zmax"].append(zhi)
        sums.add(arr)
        if blooms is not None:
            blooms.append(_page_bloom(arr))
    if ztype is None:
        return
    cols = {"page_idx": pa.array(rows["page_idx"], pa.int64()),
            "nrows": pa.array(rows["nrows"], pa.int64()),
            "nnull": pa.array(rows["nnull"], pa.int64()),
            "zmin": pa.array(rows["zmin"], type=ztype),
            "zmax": pa.array(rows["zmax"], type=ztype)}
    zs = sums.column()
    if zs is not None:
        cols["zsum"] = zs
    if blooms is not None:
        cols["bloom"] = pa.array(blooms, pa.binary())
    pq.write_table(pa.table(cols), os.path.join(zones_dir, f"{col}.parquet"))
    meta_p = os.path.join(zones_dir, "meta.json")
    meta = {"uniform": False, "columns": []}
    if os.path.exists(meta_p):
        with open(meta_p) as f:
            meta = json.load(f)
    if col not in meta["columns"]:
        meta["columns"].append(col)
    with open(meta_p, "w") as f:
        json.dump(meta, f)


def build_zone_maps(out_dir: str, columns: list[str],
                    bloom_columns: list[str] | None = None) -> list[dict]:
    """Build min/max zone maps for ``columns`` over every partition of an
    encoded layout — one Ray task per ``part_key=`` dir (same fan-out as
    ``decode_dir``); re-runnable and additive (new columns extend the
    sidecar tree, pages are never touched). ``bloom_columns`` also get
    per-page bloom bitmaps (point-lookup pruning)."""
    import ray

    dirs = _part_dirs(out_dir)
    pages_root = os.path.join(out_dir, "pages")
    zones_root = os.path.join(out_dir, ZONES_DIRNAME)

    @ray.remote
    def one(d: str) -> dict:
        return _build_zone_partition(os.path.join(pages_root, d),
                                     os.path.join(zones_root, d),
                                     columns, bloom_columns)

    return ray.get([one.remote(d) for d in dirs])


def _pred(spec) -> tuple:
    """Normalize one predicate spec. A 2-tuple/list ``(lo, hi)`` is a
    closed RANGE (either side None = unbounded) → ``("range", lo, hi)``.
    ``{"in": [...]}`` or a set is MEMBERSHIP (SQL ``IN``: null never
    matches; an empty list matches nothing) → ``("in", values)``. A
     2-element list is always a range — pass ``{"in": [a, b]}`` for a
    two-value membership test."""
    if isinstance(spec, dict):
        if set(spec) != {"in"}:
            raise ValueError(f"predicate dict must be "
                             f"{{'in': [...]}}, got {sorted(spec)}")
        vals = list(dict.fromkeys(spec["in"]))
        if any(isinstance(v, float) and v != v for v in vals):
            # IEEE equality: NaN equals nothing — a NaN predicate value
            # could never match and silently returning nothing would
            # read as "no such rows"; refuse loudly instead
            raise ValueError("NaN is not a valid membership value "
                             "(float membership is IEEE equality)")
        return ("in", vals)
    if isinstance(spec, (set, frozenset)):
        return ("in", sorted(spec))
    if isinstance(spec, (tuple, list)) and len(spec) == 2:
        return ("range", spec[0], spec[1])
    raise ValueError(f"predicate must be (lo, hi) or {{'in': [...]}}, "
                     f"got {spec!r}")


def predicate_mask(t: pa.Table, ranges: dict):
    """Exact boolean mask for the conjunction of every column predicate
    (see :func:`_pred`), null-filled to False — the single definition of
    predicate semantics shared by the filtered decode, count and
    aggregate pushdown paths."""
    mask = pa.array([True] * t.num_rows)
    for col, spec in ranges.items():
        kind, *args = _pred(spec)
        if kind == "range":
            lo, hi = args
            if lo is not None:
                mask = pc.and_kleene(mask, pc.greater_equal(t[col], lo))
            if hi is not None:
                mask = pc.and_kleene(mask, pc.less_equal(t[col], hi))
        elif pa.types.is_floating(t[col].type):
            # SQL/IEEE equality, not Arrow's bitwise is_in: -0.0 matches
            # 0.0 (is_in hashes bit patterns and would miss it); NaN
            # data matches nothing (pc.equal(NaN, v) is False)
            m = pa.array([False] * t.num_rows)
            for v in args[0]:
                m = pc.or_kleene(m, pc.equal(t[col], v))
            mask = pc.and_kleene(mask, m)
        else:
            vals = pa.array(args[0]) if args[0] else \
                pa.array([], type=t[col].type)
            mask = pc.and_kleene(mask, pc.is_in(t[col], value_set=vals))
    return pc.fill_null(mask, False)


def _overlap_pages(zones_dir: str,
                   ranges: dict) -> list[set[int]] | None:
    """Per-PREDICATE-COLUMN sets of page indexes that may satisfy that
    column's range, or None when the partition lacks a zone file for
    some predicate column (must keep everything). Kept per column —
    intersecting across columns is only sound when every column shares
    the same page boundaries (the caller checks the ``uniform`` flag),
    but a single column's EMPTY set proves the whole partition has no
    matching row under ANY layout."""
    import pyarrow.parquet as pq

    sets: list[set[int]] = []
    for col, spec in ranges.items():
        zf = os.path.join(zones_dir, f"{col}.parquet")
        if not os.path.exists(zf):
            return None
        kind, *args = _pred(spec)
        # driver-side planning reads ONLY the stats it needs — bloom
        # bitmaps (KBs/page) stay on disk unless a membership predicate
        # actually probes them
        want_cols = ["page_idx", "zmin", "zmax"]
        if kind == "in" and args[0] and \
                "bloom" in pq.read_schema(zf).names:
            want_cols.append("bloom")
        z = pq.read_table(zf, columns=want_cols)
        zmin, zmax = z["zmin"], z["zmax"]
        if kind == "range":
            lo, hi = args
            ok = pa.array([True] * z.num_rows)
            if hi is not None:
                ok = pc.and_kleene(ok, pc.less_equal(zmin, hi))
            if lo is not None:
                ok = pc.and_kleene(ok, pc.greater_equal(zmax, lo))
        else:  # membership: a page may match iff ANY value falls in it
            ok = pa.array([False] * z.num_rows)
            for v in args[0]:
                ok = pc.or_kleene(ok, pc.and_kleene(
                    pc.less_equal(zmin, v), pc.greater_equal(zmax, v)))
        # all-null pages have null zmin/zmax → unknown → keep; impossible
        # stats (min > max — e.g. a pre-fix sidecar whose float page was
        # poisoned by Arrow's NaN min_max bug to (inf, -inf)) are also
        # unknown — never prune on stats that can't be real
        ok = pc.or_kleene(ok, pc.greater(zmin, zmax))
        ok = pc.fill_null(ok, True)
        keep = np.asarray(ok)
        if kind == "in" and args[0] and "bloom" in z.schema.names \
                and not pa.types.is_floating(zmin.type):
            # high-cardinality columns (url): min/max spans are useless
            # on unsorted pages, but the per-page bloom proves absence
            # exactly like the point-lookup path — same key-hash
            # canonicalization, so false negatives are impossible and a
            # false positive only keeps an extra page. Floats excluded:
            # the bloom hashes bit patterns, IEEE equality doesn't
            hashes = bloom_hashes(pa.array(args[0]))
            keep = keep & np.array(
                [_bloom_maybe_any(b.as_py(), hashes) for b in z["bloom"]],
                dtype=bool)
        sets.append(set(np.asarray(z["page_idx"])[keep].tolist()))
    return sets


_PRUNED = "__fully_pruned__"  # _plan_one sentinel: omit from the plan

#: above this partition count the planning fan-outs to Ray tasks — a
#: serial driver loop over thousands of sidecar files would gate every
#: pruned query on driver filesystem latency
PLAN_DRIVER_PARTITIONS = int(os.environ.get(
    "RAYSTACK_PLAN_DRIVER_PARTITIONS", "256"))


def _plan_one(zones_root: str, d: str, ranges: dict):
    """Pruning verdict for ONE partition: a sorted page whitelist, None
    (decode all pages), or the ``_PRUNED`` sentinel (no row can match —
    omit the partition entirely). Pure function: runs on the driver for
    small layouts, inside a Ray task for large ones."""
    zdir = os.path.join(zones_root, d)
    meta_p = os.path.join(zdir, "meta.json")
    if not os.path.exists(meta_p):
        return None
    with open(meta_p) as f:
        meta = json.load(f)
    sets = _overlap_pages(zdir, ranges)
    if sets is None:
        return None
    if any(not s for s in sets):
        # one column proves no row can match — sound for ANY page
        # layout (never intersect across columns before this check:
        # with mixed boundaries, per-column page ids are unrelated
        # and an empty INTERSECTION would drop matching rows)
        return _PRUNED
    if not meta.get("uniform", False):
        return None  # mixed boundaries: partition-level only
    inter = set.intersection(*sets) if sets else set()
    if not inter:
        return _PRUNED  # uniform boundaries: intersection is sound
    return sorted(inter)


def zone_prune_plan(out_dir: str, ranges: dict) -> dict:
    """Pruning plan from the zone sidecars (metadata only — no page
    bytes touched): ``{part_dir: sorted page list | None}``.
    ``None`` = decode all pages of that partition (no zones, or mixed
    page boundaries where page pruning is unsound); fully pruned
    partitions are omitted. ``ranges`` maps column → predicate: a
    ``(lo, hi)`` closed range (either side None for unbounded) or
    ``{"in": [...]}`` membership (see :func:`_pred`). Layouts up to
    ``PLAN_DRIVER_PARTITIONS`` partitions plan on the driver; above
    that, planning fans out as Ray tasks (a chunk of partitions per
    task) so a 4096-partition layout isn't gated on thousands of
    serial driver file reads — identical plans either way."""
    zones_root = os.path.join(out_dir, ZONES_DIRNAME)
    dirs = _part_dirs(out_dir)
    if len(dirs) <= PLAN_DRIVER_PARTITIONS:
        verdicts = [_plan_one(zones_root, d, ranges) for d in dirs]
    else:
        import ray
        chunk = max(16, len(dirs) // 128)

        @ray.remote(num_cpus=1)
        def plan_chunk(ds: list[str]) -> list:
            return [_plan_one(zones_root, d, ranges) for d in ds]

        refs = [plan_chunk.remote(dirs[i:i + chunk])
                for i in range(0, len(dirs), chunk)]
        verdicts = [v for vs in ray.get(refs) for v in vs]
    return {d: v for d, v in zip(dirs, verdicts)
            if not (isinstance(v, str) and v == _PRUNED)}


def decode_dir_where(out_dir: str, ranges: dict,
                     columns: list[str] | None = None):
    """Exactly-filtered decode over an encoded layout: zone maps prune
    partitions and pages first (their bytes are never decoded), then the
    surviving rows get the exact filter — the result always equals
    ``decode_dir(out_dir, columns)`` + filter, zones or not. One Ray task
    per surviving partition, same scale shape as ``decode_dir``.
    ``ranges`` maps column → ``(lo, hi)`` closed range or
    ``{"in": [...]}`` membership (SQL ``IN`` — null never matches);
    membership prunes pages whose [zmin, zmax] contains no listed value,
    which goes page-exact after clustering a low-cardinality column."""
    import ray.data

    from .pipeline import _decode_partition_dir

    plan = zone_prune_plan(out_dir, ranges)
    pages_root = os.path.join(out_dir, "pages")
    want = columns
    if want is not None:
        missing = [c for c in ranges if c not in want]
        want = [*want, *missing]  # predicate columns needed for the filter

    def exact_filter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        out = t.filter(predicate_mask(t, ranges))
        if columns is not None:
            out = out.select([c for c in columns if c in out.schema.names])
        return out

    if not plan:
        return ray.data.from_items([]).map_batches(
            lambda t: t, batch_format="pyarrow")

    items = [{"dir": d, "pages": json.dumps(p) if p is not None else ""}
             for d, p in plan.items()]

    def decode_one(batch: dict):
        # page-group streaming (see pipeline._decode_partition_stream):
        # surviving pages decode and filter one bounded block at a time
        from .pipeline import _decode_partition_stream
        empty = True
        for d, pj in zip(batch["dir"], batch["pages"]):
            wl = json.loads(pj) if pj else None
            for piece in _decode_partition_stream(
                    os.path.join(pages_root, str(d)), want,
                    page_whitelist=wl):
                if piece.num_rows:
                    out = exact_filter(piece)
                    if out.num_rows:
                        empty = False
                        yield out
        if empty:
            yield pa.table({})

    return ray.data.from_items(items) \
        .map_batches(decode_one, batch_size=1, batch_format="numpy")


def _page_classify(z: pa.Table, spec) -> tuple[np.ndarray, np.ndarray]:
    """Per-page (disjoint, contained) proof arrays for ONE predicate
    column from its zone rows: disjoint = no row of the page can match,
    contained = EVERY row matches (requires zero nulls and non-null
    stats). For membership predicates disjointness holds when no value
    falls inside [zmin, zmax]; containment is only provable for CONSTANT
    pages (zmin == zmax) whose single value is in the set — common after
    clustering a low-cardinality column. Shared by the COUNT and
    aggregate pushdown paths."""
    n = z.num_rows
    kind, *args = _pred(spec)
    disjoint = np.zeros(n, dtype=bool)
    contained = np.ones(n, dtype=bool)
    zmin, zmax = z["zmin"], z["zmax"]
    if kind == "range" and args[0] is None and args[1] is None:
        # unconstrained column: the exact filter keeps EVERY row (nulls
        # included), so it must impose nothing here — the null-page
        # shortcuts below would otherwise drop all-null pages and break
        # the decode_dir_where().count() identity
        return disjoint, contained
    has_null = np.asarray(pc.greater(z["nnull"], 0)) \
        if "nnull" in z.schema.names else np.ones(n, dtype=bool)
    stats_null = np.asarray(pc.is_null(zmin))
    if pa.types.is_floating(zmin.type):
        # Arrow's min_max SKIPS NaN (an all-NaN page reads (inf, -inf)),
        # so float stats bound only the non-NaN rows: DISJOINT proofs
        # stay sound (a NaN row never matches any predicate), but
        # CONTAINED would count a page's NaN rows as matches — a page
        # with any NaN must decode as boundary, and the sidecar doesn't
        # record NaN counts, so float pages never prove containment
        contained &= False
    if kind == "range":
        lo, hi = args
        if lo is not None:
            disjoint |= np.asarray(pc.fill_null(pc.less(zmax, lo), False))
            contained &= np.asarray(pc.fill_null(
                pc.greater_equal(zmin, lo), False))
        if hi is not None:
            disjoint |= np.asarray(pc.fill_null(pc.greater(zmin, hi),
                                                False))
            contained &= np.asarray(pc.fill_null(
                pc.less_equal(zmax, hi), False))
    else:
        vals = args[0]
        overlap = pa.array([False] * n)
        for v in vals:
            overlap = pc.or_kleene(overlap, pc.and_kleene(
                pc.less_equal(zmin, v), pc.greater_equal(zmax, v)))
        disjoint |= np.asarray(pc.fill_null(pc.invert(overlap), False))
        if vals:
            if pa.types.is_floating(zmin.type):
                # IEEE equality (see predicate_mask): OR of pc.equal —
                # is_in's bitwise hashing would treat -0.0 != 0.0
                eq = pa.array([False] * n)
                for v in vals:
                    eq = pc.or_kleene(eq, pc.equal(zmin, v))
                const_in = pc.and_kleene(pc.equal(zmin, zmax), eq)
            else:
                const_in = pc.and_kleene(
                    pc.equal(zmin, zmax),
                    pc.is_in(zmin, value_set=pa.array(vals)))
            contained &= np.asarray(pc.fill_null(const_in, False))
            if "bloom" in z.schema.names \
                    and not pa.types.is_floating(zmin.type):
                # bloom absence proof (see _overlap_pages): prunes
                # unsorted high-cardinality pages min/max can't. Floats
                # are excluded — the bloom hashes bit patterns, so a
                # page holding -0.0 would false-negative a 0.0 probe
                hashes = bloom_hashes(pa.array(vals))
                disjoint |= ~np.array(
                    [_bloom_maybe_any(b.as_py(), hashes)
                     for b in z["bloom"]], dtype=bool)
        else:
            contained &= False
    contained &= ~has_null & ~stats_null
    # all-null pages have no value in range: every row fails the filter
    if "nnull" in z.schema.names:
        disjoint |= stats_null & np.asarray(pc.equal(z["nnull"],
                                                     z["nrows"]))
    # impossible stats (min > max — a pre-fix sidecar poisoned by
    # Arrow's NaN min_max bug) prove nothing: boundary-decode the page
    invalid = np.asarray(pc.fill_null(pc.greater(zmin, zmax), False))
    disjoint &= ~invalid
    contained &= ~invalid
    return disjoint, contained


def _count_partition(pages_dir: str, zones_dir: str, ranges: dict) -> int:
    """Exact predicate COUNT for one partition: pages provably disjoint
    from the range cost nothing, pages provably contained (min/max inside
    the bounds, zero nulls) count from metadata alone, and only boundary
    pages get their predicate columns decoded. Pure function run inside
    one Ray task."""
    import pyarrow.parquet as pq

    from .pipeline import _decode_partition_dir

    pred_cols = list(ranges)

    def full_count() -> int:
        t = _decode_partition_dir(pages_dir, pred_cols)
        if t.num_rows == 0:
            return 0
        return int(pc.sum(predicate_mask(t, ranges)).as_py() or 0)

    zts = {}
    for col in pred_cols:
        zf = os.path.join(zones_dir, f"{col}.parquet")
        if not os.path.exists(zf):
            return full_count()
        zts[col] = pq.read_table(zf)
    layouts = {tuple(zip(np.asarray(z["page_idx"]).tolist(),
                         np.asarray(z["nrows"]).tolist()))
               for z in zts.values()}
    if len(layouts) != 1:
        # predicate columns don't share page boundaries — page-level math
        # is unsound, fall back to the partition decode (always aligned)
        return full_count()

    ref = next(iter(zts.values()))
    page_idx = np.asarray(ref["page_idx"])
    nrows = np.asarray(ref["nrows"])
    disjoint = np.zeros(len(page_idx), dtype=bool)
    contained = np.ones(len(page_idx), dtype=bool)
    for col, spec in ranges.items():
        dj, ct = _page_classify(zts[col], spec)
        disjoint |= dj
        contained &= ct
    total = int(nrows[contained & ~disjoint].sum())
    boundary = sorted(page_idx[~contained & ~disjoint].tolist())
    if boundary:
        t = _decode_partition_dir(pages_dir, pred_cols,
                                  page_whitelist=boundary)
        if t.num_rows:
            total += int(pc.sum(predicate_mask(t, ranges)).as_py() or 0)
    return total


def _merge_partial(a: dict, b: dict) -> dict:
    """Merge two SUM/COUNT/MIN/MAX partials (``{"sum","n","min","max"}``;
    None fields mean 'no non-null value seen')."""
    def opt(f, x, y):
        if x is None:
            return y
        if y is None:
            return x
        return f(x, y)
    return {"sum": opt(lambda x, y: x + y, a["sum"], b["sum"]),
            "n": a["n"] + b["n"],
            "min": opt(min, a["min"], b["min"]),
            "max": opt(max, a["max"], b["max"])}


_EMPTY_PARTIAL = {"sum": None, "n": 0, "min": None, "max": None}


def _agg_partition(pages_dir: str, zones_dir: str, value_col: str,
                   ranges: dict) -> dict:
    """Exact predicate SUM/COUNT/MIN/MAX partial of ``value_col`` for one
    partition (SQL semantics — null values skipped, ``n`` counts
    matching non-null values): pages proven contained by every predicate
    range contribute sidecar metadata (``zsum``, ``nrows - nnull``,
    ``zmin``/``zmax``) without decoding, proven-disjoint pages nothing,
    and only boundary pages decode the predicate columns + the value
    column. Numeric value columns only (``pc.sum``). Pure function run
    inside one Ray task."""
    import pyarrow.parquet as pq

    from .pipeline import _decode_partition_dir

    pred_cols = list(ranges)
    want = list(dict.fromkeys([*pred_cols, value_col]))

    def exact_agg(t: pa.Table) -> dict:
        if t.num_rows == 0:
            return dict(_EMPTY_PARTIAL)
        vals = t[value_col].filter(predicate_mask(t, ranges))
        n = len(vals) - vals.null_count
        if n == 0:
            return dict(_EMPTY_PARTIAL)
        # NaN-safe min/max (declared: min/max skip NaN, pandas-like —
        # and Arrow's min_max misreads some NaN payloads entirely, see
        # _page_min_max); sum keeps IEEE propagation (any NaN → NaN),
        # matching the sidecar zsum so both answer paths agree
        zlo, zhi = _page_min_max(
            vals.combine_chunks() if isinstance(vals, pa.ChunkedArray)
            else vals)
        return {"sum": pc.sum(vals).as_py(), "n": n,
                "min": zlo, "max": zhi}

    def full_agg() -> dict:
        return exact_agg(_decode_partition_dir(pages_dir, want))

    zts = {}
    for col in want:
        zf = os.path.join(zones_dir, f"{col}.parquet")
        if not os.path.exists(zf):
            return full_agg()
        zts[col] = pq.read_table(zf)
    if "zsum" not in zts[value_col].schema.names:
        return full_agg()  # pre-zsum sidecar: exact, just not pushed down
    layouts = {tuple(zip(np.asarray(z["page_idx"]).tolist(),
                         np.asarray(z["nrows"]).tolist()))
               for z in zts.values()}
    if len(layouts) != 1:
        # value/predicate columns don't share page boundaries: page-level
        # math is unsound, fall back (always aligned)
        return full_agg()

    ref = zts[value_col]
    page_idx = np.asarray(ref["page_idx"])
    disjoint = np.zeros(len(page_idx), dtype=bool)
    contained = np.ones(len(page_idx), dtype=bool)
    for col, spec in ranges.items():
        dj, ct = _page_classify(zts[col], spec)
        disjoint |= dj
        contained &= ct
    out = dict(_EMPTY_PARTIAL)
    take = contained & ~disjoint
    if take.any():
        tk = pa.array(take)
        zn = int(pc.sum(pc.subtract(
            ref["nrows"], ref["nnull"]).filter(tk)).as_py() or 0)
        if zn:
            mn = pc.min_max(ref["zmin"].filter(tk))["min"].as_py()
            mx = pc.min_max(ref["zmax"].filter(tk))["max"].as_py()
            zs = None if pa.types.is_null(ref["zsum"].type) \
                else pc.sum(ref["zsum"].filter(tk)).as_py()
            out = _merge_partial(out, {"sum": zs, "n": zn,
                                       "min": mn, "max": mx})
    boundary = sorted(page_idx[~contained & ~disjoint].tolist())
    if boundary:
        out = _merge_partial(out, exact_agg(_decode_partition_dir(
            pages_dir, want, page_whitelist=boundary)))
    return out


def agg_where(out_dir: str, value_col: str, ranges: dict) -> dict:
    """Exact SUM / COUNT(value) / MIN / MAX / AVG of ``value_col`` over
    rows matching every column predicate (range or {'in': [...]}
    membership), accelerated by zone maps: one
    Ray task per partition; pages proven contained answer from sidecar
    metadata alone (``zsum``, ``nrows - nnull``, ``zmin``/``zmax``),
    proven-disjoint pages cost nothing, only boundary pages decode.
    Identical to aggregating ``decode_dir_where(...)`` — without zones
    (or with pre-``zsum`` sidecars) it degrades to a pruned decode,
    never a wrong answer. None fields = no non-null value matched (SQL
    aggregates of the empty set); ``count`` counts matching NON-NULL
    values (SQL ``COUNT(col)``, not ``COUNT(*)`` — that's
    :func:`count_where`)."""
    import functools

    import ray

    pages_root = os.path.join(out_dir, "pages")
    zones_root = os.path.join(out_dir, ZONES_DIRNAME)
    one = ray.remote(num_cpus=1)(_agg_partition)
    p = functools.reduce(_merge_partial, ray.get(
        [one.remote(os.path.join(pages_root, d),
                    os.path.join(zones_root, d), value_col, ranges)
         for d in _part_dirs(out_dir)]), dict(_EMPTY_PARTIAL))
    return {"sum": p["sum"], "count": p["n"], "min": p["min"],
            "max": p["max"],
            "avg": (p["sum"] / p["n"]) if p["n"] else None}


def sum_where(out_dir: str, value_col: str, ranges: dict):
    """Exact SUM of ``value_col`` over rows matching every range
    predicate — see :func:`agg_where` (this is its ``sum`` field)."""
    return agg_where(out_dir, value_col, ranges)["sum"]


def count_where(out_dir: str, ranges: dict) -> int:
    """Exact COUNT of rows matching every column predicate (range or
    {'in': [...]} membership) over an encoded
    layout, accelerated by zone maps: one Ray task per partition; pages
    proven contained count via sidecar metadata (nrows), proven-disjoint
    pages cost nothing, and only boundary pages are decoded (predicate
    columns only). Identical to ``decode_dir_where(...).count()`` —
    without zones it degrades to a pruned decode, never a wrong answer."""
    import ray

    pages_root = os.path.join(out_dir, "pages")
    zones_root = os.path.join(out_dir, ZONES_DIRNAME)
    one = ray.remote(num_cpus=1)(_count_partition)
    refs = [one.remote(os.path.join(pages_root, d),
                       os.path.join(zones_root, d), ranges)
            for d in _part_dirs(out_dir)]
    return int(sum(ray.get(refs)))
