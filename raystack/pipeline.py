"""Ray Data encode / decode pipelines (SURVEY.md §7 steps 4-6).

Two encode shapes, both emitting the same encoded-pages table:

- :func:`encode_batches` — streaming fast path: a stateful actor-pool
  ``map_batches`` stage encodes each Arrow block independently (per-chunk
  codec choice, no shuffle). Page identity is content-derived so retries are
  idempotent.
- :func:`encode_partitioned` — the co-located path: explicit hash
  partitioning on the url host prefix with **salt-based skew splitting** for
  heavy-hitter hosts (driver samples prefix frequencies via a tiny partial-
  count aggregation, seeded/deterministic), then ONE all-to-all
  ``groupby(part_key).map_groups`` that builds dictionaries / FSST symbol
  tables over co-located values and emits pages + a lineage manifest row per
  partition. Resume filters completed partitions out *before* the shuffle.

Pages schema:
  (part_key:int64, page_idx:int64, column:string, codec:string, nrows:int64,
   raw_bytes:int64, enc_bytes:int64, checksum:int64, input_files:string,
   encode_ms:int64, data:large_binary)

Decode (:func:`decode_pages`) groups pages by (part_key, page_idx) and
rebuilds original-schema batches — bit-identical (tests/test_pipeline.py).

Scale notes (100 TB design): pick ``num_partitions`` so a partition ≈
128-512 MB (fits one map_groups task); pages are written partitioned by
``part_key`` so a resumed run skips finished partitions; the only full
shuffle is the one groupby; the hot-key salt split bounds the largest
partition by ~(hot_share/salt) of the input.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import manifest as mf
from .codecs import EncodedChunk, get_codec
from .select import choose_codec

PAGES_SCHEMA = pa.schema([
    ("part_key", pa.int64()),
    ("page_idx", pa.int64()),
    ("column", pa.string()),
    ("codec", pa.string()),
    ("nrows", pa.int64()),
    ("raw_bytes", pa.int64()),
    ("enc_bytes", pa.int64()),
    ("checksum", pa.int64()),
    ("input_files", pa.string()),  # JSON list; lineage (empty when unknown)
    ("encode_ms", pa.int64()),     # wall ms spent encoding this call's pages
    ("data", pa.large_binary()),
])

DEFAULT_PAGE_ROWS = 65536

#: target per-partition Arrow bytes (middle of the 128-512 MB guidance —
#: one map_groups task's working set)
TARGET_PARTITION_BYTES = 256 << 20
#: parquet-on-disk → in-memory Arrow expansion heuristic (measured ~3-4×
#: on the webtext corpus)
_PARQUET_EXPANSION = 4


def auto_partitions(ds=None, source_paths: list[str] | None = None,
                    target_bytes: int = TARGET_PARTITION_BYTES) -> int:
    """Derive ``num_partitions`` so one partition ≈ ``target_bytes`` of
    Arrow data (fits one encode task). Estimation is metadata-only: on-disk
    bytes of the source files × an expansion factor — never executes the
    dataset. Falls back to 32 when no size signal exists. At 100 TB this
    yields ~1.6M partitions of 256 MB instead of 32 partitions of 3 TB."""
    paths = list(source_paths) if source_paths else None
    if not paths and ds is not None:
        try:
            paths = ds.input_files()
        except Exception:
            paths = None
    if paths:
        raw = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
        if raw > 0:
            return max(8, int(np.ceil(raw * _PARQUET_EXPANSION
                                      / target_bytes)))
    return 32


def _cluster(full: pa.Table, sort_by) -> pa.Table:
    """Partition-local clustering before the page cut. ``sort_by`` is a
    column name (plain sort — the named column's zone maps get tight) or
    a LIST of names (Z-order interleave via
    :func:`raystack.zones.zorder_indices` — every listed column's zone
    maps get locally narrow, so range predicates on any of them prune)."""
    if isinstance(sort_by, (list, tuple)):
        from .zones import zorder_indices
        return full.take(pa.array(zorder_indices(full, list(sort_by))))
    return full.sort_by(sort_by)


def _crc(data: bytes) -> int:
    return zlib.crc32(data) & 0xFFFFFFFF


def _ident_crc(val) -> int:
    """Page-identity hash of one value: a bounded 64-byte prefix with the
    full length mixed in — never hashes a multi-MB html payload whole.
    Deterministic across processes (crc32 of bytes only)."""
    if isinstance(val, (bytes, bytearray)):
        b = bytes(val[:64]) + len(val).to_bytes(8, "little")
    elif isinstance(val, str):
        b = val[:64].encode() + len(val).to_bytes(8, "little")
    else:
        b = repr(val).encode()
    return _crc(b)


def _stable_hash_strings(values: list[str]) -> np.ndarray:
    """Deterministic (process-independent) 32-bit hash per string. Python
    loop — only ever used on the small *unique* host list of a batch."""
    return np.array([_crc(v.encode()) for v in values], dtype=np.int64)


def _tail_hash(strs: pa.Array) -> np.ndarray:
    """Vectorized per-row hash from the last ≤8 bytes of each string (urls
    end in a unique "-<rowid>" suffix, so tails distribute well). No per-row
    Python."""
    from .codecs.fsst import _flatten
    data, lengths = _flatten(strs)
    ends = np.cumsum(lengths)
    take = np.minimum(lengths, 8)
    out = np.zeros((len(lengths), 8), dtype=np.uint8)
    # gather last `take` bytes per row
    intra = (np.arange(int(take.sum()))
             - np.repeat(np.concatenate([[0], np.cumsum(take)[:-1]]), take))
    idx = np.repeat(ends - take, take) + intra
    rows = np.repeat(np.arange(len(lengths)), take)
    out[rows, intra] = data[idx]
    h = out.view(np.uint64).ravel().copy()
    # splitmix64 finalizer (public domain constant mixer)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return (h >> np.uint64(1)).astype(np.int64)


def _host_of(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """url -> host prefix, vectorized (one regex kernel). Non-URL values
    (or non-string key columns) fall back to the whole value, so generic
    tables hash-partition on the column itself."""
    if not (pa.types.is_string(urls.type) or pa.types.is_large_string(urls.type)):
        urls = pc.cast(urls, pa.string())
    ex = pc.extract_regex(urls, r"^[a-z]+://(?P<h>[^/]+)")
    host = pc.struct_field(ex, "h")
    return pc.fill_null(pc.coalesce(host, urls), "")


# ---------------------------------------------------------------------------
# skew detection + partition key
# ---------------------------------------------------------------------------

def collect_host_counts(ds, url_col: str = "url",
                        top_k: int = 4096) -> dict[str, int]:
    """Distributed exact host frequency pass (ANALYZE): per-batch partial
    value_counts → one small groupby → the top_k hosts' counts to the
    driver (bounded). Feeds :func:`plan_host_partitions`."""
    import ray.data  # noqa: F401  (ds is already a Dataset)

    def partial_counts(batch: pa.Table) -> pa.Table:
        hosts = _host_of(batch[url_col])
        vc = hosts.value_counts()
        return pa.table({"host": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    parts = ds.map_batches(partial_counts, batch_format="pyarrow")
    totals = parts.groupby("host").sum("n").to_pandas()  # small: #hosts rows
    totals = totals.sort_values("sum(n)", ascending=False).head(top_k)
    return {str(h): int(n) for h, n in zip(totals["host"], totals["sum(n)"])}


def detect_hot_hosts(ds, url_col: str = "url", num_partitions: int = 32,
                     hot_factor: float = 2.0) -> dict[str, int]:
    """Legacy salt-split planner: hosts whose share exceeds
    ``hot_factor / P`` get a salt fan-out proportional to their share.
    Prefer :func:`collect_host_counts` + :func:`plan_host_partitions`
    (balanced explicit assignment) for the encode pipelines."""
    counts = collect_host_counts(ds, url_col)
    total = sum(counts.values())
    if total == 0:
        return {}
    hot = {}
    thresh = hot_factor / num_partitions
    for host, n in counts.items():
        share = n / total
        if share > thresh:
            # fan a hot host out over enough salts to dilute it to ~1/P each
            hot[host] = int(np.ceil(share * num_partitions))
    return hot


#: on-disk parquet bytes below which the ANALYZE host-count pass runs on
#: the driver: a Ray scan+groupby job carries ~1-2 s of fixed plan/
#: schedule cost, which dwarfs a column-pruned pyarrow read at this size
_DRIVER_ANALYZE_MAX_BYTES = 128 << 20


def _host_counts_driver(paths: list[str], url_col: str,
                        top_k: int = 4096) -> dict[str, int]:
    """Driver-side ANALYZE for small parquet inputs — same result as
    :func:`collect_host_counts`, no Ray job. Only the key column's bytes
    are read (column pruning), so the cost is a fraction of the input
    bound."""
    from collections import Counter

    import pyarrow.parquet as _pq
    c: Counter = Counter()
    for p in paths:
        t = _pq.read_table(p, columns=[url_col])
        vc = _host_of(t[url_col]).value_counts()
        for h, n in zip(vc.field("values").to_pylist(),
                        vc.field("counts").to_pylist()):
            c[str(h)] += int(n)
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    return dict(ranked)


def _analyze_small(paths: list[str]) -> bool:
    """True when every path is parquet and the total size fits the
    driver-ANALYZE bound."""
    if not paths or not all(p.endswith((".parquet", ".pq"))
                            for p in paths):
        return False
    try:
        total = sum(os.path.getsize(p) for p in paths)
    except OSError:
        return False
    return total <= _DRIVER_ANALYZE_MAX_BYTES


def plan_host_partitions(host_counts: dict[str, int], num_partitions: int,
                         top_k: int = 4096) -> dict[str, list[int]]:
    """Balanced host→partition assignment from ANALYZE-style exact counts:
    greedy largest-first packing onto the least-loaded partitions, with a
    host whose share exceeds one partition's fair share fanned out over
    enough slots to dilute it (the salt-split, expressed as an explicit
    slot list). Hosts beyond ``top_k`` (the long tail) fall back to
    hash(host) % P inside :func:`compute_part_keys`. This removes the
    binomial lumpiness of pure hashing when distinct hosts ≈ partitions —
    measured max/mean partition load drops from ~2.2 to ~1.05."""
    import heapq
    total = sum(host_counts.values()) or 1
    fair = total / num_partitions
    loads = [(0.0, p) for p in range(num_partitions)]
    heapq.heapify(loads)
    assign: dict[str, list[int]] = {}
    ranked = sorted(host_counts.items(), key=lambda kv: -kv[1])[:top_k]
    for host, n in ranked:
        slots = max(1, int(np.ceil(n / fair)))
        picked = [heapq.heappop(loads) for _ in range(min(slots,
                                                         num_partitions))]
        share = n / len(picked)
        assign[host] = sorted(p for _, p in picked)
        for load, p in picked:
            heapq.heappush(loads, (load + share, p))
    return assign


def compute_part_keys(urls: pa.Array | pa.ChunkedArray, num_partitions: int,
                      hot_hosts: dict[str, int] | None = None,
                      host_map: dict[str, list[int]] | None = None
                      ) -> np.ndarray:
    """Pure keying math, deterministic per value — used by the encode keyer
    AND by point lookups (:func:`lookup_rows`) to route straight to
    partitions. Two modes:

    - ``host_map`` (preferred): explicit balanced assignment from
      :func:`plan_host_partitions`; a host with several slots spreads its
      rows over them via the url tail hash; unknown hosts hash.
    - ``hot_hosts``: legacy hash % P with salt-split fan-out for the
      listed heavy hitters only."""
    hot_hosts = hot_hosts or {}
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    hosts = _host_of(urls)
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    denc = pc.dictionary_encode(hosts)
    uniq = denc.dictionary.to_pylist()
    codes = np.asarray(denc.indices)
    base = _stable_hash_strings(uniq) % num_partitions
    keys = base[codes].copy()
    if host_map is not None:
        sub = None
        for i, h in enumerate(uniq):
            slots = host_map.get(h)
            if not slots:
                continue
            mask = codes == i
            if len(slots) == 1:
                keys[mask] = slots[0]
            else:
                if sub is None:
                    sub = _tail_hash(urls)
                keys[mask] = np.array(slots)[sub[mask] % len(slots)]
        return keys
    hot_idx = [i for i, h in enumerate(uniq) if h in hot_hosts]
    if hot_idx:
        mask = np.isin(codes, hot_idx)
        if mask.any():
            salts = np.array([hot_hosts[uniq[c]] for c in codes[mask]])
            sub = _tail_hash(urls)[mask]
            keys[mask] = (base[codes[mask]] + sub % salts * 7919) % num_partitions
    return keys


def add_partition_key(ds, url_col: str = "url", num_partitions: int = 32,
                      hot_hosts: dict[str, int] | None = None,
                      host_map: dict[str, list[int]] | None = None):
    """Append int64 ``part_key`` per :func:`compute_part_keys` (balanced
    host map or legacy hash+salt — explicit skew handling, SURVEY.md
    §2.10)."""

    def keyer(batch: pa.Table) -> pa.Table:
        keys = compute_part_keys(batch[url_col], num_partitions, hot_hosts,
                                 host_map)
        return batch.append_column("part_key", pa.array(keys, type=pa.int64()))

    return ds.map_batches(keyer, batch_format="pyarrow")


def pack_segments(batch: pa.Table) -> pa.Table:
    """Shuffle compression: slice a keyed batch into per-part_key segments
    and ship each as ONE zstd-compressed Arrow IPC blob. The sort then moves
    ~4× fewer bytes (html/text compress well) and a few rows per block
    instead of every row — the all-to-all stops being memory-bandwidth
    bound. Co-location semantics are unchanged: the group stage decompresses
    and concatenates before building dictionaries."""
    if batch.num_rows == 0:
        return pa.table({"part_key": pa.array([], pa.int64()),
                         "seg": pa.array([], pa.large_binary())})
    keys = np.asarray(batch["part_key"])
    order = np.argsort(keys, kind="stable")
    tbl = batch.take(pa.array(order))
    keys = keys[order]
    bounds = np.concatenate([[0], np.flatnonzero(np.diff(keys)) + 1,
                             [len(keys)]])
    opts = pa.ipc.IpcWriteOptions(compression="zstd")
    out_keys, blobs = [], []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        seg = tbl.slice(int(lo), int(hi - lo)).combine_chunks()
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, seg.schema, options=opts) as w:
            w.write_table(seg)
        out_keys.append(int(keys[lo]))
        blobs.append(sink.getvalue().to_pybytes())
    return pa.table({"part_key": pa.array(out_keys, pa.int64()),
                     "seg": pa.array(blobs, pa.large_binary())})


def make_keyer_pack(url_col: str = "url", num_partitions: int = 32,
                    hot_hosts: dict[str, int] | None = None,
                    host_map: dict[str, list[int]] | None = None):
    """Fused keyer + segment packer for :func:`encode_partitioned`. Pass
    the result as ``read_aligned(post_align=...)`` so it fuses INTO the
    read/align task chain (a map placed after the union can't fuse across
    it, and the full uncompressed table would cross the object store once
    more); then call ``encode_partitioned(ds, ..., columns=[...])`` with
    the SAME num_partitions/hot_hosts/host_map — the pre-packed input is
    detected by its (part_key, seg) schema, and the encode stage verifies
    per partition that the recorded routing config reproduces the keyer's
    part_keys (a mismatched config would make lookup_rows silently miss)."""

    def keyer_pack(batch: pa.Table) -> pa.Table:
        keys = compute_part_keys(batch[url_col], num_partitions, hot_hosts,
                                 host_map)
        keyed = batch.append_column("part_key",
                                    pa.array(keys, type=pa.int64()))
        return pack_segments(keyed)

    return keyer_pack


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------

def _encode_table(table: pa.Table, part_key: int, columns: list[str],
                  page_rows: int, first_page_idx: int = 0,
                  input_files: str = "",
                  codec_cache: dict[str, str] | None = None) -> pa.Table:
    """Encode one co-located table into pages rows (pure, deterministic).
    ``codec_cache`` (column → codec) lets a caller reuse choices across
    partitions/segments (streaming path); default = choose per partition."""
    import time as _time
    t_start = _time.perf_counter()
    rows = {name: [] for name in PAGES_SCHEMA.names}
    n = table.num_rows
    page_idx = first_page_idx
    # choose once per partition per column (or reuse the caller's cache)
    codec_by_col = codec_cache if codec_cache is not None else {}
    for lo in range(0, max(n, 1), page_rows):
        chunk = table.slice(lo, page_rows)
        for col in columns:
            arr = chunk[col].combine_chunks()
            codec_name = codec_by_col.get(col)
            if codec_name is None:
                codec_name = choose_codec(arr, column=col, part_key=part_key)
                codec_by_col[col] = codec_name
            try:
                blob = get_codec(codec_name).encode(arr).to_bytes()
            except Exception:
                # a codec can pass on the sample yet fail on the full chunk
                # (exotic type edge) — plain is the guaranteed floor
                codec_name = "plain"
                codec_by_col[col] = codec_name
                blob = get_codec(codec_name).encode(arr).to_bytes()
            rows["part_key"].append(part_key)
            rows["page_idx"].append(page_idx)
            rows["column"].append(col)
            rows["codec"].append(codec_name)
            rows["nrows"].append(len(arr))
            rows["raw_bytes"].append(arr.nbytes)
            rows["enc_bytes"].append(len(blob))
            rows["checksum"].append(_crc(blob))
            rows["input_files"].append(input_files)
            rows["encode_ms"].append(0)
            rows["data"].append(blob)
        page_idx += 1
    ms = int((_time.perf_counter() - t_start) * 1000)
    # distribute the call's wall ms across its pages: the manifest sums
    # encode_ms over DISTINCT pages, so giving every page the full total
    # over-reported the metric by ~page-count x
    npages = max(1, page_idx - first_page_idx)
    base, rem = divmod(ms, npages)
    rows["encode_ms"] = [base + (1 if (pi - first_page_idx) < rem else 0)
                         for pi in rows["page_idx"]]
    return pa.table(rows, schema=PAGES_SCHEMA)


class BatchEncoder:
    """Actor-pool per-batch encoder (stateless across batches apart from the
    codec registry; actor form amortizes import/registry setup and keeps the
    stage's worker set stable). Page identity derives from content so task
    retries produce identical pages."""

    def __init__(self, columns: list[str] | None = None,
                 page_rows: int = DEFAULT_PAGE_ROWS):
        self.columns = columns
        self.page_rows = page_rows
        self.codec_cache: dict[str, str] = {}  # per-actor, amortizes selection

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({n: [] for n in PAGES_SCHEMA.names},
                            schema=PAGES_SCHEMA)
        cols = self.columns or [c for c in batch.schema.names if c != "part_key"]
        # content-derived pseudo partition key → idempotent retries; the
        # first+last+rows 62-bit scheme (same as SplitEncoder) so two
        # batches sharing a first value and row count can't collide and get
        # silently merged by decode_pages' (part_key, page_idx) grouping
        key_src = batch[cols[0]].combine_chunks()
        h = ((_ident_crc(key_src[0].as_py()) << 31)
             ^ (_ident_crc(key_src[-1].as_py()) << 1)
             ^ batch.num_rows) & ((1 << 62) - 1)
        return _encode_table(batch, int(h), cols, self.page_rows,
                             codec_cache=self.codec_cache)


def encode_batches(ds, columns: list[str] | None = None,
                   page_rows: int = DEFAULT_PAGE_ROWS,
                   batch_size: int = DEFAULT_PAGE_ROWS,
                   concurrency: int | tuple | None = None):
    """Streaming per-batch encode: no shuffle, per-chunk codec choice.
    Actor pool autoscales up to the cluster's CPUs by default."""
    if concurrency is None:
        import ray
        n = int(ray.cluster_resources().get("CPU", 4))
        # leave ≥2 CPUs for the read/write/shuffle stages — an actor pool
        # that reserves every CPU starves them and the pipeline deadlocks
        concurrency = (1, max(2, n - 2))
    return ds.map_batches(BatchEncoder, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs={"columns": columns,
                                                 "page_rows": page_rows})


def encode_partitioned(ds, out_dir: str, columns: list[str] | None = None,
                       url_col: str = "url", num_partitions: int | None = None,
                       page_rows: int = DEFAULT_PAGE_ROWS,
                       resume: bool = False,
                       hot_hosts: dict[str, int] | None = None,
                       source_paths: list[str] | None = None,
                       logger=None, collect_stats: bool = False,
                       pre_packed: bool | None = None,
                       host_map: dict[str, list[int]] | None = None,
                       zone_columns: list[str] | None = None,
                       sort_by: str | list[str] | None = None) -> dict:
    """Full co-located encode: partition → (skip done) → groupby shuffle →
    per-partition encode with lineage → partitioned Parquet + manifest.

    Returns the manifest summary (plus ``stats`` — the per-stage Ray Data
    execution breakdown — when ``collect_stats``). ``resume=True`` skips
    partitions already recorded in ``out_dir``'s manifest (filtered before
    the shuffle). ``logger`` gets ``send_log`` milestone events."""
    from .log import get_logger
    log = get_logger(logger)
    if pre_packed is None:
        # probe only when the caller didn't say: schema() on a fused
        # read→align→pack dataset executes one whole task chain serially
        schema_names = ds.schema().names
        pre_packed = set(schema_names) == {"part_key", "seg"}
    else:
        # explicitly not pre-packed but no columns given: probe the
        # schema (this used to raise a misleading KeyError off [])
        schema_names = columns or list(ds.schema().names)
    if pre_packed:
        if columns is None:
            raise ValueError("encode_partitioned on a pre-packed dataset "
                             "(make_keyer_pack) needs an explicit columns=")
        # the keying already happened inside make_keyer_pack — the config
        # saved below MUST be the one the keyer used, or lookup_rows will
        # silently route to the wrong partitions. It cannot be re-derived
        # from an already-keyed dataset, so insist the caller states it
        # (no silent auto_partitions / empty-hot-hosts defaults); the
        # encode stage then cross-checks it per partition (see
        # encode_group's routing audit).
        if num_partitions is None or (hot_hosts is None
                                      and host_map is None):
            raise ValueError(
                "encode_partitioned(pre_packed=True): pass the SAME "
                "num_partitions and hot_hosts/host_map given to "
                "make_keyer_pack — they are persisted for lookup_rows "
                "and cannot be re-derived from an already-keyed dataset. "
                "If the keyer used plain hash routing (no hot hosts), "
                "declare that explicitly with hot_hosts={}")
        keyed = ds
    else:
        if url_col not in schema_names:
            raise KeyError(f"partition key column {url_col!r} not in dataset "
                           f"schema {schema_names}")
        columns = columns or [c for c in schema_names
                              if c not in ("part_key",)]
        if num_partitions is None:
            num_partitions = auto_partitions(ds, source_paths)
        if hot_hosts is None and host_map is None:
            # ANALYZE pre-pass → balanced explicit host→partition packing
            # (pruned: read ONLY the key column from raw files when known;
            # non-parquet sources — WARC/CSV front doors — count through
            # the dataset itself instead)
            if source_paths and all(p.endswith(".parquet")
                                    for p in source_paths):
                import ray.data
                from .io import read_parquet_clean
                url_ds = read_parquet_clean(source_paths,
                                            columns=[url_col])
                counts = collect_host_counts(url_ds, url_col)
            else:
                counts = collect_host_counts(ds, url_col)
            host_map = plan_host_partitions(counts, num_partitions)
        keyed = add_partition_key(ds, url_col, num_partitions, hot_hosts,
                                  host_map)
        keyed = keyed.map_batches(pack_segments, batch_format="pyarrow")
    has_prov = "filepath" in columns or "filename" in columns

    keyed = _apply_resume(keyed, out_dir, resume)

    enc_cols = [c for c in columns if c not in ("part_key", "filepath", "filename")]
    prov_cols = [c for c in ("filepath", "filename") if c in columns]

    import json

    def encode_group(group: pa.Table) -> pa.Table:
        pk = int(group["part_key"][0].as_py())
        tables = [pa.ipc.open_stream(pa.BufferReader(b.as_py())).read_all()
                  for b in group["seg"]]
        full = pa.concat_tables(tables, promote_options="default")
        if sort_by is not None and full.num_rows:
            full = _cluster(full, sort_by)  # clustering (see tasks path)
        if url_col in full.schema.names and full.num_rows:
            # routing audit: the persisted config must reproduce the keyer's
            # part_key for this group's rows — a pre-packed dataset keyed
            # with a DIFFERENT config than the caller passed would otherwise
            # make lookup_rows silently miss (O(1) per partition)
            probe = full[url_col].combine_chunks().slice(0, 1)
            expect = int(compute_part_keys(probe, num_partitions, hot_hosts,
                                           host_map)[0])
            if expect != pk:
                raise ValueError(
                    f"partition {pk}: saved routing config maps url "
                    f"{probe[0].as_py()!r} to partition {expect} — the "
                    "num_partitions/hot_hosts/host_map passed to "
                    "encode_partitioned do not match the keyer's")
        files = ""
        if has_prov:
            files = json.dumps(sorted(set(full["filename"].to_pylist())))
        pages_t = _encode_table(full, pk, enc_cols + prov_cols, page_rows,
                                input_files=files)
        from .zones import (ZONES_DIRNAME, invalidate_zone_sidecar,
                            zone_sidecar_from_table)
        invalidate_zone_sidecar(out_dir, pk)  # never leave stale min/max
        cols = [c for c in (zone_columns or []) if c in full.schema.names]
        # bloom only when the key's pages are actually stored
        bloom = ([url_col] if url_col in full.schema.names
                 and url_col in enc_cols else None)
        if cols or bloom:  # groupby path: every column shares boundaries
            zone_sidecar_from_table(
                os.path.join(out_dir, ZONES_DIRNAME, f"part_key={pk}"),
                full, cols, page_rows, uniform=True, bloom_columns=bloom)
        return pages_t

    log.send_log(f"encode_partitioned: "
                 f"{len(host_map) if host_map else len(hot_hosts or {})} "
                 f"host(s) planned, {num_partitions} partitions → {out_dir}")
    cfg = {"url_col": url_col, "num_partitions": num_partitions,
           "hot_hosts": hot_hosts, "host_map": host_map}
    if sort_by is not None:
        cfg["sort_by"] = sort_by if isinstance(sort_by, str) \
            else list(sort_by)
    mf.save_config(out_dir, cfg)
    pages = keyed.groupby("part_key").map_groups(encode_group,
                                                 batch_format="pyarrow")
    # stream pages straight to partitioned storage (never materialized)
    pages.write_parquet(os.path.join(out_dir, "pages"),
                        partition_cols=["part_key"])
    summary = _finalize_manifest(out_dir, enc_cols, snapshot_op="encode")
    if collect_stats:
        summary["stats"] = pages.stats()
    log.send_log(f"encode_partitioned done: {summary['rows']} rows, "
                 f"{summary['encoded_bytes']}/{summary['raw_bytes']} bytes")
    return summary


def _resume_prepare(out_dir: str, resume: bool) -> set[int]:
    """Disk-side resume prep shared by both partitioned encode paths.
    Fresh run: wipe stale outputs, return the empty set. Resume: drop page
    files of partitions being re-encoded (so an append-style write can't
    leave duplicates) and return the completed part_keys."""
    import shutil
    pages_dir = os.path.join(out_dir, "pages")
    if not resume:
        shutil.rmtree(pages_dir, ignore_errors=True)
        shutil.rmtree(os.path.join(out_dir, "_manifest"), ignore_errors=True)
        # a fresh encode starts a new lineage: retired files of the old
        # layout are unreachable (their snapshot log was just wiped)
        shutil.rmtree(os.path.join(out_dir, "_history"), ignore_errors=True)
        return set()
    done = mf.completed_part_keys(out_dir)
    if os.path.isdir(pages_dir):
        for d in os.listdir(pages_dir):
            if d.startswith("part_key="):
                try:
                    k = int(d.split("=", 1)[1])
                except ValueError:
                    continue
                if k not in done:
                    shutil.rmtree(os.path.join(pages_dir, d),
                                  ignore_errors=True)
    return done


def _apply_resume(keyed, out_dir: str, resume: bool):
    """Dataset-side resume: disk prep via :func:`_resume_prepare`, then
    filter completed part_keys out *before* the shuffle."""
    done = _resume_prepare(out_dir, resume)
    if done:
        done_arr = pa.array(sorted(done), type=pa.int64())
        keyed = keyed.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t["part_key"], value_set=done_arr))),
            batch_format="pyarrow")
    return keyed


# ---------------------------------------------------------------------------
# task-exchange encode (deterministic keyed shuffle via raw Ray tasks)
# ---------------------------------------------------------------------------

#: codecs that gain nothing from partition co-location (no shared symbol
#: table / dictionary) — their columns can be encoded to FINAL page form on
#: the map side, so their bytes are compressed exactly once (the reduce
#: passes the pages through instead of unpacking + re-compressing)
_PRECODE_CODECS = frozenset({"plain", "plain+z", "plain+zs"})

#: rows sampled by the DRIVER to fix the precode column→codec map. The map
#: is decided exactly once per job and shipped to every map task: letting
#: each worker sample its own first-seen batch (the round-2 design) could
#: classify the same column heavy on one worker and light on another, and
#: the reduce would then silently drop the light copies — data loss.
_PRECODE_SAMPLE_ROWS = 4096


def plan_precode_columns(paths: list[str], plan, enc_cols: list[str],
                         dialect=None) -> dict[str, str]:
    """Driver-side, once-per-job decision of which columns are map-side
    precoded (plain-family → FINAL pages on the map side) and with which
    codec. Samples the first input file only — the choice must be global
    and deterministic, not per-worker (see ADVICE r2: per-worker divergence
    corrupts the reduce). Columns not in the returned dict stay 'light' and
    get their codec chosen per partition at reduce time."""
    if not paths:
        return {}
    first = paths[0]
    if dialect is None:
        # parquet: stream ONLY the first _PRECODE_SAMPLE_ROWS rows out of
        # the first file. read_row_group(0) decoded the WHOLE row group
        # (~1 s per 500k-row group of web pages, on the driver, inside the
        # timed job) when the sample needs <1% of it — iter_batches stops
        # at the first page boundary past the sample size instead
        import pyarrow.parquet as pq
        rename = plan.rename_by_file[first]
        avail = set(plan.file_schemas[first].names)
        target = set(plan.target_columns)
        needed = sorted(c for c in avail if rename.get(c, c) in target)
        pf = pq.ParquetFile(first)
        b = next(pf.iter_batches(batch_size=_PRECODE_SAMPLE_ROWS,
                                 columns=needed or None), None)
        t = pa.Table.from_batches([b]) if b is not None \
            else pf.read(columns=needed or None)
    else:
        t = _read_map_file(first, plan, dialect)
    from .align import make_align_fn
    t = t.slice(0, _PRECODE_SAMPLE_ROWS)
    if plan.add_filename:
        t = t.append_column("path",
                            pa.array([first] * t.num_rows, pa.string()))
    aligned = make_align_fn(plan, first)(t)
    out: dict[str, str] = {}
    for name in enc_cols:
        if name not in aligned.schema.names:
            continue
        arr = aligned[name]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        codec = choose_codec(arr, column=name, part_key=0)
        if codec in _PRECODE_CODECS:
            out[name] = codec
    return out


def _ipc_zstd(table: pa.Table) -> bytes:
    opts = pa.ipc.IpcWriteOptions(compression="zstd")
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema, options=opts) as w:
        w.write_table(table)
    return sink.getvalue().to_pybytes()


def _precode_slot(seg: pa.Table, precode_map: dict[str, str]) -> bytes:
    """One slot → the PCD1 container: heavy (plain-family) columns as
    FINAL EncodedChunk page blobs, everything else as a zstd-IPC 'light'
    table. The reduce adopts the heavy pages untouched. ``precode_map``
    (column → codec) is decided ONCE by the driver and shipped to every
    map task, so all workers agree on which columns are heavy."""
    heavy: list[tuple[str, int, bytes]] = []  # (name, raw_bytes, blob)
    light_cols = []
    for name in seg.schema.names:
        codec = precode_map.get(name)
        if codec is not None:
            arr = seg[name]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            try:
                blob = get_codec(codec).encode(arr).to_bytes()
            except Exception:
                blob = get_codec("plain").encode(arr).to_bytes()
            heavy.append((name, arr.nbytes, blob))
        else:
            light_cols.append(name)
    light = _ipc_zstd(seg.select(light_cols))
    parts = [b"PCD1", len(light).to_bytes(8, "little"), light,
             len(heavy).to_bytes(4, "little")]
    for name, raw, blob in heavy:
        nb = name.encode()
        parts += [len(nb).to_bytes(4, "little"), nb,
                  raw.to_bytes(8, "little"),
                  len(blob).to_bytes(8, "little"), blob]
    return b"".join(parts)


def _pack_dense(keyed: pa.Table, num_partitions: int,
                skip: frozenset | None = None,
                precode_map: dict[str, str] | None = None) -> list[bytes]:
    """Keyed table → one blob per partition slot (b"" for empty / skipped
    slots): a zstd Arrow-IPC stream, or the PCD1 precoded container when
    ``precode``. Deterministic: rows keep their in-table order inside
    each slot (stable sort)."""
    out: list[bytes] = [b""] * num_partitions
    if keyed.num_rows == 0:
        return out
    keys = np.asarray(keyed["part_key"])
    order = np.argsort(keys, kind="stable")
    tbl = keyed.take(pa.array(order))
    keys = keys[order]
    bounds = np.concatenate([[0], np.flatnonzero(np.diff(keys)) + 1,
                             [len(keys)]])
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        pk = int(keys[lo])
        if skip and pk in skip:
            continue
        seg = tbl.slice(int(lo), int(hi - lo)).combine_chunks()
        seg = seg.drop_columns(["part_key"])
        out[pk] = (_precode_slot(seg, precode_map) if precode_map
                   else _ipc_zstd(seg))
    return out


def _read_map_file(p: str, plan, dialect=None, extract=None) -> pa.Table:
    """One file → pruned Arrow table for the task-exchange map side.
    Parquet reads only the needed columns; CSV reads with the sniffed
    dialect + the plan's unified per-column types (same options as
    ``sources.csv.read_aligned_csv``) so per-file inference can't drift;
    WARC parses the whole archive (``extract`` optionally appends the
    extracted text column map-side, same kernel as the Dataset path)."""
    if p.endswith((".warc", ".warc.gz")):
        from .sources.warc import read_warc_file_table
        t = read_warc_file_table(p, extract)
        keep = [c for c in t.column_names if c in set(plan.target_columns)]
        return t.select(keep)
    rename = plan.rename_by_file[p]
    avail = set(plan.file_schemas[p].names)
    target = set(plan.target_columns)
    needed = sorted(c for c in avail if rename.get(c, c) in target)
    if dialect is None:
        import pyarrow.parquet as pq
        return pq.read_table(p, columns=needed or None)
    from .sources.csv import _csv_options
    g_schema = plan.file_schemas[p]
    target_types = {}
    for f in g_schema:
        tgt = rename.get(f.name, f.name)
        if tgt in plan.unified_schema.names:
            target_types[f.name] = plan.unified_schema.field(tgt).type
    column_names = None if dialect.has_header else list(g_schema.names)
    read_opts, parse_opts, convert_opts = _csv_options(
        dialect, column_names=column_names, column_types=target_types)
    from pyarrow import csv as pacsv
    t = pacsv.read_csv(p, read_options=read_opts, parse_options=parse_opts,
                       convert_options=convert_opts)
    return t.select([c for c in t.schema.names if c in needed]) \
        if needed else t


def _map_pack_files(file_group: list[str], plan, num_partitions: int,
                    url_col: str, hot_hosts: dict | None, host_map: dict | None,
                    skip: frozenset, dialect=None,
                    precode_map: dict[str, str] | None = None,
                    extract=None) -> list[bytes]:
    """Map side of the task exchange: read (column-pruned) → align → key →
    per-partition zstd segments. Runs as one Ray task per file group; the
    scheduler sees ``num_partitions`` separate return objects so each
    reducer pulls only its own bytes."""
    from .align import make_align_fn
    packed: list[list[bytes]] = []
    for p in file_group:
        t = _read_map_file(p, plan, dialect, extract)
        if plan.add_filename:
            t = t.append_column("path", pa.array([p] * t.num_rows,
                                                 pa.string()))
        aligned = make_align_fn(plan, p)(t)
        keys = compute_part_keys(aligned[url_col], num_partitions,
                                 hot_hosts, host_map)
        keyed = aligned.append_column("part_key",
                                      pa.array(keys, type=pa.int64()))
        packed.append(_pack_dense(keyed, num_partitions, skip, precode_map))
    if len(packed) == 1:
        return packed[0]
    # concatenate the per-file blobs per slot (decoder reads streams
    # back-to-back is invalid IPC — instead keep per-file blobs delimited
    # by length prefixes)
    out = []
    for slot in range(num_partitions):
        blobs = [pk[slot] for pk in packed if pk[slot]]
        if not blobs:
            out.append(b"")
        elif len(blobs) == 1:
            out.append(blobs[0])
        else:
            parts = [len(blobs).to_bytes(4, "little")]
            for b in blobs:
                parts.append(len(b).to_bytes(8, "little"))
                parts.append(b)
            out.append(b"MSEG" + b"".join(parts))
    return out


def _map_pack_single(file_group, plan, num_partitions, url_col,
                     hot_hosts, host_map, skip, dialect=None,
                     precode_map: dict[str, str] | None = None,
                     extract=None) -> bytes:
    return _map_pack_files(file_group, plan, num_partitions, url_col,
                           hot_hosts, host_map, skip, dialect,
                           precode_map, extract)[0]


def _parse_one_slot(blob: bytes, light: list, heavy: dict) -> None:
    """Parse a single (non-MSEG) slot blob into the accumulators: the
    light table is appended; heavy page blobs extend per-column lists
    (arrival order == row order)."""
    if blob[:4] == b"PCD1":
        off = 4
        ln = int.from_bytes(blob[off:off + 8], "little")
        off += 8
        light.append(pa.ipc.open_stream(
            pa.BufferReader(blob[off:off + ln])).read_all())
        off += ln
        n_heavy = int.from_bytes(blob[off:off + 4], "little")
        off += 4
        for _ in range(n_heavy):
            nl = int.from_bytes(blob[off:off + 4], "little")
            off += 4
            name = blob[off:off + nl].decode()
            off += nl
            raw = int.from_bytes(blob[off:off + 8], "little")
            off += 8
            bl = int.from_bytes(blob[off:off + 8], "little")
            off += 8
            heavy.setdefault(name, []).append((raw, blob[off:off + bl]))
            off += bl
    else:
        light.append(pa.ipc.open_stream(pa.BufferReader(blob)).read_all())


def _unpack_segment(blob: bytes) -> tuple[list[pa.Table], dict]:
    """Inverse of the map side's per-slot blob format. Returns
    (light_tables, heavy_pages) where heavy_pages maps column →
    [(raw_bytes, EncodedChunk blob), ...] in row order."""
    light: list[pa.Table] = []
    heavy: dict[str, list] = {}
    if not blob:
        return light, heavy
    if blob[:4] == b"MSEG":
        n = int.from_bytes(blob[4:8], "little")
        off = 8
        for _ in range(n):
            ln = int.from_bytes(blob[off:off + 8], "little")
            off += 8
            _parse_one_slot(bytes(blob[off:off + ln]), light, heavy)
            off += ln
    else:
        _parse_one_slot(blob, light, heavy)
    return light, heavy


def _encode_part_task(pk: int, out_dir: str, enc_cols: list[str],
                      prov_cols: list[str], page_rows: int,
                      has_prov: bool, zone_cols, *blobs: bytes,
                      append: bool = False, file_tag: str = "",
                      backfill: dict | None = None,
                      sort_by: str | list[str] | None = None,
                      bloom_col: str | None = None) -> dict:
    """Reduce side of the task exchange: unpack this partition's segments
    (in map order — deterministic), concat, encode to pages, write ONE
    parquet file under ``pages/part_key=<pk>/``. ``zone_cols`` writes the
    partition's zone-map sidecar from the in-memory table (free min/max,
    :mod:`raystack.zones`). ``append=True`` (incremental ingest,
    :func:`encode_append`) numbers new pages after the partition's
    existing maximum and writes ``part-<file_tag>.parquet`` instead of
    overwriting — the tag is derived from the appended file set, so a
    retried reduce task (or re-running the same append) atomically
    REPLACES its own output rather than duplicating rows; this run's own
    file is excluded from the base-page computation. ``backfill`` (union
    schema-drift append) maps newly-appearing column names to their Arrow
    types: each gets ONE all-null page (codec ``nulls``, ``page_idx=-1``
    so it sorts before every real page) covering this partition's
    pre-append rows — computed locally from the existing pages' metadata,
    and skipped for columns the partition already carries. Returns tiny
    stats only."""
    import json as _json

    import pyarrow.parquet as pq
    tables: list[pa.Table] = []
    heavy: dict[str, list] = {}
    for b in blobs:
        lt, hv = _unpack_segment(b)
        tables.extend(lt)
        for name, pgs in hv.items():
            heavy.setdefault(name, []).extend(pgs)
    do_backfill = bool(backfill) and append
    if not tables and not heavy and not do_backfill:
        return {"part_key": pk, "rows": 0}
    if heavy:
        # invariant: a column is heavy (map-side precoded) in EVERY map
        # segment or in none — the driver fixes the precode map before the
        # job, so a mix means corrupted input; failing loudly here beats
        # the silent row loss a mixed column would otherwise cause
        mixed = set(heavy) & {n for t in tables for n in t.schema.names}
        if mixed:
            raise ValueError(
                f"part {pk}: column(s) {sorted(mixed)} arrived both "
                "precoded (heavy) and in light segments — inconsistent "
                "precode maps across map tasks")
    if tables:
        full = pa.concat_tables(tables, promote_options="default")
        if sort_by is not None and full.num_rows:
            if heavy:
                raise ValueError(
                    "sort_by is incompatible with precoded columns "
                    "(their row order is fixed map-side)")
            # clustering: rows sorted within the partition make the
            # sorted column's zone maps TIGHT (each page covers a narrow
            # value range), so range queries prune pages precisely
            # instead of hitting every page's min/max span
            full = _cluster(full, sort_by)
    else:  # backfill-only task: partition got no new rows this append
        full = None
    files = ""
    if has_prov and full is not None:
        files = _json.dumps(sorted(set(
            pc.unique(full["filename"]).to_pylist())))
    light_cols = [c for c in enc_cols + prov_cols
                  if full is not None and c in full.schema.names
                  and c not in heavy]
    part_dir = os.path.join(out_dir, "pages", f"part_key={pk}")
    base_page = 0
    out_name = f"part-{file_tag}" if append else "part-0"
    prior_meta = None
    if append and os.path.isdir(part_dir):
        # metadata-only read: new pages number after the existing max so
        # decode's (part_key, page_idx) grouping never collides. This
        # run's own file (same tag — a retry/re-run) is excluded, making
        # the task idempotent.
        import pyarrow.dataset as pads
        prior = [os.path.join(part_dir, f) for f in os.listdir(part_dir)
                 if f.endswith(".parquet")
                 and f != f"{out_name}.parquet"]
        if prior:
            prior_meta = pads.dataset(prior).to_table(
                columns=["page_idx", "column", "nrows"])
            if prior_meta.num_rows:
                base_page = int(pc.max(prior_meta["page_idx"]).as_py()) + 1
    pages = _encode_table(full, pk, light_cols, page_rows,
                          first_page_idx=base_page, input_files=files) \
        if full is not None else PAGES_SCHEMA.empty_table()
    if heavy:
        # adopt the map-side FINAL pages untouched (page_idx numbering is
        # per-column; decode assembles columns independently)
        rows = {name: [] for name in PAGES_SCHEMA.names}
        for name, pgs in heavy.items():
            for i, (raw, blob) in enumerate(pgs):
                chunk = EncodedChunk.from_bytes(blob)
                rows["part_key"].append(pk)
                rows["page_idx"].append(base_page + i)
                rows["column"].append(name)
                rows["codec"].append(chunk.codec)
                rows["nrows"].append(chunk.length)
                rows["raw_bytes"].append(raw)
                rows["enc_bytes"].append(len(blob))
                rows["checksum"].append(_crc(blob))
                rows["input_files"].append(files)
                rows["encode_ms"].append(0)
                rows["data"].append(blob)
        pages = pa.concat_tables(
            [pages, pa.table(rows, schema=PAGES_SCHEMA)])
    n_rows = full.num_rows if full is not None else 0
    if not light_cols and heavy:
        # zero-column light tables lose their row count over IPC
        first = next(iter(heavy.values()))
        n_rows = sum(EncodedChunk.from_bytes(b).length for _, b in first)
    if do_backfill and prior_meta is not None and prior_meta.num_rows:
        # union schema drift: give each newly-appearing column one
        # all-null page over this partition's PRE-append rows, so every
        # column decodes to the same total row count. Columns the
        # partition already carries are skipped (idempotent under
        # repeated drifted appends).
        present = set(prior_meta["column"].to_pylist())
        todo = {c: t for c, t in backfill.items() if c not in present}
        if todo:
            from .codecs.nulls import NullsCodec
            any_col = prior_meta["column"][0].as_py()
            prior_rows = int(pc.sum(pc.filter(
                prior_meta["nrows"],
                pc.equal(prior_meta["column"], any_col))).as_py())
            if prior_rows:
                nc = NullsCodec()
                brows = {name: [] for name in PAGES_SCHEMA.names}
                for cname in sorted(todo):
                    blob = nc.encode(
                        pa.nulls(prior_rows, type=todo[cname])).to_bytes()
                    brows["part_key"].append(pk)
                    brows["page_idx"].append(-1)  # sorts before real pages
                    brows["column"].append(cname)
                    brows["codec"].append("nulls")
                    brows["nrows"].append(prior_rows)
                    brows["raw_bytes"].append(0)
                    brows["enc_bytes"].append(len(blob))
                    brows["checksum"].append(_crc(blob))
                    brows["input_files"].append(files)
                    brows["encode_ms"].append(0)
                    brows["data"].append(blob)
                pages = pa.concat_tables(
                    [pa.table(brows, schema=PAGES_SCHEMA), pages])
    if pages.num_rows == 0:
        return {"part_key": pk, "rows": 0}
    from .zones import (ZONES_DIRNAME, invalidate_zone_sidecar,
                        zone_sidecar_from_pages, zone_sidecar_from_table)
    invalidate_zone_sidecar(out_dir, pk)  # never leave stale min/max
    os.makedirs(part_dir, exist_ok=True)
    tmp = os.path.join(part_dir, f".{out_name}.parquet.tmp")
    # bounded row groups: predicate pushdown on (column, page_idx) then
    # skips unwanted page blobs' bytes instead of reading the whole file
    pq.write_table(pages.drop_columns(["part_key"]), tmp,
                   row_group_size=PAGES_ROW_GROUP)
    os.replace(tmp, os.path.join(part_dir, f"{out_name}.parquet"))
    if full is not None and not append:
        cols = [c for c in (zone_cols or [])
                if c in full.schema.names and c not in heavy]
        # key-column blooms only on fresh part-0 writes (pages number from
        # 0, matching the sidecar's slicing); appends invalidate the
        # sidecar and defer to build_zone_maps. light_cols membership also
        # guarantees the key's pages are actually STORED (a column-subset
        # encode that drops the key must not grow a pageless sidecar)
        bloom = [bloom_col] if bloom_col and bloom_col in light_cols else None
        if cols or bloom:
            # precoded heavy columns carry their own page numbering →
            # page boundaries differ → partition-level pruning only
            # (point lookups stay page-pruned: they map the KEY column's
            # surviving pages to row ranges instead of page ids)
            zone_sidecar_from_table(
                os.path.join(out_dir, ZONES_DIRNAME, f"part_key={pk}"),
                full, cols, page_rows, uniform=not heavy,
                bloom_columns=bloom)
    if not append and bloom_col and bloom_col in heavy:
        # the key column itself precoded map-side (plain-family urls on
        # the flagship layout): build its bloom sidecar from the heavy
        # pages — their OWN page numbering; point lookups map surviving
        # pages to row ranges so differing boundaries stay sound. Urls
        # are tiny next to the payload columns, so the extra decode here
        # is noise in the reduce.
        pgs = []
        for i, (_, blob) in enumerate(heavy[bloom_col]):
            chunk = EncodedChunk.from_bytes(blob)
            pgs.append((base_page + i, get_codec(chunk.codec).decode(chunk)))
        zone_sidecar_from_pages(
            os.path.join(out_dir, ZONES_DIRNAME, f"part_key={pk}"),
            bloom_col, pgs)
    return {"part_key": pk, "rows": n_rows,
            "enc_bytes": int(pc.sum(pages["enc_bytes"]).as_py() or 0)}


#: per-map on-disk input bytes target for the task exchange (parquet bytes;
#: ~4x that once decoded — one map task's working set)
TARGET_MAP_BYTES = 128 << 20


def _group_files(paths: list[str], target_bytes: int) -> list[list[str]]:
    groups, cur, cur_b = [], [], 0
    for p in paths:
        sz = os.path.getsize(p) if os.path.exists(p) else target_bytes
        if cur and cur_b + sz > target_bytes:
            groups.append(cur)
            cur, cur_b = [], 0
        cur.append(p)
        cur_b += sz
    if cur:
        groups.append(cur)
    return groups


def encode_partitioned_tasks(source_paths: list[str], out_dir: str, *,
                             columns_select: list[str] | None = None,
                             columns_rename: dict[str, str] | None = None,
                             add_filename: bool = True,
                             url_col: str = "url",
                             num_partitions: int | None = None,
                             page_rows: int = DEFAULT_PAGE_ROWS,
                             resume: bool = False,
                             hot_hosts: dict[str, int] | None = None,
                             host_map: dict[str, list[int]] | None = None,
                             host_counts: dict[str, int] | None = None,
                             plan=None, dialect=None, logger=None,
                             map_bytes: int = TARGET_MAP_BYTES,
                             precode: bool = True,
                             collect_stats: bool = False,
                             zone_columns: list[str] | None = None,
                             sort_by: str | list[str] | None = None,
                             warc_extract_text: tuple[bytes, bytes] | None
                             = None) -> dict:
    """Co-located encode with a deterministic raw-task exchange instead of
    the Dataset ``groupby`` shuffle. Same output layout + manifest as
    :func:`encode_partitioned`; same keying (:func:`compute_part_keys`).

    Why raw tasks here: a keyed exchange with a KNOWN small integer key
    domain (part_key ∈ [0, P)) is something Ray Data cannot express
    efficiently — ``groupby().map_groups`` rides a sampled sort whose
    boundary estimate packs ~2 partitions per reduce block with up to 4x
    block skew (measured), and the hash-shuffle strategy's aggregator
    actors measured ~2x slower at 8 CPUs. Here each map task returns one
    object per partition (``num_returns=P``) and each of the P reduce
    tasks consumes exactly its own segments, giving perfectly even reduce
    granularity and map-order-deterministic row order per partition.

    Scale bounds (100 TB design note): the driver tracks M×P object refs.
    With 256 MB map inputs and 256 MB partitions that is ~(bytes/256MB)²
    refs per job — fine to a few TB per job; beyond that use
    :func:`encode_sharded`, which bounds M×P by splitting the file list
    into shards (task-exchange first shard + idempotent appends, one
    routing decision over the full list), or
    :func:`encode_partitioned`, whose push-based sort shuffle merges
    intermediate objects. Reference semantics: the per-file chunked
    combine loop of d6tstack/combine_csv.py:453-504, parallelized."""
    import ray

    from .log import get_logger
    from .plan import build_plan
    log = get_logger(logger)
    is_csv = any(p.endswith((".csv", ".txt", ".tsv")) for p in source_paths)
    is_warc = bool(source_paths) and all(
        p.endswith((".warc", ".warc.gz")) for p in source_paths)
    if plan is None:
        if is_warc:
            # Common Crawl straight into the task exchange: the schema is
            # fixed by the format, so the plan needs no footer sniff
            from .plan import plan_from_schemas
            from .sources.warc import warc_schema
            ws = warc_schema(extract=warc_extract_text is not None)
            plan = plan_from_schemas(sorted(source_paths),
                                     {p: ws for p in source_paths},
                                     columns_select=columns_select,
                                     columns_rename=columns_rename,
                                     add_filename=add_filename)
        elif is_csv:
            from .sources.csv import build_csv_plan
            plan, dialect = build_csv_plan(
                source_paths, columns_select=columns_select,
                columns_rename=columns_rename, add_filename=add_filename)
        else:
            plan = build_plan(source_paths, columns_select=columns_select,
                              columns_rename=columns_rename,
                              add_filename=add_filename)
    if is_warc:
        # precode samples parquet row groups; WARC's heavy columns still
        # get their dictionaries built co-located in the reduce
        precode = False
    if num_partitions is None:
        num_partitions = auto_partitions(source_paths=source_paths)
    if host_map is None and hot_hosts is None:
        if host_counts is None:
            if _analyze_small(source_paths) and dialect is None \
                    and not is_warc:
                # small parquet inputs: ANALYZE on the driver — the Ray
                # scan+groupby job's fixed cost dwarfs a column-pruned
                # pyarrow read at this size
                host_counts = _host_counts_driver(source_paths, url_col)
            else:
                import ray.data
                if is_warc:
                    from .sources.warc import read_warc
                    url_ds = read_warc(source_paths) \
                        .select_columns([url_col])
                elif dialect is not None:
                    from .sources.csv import read_aligned_csv
                    url_ds = read_aligned_csv(source_paths, plan=plan,
                                              dialect=dialect)
                else:
                    from .io import read_parquet_clean
                    url_ds = read_parquet_clean(source_paths,
                                                columns=[url_col])
                host_counts = collect_host_counts(url_ds, url_col)
        host_map = plan_host_partitions(host_counts, num_partitions)

    columns = list(plan.target_columns)
    if plan.add_filename:
        columns += ["filepath", "filename"]
    enc_cols = [c for c in columns if c not in ("part_key", "filepath",
                                                "filename")]
    prov_cols = [c for c in ("filepath", "filename") if c in columns]
    has_prov = bool(prov_cols)

    if num_partitions > 4096:
        raise ValueError(
            f"encode_partitioned_tasks: num_partitions={num_partitions} "
            "exceeds the per-map num_returns budget (4096); shard the "
            "input into multiple jobs (the manifest/resume layout is "
            "per-shard) or use encode_partitioned (push-based sort "
            "shuffle merges intermediates)")
    done = _resume_prepare(out_dir, resume)
    cfg = {"url_col": url_col, "num_partitions": num_partitions,
           "hot_hosts": hot_hosts, "host_map": host_map}
    if sort_by is not None:
        # persists with the layout: encode_append clusters its new pages
        # the same way, so zone pruning survives incremental ingest
        cfg["sort_by"] = sort_by if isinstance(sort_by, str) \
            else list(sort_by)
    if is_warc:
        # appends must parse/extract exactly like the initial encode —
        # the extraction tags persist with the layout (latin-1: tags are
        # byte strings, JSON wants text)
        cfg["warc_extract"] = ([t.decode("latin-1")
                                for t in warc_extract_text]
                               if warc_extract_text else None)
    mf.save_config(out_dir, cfg)
    _srcs = set(source_paths)
    use_paths = [p for p in plan.paths if p in _srcs]
    # map granularity: cap at map_bytes but never group so coarsely that
    # the map wave can't fill the cluster (~2 tasks per CPU); small jobs
    # on big clusters otherwise collapse to a handful of map tasks
    total_b = sum(os.path.getsize(p) for p in use_paths if os.path.exists(p))
    ncpu = int(ray.cluster_resources().get("CPU", 8) or 8)
    eff_map_bytes = max(16 << 20, min(map_bytes,
                                      total_b // max(1, 2 * ncpu) or
                                      map_bytes))
    groups = _group_files(use_paths, eff_map_bytes)
    # the precode column→codec map is decided HERE, once, and shipped to
    # every map task — per-worker sampling could split a column heavy/light
    # across workers and corrupt the reduce (ADVICE r2, high)
    if sort_by is not None:
        # clustering re-orders rows at the reduce; map-side precoded
        # pages have a fixed row order, so the two can't combine
        precode = False
    precode_map = (plan_precode_columns(use_paths, plan, enc_cols, dialect)
                   if precode else {})
    log.send_log(f"encode_partitioned_tasks: {len(groups)} map task(s) → "
                 f"{num_partitions} partitions → {out_dir}"
                 + (f"; precoded columns: {sorted(precode_map)}"
                    if precode_map else ""))

    if num_partitions == 1:
        # num_returns=1 would make the whole list one object; return the
        # single blob directly instead
        map_fn = ray.remote(num_cpus=1)(_map_pack_single)
    else:
        map_fn = ray.remote(num_returns=num_partitions,
                            num_cpus=1)(_map_pack_files)
    enc_fn = ray.remote(num_cpus=1)(_encode_part_task)
    skip = frozenset(done)
    map_refs = [map_fn.remote(g, plan, num_partitions, url_col,
                              hot_hosts, host_map, skip, dialect,
                              precode_map, warc_extract_text)
                for g in groups]
    if num_partitions == 1:
        map_refs = [[r] for r in map_refs]
    enc_refs = [enc_fn.remote(pk, out_dir, enc_cols, prov_cols, page_rows,
                              has_prov, zone_columns,
                              *[m[pk] for m in map_refs],
                              bloom_col=url_col,
                              sort_by=sort_by)
                for pk in range(num_partitions) if pk not in done]
    stats = None
    if collect_stats:
        import time as _time
        t0 = _time.perf_counter()
        ray.wait([m[0] for m in map_refs], num_returns=len(map_refs),
                 fetch_local=False)
        t_maps = _time.perf_counter() - t0
        ray.get(enc_refs)
        stats = {"map_tasks": len(groups), "reduce_tasks": len(enc_refs),
                 "map_wall_s": round(t_maps, 3),
                 "reduce_tail_s": round(_time.perf_counter() - t0 - t_maps,
                                        3)}
    else:
        ray.get(enc_refs)
    summary = _finalize_manifest(out_dir, enc_cols, snapshot_op="encode")
    if stats is not None:
        summary["stats"] = stats
    log.send_log(f"encode_partitioned_tasks done: {summary['rows']} rows, "
                 f"{summary['encoded_bytes']}/{summary['raw_bytes']} bytes")
    return summary


def _layout_column_types(out_dir: str) -> dict[str, "pa.DataType"]:
    """Column name → Arrow type of an encoded layout, read from the first
    non-empty partition's page-blob headers (every non-empty partition
    carries every column — encode's invariant, maintained across drifted
    appends by the union back-fill). Metadata columns scan first; then one
    ``data`` blob per column is fetched with a pushed-down
    ``(column, page_idx)`` filter, so with bounded page row groups the
    read touches a few pages, not the partition."""
    import pyarrow.dataset as pads
    pages_root = os.path.join(out_dir, "pages")
    dirs = sorted(d for d in os.listdir(pages_root)
                  if d.startswith("part_key=")) \
        if os.path.isdir(pages_root) else []
    for d in dirs:
        ds = pads.dataset(os.path.join(pages_root, d))
        meta = ds.to_table(columns=["column", "page_idx"])
        if not meta.num_rows:
            continue
        first_page: dict[str, int] = {}
        for name, i in zip(meta["column"].to_pylist(),
                           meta["page_idx"].to_pylist()):
            if name not in first_page or i < first_page[name]:
                first_page[name] = i
        types: dict[str, pa.DataType] = {}
        for name, i in first_page.items():
            t = ds.to_table(columns=["data"],
                            filter=(pc.field("column") == name)
                            & (pc.field("page_idx") == i))
            types[name] = EncodedChunk.from_bytes(t["data"][0].as_py()).type
        return types
    return {}


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(int(pid), 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


import contextlib as _contextlib  # noqa: E402


@_contextlib.contextmanager
def _mutation_lock(out_dir: str, op: str):
    """Advisory lock serializing layout mutations. Appends compute base
    page indexes from the current state and rewrites journal per
    partition — two CONCURRENT mutators would silently corrupt, so the
    second fails LOUDLY here instead. Same-host stale locks (the owning
    pid is dead) self-heal; a lock left by a crashed run on another
    host must be removed manually (the error names the file). Verbs
    that compose other verbs (upsert_rows, encode_sharded) are NOT
    locked themselves — their steps serialize through this lock one at
    a time."""
    import socket
    lock_dir = os.path.join(out_dir, "_manifest")
    os.makedirs(lock_dir, exist_ok=True)
    path = os.path.join(lock_dir, ".mutation.lock")
    me = {"pid": os.getpid(), "op": op,
          "host": socket.gethostname()}
    acquired = False
    for _ in range(3):  # extra passes only after breaking stale locks
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, json.dumps(me).encode())
            os.close(fd)
            acquired = True
            break
        except FileExistsError:
            try:
                with open(path) as fh:
                    info = json.load(fh)
            except (OSError, ValueError):
                info = {}
            if info.get("host") == me["host"] and info.get("pid") \
                    and not _pid_alive(info["pid"]):
                # crashed owner on this host: break the lock and retry
                with _contextlib.suppress(FileNotFoundError):
                    os.remove(path)
                continue
            raise RuntimeError(
                f"layout {out_dir} is being mutated by {info or path} — "
                "concurrent layout mutations are unsupported (they "
                "would corrupt page numbering); wait for it, or remove "
                f"{path} if that run crashed on another host")
    if not acquired:
        # Every pass found a (stale-looking) lock and broke it, yet a
        # new one kept appearing: live contention. Proceeding without
        # the lock — or deleting a third mutator's lock in `finally` —
        # would defeat the corruption guard, so fail loudly instead.
        raise RuntimeError(
            f"could not acquire mutation lock for {out_dir} after "
            "repeated stale-lock breaks — another mutator is racing "
            f"this one (lock file: {path})")
    try:
        yield
    finally:
        with _contextlib.suppress(FileNotFoundError):
            os.remove(path)


def _mutates_layout(fn):
    """Decorator: run ``fn`` under the layout's mutation lock (see
    :func:`_mutation_lock`). ``out_dir`` is found by signature binding,
    so both positional and keyword call styles lock correctly."""
    import functools
    import inspect
    sig = inspect.signature(fn)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        bound = sig.bind(*args, **kwargs)
        with _mutation_lock(bound.arguments["out_dir"], fn.__name__):
            return fn(*args, **kwargs)
    return wrapper


@_mutates_layout
def encode_append(source_paths: list[str], out_dir: str, *,
                  columns_select: list[str] | None = None,
                  columns_rename: dict[str, str] | None = None,
                  add_filename: bool = True,
                  schema: str = "strict",
                  precode: bool = True,
                  page_rows: int = DEFAULT_PAGE_ROWS,
                  map_bytes: int = TARGET_MAP_BYTES,
                  logger=None) -> dict:
    """Incremental ingest: encode NEW files into an EXISTING layout (the
    daily-increment case a 100 TB pipeline lives on). Routing reuses the
    layout's persisted keyer config verbatim — rows land in the same
    partitions ``lookup_rows`` already routes to, hosts unseen at
    first-encode time hash deterministically — and each touched partition
    gains one ``part-<k>.parquet`` whose pages number after the existing
    maximum, so decode's (part_key, page_idx) grouping never collides.
    Untouched partitions' files (and zone sidecars) are left alone;
    touched partitions' sidecars are invalidated (re-run
    :func:`raystack.zones.build_zone_maps` to restore pruning there). The
    manifest is re-finalized over the whole layout. Heavy plain-family
    columns precode on the map side exactly as in
    :func:`encode_partitioned_tasks` (the global append base page
    upper-bounds every column's numbering, so per-column heavy page ids
    never collide with prior pages).

    ``schema="strict"`` (default) requires the appended files' columns to
    match the layout's exactly. ``schema="union"`` absorbs schema drift
    with d6tstack's union-align semantics: columns missing from the new
    files are null-filled (using the layout's stored Arrow types), and
    columns new to the layout are back-filled over every existing
    partition's prior rows with zero-byte all-null pages (codec
    ``nulls``, ``page_idx=-1``), so ``day1(A,B) + append(B,C)`` decodes
    exactly like a fresh union encode of both days.

    Exactly-once per file set: each append run writes
    ``part-<tag>.parquet`` where the tag is a digest of the appended file
    names — a retried reduce task, or re-running the same append after a
    crash, atomically replaces its own output instead of duplicating
    rows."""
    import ray

    from .log import get_logger
    from .plan import build_plan
    log = get_logger(logger)
    cfg = mf.load_config(out_dir)
    if not cfg:
        raise FileNotFoundError(f"no encode config under {out_dir} — "
                                "encode_append needs an existing layout")
    url_col = cfg["url_col"]
    num_partitions = cfg["num_partitions"]
    hot_hosts = cfg.get("hot_hosts")
    host_map = cfg.get("host_map")

    source_paths = sorted(source_paths)
    is_csv = any(p.endswith((".csv", ".txt", ".tsv")) for p in source_paths)
    is_warc = bool(source_paths) and all(
        p.endswith((".warc", ".warc.gz")) for p in source_paths)
    dialect = None
    warc_extract = None
    if is_warc:
        # parse/extract exactly like the layout's initial encode: the
        # extraction tags come from the persisted config, never the caller
        ex = cfg.get("warc_extract")
        warc_extract = tuple(t.encode("latin-1") for t in ex) if ex \
            else None
        from .plan import plan_from_schemas
        from .sources.warc import warc_schema
        ws = warc_schema(extract=warc_extract is not None)
        plan = plan_from_schemas(source_paths,
                                 {p: ws for p in source_paths},
                                 columns_select=columns_select,
                                 columns_rename=columns_rename,
                                 add_filename=add_filename)
        precode = False  # precode samples parquet row groups
    elif is_csv:
        from .sources.csv import build_csv_plan
        plan, dialect = build_csv_plan(
            source_paths, columns_select=columns_select,
            columns_rename=columns_rename, add_filename=add_filename)
    else:
        plan = build_plan(source_paths, columns_select=columns_select,
                          columns_rename=columns_rename,
                          add_filename=add_filename)
    columns = list(plan.target_columns)
    if plan.add_filename:
        columns += ["filepath", "filename"]
    enc_cols = [c for c in columns if c not in ("part_key", "filepath",
                                                "filename")]
    prov_cols = [c for c in ("filepath", "filename") if c in columns]
    has_prov = bool(prov_cols)

    # schema audit: in strict mode appended pages must cover exactly the
    # layout's columns or per-column decode row counts diverge (loud
    # ValueError, but late). Union mode absorbs drift instead: columns
    # the new files LACK are null-filled by the align plan (the layout's
    # stored types, not a guess), and columns the layout lacks are
    # back-filled over existing rows with all-null pages in the reduce
    # task — the d6tstack union-align semantics (combine_csv.py) applied
    # to an encoded layout.
    if schema not in ("strict", "union"):
        raise ValueError(f"schema must be 'strict' or 'union', got {schema!r}")
    backfill: dict[str, pa.DataType] = {}
    existing_types = _layout_column_types(out_dir)
    if existing_types:
        appended = sorted(enc_cols + prov_cols)
        existing = sorted(existing_types)
        if schema == "strict":
            if existing != appended:
                raise ValueError(
                    f"encode_append: new files' columns {appended} "
                    f"!= existing layout's {existing} — repair with "
                    "columns_select/columns_rename, or pass "
                    "schema='union' to absorb the drift")
        else:
            missing = [c for c in existing if c not in set(appended)]
            prov_missing = [c for c in missing
                            if c in ("filepath", "filename")]
            if prov_missing:
                raise ValueError(
                    "encode_append: layout has provenance columns "
                    f"{prov_missing}; pass add_filename=True")
            import dataclasses
            # columns present on BOTH sides align to the LAYOUT's stored
            # Arrow type (a fresh union encode would unify types too; a
            # layout whose column mixes int64 and string pages would
            # only fail at decode time, after the append committed).
            # Arrow's cast raises loudly in the map tasks — before any
            # partition file is written — when values can't convert.
            fields = [pa.field(f.name, existing_types.get(f.name, f.type))
                      for f in plan.unified_schema]
            fields += [pa.field(c, existing_types[c]) for c in missing]
            plan = dataclasses.replace(
                plan,
                target_columns=list(plan.target_columns) + missing,
                unified_schema=pa.schema(fields))
            columns = list(plan.target_columns)
            if plan.add_filename:
                columns += ["filepath", "filename"]
            enc_cols = [c for c in columns
                        if c not in ("part_key", "filepath", "filename")]
            # pass EVERY appended column as a back-fill candidate — each
            # reduce task skips the ones its own prior files already
            # carry. Deciding "new to the layout" here instead would
            # break re-runs: the layout scan sees the column in the very
            # file the re-run is about to replace, so the replacement
            # would drop the back-fill page (silent row-count divergence)
            for c in enc_cols + prov_cols:
                backfill[c] = pa.string() if c in prov_cols \
                    else plan.unified_schema.field(c).type

    # the layout's persisted clustering applies to appended pages too —
    # a recluster (or encode-time sort_by) would otherwise degrade one
    # append at a time as unsorted increments land. Clustering re-orders
    # rows at the reduce, so map-side precode is off (same rule as the
    # fresh-encode path); sort columns this append lacks (union drift)
    # skip clustering rather than fail — sidecars are invalidated either
    # way and the rows stay decodable.
    sort_by = cfg.get("sort_by")
    if sort_by is not None:
        sort_cols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        if all(c in enc_cols for c in sort_cols):
            precode = False
        else:
            log.send_log(f"encode_append: persisted sort_by={sort_cols} "
                         "references columns absent from this append — "
                         "new pages land unclustered")
            sort_by = None

    # precode works for appends too: heavy plain-family columns compress
    # ONCE on the map side exactly as in encode_partitioned_tasks. The
    # append base page (global max over ALL existing pages + 1) upper-
    # bounds every column's own numbering, so per-column heavy page ids
    # never collide with prior pages either. The map is decided once on
    # the driver (sampled from THIS append's first file, after any union
    # plan extension) — the reduce's divergence check applies per run;
    # across runs a column may legally switch heavy/light (decode
    # assembles columns independently, any codec mix).
    precode_map = plan_precode_columns(source_paths, plan, enc_cols,
                                       dialect) if precode else {}
    groups = _group_files(source_paths, map_bytes)
    log.send_log(f"encode_append: {len(groups)} map task(s) → "
                 f"{num_partitions} partitions (existing layout) → {out_dir}"
                 + (f"; precoded columns: {sorted(precode_map)}"
                    if precode_map else ""))
    if num_partitions == 1:
        map_fn = ray.remote(num_cpus=1)(_map_pack_single)
    else:
        map_fn = ray.remote(num_returns=num_partitions,
                            num_cpus=1)(_map_pack_files)
    enc_fn = ray.remote(num_cpus=1)(_encode_part_task)
    map_refs = [map_fn.remote(g, plan, num_partitions, url_col, hot_hosts,
                              host_map, frozenset(), dialect, precode_map,
                              warc_extract)
                for g in groups]
    if num_partitions == 1:
        map_refs = [[r] for r in map_refs]
    import hashlib
    # FULL paths, not basenames: daily increments routinely share file
    # names across directories (/data/<date>/batch.parquet) and a
    # basename tag would make day 2 silently REPLACE day 1's append.
    # abspath keeps the tag stable across cwd differences, preserving
    # retry/re-run idempotency for the same file set.
    tag = hashlib.sha1("\n".join(
        os.path.abspath(p) for p in source_paths).encode()).hexdigest()[:12]
    enc_refs = [enc_fn.remote(pk, out_dir, enc_cols, prov_cols, page_rows,
                              has_prov, None, *[m[pk] for m in map_refs],
                              append=True, file_tag=tag,
                              backfill=backfill or None,
                              sort_by=sort_by)
                for pk in range(num_partitions)]
    ray.get(enc_refs)
    summary = _finalize_manifest(out_dir, enc_cols, snapshot_op="append")
    log.send_log(f"encode_append done: {summary['rows']} rows total, "
                 f"{summary['encoded_bytes']}/{summary['raw_bytes']} bytes")
    return summary


#: default cap on in-flight driver object refs for one task-exchange job
#: (M map tasks × P partitions). 250k refs ≈ tens of MB of driver state —
#: comfortably below Ray's practical limits while letting a single shard
#: cover ~1000 map tasks at 256 partitions.
DEFAULT_MAX_REFS = 250_000


def _shard_ledger_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest", "shards.json")


def _load_shard_ledger(out_dir: str) -> list[dict]:
    p = _shard_ledger_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f).get("shards", [])
    return []


def _append_shard_ledger(out_dir: str, entry: dict) -> None:
    p = _shard_ledger_path(out_dir)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    shards = _load_shard_ledger(out_dir)
    shards = [s for s in shards if s["idx"] != entry["idx"]] + [entry]
    shards.sort(key=lambda s: s["idx"])
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"shards": shards}, f)
    os.replace(tmp, p)


def encode_sharded(source_paths: list[str], out_dir: str, *,
                   max_refs: int = DEFAULT_MAX_REFS,
                   columns_select: list[str] | None = None,
                   columns_rename: dict[str, str] | None = None,
                   add_filename: bool = True,
                   url_col: str = "url",
                   num_partitions: int | None = None,
                   page_rows: int = DEFAULT_PAGE_ROWS,
                   resume: bool = False,
                   hot_hosts: dict[str, int] | None = None,
                   host_map: dict[str, list[int]] | None = None,
                   host_counts: dict[str, int] | None = None,
                   map_bytes: int = TARGET_MAP_BYTES,
                   precode: bool = True,
                   zone_columns: list[str] | None = None,
                   logger=None,
                   warc_extract_text: tuple[bytes, bytes] | None
                   = None) -> dict:
    """Arbitrarily-large encode: the auto-sharding orchestrator over
    :func:`encode_partitioned_tasks`. That path tracks one driver object
    ref per (map task × partition); this wrapper bounds the in-flight ref
    count by splitting the input file list into shards of at most
    ``max_refs // num_partitions`` map tasks each, encoding shard 1 with
    the task exchange and every later shard with :func:`encode_append`
    (same persisted routing, exactly-once per-shard output tags), so one
    job can ingest an unbounded corpus with bounded driver state.

    Equivalence: routing (align plan, host_map, num_partitions) is decided
    ONCE over the FULL file list before sharding, so every row lands in
    the same partition a single-job encode would put it in, and the
    decoded table is row-identical to a single-job union encode (appends
    align drifted shards to the layout's stored types exactly as a global
    union plan would). Pages arrive shard-by-shard instead of in one map
    order — decode output ORDER within a partition may differ, content
    does not.

    Resume: a shard ledger (``_manifest/shards.json``) records completed
    shards; with ``resume=True`` finished shards are skipped, a crashed
    shard 1 resumes per-partition, and a crashed append shard re-runs
    idempotently (its file-set tag replaces its own partial output). The
    ledger pins each shard's file-list digest — resuming with a changed
    input list fails loudly instead of mixing layouts.

    Zone maps: appends invalidate touched partitions' sidecars, so when
    ``zone_columns`` is set and more than one shard ran, sidecars are
    rebuilt once over the final layout (metadata-only scan).

    Reference semantics: d6tstack's whole-directory combine loop
    (combine_csv.py:453-504) — here restartable and ref-bounded."""
    import hashlib

    from .log import get_logger
    from .plan import build_plan
    log = get_logger(logger)

    source_paths = sorted(source_paths)
    is_csv = any(p.endswith((".csv", ".txt", ".tsv")) for p in source_paths)
    is_warc = bool(source_paths) and all(
        p.endswith((".warc", ".warc.gz")) for p in source_paths)
    dialect = None
    if is_warc:
        from .plan import plan_from_schemas
        from .sources.warc import warc_schema
        ws = warc_schema(extract=warc_extract_text is not None)
        plan = plan_from_schemas(source_paths,
                                 {p: ws for p in source_paths},
                                 columns_select=columns_select,
                                 columns_rename=columns_rename,
                                 add_filename=add_filename)
        precode = False
    elif is_csv:
        from .sources.csv import build_csv_plan
        plan, dialect = build_csv_plan(
            source_paths, columns_select=columns_select,
            columns_rename=columns_rename, add_filename=add_filename)
    else:
        plan = build_plan(source_paths, columns_select=columns_select,
                          columns_rename=columns_rename,
                          add_filename=add_filename)
    if num_partitions is None:
        num_partitions = auto_partitions(source_paths=source_paths)
    # routing decided once, over ALL files — shard boundaries must not
    # change which partition a url lands in
    if host_map is None and hot_hosts is None:
        if host_counts is None:
            if _analyze_small(source_paths) and dialect is None \
                    and not is_warc:
                # small parquet inputs: ANALYZE on the driver — the Ray
                # scan+groupby job's fixed cost dwarfs a column-pruned
                # pyarrow read at this size
                host_counts = _host_counts_driver(source_paths, url_col)
            else:
                import ray.data
                if is_warc:
                    from .sources.warc import read_warc
                    url_ds = read_warc(source_paths) \
                        .select_columns([url_col])
                elif dialect is not None:
                    from .sources.csv import read_aligned_csv
                    url_ds = read_aligned_csv(source_paths, plan=plan,
                                              dialect=dialect)
                else:
                    from .io import read_parquet_clean
                    url_ds = read_parquet_clean(source_paths,
                                                columns=[url_col])
                host_counts = collect_host_counts(url_ds, url_col)
        host_map = plan_host_partitions(host_counts, num_partitions)

    groups = _group_files(source_paths, map_bytes)
    max_maps = max(1, max_refs // max(1, num_partitions))
    shard_files = [sum(groups[i:i + max_maps], [])
                   for i in range(0, len(groups), max_maps)]
    tags = [hashlib.sha1("\n".join(
        os.path.abspath(p) for p in fs).encode()).hexdigest()[:12]
        for fs in shard_files]

    done_tags: dict[int, str] = {}
    if resume:
        for s in _load_shard_ledger(out_dir):
            done_tags[s["idx"]] = s["tag"]
        for idx, tag in done_tags.items():
            if idx >= len(tags) or tags[idx] != tag:
                # idx >= len(tags): the input list SHRANK — the layout
                # still holds the removed shards' rows; fail loudly
                raise ValueError(
                    f"encode_sharded resume: shard {idx}'s file list "
                    "changed since the ledger entry was written — "
                    "re-run without resume to re-encode from scratch")
    log.send_log(f"encode_sharded: {len(source_paths)} file(s) → "
                 f"{len(shard_files)} shard(s) × ≤{max_maps} map task(s) "
                 f"→ {num_partitions} partitions → {out_dir}")

    summary: dict = {}
    for idx, files in enumerate(shard_files):
        if done_tags.get(idx) == tags[idx]:
            continue
        if idx == 0:
            summary = encode_partitioned_tasks(
                files, out_dir, add_filename=add_filename,
                url_col=url_col, num_partitions=num_partitions,
                page_rows=page_rows, resume=resume,
                hot_hosts=hot_hosts, host_map=host_map,
                plan=plan, dialect=dialect, logger=logger,
                map_bytes=map_bytes, precode=precode,
                zone_columns=zone_columns,
                warc_extract_text=warc_extract_text)
        else:
            summary = encode_append(
                files, out_dir, columns_select=columns_select,
                columns_rename=columns_rename, add_filename=add_filename,
                schema="union", precode=precode, page_rows=page_rows,
                map_bytes=map_bytes, logger=logger)
        _append_shard_ledger(out_dir, {
            "idx": idx, "tag": tags[idx], "files": len(files),
            "rows": summary.get("rows")})
    if not summary:  # every shard was already in the ledger
        summary = mf.manifest_summary(out_dir)
    if len(shard_files) > 1:
        # shards 2..N appended → their partitions' sidecars were
        # invalidated; one decode pass restores min/max pruning AND the
        # key-column blooms lookup_rows prunes pages with
        from .zones import build_zone_maps
        build_zone_maps(out_dir, zone_columns or [],
                        bloom_columns=[url_col])
    summary["shards"] = len(shard_files)
    return summary


_DRIVER_MANIFEST_MAX_FILES = 512


def _finalize_manifest(out_dir: str, enc_cols: list[str],
                       snapshot_op: str | None = None) -> dict:
    """Lineage/manifest from a metadata-only read-back of what actually
    landed (pruned — no ``data`` column), reduced to one row per partition;
    only #partitions rows ever reach the driver. Small outputs (≤512 page
    files) read the metadata directly with pyarrow on the driver — the Ray
    fan-out costs more than the read at that size; big outputs keep the
    distributed aggregation. ``snapshot_op`` additionally commits the
    resulting live file set to the snapshot log (:mod:`raystack.snapshots`)
    labeled with the mutating operation's name — every layout-mutating
    entry point passes it, making the layout time-travelable."""
    import glob as _glob
    import json

    import ray.data
    from pandas import DataFrame as pd_DataFrame

    meta_cols = ["part_key", "page_idx", "column", "codec", "nrows",
                 "raw_bytes", "enc_bytes", "checksum", "input_files",
                 "encode_ms"]
    page_files = _glob.glob(os.path.join(out_dir, "pages", "**", "*.parquet"),
                            recursive=True)
    small = len(page_files) <= _DRIVER_MANIFEST_MAX_FILES
    if small:
        import pyarrow.dataset as _pads
        meta_pdf = _pads.dataset(os.path.join(out_dir, "pages"),
                                 partitioning="hive") \
            .to_table(columns=meta_cols).to_pandas()
    else:
        meta_ds = ray.data.read_parquet(os.path.join(out_dir, "pages"),
                                        columns=meta_cols)

    def summarize(g):  # pandas group → one manifest row
        # codecs/input_files from each column's first REAL page: union
        # schema-drift back-fill pages sit at page_idx=-1 with codec
        # "nulls" and would otherwise mask the data codecs
        ranked = g.assign(_nul=g["codec"].eq("nulls")) \
            .sort_values(["_nul", "page_idx"])
        first = ranked.drop_duplicates("column")
        return pd_DataFrame([{
            "part_key": int(g["part_key"].iloc[0]),
            "rows": int(g[g["column"] == enc_cols[0]]["nrows"].sum()),
            "raw_bytes": int(g["raw_bytes"].sum()),
            "encoded_bytes": int(g["enc_bytes"].sum()),
            "pages": int(g["page_idx"].nunique()),
            "codecs": json.dumps(dict(zip(first["column"], first["codec"]))),
            "checksum": int(np.bitwise_xor.reduce(
                g["checksum"].to_numpy().astype(np.uint32))),
            # UNION of every page's lineage: append pages carry their own
            # day's files — the first page alone loses them
            "input_files": json.dumps(sorted({
                f for v in g["input_files"].unique() if v
                for f in json.loads(v)})),
            "encode_ms": int(g.drop_duplicates(["page_idx"])["encode_ms"].sum()),
        }])

    if small:
        import pandas as _pd
        summary = _pd.concat([summarize(g) for _, g in
                              meta_pdf.groupby("part_key")],
                             ignore_index=True) if len(meta_pdf) else \
            pd_DataFrame(columns=["part_key"])
    else:
        summary = meta_ds.groupby("part_key").map_groups(
            summarize, batch_format="pandas").to_pandas()
    rows = {}
    for r in summary.itertuples(index=False):
        rows[str(int(r.part_key))] = {
            "rows": int(r.rows), "raw_bytes": int(r.raw_bytes),
            "encoded_bytes": int(r.encoded_bytes), "pages": int(r.pages),
            "codecs": json.loads(r.codecs), "checksum": int(r.checksum),
            "input_files": json.loads(r.input_files) if r.input_files else [],
            "encode_ms": int(getattr(r, "encode_ms", 0)),
        }
    mf.update_manifest(out_dir, rows)
    if snapshot_op is not None:
        from .snapshots import commit_snapshot
        commit_snapshot(out_dir, snapshot_op)
    return mf.manifest_summary(out_dir)


#: per-worker-process codec-choice cache for the stateless streaming tasks
_SPLIT_CODEC_CACHE: dict = {}


class SplitEncoder:
    """Per-batch segment encoder for :func:`encode_streaming`: sort each batch by
    ``part_key`` (cheap in-batch sort), slice per-key segments, encode each
    segment into pages whose ids derive from content (62-bit hash of first/
    last key value + row count) — deterministic under task retries, unique
    per (partition, page) with ~2^-62 collision odds."""

    def __init__(self, enc_cols: list[str], prov_cols: list[str],
                 page_rows: int, has_prov: bool):
        self.enc_cols = enc_cols
        self.prov_cols = prov_cols
        self.page_rows = page_rows
        self.has_prov = has_prov
        # actor state: codec choice per column, decided on the first (and
        # largest-sample) segment seen, reused for every later segment —
        # selection cost is paid once per actor, not once per tiny segment
        self.codec_cache: dict[str, str] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json
        if batch.num_rows == 0:
            # a resume filter can drop every row of a block; the per-segment
            # loop below would IndexError on keys[0]/seg[col][0]
            return pa.table({n: [] for n in PAGES_SCHEMA.names},
                            schema=PAGES_SCHEMA)
        keys = np.asarray(batch["part_key"])
        order = np.argsort(keys, kind="stable")
        tbl = batch.take(pa.array(order))
        keys = keys[order]
        bounds = np.concatenate([[0], np.flatnonzero(np.diff(keys)) + 1,
                                 [len(keys)]])
        out = []
        cols = self.enc_cols + self.prov_cols
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            seg = tbl.slice(int(lo), int(hi - lo))
            pk = int(keys[lo])
            base = ((_ident_crc(seg[self.enc_cols[0]][0].as_py()) << 31)
                    ^ (_ident_crc(seg[self.enc_cols[0]][-1].as_py()) << 1)
                    ^ seg.num_rows) & ((1 << 62) - 1)
            files = ""
            if self.has_prov:
                files = json.dumps(sorted(set(seg["filename"].to_pylist())))
            out.append(_encode_table(seg, pk, cols, self.page_rows,
                                     first_page_idx=base, input_files=files,
                                     codec_cache=self.codec_cache))
        return pa.concat_tables(out)


def encode_streaming(ds, out_dir: str, columns: list[str] | None = None,
                     url_col: str = "url", num_partitions: int | None = None,
                     page_rows: int = DEFAULT_PAGE_ROWS,
                     resume: bool = False,
                     hot_hosts: dict[str, int] | None = None,
                     source_paths: list[str] | None = None,
                     batch_size: int = 32768,
                     concurrency: int | tuple | None = None,
                     sort_pages: bool = True, logger=None,
                     host_map: dict[str, list[int]] | None = None) -> dict:
    """Throughput-path encode: per-batch per-partition-segment encoding with
    NO row shuffle — the only exchange is an optional sort of the already-
    compressed pages (≈4× less volume than the input) so page files land
    partition-aligned. Trade-off vs :func:`encode_partitioned`: dictionaries
    / FSST tables are per page-segment, not per partition, so columns that
    profit from global co-located dictionary builds may compress slightly
    worse; resume/manifest/decode semantics are identical."""
    schema_names = ds.schema().names
    columns = columns or [c for c in schema_names if c not in ("part_key",)]
    has_prov = "filepath" in schema_names
    if num_partitions is None:
        num_partitions = auto_partitions(ds, source_paths)

    if hot_hosts is None and host_map is None:
        if source_paths:
            import ray.data
            from .io import read_parquet_clean
            url_ds = read_parquet_clean(source_paths, columns=[url_col])
            counts = collect_host_counts(url_ds, url_col)
        else:
            counts = collect_host_counts(ds, url_col)
        host_map = plan_host_partitions(counts, num_partitions)
    keyed = add_partition_key(ds, url_col, num_partitions, hot_hosts,
                              host_map)
    keyed = _apply_resume(keyed, out_dir, resume)
    mf.save_config(out_dir, {"url_col": url_col,
                             "num_partitions": num_partitions,
                             "hot_hosts": hot_hosts,
                             "host_map": host_map})

    enc_cols = [c for c in columns if c not in ("part_key", "filepath", "filename")]
    prov_cols = [c for c in ("filepath", "filename") if c in columns]
    if concurrency is None:
        # stateless tasks by default: they reuse the already-warm worker
        # pool (no per-actor spawn, measured ~2.5x faster than an actor
        # pool here); the codec-choice cache lives in a per-worker-process
        # module global so selection is still amortized across tasks
        def split_task(batch: pa.Table) -> pa.Table:
            enc = SplitEncoder(enc_cols, prov_cols, page_rows, has_prov)
            enc.codec_cache = _SPLIT_CODEC_CACHE
            return enc(batch)

        pages = keyed.map_batches(split_task, batch_format="pyarrow",
                                  batch_size=batch_size)
    else:
        # explicit actor pool (e.g. to hold a shared pre-trained symbol
        # table); leave ≥2 CPUs headroom or the downstream sort starves
        pages = keyed.map_batches(
            SplitEncoder, batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency,
            fn_constructor_kwargs={"enc_cols": enc_cols,
                                   "prov_cols": prov_cols,
                                   "page_rows": page_rows,
                                   "has_prov": has_prov})
    if sort_pages:
        pages = pages.sort("part_key")  # compressed-volume exchange only
    pages.write_parquet(os.path.join(out_dir, "pages"),
                        partition_cols=["part_key"])
    summary = _finalize_manifest(out_dir, enc_cols, snapshot_op="encode")
    from .log import get_logger
    get_logger(logger).send_log(
        f"encode_streaming done: {summary['rows']} rows, "
        f"{summary['encoded_bytes']}/{summary['raw_bytes']} bytes")
    return summary


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode_pages(pages_ds, columns: list[str] | None = None):
    """Encoded-pages Dataset → original-schema Dataset (bit-identical).
    Groups by (part_key, page_idx); each group holds one page per column.
    Column pruning happens BEFORE the grouping shuffle so unwanted pages
    never move. Valid only for uniform page boundaries (one fresh encode);
    layouts with per-column numbering — precoded heavy columns, union
    schema-drift appends — decode with :func:`decode_dir`, which
    assembles columns independently."""
    if columns:
        want = pa.array(sorted(columns))
        pages_ds = pages_ds.map_batches(
            lambda t: t.filter(pc.is_in(t["column"], value_set=want)),
            batch_format="pyarrow")

    def decode_group(group: pa.Table) -> pa.Table:
        cols, arrays = [], []
        order = {c.as_py(): i for i, c in enumerate(group["column"])}
        for name, i in order.items():
            blob = group["data"][i].as_py()
            chunk = EncodedChunk.from_bytes(blob)
            arrays.append(get_codec(chunk.codec).decode(chunk))
            cols.append(name)
        return pa.table(arrays, names=cols)

    return pages_ds.groupby(["part_key", "page_idx"]).map_groups(
        decode_group, batch_format="pyarrow")


#: rows per row group in the pages parquet files (tasks/compact writers):
#: small enough that a (column, page_idx) pushdown filter skips most of a
#: pruned file's bytes, large enough that metadata stays negligible
#: (env-overridable for A/B benchmarking)
PAGES_ROW_GROUP = int(os.environ.get("RAYSTACK_PAGES_ROW_GROUP", "8"))


def _decode_partition_dir(dir_path: str,
                          columns: list[str] | None = None,
                          page_whitelist=None,
                          paths: list[str] | None = None) -> pa.Table:
    """Decode every page group inside one ``part_key=`` directory locally:
    read the partition's page files (pruned to the wanted columns), sort by
    page_idx in-memory, slice each page group, decode. Pure function run
    inside one Ray task; memory is bounded by the partition size the
    encoder targeted (128-512 MB). ``page_whitelist`` (zone-map pruning,
    :mod:`raystack.zones`) restricts decode to the listed page_idx values
    — only valid when every decoded column shares the same page row
    boundaries (the zone builder records that as ``uniform``).
    ``paths`` (time travel, :mod:`raystack.snapshots`) reads the listed
    page files — which may live in ``_history/`` — instead of globbing
    the directory."""
    import pyarrow.dataset as pads
    # push the filters into the scan: with bounded row groups
    # (PAGES_ROW_GROUP) parquet statistics let the reader skip the
    # unwanted pages' blob bytes entirely
    expr = None
    if columns:
        expr = pc.field("column").isin(sorted(columns))
    if page_whitelist is not None:
        pw = pc.field("page_idx").isin(
            [int(p) for p in page_whitelist])
        expr = pw if expr is None else (expr & pw)
    src = pads.dataset(paths) if paths is not None else pads.dataset(dir_path)
    t = src.to_table(
        columns=["page_idx", "column", "data"], filter=expr)
    if t.num_rows == 0:
        return pa.table({})
    # per-COLUMN assembly: decode each column's pages in page_idx order and
    # zip the full columns. Row order per column is the encoder's append
    # order either way; this also supports layouts where page row
    # boundaries differ across columns (the precoded heavy-column path).
    idx = np.asarray(t["page_idx"])
    names = t["column"].to_pylist()
    col_order: list[str] = []
    rows_by_col: dict[str, list[tuple[int, int]]] = {}
    for i, name in enumerate(names):
        if name not in rows_by_col:
            rows_by_col[name] = []
            col_order.append(name)
        rows_by_col[name].append((int(idx[i]), i))
    arrays, out_names = [], []
    data_col = t["data"]
    n_rows = None
    for name in col_order:
        pages = sorted(rows_by_col[name])
        chunks = []
        for _, i in pages:
            chunk = EncodedChunk.from_bytes(data_col[i].as_py())
            chunks.append(get_codec(chunk.codec).decode(chunk))
        arr = pa.chunked_array(chunks) if len(chunks) > 1 else chunks[0]
        if n_rows is None:
            n_rows = len(arr)
        elif len(arr) != n_rows:
            raise ValueError(f"{dir_path}: column {name!r} decoded "
                             f"{len(arr)} rows, expected {n_rows}")
        arrays.append(arr)
        out_names.append(name)
    return pa.table(arrays, names=out_names)


def _decode_partition_stream(dir_path: str,
                             columns: list[str] | None = None,
                             paths: list[str] | None = None,
                             page_whitelist=None):
    """Generator variant of :func:`_decode_partition_dir` for the
    streaming executor: when the partition's page boundaries are UNIFORM
    (every page_idx carries every column once, equal row counts — one
    fresh encode), yield one decoded table PER PAGE GROUP in page_idx
    order, so a 128–512 MB partition flows through Ray as page-sized
    blocks with backpressure instead of materializing as a single block.
    Non-uniform layouts (map-side precoded heavy columns, union
    schema-drift back-fill pages) fall back to yielding the one
    whole-partition table — identical rows either way (pages concatenate
    in page_idx order in both paths)."""
    import pyarrow.dataset as pads
    expr = None
    if columns:
        expr = pc.field("column").isin(sorted(columns))
    if page_whitelist is not None:
        pw = pc.field("page_idx").isin([int(p) for p in page_whitelist])
        expr = pw if expr is None else (expr & pw)
    src = pads.dataset(paths) if paths is not None \
        else pads.dataset(dir_path)
    t = src.to_table(columns=["page_idx", "column", "nrows", "data"],
                     filter=expr)
    if t.num_rows == 0:
        return
    idx = np.asarray(t["page_idx"]).tolist()
    names = t["column"].to_pylist()
    nrows = np.asarray(t["nrows"]).tolist()
    by_page: dict[int, list[int]] = {}
    for i, p in enumerate(idx):
        by_page.setdefault(int(p), []).append(i)
    all_cols = sorted(set(names))
    uniform = all(
        sorted(names[i] for i in ii) == all_cols
        and len({int(nrows[i]) for i in ii}) == 1
        for ii in by_page.values())
    if not uniform:
        full = _decode_partition_dir(dir_path, columns, paths=paths,
                                     page_whitelist=page_whitelist)
        if full.num_rows:
            yield full
        return
    col_order = list(dict.fromkeys(names))  # first-appearance order,
    # identical across page groups → every yielded block shares a schema
    data_col = t["data"]
    for p in sorted(by_page):
        per = {names[i]: i for i in by_page[p]}
        arrays = []
        for name in col_order:
            chunk = EncodedChunk.from_bytes(data_col[per[name]].as_py())
            arrays.append(get_codec(chunk.codec).decode(chunk))
        yield pa.table(arrays, names=col_order)


def decode_dir(out_dir: str, columns: list[str] | None = None,
               snapshot: int | None = None):
    """Partition-local decode of an encoded layout on disk: one task per
    ``part_key=`` directory, each decoding its own page groups — NO
    all-to-all (a page group never spans part_key directories, by
    construction of both encode paths). This replaces the global
    groupby(part_key, page_idx) shuffle :func:`decode_pages` needs for
    in-memory pages datasets; at 100 TB the decode plan is a pure task
    fan-out with parallelism = num_partitions, and within each task the
    decode STREAMS — uniform partitions yield page-group-sized blocks
    (:func:`_decode_partition_stream`), so block size is bounded by the
    encoder's page_rows, not the partition size.

    ``snapshot`` time-travels: the decode reads exactly the page files
    the snapshot log (:mod:`raystack.snapshots`) recorded as live at
    that snapshot id, resolving files later rewrites retired into
    ``_history/``. The plan shape is identical — the snapshot only
    changes WHICH files each partition task opens."""
    import ray.data
    pages_root = os.path.join(out_dir, "pages")
    if snapshot is not None:
        from .snapshots import resolve_snapshot_paths
        per_dir = resolve_snapshot_paths(out_dir, snapshot)
        items = [{"dir": d, "paths": paths}
                 for d, paths in sorted(per_dir.items())]
        if not items:
            raise FileNotFoundError(
                f"snapshot {snapshot} of {out_dir} lists no partitions")
    else:
        dirs = sorted(d for d in os.listdir(pages_root)
                      if d.startswith("part_key="))
        if not dirs:
            raise FileNotFoundError(f"no part_key= dirs under {pages_root}")
        items = [{"dir": d} for d in dirs]

    def decode_one(batch: dict):
        path_lists = batch.get("paths")
        empty = True
        for i, d in enumerate(batch["dir"]):
            paths = list(path_lists[i]) if path_lists is not None else None
            for piece in _decode_partition_stream(
                    os.path.join(pages_root, str(d)), columns,
                    paths=paths):
                if piece.num_rows:
                    empty = False
                    yield piece
        if empty:
            yield pa.table({})

    return ray.data.from_items(items) \
        .map_batches(decode_one, batch_size=1, batch_format="numpy")


def verify_encoded(out_dir: str) -> dict:
    """Checksum audit: recompute each stored page's CRC and XOR-combine per
    partition against the manifest (metadata + data read, no decode).
    Returns {'ok': [...part_keys], 'bad': [...part_keys], 'missing': [...]}."""
    import ray.data

    pages = ray.data.read_parquet(os.path.join(out_dir, "pages"),
                                  columns=["part_key", "checksum", "data"])

    def chk(t: pa.Table):
        """Per-batch partial reduce: page-level CRCs fold into per-partition
        XORs + mismatch counts INSIDE the task, so the driver receives
        O(#partitions × #blocks) tiny rows, never one row per page."""
        import pandas as pd
        actual = np.array([_crc(d.as_py()) for d in t["data"]],
                          dtype=np.int64)  # C-speed crc per page blob
        df = pd.DataFrame({"part_key": np.asarray(t["part_key"]),
                           "stored": np.asarray(t["checksum"]),
                           "actual": actual})
        xor = lambda s: int(np.bitwise_xor.reduce(  # noqa: E731
            s.to_numpy().astype(np.uint32)))
        g = df.groupby("part_key")
        return pd.DataFrame({
            "stored": g["stored"].apply(xor),
            "actual": g["actual"].apply(xor),
            "mismatches": (df["stored"] != df["actual"])
            .groupby(df["part_key"]).sum(),
        }).reset_index()

    partials = pages.map_batches(chk, batch_format="pyarrow").to_pandas()
    agg = partials.groupby("part_key").agg(
        stored=("stored", lambda s: int(np.bitwise_xor.reduce(
            s.to_numpy().astype(np.uint32)))),
        actual=("actual", lambda s: int(np.bitwise_xor.reduce(
            s.to_numpy().astype(np.uint32)))),
        mismatches=("mismatches", "sum"))
    manifest = mf.load_manifest(out_dir)
    ok, bad = [], []
    for pk, row in agg.iterrows():
        m = manifest.get(str(int(pk)))
        if (row["mismatches"] == 0 and m is not None
                and m["checksum"] == row["actual"]):
            ok.append(int(pk))
        else:
            bad.append(int(pk))
    missing = [int(k) for k in manifest if int(k) not in set(ok) | set(bad)]
    return {"ok": sorted(ok), "bad": sorted(bad), "missing": sorted(missing)}


def read_encoded(out_dir: str):
    import ray.data
    return ray.data.read_parquet(os.path.join(out_dir, "pages"))


def scan(out_dir: str, columns: list[str] | None = None,
         where: dict | None = None, keys: list | None = None,
         snapshot: int | None = None, limit: int | None = None):
    """One read entry point over an encoded layout, routing to the most
    pruned decode the request allows:

    - ``keys=[...]`` → :func:`lookup_rows` (partition routing + per-page
      key blooms: ~1 page per column per hit);
    - ``where={col: (lo, hi) | {"in": [...]}, ...}`` → zone-pruned exact
      filtered decode (:func:`raystack.zones.decode_dir_where`; ranges
      prune on page min/max, memberships on value-in-[zmin, zmax]);
    - otherwise → partition-local :func:`decode_dir`
      (``snapshot=`` time-travels through the snapshot log).

    ``limit`` applies last (Ray's streaming limit — upstream tasks stop
    early). ``keys`` composes with neither ``where`` nor ``snapshot``
    (point lookups route through the LIVE layout's blooms); combining
    raises rather than silently ignoring a clause."""
    if keys is not None:
        if where is not None or snapshot is not None:
            raise ValueError("keys= routes through the live layout's "
                             "blooms — it composes with neither where= "
                             "nor snapshot=")
        out = lookup_rows(out_dir, keys, columns=columns)
    elif where is not None:
        if snapshot is not None:
            raise ValueError("where= reads the live zone sidecars — "
                             "decode_dir(snapshot=) then filter for "
                             "historical states")
        from .zones import decode_dir_where
        out = decode_dir_where(out_dir, where, columns=columns)
    else:
        out = decode_dir(out_dir, columns=columns, snapshot=snapshot)
    return out.limit(limit) if limit is not None else out


def _lookup_partition_dir(part_dir: str, zones_dir: str, url_col: str,
                          hashes: np.ndarray,
                          columns: list[str] | None) -> pa.Table | None:
    """Point-lookup decode of ONE partition: probe the key column's
    per-page blooms (:func:`raystack.zones.bloom_prune_key_pages`), map
    surviving pages to ROW RANGES via the key column's nrows cumsum, then
    decode only the pages of each wanted column overlapping those ranges
    and slice — sound even when other columns use different page
    boundaries (precoded heavy columns). Falls back to a full partition
    decode whenever pruning is unavailable or the sidecar's key pages
    don't EXACTLY match the pages on disk (post-append, stale) — never
    wrong, at worst unpruned. Bloom false positives only cost extra
    decoded pages (the caller's exact filter drops their rows); returns
    None on a proven miss (no page can hold any queried key)."""
    import functools
    import operator

    import pyarrow.dataset as pads

    from .zones import bloom_prune_key_pages

    probe = bloom_prune_key_pages(zones_dir, url_col, hashes)
    if probe is None:
        return _decode_partition_dir(part_dir, columns)
    # page metadata actually on disk — cheap: three tiny columns, the
    # data blobs' bytes are never touched
    expr = None
    if columns:
        expr = pc.field("column").isin(sorted({url_col, *columns}))
    meta = pads.dataset(part_dir).to_table(
        columns=["page_idx", "column", "nrows"], filter=expr)
    names = meta["column"].to_pylist()
    idxs = np.asarray(meta["page_idx"])
    nrows_all = np.asarray(meta["nrows"])
    key_actual = sorted((int(idxs[i]), int(nrows_all[i]))
                        for i, nm in enumerate(names) if nm == url_col)
    if [(p, n) for p, n, _ in probe] != key_actual:
        # soundness gate: a key page the sidecar doesn't describe could
        # hold a match — decode everything instead
        return _decode_partition_dir(part_dir, columns)
    ranges: list[tuple[int, int]] = []
    row = 0
    for _, n, keep in probe:
        if keep:
            ranges.append((row, row + n))
        row += n
    if not ranges:
        return None  # every page provably lacks all queried keys
    total_rows = row
    # per-column page selection: each column's own pages concatenate in
    # page_idx order; keep those overlapping any surviving row range
    per_col: dict[str, list[tuple[int, int]]] = {}
    order: list[str] = []
    for i, nm in enumerate(names):
        if nm not in per_col:
            per_col[nm] = []
            order.append(nm)
        per_col[nm].append((int(idxs[i]), int(nrows_all[i])))
    col_pages: dict[str, list[tuple[int, int]]] = {}  # col → (page, start)
    keep_exprs = []
    for nm in order:
        start = 0
        keep_pages = []
        for p, n in sorted(per_col[nm]):
            end = start + n
            if any(s < end and start < e for s, e in ranges):
                keep_pages.append((p, start))
            start = end
        if start != total_rows:
            # a column whose total row count disagrees with the key's —
            # unexpected layout state; stay correct via the full decode
            return _decode_partition_dir(part_dir, columns)
        col_pages[nm] = keep_pages
        keep_exprs.append((pc.field("column") == nm)
                          & pc.field("page_idx").isin(
                              [p for p, _ in keep_pages]))
    data_t = pads.dataset(part_dir).to_table(
        columns=["page_idx", "column", "data"],
        filter=functools.reduce(operator.or_, keep_exprs))
    dnames = data_t["column"].to_pylist()
    didx = np.asarray(data_t["page_idx"])
    blob_at = {(nm, int(didx[i])): i for i, nm in enumerate(dnames)}
    arrays = []
    for nm in order:
        pieces = []
        for p, start in col_pages[nm]:
            chunk = EncodedChunk.from_bytes(
                data_t["data"][blob_at[(nm, p)]].as_py())
            arr = get_codec(chunk.codec).decode(chunk)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            # ascending (page, range) slicing keeps global row order —
            # identical across columns, so the zip below aligns rows
            for s, e in ranges:
                lo, hi = max(s, start), min(e, start + len(arr))
                if lo < hi:
                    pieces.append(arr.slice(lo - start, hi - lo))
        arrays.append(pa.chunked_array(pieces))
    return pa.table(arrays, names=order)


def lookup_rows(out_dir: str, values: list[str],
                columns: list[str] | None = None):
    """Point lookup over the encoded layout: route each query value through
    the SAME partition-key math the encoder used (config persisted in the
    manifest dir), read ONLY those partitions' page files, bloom-prune to
    the pages that might hold a queried key, decode, filter. Touches
    hash(|values|) partitions — and within each, ~1 page per column per
    hit instead of the whole partition — the random-access payoff of the
    partitioned layout plus the key-column bloom sidecars."""
    import ray.data

    from .zones import ZONES_DIRNAME, bloom_hashes

    cfg = mf.load_config(out_dir)
    if not cfg:
        raise FileNotFoundError(f"no partitioning config under {out_dir}")
    url_col = cfg["url_col"]
    vals = pa.array(values, type=pa.string())
    keys = np.unique(compute_part_keys(
        vals, cfg["num_partitions"],
        cfg.get("hot_hosts") or {}, cfg.get("host_map")))
    dirs = [os.path.join(out_dir, "pages", f"part_key={int(k)}")
            for k in keys]
    dirs = [d for d in dirs if os.path.isdir(d)]
    if not dirs:
        return None
    want_cols = columns
    if want_cols is not None and url_col not in want_cols:
        want_cols = [url_col, *want_cols]
    hashes = bloom_hashes(vals)

    # partition-local pruned decode of ONLY the routed dirs — no shuffle,
    # one task per touched partition
    def decode_one(batch: dict) -> pa.Table:
        parts = []
        for d in batch["dir"]:
            zdir = os.path.join(out_dir, ZONES_DIRNAME,
                                os.path.basename(str(d)))
            t = _lookup_partition_dir(str(d), zdir, url_col, hashes,
                                      want_cols)
            if t is not None and t.num_rows:
                parts.append(t)
        return pa.concat_tables(parts, promote_options="default") \
            if parts else pa.table({})

    decoded = ray.data.from_items([{"dir": d} for d in dirs]) \
        .map_batches(decode_one, batch_size=1, batch_format="numpy")

    def exact(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # a fully bloom-pruned partition's block
            return t
        return t.filter(pc.is_in(t[url_col], value_set=vals))

    return decoded.map_batches(exact, batch_format="pyarrow")


def lookup_join(out_dir: str, keys_ds, key_col: str | None = None,
                columns: list[str] | None = None):
    """Distributed bulk point lookup (index fetch): route a whole Dataset
    of keys through the layout's persisted partition-key math, shuffle
    ONLY the keys (a ``groupby(part_key)`` whose bytes are the key column,
    never the pages), then ONE task per TOUCHED partition decodes it
    bloom-pruned against that group's key set and returns the rows whose
    ``url_col`` value is in the set. Untouched partitions are never
    opened; within a touched one the per-page key blooms cut decode to
    the pages that might hold a queried key. Duplicate keys don't
    duplicate output (every stored matching row returns exactly once).
    This is :func:`lookup_rows` at Dataset scale — use it when the key
    set is itself too big to sit on the driver (joining a 100 TB layout
    against a billion-row key table moves only the keys)."""
    from .zones import ZONES_DIRNAME, bloom_hashes

    cfg = mf.load_config(out_dir)
    if not cfg:
        raise FileNotFoundError(f"no partitioning config under {out_dir}")
    url_col = cfg["url_col"]
    kc = key_col or url_col
    num_partitions = cfg["num_partitions"]
    hot = cfg.get("hot_hosts") or {}
    hmap = cfg.get("host_map")
    want_cols = columns
    if want_cols is not None and url_col not in want_cols:
        want_cols = [url_col, *want_cols]
    pages_root = os.path.join(out_dir, "pages")
    zones_root = os.path.join(out_dir, ZONES_DIRNAME)

    def key_batch(t: pa.Table) -> pa.Table:
        vals = t[kc].combine_chunks().cast(pa.string())
        pk = compute_part_keys(vals, num_partitions, hot, hmap)
        return pa.table({"__k": vals,
                         "part_key": pa.array(pk, type=pa.int64())})

    def fetch_group(g: pa.Table) -> pa.Table:
        pk = int(g["part_key"][0].as_py())
        part_dir = os.path.join(pages_root, f"part_key={pk}")
        if not os.path.isdir(part_dir):
            return pa.table({})
        keys = pc.unique(g["__k"].combine_chunks())
        t = _lookup_partition_dir(
            part_dir, os.path.join(zones_root, f"part_key={pk}"),
            url_col, bloom_hashes(keys), want_cols)
        if t is None or t.num_rows == 0:
            return pa.table({})
        return t.filter(pc.is_in(t[url_col], value_set=keys))

    return keys_ds.map_batches(key_batch, batch_format="pyarrow") \
        .groupby("part_key") \
        .map_groups(fetch_group, batch_format="pyarrow")


def layout_stats(out_dir: str) -> dict:
    """Operator-facing health summary of an encoded layout
    (``run_encode.py --stats``): manifest totals + compression ratio,
    per-column codec mix across partitions (a column split across many
    codecs hints at value drift), files per partition (append
    accumulation — the compaction signal), and zone-sidecar coverage.
    Driver-side METADATA only: manifest json + directory listings; never
    opens a page file."""
    from .zones import ZONES_DIRNAME
    m = mf.load_manifest(out_dir)
    summary = mf.manifest_summary(out_dir)
    codec_mix: dict[str, dict[str, int]] = {}
    for row in m.values():
        for col, codec in row.get("codecs", {}).items():
            codec_mix.setdefault(col, {})
            codec_mix[col][codec] = codec_mix[col].get(codec, 0) + 1
    pages_root = os.path.join(out_dir, "pages")
    files_per_part = {
        d: sum(f.endswith(".parquet")
               for f in os.listdir(os.path.join(pages_root, d)))
        for d in sorted(os.listdir(pages_root))
        if d.startswith("part_key=")} if os.path.isdir(pages_root) else {}
    zones_root = os.path.join(out_dir, ZONES_DIRNAME)
    zoned = sum(
        os.path.exists(os.path.join(zones_root, d, "meta.json"))
        for d in os.listdir(zones_root)) if os.path.isdir(zones_root) else 0
    summary.update({
        "config": mf.load_config(out_dir),
        "compression": round(summary["encoded_bytes"]
                             / max(1, summary["raw_bytes"]), 4),
        "codec_mix": codec_mix,
        "page_files": sum(files_per_part.values()),
        "multi_file_partitions": sum(v > 1 for v in files_per_part.values()),
        "max_files_per_partition": max(files_per_part.values(), default=0),
        "zone_sidecars": int(zoned),
    })
    from .snapshots import list_snapshots
    snaps = list_snapshots(out_dir)
    summary["snapshots"] = [{"id": s["id"], "op": s["op"], "rows": s["rows"]}
                            for s in snaps]
    summary["current_snapshot"] = snaps[-1]["id"] if snaps else None
    return summary


@_mutates_layout
def alter_layout(out_dir: str, drop: list[str] | None = None,
                 rename: dict[str, str] | None = None,
                 logger=None) -> dict:
    """ALTER-TABLE-style maintenance on an encoded layout WITHOUT
    re-encoding: ``drop`` removes columns (their page rows are filtered
    out of each partition file), ``rename`` relabels them (the pages'
    ``column`` field and the zone sidecar file move; the page BLOBS are
    untouched — a rename of a 100 TB column costs one metadata rewrite
    per partition file, not an encode). One Ray task per partition;
    sidecars of dropped columns are deleted, everything else is
    preserved; the manifest is re-finalized. Fails loudly if a rename
    target already exists or a named column is absent from the layout."""
    import ray

    from .log import get_logger
    drop = list(drop or [])
    rename = dict(rename or {})
    log = get_logger(logger)
    if not drop and not rename:
        return mf.manifest_summary(out_dir)
    existing = set(_layout_column_types(out_dir))
    missing = [c for c in drop + list(rename) if c not in existing]
    if missing:
        raise ValueError(f"alter_layout: column(s) {missing} not in layout "
                         f"{sorted(existing)}")
    clobber = [n for n in rename.values()
               if n in existing - set(rename) - set(drop)]
    if clobber:
        raise ValueError(f"alter_layout: rename target(s) {clobber} "
                         "already exist")
    overlap = set(drop) & set(rename)
    if overlap:
        raise ValueError(f"alter_layout: {sorted(overlap)} both dropped "
                         "and renamed")
    if len(set(rename.values())) != len(rename):
        raise ValueError("alter_layout: two renames share a target")
    # the routing key column backs lookup_rows/append: it may be renamed
    # (the persisted config follows) but never dropped
    cfg = mf.load_config(out_dir)
    url_col = cfg.get("url_col") if cfg else None
    if url_col in drop:
        raise ValueError(f"alter_layout: {url_col!r} is the layout's "
                         "routing key; it cannot be dropped")
    pages_root = os.path.join(out_dir, "pages")
    dirs = sorted(d for d in os.listdir(pages_root)
                  if d.startswith("part_key="))
    from .snapshots import retirement_gen
    gen = retirement_gen(out_dir)

    @ray.remote(num_cpus=1)
    def one(d: str) -> int:
        import pyarrow.parquet as _pq

        from .snapshots import retire_file
        from .zones import ZONES_DIRNAME
        part_dir = os.path.join(pages_root, d)
        zdir = os.path.join(out_dir, ZONES_DIRNAME, d)
        for f in sorted(os.listdir(part_dir)):
            if not f.endswith(".parquet"):
                continue
            path = os.path.join(part_dir, f)
            t = _pq.read_table(path)
            names = t["column"]
            if drop:
                t = t.filter(pc.invert(pc.is_in(
                    names, value_set=pa.array(sorted(drop)))))
                names = t["column"]
            if rename:
                arr = names.to_pylist()
                new = pa.array([rename.get(c, c) for c in arr],
                               type=pa.string())
                t = t.set_column(t.schema.get_field_index("column"),
                                 "column", new)
            # generation-suffixed new name + retirement of the original:
            # the pre-alter snapshot stays decodable (time travel). Order
            # = write tmp (dot-prefixed, invisible) → retire old →
            # install new: a crash between the last two leaves that
            # file's pages MISSING from the live view — decode fails
            # loudly (and the bytes are safe in history) — rather than
            # duplicated, which would corrupt silently
            new_name = f"{f[:-len('.parquet')]}.a{gen}.parquet"
            tmp = os.path.join(part_dir, f".{new_name}.tmp")
            _pq.write_table(t, tmp, row_group_size=PAGES_ROW_GROUP)
            retire_file(out_dir, gen, d, f)
            os.replace(tmp, os.path.join(part_dir, new_name))
        # zone sidecars: dropped columns' files go away; renamed move.
        # meta.json's column list is rewritten to match
        if os.path.isdir(zdir):
            import json as _json
            meta_p = os.path.join(zdir, "meta.json")
            for c in drop:
                zf = os.path.join(zdir, f"{c}.parquet")
                if os.path.exists(zf):
                    os.remove(zf)
            # two-phase rename: swap/chain renames (a->b, b->a) are legal
            # for the page labels (applied simultaneously per element),
            # so the sidecar moves must not clobber each other either
            staged = []
            for old, new_name in rename.items():
                zf = os.path.join(zdir, f"{old}.parquet")
                if os.path.exists(zf):
                    tmp = os.path.join(zdir, f".pending-{new_name}.parquet")
                    os.replace(zf, tmp)
                    staged.append((tmp, new_name))
            for tmp, new_name in staged:
                os.replace(tmp, os.path.join(zdir,
                                             f"{new_name}.parquet"))
            if os.path.exists(meta_p):
                with open(meta_p) as fh:
                    zm = _json.load(fh)
                zm["columns"] = [rename.get(c, c) for c in zm["columns"]
                                 if c not in drop]
                with open(meta_p, "w") as fh:
                    _json.dump(zm, fh)
        return 1

    ray.get([one.remote(d) for d in dirs])
    if url_col in rename:  # keep lookup_rows/append routing working
        cfg["url_col"] = rename[url_col]
        mf.save_config(out_dir, cfg)
    log.send_log(f"alter_layout: drop={drop} rename={rename} over "
                 f"{len(dirs)} partitions")
    final_cols = sorted((existing - set(drop) - set(rename))
                        | set(rename.values()))
    enc_like = [c for c in final_cols if c not in ("filepath", "filename")]
    return _finalize_manifest(out_dir, enc_like or final_cols,
                              snapshot_op="alter")


@_mutates_layout
def derive_column(out_dir: str, fn, out_col: str, *,
                  input_columns: list[str],
                  page_rows: int = DEFAULT_PAGE_ROWS,
                  logger=None) -> dict:
    """Attach a COMPUTED column to an existing layout without re-encoding
    anything else — the training-data backfill verb (quality scores,
    langid, perplexity: derive once, filter forever). One Ray task per
    partition decodes ONLY ``input_columns``, applies ``fn``
    (``pa.Table -> pa.Array``/``ChunkedArray`` of the same length),
    encodes just the new column's pages into one new page file
    (``part-d<gen>-<out_col>.parquet``, its own page numbering — decode
    assembles columns independently, exactly as with precoded heavy
    columns), and leaves every existing byte untouched. At 100 TB the
    cost is decode(inputs) + encode(one column); the payload columns
    never move. Touched partitions' zone sidecars are invalidated (the
    new column breaks the uniform-page-boundary claim, same as appends);
    the manifest is re-finalized and a ``derive:<col>`` snapshot makes
    the step time-travelable/rollbackable. Fails loudly when ``out_col``
    already exists, an input column is missing, or ``fn`` returns the
    wrong number of rows."""
    import ray

    from .log import get_logger
    from .snapshots import retirement_gen
    log = get_logger(logger)
    existing = _layout_column_types(out_dir)
    if not existing:
        raise FileNotFoundError(f"no encoded layout under {out_dir}")
    # existence is judged against the COMMITTED state (manifest codecs),
    # not the files: a crashed derive leaves partial part-d*-<col> files
    # in some partitions with no finalize — the re-run must heal them,
    # not be refused by them
    manifest = mf.load_manifest(out_dir)
    committed = {c for row in manifest.values()
                 for c in row.get("codecs", {})} or set(existing)
    if out_col in committed:
        raise ValueError(f"derive_column: {out_col!r} already exists — "
                         "alter_layout(drop=...) it first, or pick "
                         "another name")
    missing = [c for c in input_columns if c not in existing]
    if missing:
        raise ValueError(f"derive_column: input column(s) {missing} not "
                         f"in layout {sorted(existing)}")
    pages_root = os.path.join(out_dir, "pages")
    dirs = sorted(d for d in os.listdir(pages_root)
                  if d.startswith("part_key="))
    gen = retirement_gen(out_dir)  # unique generation for the file name

    @ray.remote(num_cpus=1)
    def one(d: str) -> int:
        import pyarrow.parquet as _pq

        import re as _re

        from .zones import invalidate_zone_sidecar
        part_dir = os.path.join(pages_root, d)
        pk = int(d.split("=", 1)[1])
        # heal a crashed attempt: stale derive files of THIS column are
        # orphans (their run never finalized — a successful one would
        # have been refused above), so a re-run replaces them cleanly
        stale = _re.compile(rf"^part-d\d+-{_re.escape(out_col)}\.parquet$")
        for f in os.listdir(part_dir):
            if stale.match(f):
                os.remove(os.path.join(part_dir, f))
        inputs = _decode_partition_dir(part_dir, list(input_columns))
        if inputs.num_rows == 0:
            return 0
        arr = fn(inputs)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if not isinstance(arr, pa.Array):
            arr = pa.array(arr)
        if len(arr) != inputs.num_rows:
            raise ValueError(
                f"derive_column: fn returned {len(arr)} rows for "
                f"partition {pk} with {inputs.num_rows} rows")
        pages = _encode_table(pa.table({out_col: arr}), pk, [out_col],
                              page_rows)
        invalidate_zone_sidecar(out_dir, pk)
        name = f"part-d{gen}-{out_col}.parquet"
        tmp = os.path.join(part_dir, f".{name}.tmp")
        _pq.write_table(pages.drop_columns(["part_key"]), tmp,
                        row_group_size=PAGES_ROW_GROUP)
        os.replace(tmp, os.path.join(part_dir, name))
        return inputs.num_rows

    rows = ray.get([one.remote(d) for d in dirs])
    log.send_log(f"derive_column: {out_col!r} attached over "
                 f"{sum(1 for r in rows if r)} partition(s), "
                 f"{sum(rows)} rows")
    enc_cols = sorted(set(existing) - {"filepath", "filename"}) + [out_col]
    return _finalize_manifest(out_dir, sorted(enc_cols),
                              snapshot_op=f"derive:{out_col}")


def _replay_partition_journal(out_dir: str, part_dir: str,
                              fallback_gen: int) -> None:
    """Finish or discard a crashed partition-rewrite commit (the journal
    protocol of :func:`_commit_partition_rewrite`). The journal records the
    digest and name of the NEW base file: if it matches, the install
    happened → finish retiring the replaced files (into the crashed run's
    generation); if not, nothing was installed → just drop the journal
    (the dot-prefixed tmp is invisible to dataset discovery either way)."""
    import hashlib as _hashlib
    import json as _json

    from .snapshots import retire_file
    journal = os.path.join(part_dir, ".compact-journal.json")
    if not os.path.exists(journal):
        return
    with open(journal) as fh:
        j = _json.load(fh)
    jbase = os.path.join(part_dir, j.get("base", "part-0.parquet"))
    if os.path.exists(jbase) and _hashlib.sha1(
            open(jbase, "rb").read()).hexdigest() == j["digest"]:
        d = os.path.basename(part_dir)
        for f in j.get("retire", j.get("remove", [])):
            retire_file(out_dir, j.get("gen", fallback_gen), d, f)
    os.remove(journal)


def _partition_lineage(part_dir: str) -> str:
    """Union of every page file's ``input_files`` lineage — rewrites must
    carry it forward or resume/audit loses the partition's provenance."""
    import json as _json

    import pyarrow.parquet as _pq
    lineage: set[str] = set()
    for f in os.listdir(part_dir):
        if f.endswith(".parquet"):
            t_if = _pq.read_table(os.path.join(part_dir, f),
                                  columns=["input_files"])
            for v in set(t_if["input_files"].to_pylist()):
                if v:
                    lineage.update(_json.loads(v))
    return _json.dumps(sorted(lineage)) if lineage else ""


def _commit_partition_rewrite(out_dir: str, part_dir: str, pk: int,
                              full: pa.Table, gen: int, page_rows: int,
                              key_col: str | None,
                              zone_columns: list[str] | None,
                              input_files: str = "") -> None:
    """Crash-safe replace of a partition's page files with a fresh encode
    of ``full`` (pages renumbered from 0, codecs re-picked): journal(digest
    + name of new base, files to retire) → install base → retire replaced
    files into ``_history/<gen>/`` (time travel keeps them readable; vacuum
    reclaims) → drop journal → rebuild zone sidecars. The partition's rows
    are reachable at every instant; a crash between install and retirement
    leaves duplicates that :func:`_replay_partition_journal` retires on the
    next maintenance run. Shared by compact_partitions and delete_rows."""
    import hashlib as _hashlib
    import json as _json

    import pyarrow.parquet as _pq

    from .snapshots import retire_file
    from .zones import (ZONES_DIRNAME, invalidate_zone_sidecar,
                        zone_sidecar_from_table)
    d = os.path.basename(part_dir)
    journal = os.path.join(part_dir, ".compact-journal.json")
    base_name = f"part-c{gen}.parquet"
    base = os.path.join(part_dir, base_name)
    cols = list(full.schema.names)
    pages = _encode_table(full, pk, cols, page_rows,
                          input_files=input_files)
    invalidate_zone_sidecar(out_dir, pk)
    old = [f for f in os.listdir(part_dir)
           if f.endswith(".parquet") and f != base_name]
    tmp = os.path.join(part_dir, f".{base_name}.tmp")
    _pq.write_table(pages.drop_columns(["part_key"]), tmp,
                    row_group_size=PAGES_ROW_GROUP)
    digest = _hashlib.sha1(open(tmp, "rb").read()).hexdigest()
    jtmp = journal + ".tmp"
    with open(jtmp, "w") as fh:
        _json.dump({"digest": digest, "base": base_name,
                    "gen": gen, "retire": old}, fh)
    os.replace(jtmp, journal)
    os.replace(tmp, base)
    for f in old:
        retire_file(out_dir, gen, d, f)
    os.remove(journal)
    zcols = [c for c in (zone_columns or []) if c in full.schema.names]
    bloom = ([key_col] if key_col and key_col in full.schema.names
             else None)  # rewrite renumbers pages from 0 → valid
    if (zcols or bloom) and full.num_rows:
        zone_sidecar_from_table(
            os.path.join(out_dir, ZONES_DIRNAME, d),
            full, zcols, page_rows, uniform=True, bloom_columns=bloom)


@_mutates_layout
def compact_partitions(out_dir: str, min_files: int = 2,
                       page_rows: int = DEFAULT_PAGE_ROWS,
                       zone_columns: list[str] | None = None,
                       logger=None) -> dict:
    """Maintenance companion to :func:`encode_append`: partitions that
    accumulated ``min_files`` or more page files (one per append) are
    decoded locally and rewritten as a single freshly-encoded file —
    restoring one-file-per-partition reads, re-picking codecs over the
    full partition, renumbering pages from 0, and (optionally) rebuilding
    the zone sidecar. One Ray task per qualifying partition; partitions
    below the threshold are untouched. The manifest is re-finalized."""
    import ray

    from .log import get_logger
    log = get_logger(logger)
    pages_root = os.path.join(out_dir, "pages")
    todo = []
    for d in sorted(os.listdir(pages_root)):
        if not d.startswith("part_key="):
            continue
        entries = os.listdir(os.path.join(pages_root, d))
        files = [f for f in entries if f.endswith(".parquet")]
        # a leftover journal marks a crashed compact commit — always
        # revisit it (the replay inside one() removes any duplicates),
        # regardless of the min_files threshold
        if len(files) >= min_files or ".compact-journal.json" in entries:
            todo.append(d)
    if not todo:
        return {"compacted": 0}
    key_col = (mf.load_config(out_dir) or {}).get("url_col")

    from .snapshots import retirement_gen
    gen = retirement_gen(out_dir)

    def one(d: str) -> int:
        part_dir = os.path.join(pages_root, d)
        pk = int(d.split("=", 1)[1])
        _replay_partition_journal(out_dir, part_dir, gen)
        full = _decode_partition_dir(part_dir)
        # lineage survives compaction: union the old pages' input_files
        _commit_partition_rewrite(out_dir, part_dir, pk, full, gen,
                                  page_rows, key_col, zone_columns,
                                  input_files=_partition_lineage(part_dir))
        return full.num_rows

    task = ray.remote(num_cpus=1)(one)
    rows = ray.get([task.remote(d) for d in todo])
    import pyarrow.dataset as pads
    t0 = pads.dataset(os.path.join(pages_root, todo[0])).to_table(
        columns=["column"])
    enc_cols = sorted(c for c in pc.unique(t0["column"]).to_pylist()
                      if c not in ("filepath", "filename"))
    summary = _finalize_manifest(out_dir, enc_cols, snapshot_op="compact")
    summary["compacted"] = len(todo)
    summary["compacted_rows"] = int(sum(rows))
    log.send_log(f"compact_partitions: rewrote {len(todo)} partition(s)")
    return summary


@_mutates_layout
def recluster(out_dir: str, sort_by: str | list[str],
              page_rows: int = DEFAULT_PAGE_ROWS,
              zone_columns: list[str] | None = None,
              logger=None) -> dict:
    """Re-cluster an encoded layout in place: every partition's rows are
    reordered by ``sort_by`` (a column name sorts; a LIST Z-orders via
    :func:`raystack.zones.zorder_indices`) and the partition is rewritten
    through the same crash-safe journal/install/retire commit as
    :func:`compact_partitions` — pages renumbered from 0, codecs
    re-picked over the new row order, lineage carried forward, the
    pre-cluster pages readable via time travel until vacuum. Zone
    sidecars are rebuilt for the sort columns (plus any extra
    ``zone_columns``) — the point of clustering: after it, range
    predicates on those columns prune pages via
    :func:`raystack.zones.decode_dir_where`. ``sort_by`` persists in the
    layout config so later :func:`encode_append` increments can cluster
    their own pages identically. Decoded content is identical modulo row
    order (each partition holds the same row SET)."""
    import ray

    from .log import get_logger
    log = get_logger(logger)
    sort_cols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
    if not sort_cols:
        raise ValueError("recluster: sort_by must name >=1 column")
    existing = set(_layout_column_types(out_dir))
    missing = [c for c in sort_cols if c not in existing]
    if missing:
        raise ValueError(f"recluster: sort column(s) {missing} not in "
                         f"layout {sorted(existing)}")
    zcols = sorted(set(sort_cols) | set(zone_columns or []))
    pages_root = os.path.join(out_dir, "pages")
    dirs = sorted(d for d in os.listdir(pages_root)
                  if d.startswith("part_key="))
    cfg = mf.load_config(out_dir) or {}
    key_col = cfg.get("url_col")

    from .snapshots import retirement_gen
    gen = retirement_gen(out_dir)

    def one(d: str) -> int:
        part_dir = os.path.join(pages_root, d)
        pk = int(d.split("=", 1)[1])
        _replay_partition_journal(out_dir, part_dir, gen)
        full = _decode_partition_dir(part_dir)
        if full.num_rows:
            full = _cluster(full, sort_by)
        _commit_partition_rewrite(out_dir, part_dir, pk, full, gen,
                                  page_rows, key_col, zcols,
                                  input_files=_partition_lineage(part_dir))
        return full.num_rows

    task = ray.remote(num_cpus=1)(one)
    rows = ray.get([task.remote(d) for d in dirs])
    cfg["sort_by"] = sort_by if isinstance(sort_by, str) else sort_cols
    mf.save_config(out_dir, cfg)
    enc_cols = sorted(c for c in existing
                      if c not in ("filepath", "filename"))
    summary = _finalize_manifest(out_dir, enc_cols, snapshot_op="recluster")
    summary["reclustered"] = len(dirs)
    summary["reclustered_rows"] = int(sum(rows))
    log.send_log(f"recluster: {len(dirs)} partition(s) by {sort_cols}")
    return summary


def export_parquet(out_dir: str, dest: str,
                   columns: list[str] | None = None,
                   where: dict | None = None,
                   snapshot: int | None = None,
                   compression: str = "snappy",
                   row_group_rows: int = DEFAULT_PAGE_ROWS,
                   resume: bool = False, logger=None) -> dict:
    """Interop escape hatch: decode an encoded layout back into STANDARD
    hive-partitioned Parquet (``dest/part_key=N/data.parquet``) that any
    engine reads — no raystack needed downstream. One Ray task per
    partition (same fan-out shape as :func:`decode_dir`, no shuffle),
    each installing its file atomically (dot-prefixed tmp + rename), so
    with ``resume=True`` a re-run after a crash skips every partition
    whose file already landed and rewrites only the missing ones — the
    output-resumability contract of the encode paths, applied to the
    export. ``snapshot=`` exports a historical state via the snapshot
    log. ``where=`` exports the matching subset (the curated-slice case:
    one language, one time window) with the same predicates and zone
    pruning as :func:`raystack.zones.decode_dir_where` — fully pruned
    partitions write nothing, surviving ones decode only overlapping
    pages then filter exactly; like ``scan``, ``where`` reads the LIVE
    sidecars so it composes with neither ``snapshot``. Returns
    ``{partitions, skipped, rows, bytes}``."""
    import ray

    from .log import get_logger
    log = get_logger(logger)
    pages_root = os.path.join(out_dir, "pages")
    if where is not None and snapshot is not None:
        raise ValueError("where= reads the live zone sidecars — "
                         "export_parquet(snapshot=) then filter for "
                         "historical states")
    if snapshot is not None:
        from .snapshots import resolve_snapshot_paths
        per_dir = resolve_snapshot_paths(out_dir, snapshot)
        items = sorted((d, paths, None) for d, paths in per_dir.items())
        if not items:
            raise FileNotFoundError(
                f"snapshot {snapshot} of {out_dir} lists no partitions")
    elif where is not None:
        from .zones import zone_prune_plan
        plan = zone_prune_plan(out_dir, where)
        items = [(d, None, wl) for d, wl in sorted(plan.items())]
    else:
        items = [(d, None, None) for d in sorted(os.listdir(pages_root))
                 if d.startswith("part_key=")]
        if not items:
            raise FileNotFoundError(f"no part_key= dirs under {pages_root}")
    want = columns
    if where is not None and want is not None:
        missing = [c for c in where if c not in want]
        want = [*want, *missing]  # predicate columns decode, then drop
    os.makedirs(dest, exist_ok=True)
    todo, skipped = [], 0
    for it in items:
        if resume and os.path.exists(os.path.join(dest, it[0],
                                                  "data.parquet")):
            skipped += 1
            continue
        todo.append(it)

    def one(d: str, paths, whitelist) -> tuple[int, int]:
        import pyarrow.parquet as _pq
        t = _decode_partition_dir(os.path.join(pages_root, d), want,
                                  paths=paths, page_whitelist=whitelist)
        if where is not None:
            if t.num_rows:
                from .zones import predicate_mask
                t = t.filter(predicate_mask(t, where))
            # drop appended predicate columns UNCONDITIONALLY (a zero-row
            # partition must export the same schema as every other one,
            # or reading dest as a single hive dataset fails on merge)
            if columns is not None:
                t = t.select([c for c in columns if c in t.schema.names])
        part_dest = os.path.join(dest, d)
        os.makedirs(part_dest, exist_ok=True)
        final = os.path.join(part_dest, "data.parquet")
        tmp = os.path.join(part_dest, ".data.parquet.tmp")
        _pq.write_table(t, tmp, compression=compression,
                        row_group_size=row_group_rows)
        os.replace(tmp, final)
        return t.num_rows, os.path.getsize(final)

    task = ray.remote(num_cpus=1)(one)
    out = ray.get([task.remote(*it) for it in todo])
    log.send_log(f"export_parquet: {len(todo)} partition(s) → {dest}"
                 + (f" ({skipped} skipped, already exported)"
                    if skipped else ""))
    return {"partitions": len(todo), "skipped": skipped,
            "rows": int(sum(r for r, _ in out)),
            "bytes": int(sum(b for _, b in out))}


@_mutates_layout
def delete_rows(out_dir: str, *, keys: list[str] | None = None,
                keys_ds=None, key_col: str | None = None,
                predicate=None, predicate_columns: list[str] | None = None,
                where: dict | None = None,
                page_rows: int = DEFAULT_PAGE_ROWS,
                zone_columns: list[str] | None = None,
                logger=None) -> dict:
    """Remove rows from an encoded layout in place — the retention /
    right-to-be-forgotten verb (takedown lists, flagged-document purges,
    curation verdicts applied to already-encoded corpora). Two modes,
    exactly one of which must be given:

    - ``keys=[...]``: delete every row whose partition-key column (the
      layout's ``url_col``) is in the list. Keys route through the SAME
      persisted partition-key math the encoder used, so only the
      partitions that can contain a key are even opened — at 100 TB a
      thousand-key takedown touches hash(|keys|) partitions, not the
      corpus.
    - ``predicate=fn, predicate_columns=[...]``: ``fn`` maps a
      ``pa.Table`` of just ``predicate_columns`` to a boolean mask (True
      = delete). Every partition is scanned, but the scan decodes ONLY
      the predicate's columns; a partition with no matches is left
      byte-for-byte untouched, and only matching partitions pay the full
      decode + re-encode.
    - ``where={col: (lo, hi) | {"in": [...]}}``: the declarative form of
      the predicate delete (same dict as
      :func:`raystack.zones.decode_dir_where`), and the one to prefer
      when the layout has zone sidecars: partitions the zones prove
      match-free are never even opened, and inside survivors the
      match probe decodes only the pages overlapping the predicate.

    A third mode, ``keys_ds=`` (a ``ray.data.Dataset`` whose ``key_col``
    column — default: the layout's ``url_col`` — holds the keys), is the
    same key delete at Dataset scale: when the takedown list is itself
    too big for the driver, ONLY the keys shuffle (a ``groupby(part_key)``
    whose bytes are the key column), and one group task per TOUCHED
    partition rewrites it against its own key subset. Partitions
    receiving no keys are never opened.

    Rewrites use the compact commit protocol (journal → install → retire
    into ``_history/<gen>/``), so a crashed delete heals on the next
    maintenance run, lineage survives, and the step is snapshot-logged
    (``delete``) — time travel still reads the pre-delete rows, and
    ``vacuum`` makes the purge physical. A partition whose every row is
    deleted keeps a zero-row page per column (schema preserved)."""
    import ray

    from .log import get_logger
    log = get_logger(logger)
    n_modes = sum(x is not None for x in (keys, keys_ds, predicate, where))
    if n_modes != 1:
        raise ValueError("delete_rows: pass exactly one of keys= / "
                         "keys_ds= / predicate= / where=")
    if predicate is not None and not predicate_columns:
        raise ValueError("delete_rows: predicate= requires "
                         "predicate_columns=[...]")
    pages_root = os.path.join(out_dir, "pages")
    if not os.path.isdir(pages_root):
        raise FileNotFoundError(f"no encoded layout under {out_dir}")
    cfg = mf.load_config(out_dir) or {}
    url_col = cfg.get("url_col")

    from .snapshots import retirement_gen
    gen = retirement_gen(out_dir)

    def _finish(n_deleted: int, n_rewritten: int, scanned: int,
                total: int) -> dict:
        manifest = mf.load_manifest(out_dir)
        enc = sorted({c for row in manifest.values()
                      for c in row.get("codecs", {})}
                     - {"filepath", "filename"})
        summary = _finalize_manifest(out_dir, enc, snapshot_op="delete")
        summary["deleted_rows"] = n_deleted
        summary["rewritten_partitions"] = n_rewritten
        summary["scanned_partitions"] = scanned
        log.send_log(f"delete_rows: removed {n_deleted} row(s) across "
                     f"{n_rewritten} partition(s) "
                     f"({scanned} scanned of {total})")
        return summary

    all_dirs = sorted(d for d in os.listdir(pages_root)
                      if d.startswith("part_key="))

    if keys_ds is not None:
        if not url_col:
            raise ValueError("delete_rows: keys_ds= needs the layout's "
                             "partitioning config (url_col)")
        kc = key_col or url_col
        num_partitions = cfg["num_partitions"]
        hot = cfg.get("hot_hosts") or {}
        hmap = cfg.get("host_map")

        def key_batch(t: pa.Table) -> pa.Table:
            vals = t[kc].combine_chunks().cast(pa.string())
            pk = compute_part_keys(vals, num_partitions, hot, hmap)
            return pa.table({"__k": vals,
                             "part_key": pa.array(pk, type=pa.int64())})

        def del_group(g: pa.Table) -> pa.Table:
            pk = int(g["part_key"][0].as_py())
            part_dir = os.path.join(pages_root, f"part_key={pk}")
            empty = pa.table({"part_key": pa.array([pk], pa.int64()),
                              "deleted": pa.array([0], pa.int64())})
            if not os.path.isdir(part_dir):
                return empty
            keyset = pc.unique(g["__k"].combine_chunks())
            _replay_partition_journal(out_dir, part_dir, gen)
            probe = _decode_partition_dir(part_dir, [url_col])
            if probe.num_rows == 0:
                return empty
            mask = pc.is_in(probe[url_col], value_set=keyset)
            ndel = int(pc.sum(mask).as_py() or 0)
            if ndel == 0:
                return empty
            full = _decode_partition_dir(part_dir)
            keep = full.filter(pc.invert(
                pc.is_in(full[url_col], value_set=keyset)))
            _commit_partition_rewrite(
                out_dir, part_dir, pk, keep, gen, page_rows, url_col,
                zone_columns, input_files=_partition_lineage(part_dir))
            return pa.table({"part_key": pa.array([pk], pa.int64()),
                             "deleted": pa.array([ndel], pa.int64())})

        res = keys_ds.map_batches(key_batch, batch_format="pyarrow") \
            .groupby("part_key") \
            .map_groups(del_group, batch_format="pyarrow").to_pandas()
        n_deleted = int(res["deleted"].sum()) if len(res) else 0
        n_rewritten = int((res["deleted"] > 0).sum()) if len(res) else 0
        return _finish(n_deleted, n_rewritten,
                       len(res), len(all_dirs))

    if keys is not None:
        if not url_col:
            raise ValueError("delete_rows: keys= needs the layout's "
                             "partitioning config (url_col) — use "
                             "predicate= on this layout")
        key_arr = pa.array([str(k) for k in keys], type=pa.string())
        routed = set(np.unique(compute_part_keys(
            key_arr, cfg["num_partitions"],
            cfg.get("hot_hosts") or {}, cfg.get("host_map"))).tolist())
        dirs = [d for d in all_dirs
                if int(d.split("=", 1)[1]) in routed]
        check_cols = [url_col]

        def make_mask(t: pa.Table) -> pa.ChunkedArray:
            return pc.is_in(t[url_col], value_set=key_arr)
    elif where is not None:
        # declarative predicate (same dict as decode_dir_where: ranges /
        # {"in": [...]} memberships): zone sidecars prune FIRST, so a
        # retention purge only opens partitions that can hold a match —
        # pruned-away partitions are never read, and inside survivors the
        # probe decodes only pages overlapping the predicate
        from .zones import predicate_mask, zone_prune_plan
        plan = zone_prune_plan(out_dir, where)
        dirs = [d for d in all_dirs if d in plan]
        probe_whitelists = plan
        check_cols = list(where)

        def make_mask(t: pa.Table):
            return predicate_mask(t, where)
    else:
        dirs = all_dirs
        check_cols = list(predicate_columns)

        def make_mask(t: pa.Table):
            m = predicate(t.select(check_cols))
            if isinstance(m, pa.ChunkedArray):
                m = m.combine_chunks()
            if not isinstance(m, pa.Array):
                m = pa.array(m, type=pa.bool_())
            if len(m) != t.num_rows:
                raise ValueError(
                    f"delete_rows: predicate returned {len(m)} rows "
                    f"for a partition with {t.num_rows} rows")
            return m

    if where is None:
        probe_whitelists = {}

    def one(d: str) -> int:
        part_dir = os.path.join(pages_root, d)
        pk = int(d.split("=", 1)[1])
        _replay_partition_journal(out_dir, part_dir, gen)
        # cheap pre-check: decode only the mask's inputs — a partition
        # with nothing to delete is left byte-for-byte untouched. For
        # where= the probe also skips pages the zone plan pruned (every
        # possible match lives in a whitelisted page)
        probe = _decode_partition_dir(part_dir, check_cols,
                                      page_whitelist=probe_whitelists
                                      .get(d))
        ndel = int(pc.sum(pc.fill_null(make_mask(probe), False)
                          ).as_py() or 0)
        if ndel == 0:
            return 0
        full = _decode_partition_dir(part_dir)
        keep = full.filter(pc.invert(
            pc.fill_null(make_mask(full), False)))
        _commit_partition_rewrite(out_dir, part_dir, pk, keep, gen,
                                  page_rows, url_col, zone_columns,
                                  input_files=_partition_lineage(part_dir))
        return ndel

    task = ray.remote(num_cpus=1)(one)
    deleted = ray.get([task.remote(d) for d in dirs]) if dirs else []
    return _finish(int(sum(deleted)), sum(1 for n in deleted if n),
                   len(dirs), len(all_dirs))


def upsert_rows(source_paths: list[str], out_dir: str, *,
                columns_select: list[str] | None = None,
                columns_rename: dict[str, str] | None = None,
                add_filename: bool = True,
                schema: str = "strict",
                precode: bool = True,
                page_rows: int = DEFAULT_PAGE_ROWS,
                map_bytes: int = TARGET_MAP_BYTES,
                logger=None) -> dict:
    """Recrawl semantics: re-ingest files into an existing layout with
    the NEWEST snapshot of a key winning — every stored row whose
    ``url_col`` value appears in the incoming files is deleted
    (:func:`delete_rows` at Dataset scale: only the incoming keys
    shuffle, only the partitions they route to rewrite), then the files
    append exactly like :func:`encode_append` (same routing, exactly-once
    tags, optional ``schema="union"`` drift absorption). Keys that occur
    more than once WITHIN the increment all land — upsert dedups against
    the layout, not inside the batch (run exact_dedup upstream for
    that). Two snapshots record the step (``delete`` then ``append``),
    so time travel can still read the replaced rows until ``vacuum``."""
    import ray.data

    from .io import read_parquet_clean
    cfg = mf.load_config(out_dir) or {}
    url_col = cfg.get("url_col")
    if not url_col:
        raise FileNotFoundError(
            f"no partitioning config under {out_dir}")
    # the incoming key column may be named differently pre-rename
    src_key = url_col
    for old, new in (columns_rename or {}).items():
        if new == url_col:
            src_key = old
            break
    keys_ds = read_parquet_clean(source_paths, columns=[src_key])
    if src_key != url_col:
        keys_ds = keys_ds.map_batches(
            lambda t: t.rename_columns([url_col]),
            batch_format="pyarrow")
    del_summary = delete_rows(out_dir, keys_ds=keys_ds,
                              page_rows=page_rows, logger=logger)
    summary = encode_append(source_paths, out_dir,
                            columns_select=columns_select,
                            columns_rename=columns_rename,
                            add_filename=add_filename, schema=schema,
                            precode=precode, page_rows=page_rows,
                            map_bytes=map_bytes, logger=logger)
    summary["replaced_rows"] = del_summary["deleted_rows"]
    summary["rewritten_partitions"] = del_summary["rewritten_partitions"]
    return summary
