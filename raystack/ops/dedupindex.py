"""Persisted deduplication index: dedup an INCREMENT against an existing
corpus without ever rescanning the corpus.

The missing piece between one-shot dedup (:mod:`raystack.ops.dedup` — both
sides rescanned every run) and incremental ingest
(:func:`raystack.pipeline.encode_append` — no dedup at all): a day-N crawl
increment must be checked against everything already ingested, but at
100 TB re-shingling the stored corpus per increment is not an option. The
index persists exactly what the dedup decision needs — 16 B/doc of content
fingerprint for the exact tier, ~2 KB/doc of banded minhash rows for the
near tier — hive-partitioned by key hash (the same filesystem-pruning
layout as :func:`raystack.ops.textindex.build_text_index` and the IVF
index), so a probe reads ONLY the buckets its own keys hash to and the
corpus text never moves again.

Document ids must be int64 (the repo-wide ``doc_id`` convention — the
probe's broadcast match gathers ids through numpy int arrays); key a
url-identified corpus by a derived int64 id, not the url string.

Layout::

    index_dir/
      dedup_index_meta.json                 config + n_docs
      exact/bucket=<fp  % B>/*.parquet      (fp, <id_col>)
      near/bucket=<key % B>/*.parquet       (k, <id_col>, sig)

- exact tier: ``fp`` is :func:`raystack.ops.text.fingerprint_kernel` — the
  same 64-bit content hash ``exact_dedup_by_hash`` shuffles, so "exact"
  means byte-equal content (collisions ≈ 2^-64/pair).
- near tier: ``k`` is one of ``bands`` banded-LSH keys per document
  (:func:`raystack.ops.dedup.band_key_matrix` over the 32-perm minhash
  signature), ``sig`` the full signature as a 256-byte blob, denormalized
  into every band row (the BM25 tf/dl trick: probing never joins back to a
  doc→sig table, so only the probed buckets are ever read). Two documents
  are near-duplicates when they share ≥1 band key AND their signatures
  agree on ≥ ``sim_threshold`` of the 32 components — the same verdict
  rule :func:`minhash_lsh_dedup` applies within its candidate buckets.

Index rows are sorted by key within each written batch and stored in
small row groups (``_RG_ROWS``), so probes prune TWICE: directory-level
(only the ``bucket=`` dirs the increment's keys hash to are opened) and
row-group-level (footer min/max stats skip every group that provably
holds no probe key — at corpus scale a bucket is hundreds of GB but a
probe reads ~one ~1 MB row group per key).

Probe shape at scale: the increment is reduced to its signature table
(~300 B/doc, materialized — the corpus side is never materialized), probe
keys prune the index read to the touched ``bucket=`` directories and the
surviving row groups, and the (new × stored) pairing is count-gated: small increments broadcast their
sorted key arrays (``ray.put`` once, ≤ ~25 MB at the 65536-doc gate) and
match map-side with ``searchsorted`` inside the pruned scan — zero
shuffles, the only all-to-all is the final tiny ``groupby().min()`` —
while large increments take a distributed hash join. Verdicts are
vectorized signature-matrix compares where the candidate rows live; the
driver sees only counts (plus the gated increment signature table).
"""

from __future__ import annotations

import glob as _glob
import json
import os

import numpy as np
import pyarrow as pa

from .dedup import _N_PERM, band_key_matrix, sig_matrix
from .dedup import _BROADCAST_LIMIT as _DEDUP_BROADCAST_LIMIT
from .hashing import flatten_column, window_hashes
from .join import strip_schema_metadata as _strip
from .text import fingerprint_kernel

_META = "dedup_index_meta.json"

#: probe-side count gate (monkeypatchable in tests to force the
#: distributed join tiers): increments with ≤ this many docs push their
#: fingerprint / band-key sets into the index scan as an ``isin`` filter,
#: so the join input is pre-shrunk to the actual matches.
_BROADCAST_LIMIT = _DEDUP_BROADCAST_LIMIT

#: partitions for the probe-side hash joins
_JOIN_PARTITIONS = 16

#: per-wave index-bytes budget for the distributed probe joins. The join
#: key's bucket (``hash(key) % num_buckets``) partitions BOTH sides, so
#: the join decomposes losslessly into per-bucket-group waves run
#: sequentially — without this, a large increment against a large index
#: pushes index_rows×sig_bytes + increment_rows×sig_bytes through ONE
#: hash join and the aggregator actors OOM (observed at 9.6M-doc index ×
#: 2.4M-doc increment: tens of GB in flight, aggregator killed). Waves
#: bound in-flight join input to ~budget × in-memory blow-up.
_JOIN_WAVE_BYTES = 512 << 20

#: parquet row-group size for index files. Small on purpose: index rows
#: are written SORTED by key within each batch, so row-group min/max
#: stats become narrow key ranges and a broadcast probe reads ~one row
#: group per probe key instead of the whole touched bucket — at corpus
#: scale a bucket is hundreds of GB, a row group ~1 MB.
_RG_ROWS = 8192


# ---------------------------------------------------------------------------
# signature rows (shared by build / append / probe)
# ---------------------------------------------------------------------------

def _bin_from_matrix(m: np.ndarray) -> pa.Array:
    """(n, P) int64 matrix → fixed-width binary array (one 8·P-byte blob
    per row) — Acero joins carry binary payloads but not list<int64>."""
    n, p = m.shape
    flat = m.astype("<i8").tobytes()
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * (p * 8))
    return pa.Array.from_buffers(
        pa.binary(), n, [None, offsets.buffers()[1], pa.py_buffer(flat)])


def _matrix_from_bin(col, p: int) -> np.ndarray:
    """Binary column of uniform 8·p-byte blobs → (n, p) int64 matrix.
    Offset-honoring gather (post-join arrays are slices), vectorized.
    Chunked inputs are gathered PER CHUNK: ``combine_chunks()`` on >2 GiB
    of binary payload overflows arrow's int32 offsets (observed on a
    hot-band-key join flood at 9.6M-doc scale)."""
    if isinstance(col, pa.ChunkedArray):
        parts = [_matrix_from_bin(c, p) for c in col.chunks if len(c)]
        if not parts:
            return np.empty((0, p), dtype=np.int64)
        return parts[0] if len(parts) == 1 else np.vstack(parts)
    arr = col
    n = len(arr)
    if n == 0:
        return np.empty((0, p), dtype=np.int64)
    off = np.frombuffer(arr.buffers()[1], np.int32)[
        arr.offset:arr.offset + n + 1]
    vals = np.frombuffer(arr.buffers()[2], np.uint8)
    idx = off[:-1].astype(np.int64)[:, None] + np.arange(p * 8)
    return vals[idx].view(np.int64)


def _sig_rows_fn(text_col: str, id_col: str):
    """Batch → (id, fp, sig) — ONE flatten + rolling-hash pass feeds both
    the fingerprint and the minhash kernels."""
    def rows(t: pa.Table) -> pa.Table:
        data, starts, lengths = flatten_column(t[text_col])
        h = window_hashes(data)
        fp = fingerprint_kernel(data, starts, lengths, h)
        sig = sig_matrix(data, starts, lengths, h)
        ids = t[id_col].combine_chunks() if isinstance(
            t[id_col], pa.ChunkedArray) else t[id_col]
        return pa.table({
            id_col: ids,
            "fp": pa.array(fp.view(np.int64)),
            "sig": _bin_from_matrix(sig.astype(np.uint64).view(np.int64)),
        })
    return rows


def _signature_table(ds, text_col: str, id_col: str):
    """Materialized (id, fp, sig) Dataset — ~300 B/doc; computed once per
    probe so the increment's text is shingled exactly once. PROBE-side
    only: increments are bounded. Build/append go through
    :func:`_persist_signature_table` instead — a 10^12-doc corpus'
    signature table must not sit in the object store."""
    return ds.map_batches(_sig_rows_fn(text_col, id_col),
                          batch_format="pyarrow",
                          batch_size=4096).materialize()


def _persist_signature_table(ds, index_dir: str, text_col: str,
                             id_col: str) -> tuple[str, int]:
    """Build/append-side signature table, spilled to parquet
    (``index_dir/_sigs``): ONE streaming shingling pass writes it, the
    exact and near index passes read it back COLUMN-PRUNED (16 B/row for
    the exact tier instead of the full ~300 B signature rows), then the
    spill is deleted. Build memory stays independent of corpus size —
    nothing corpus-sized ever lives in the object store. Returns
    ``(spill_dir, n_docs)``."""
    import shutil

    import ray.data
    sdir = os.path.join(index_dir, "_sigs")
    shutil.rmtree(sdir, ignore_errors=True)
    ds.map_batches(_sig_rows_fn(text_col, id_col),
                   batch_format="pyarrow", batch_size=4096) \
        .write_parquet(sdir)
    files = sorted(_glob.glob(os.path.join(sdir, "*.parquet")))
    n = int(ray.data.read_parquet(files).count()) if files else 0
    return sdir, n


def _read_sigs(sdir: str, columns: list[str]):
    import ray.data
    files = sorted(_glob.glob(os.path.join(sdir, "*.parquet")))
    return ray.data.read_parquet(files, columns=columns)


def _sorted_rows(t: pa.Table, key: str) -> pa.Table:
    """Sort an index-row batch by (bucket, key) so each written file's
    row groups hold narrow key ranges — what row-group-stat pruning in
    :func:`_scan_file_pruned` relies on for its effectiveness (never its
    correctness: stats are valid on unsorted data too, just wide)."""
    order = np.lexsort((np.asarray(t[key]).astype(np.int64),
                        np.asarray(t["bucket"]).astype(np.int64)))
    return t.take(pa.array(order))


def _exact_rows_fn(id_col: str, num_buckets: int):
    def fn(t: pa.Table) -> pa.Table:
        bucket = (np.asarray(t["fp"]).view(np.uint64)
                  % np.uint64(num_buckets)).astype(np.int64)
        return _sorted_rows(pa.table(
            {"fp": t["fp"].combine_chunks()
             if isinstance(t["fp"], pa.ChunkedArray) else t["fp"],
             id_col: t[id_col].combine_chunks()
             if isinstance(t[id_col], pa.ChunkedArray) else t[id_col],
             "bucket": pa.array(bucket)}), "fp")
    return fn


def _near_rows_fn(id_col: str, bands: int, num_buckets: int):
    """(id, fp, sig) batch → ``bands`` rows per doc: (k, id, sig, bucket)."""
    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        sig = _matrix_from_bin(t["sig"], _N_PERM)
        keys = band_key_matrix(sig, bands)          # (n, bands)
        k = keys.T.reshape(-1)                      # band-major concat
        ids = np.concatenate([np.asarray(t[id_col])] * bands) \
            if n else np.empty(0, np.int64)
        sig_arr = t["sig"].combine_chunks() if isinstance(
            t["sig"], pa.ChunkedArray) else t["sig"]
        bucket = (k.view(np.uint64) % np.uint64(num_buckets)) \
            .astype(np.int64)
        return _sorted_rows(pa.table({
            "k": pa.array(k),
            id_col: pa.array(ids),
            "sig": pa.concat_arrays([sig_arr] * bands) if n
            else sig_arr.slice(0, 0),
            "bucket": pa.array(bucket)}), "k")
    return fn


def _write_index_rows(sigs_dir: str, index_dir: str, id_col: str,
                      bands: int, num_buckets: int) -> None:
    """Two column-pruned passes over the spilled signature table →
    hive-partitioned exact + near sub-indexes (``write_parquet`` with
    ``partition_cols`` appends uniquely-named files, so builds and
    appends share the same code path). Each pass GLOBALLY sorts its rows
    by (bucket, key) — one range-partitioned distributed sort per tier,
    paid once at build/append — so every written file holds a narrow,
    disjoint key range and its small row groups (``_RG_ROWS``) give
    probes near-exact row-group pruning (a per-batch sort would leave
    each file's groups spanning the whole hash range whenever the
    upstream read splits into small blocks)."""
    _read_sigs(sigs_dir, ["fp", id_col]) \
        .map_batches(_exact_rows_fn(id_col, num_buckets),
                     batch_format="pyarrow") \
        .sort(["bucket", "fp"]) \
        .write_parquet(os.path.join(index_dir, "exact"),
                       partition_cols=["bucket"], row_group_size=_RG_ROWS)
    _read_sigs(sigs_dir, [id_col, "sig"]) \
        .map_batches(_near_rows_fn(id_col, bands, num_buckets),
                     batch_format="pyarrow") \
        .sort(["bucket", "k"]) \
        .write_parquet(os.path.join(index_dir, "near"),
                       partition_cols=["bucket"], row_group_size=_RG_ROWS)


def build_dedup_index(ds, index_dir: str, text_col: str = "text",
                      id_col: str = "doc_id", num_buckets: int = 64,
                      bands: int = 8) -> dict:
    """One shingling pass over the corpus → persisted dedup index.
    The corpus documents themselves are NOT stored — only fingerprints,
    band keys and signatures; ``dedup_increment`` probes are pruned to
    the buckets the increment's own keys hash to."""
    import shutil
    if _N_PERM % bands:
        raise ValueError(f"bands must divide {_N_PERM}")
    sdir, n_docs = _persist_signature_table(ds, index_dir, text_col,
                                            id_col)
    if n_docs:
        _write_index_rows(sdir, index_dir, id_col, bands, num_buckets)
    shutil.rmtree(sdir, ignore_errors=True)
    meta = {"num_buckets": int(num_buckets), "bands": int(bands),
            "text_col": text_col, "id_col": id_col, "n_docs": n_docs}
    with open(os.path.join(index_dir, _META), "w") as f:
        json.dump(meta, f)
    return meta


def append_dedup_index(ds, index_dir: str, tag: str | None = None) -> dict:
    """Add NEW documents' rows into the same ``bucket=`` directories with
    the index's stored config (the dedup sibling of
    :func:`raystack.ops.textindex.append_text_index`). The caller must not
    re-append ids already indexed — typically this is called on the
    SURVIVORS of :func:`dedup_increment` (see :func:`ingest_dedup`).

    ``tag`` makes the append exactly-once per increment: a tag already in
    the meta's ``applied`` list is skipped (same contract as
    ``encode_append``'s file-set tags), so a retried day-N ingest cannot
    double-append its signatures. Note the append is not atomic — a
    crash between the parquet writes and the meta rewrite leaves the
    rows in but the tag unrecorded; the retry then re-appends them.
    Duplicate signature rows cannot flip a verdict (the same content
    matches the same keys, ``dup_of`` stays the min id) — only
    ``n_docs`` would read high, which the tag prevents in the common
    retry-after-success case."""
    import shutil
    with open(os.path.join(index_dir, _META)) as f:
        meta = json.load(f)
    if tag is not None and tag in meta.get("applied", []):
        return meta
    sdir, n_new = _persist_signature_table(ds, index_dir,
                                           meta["text_col"],
                                           meta["id_col"])
    if n_new:
        _write_index_rows(sdir, index_dir, meta["id_col"],
                          meta["bands"], meta["num_buckets"])
    shutil.rmtree(sdir, ignore_errors=True)
    meta["n_docs"] = int(meta["n_docs"]) + n_new
    if tag is not None:
        meta["applied"] = meta.get("applied", []) + [tag]
    with open(os.path.join(index_dir, _META), "w") as f:
        json.dump(meta, f)
    return meta


# ---------------------------------------------------------------------------
# probe
# ---------------------------------------------------------------------------

def _span_indices(lo: np.ndarray, cnt: np.ndarray) -> np.ndarray:
    """Concatenated ``arange(lo[i], lo[i]+cnt[i])`` without a Python loop —
    the gather index for expanding searchsorted match spans into pairs."""
    total = int(cnt.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(cnt)
    idx = np.arange(total, dtype=np.int64)
    within = idx - np.repeat(ends - cnt, cnt)
    return np.repeat(lo, cnt) + within


def _min_per_new(t: pa.Table) -> pa.Table:
    """Per-batch pre-reduction: min ``dup_of`` per ``__new_id`` — at most
    one row per incoming doc leaves each batch, so the final distributed
    groupby is tiny regardless of how many stored rows matched."""
    nid = np.asarray(t["__new_id"]).astype(np.int64)
    dof = np.asarray(t["dup_of"]).astype(np.int64)
    if len(nid) == 0:
        return pa.table({"__new_id": pa.array([], pa.int64()),
                         "dup_of": pa.array([], pa.int64())})
    order = np.lexsort((dof, nid))
    nid, dof = nid[order], dof[order]
    first = np.ones(len(nid), dtype=bool)
    first[1:] = nid[1:] != nid[:-1]
    return pa.table({"__new_id": pa.array(nid[first]),
                     "dup_of": pa.array(dof[first])})


def _scan_file_pruned(path: str, key_col: str, columns: list[str],
                      keys: np.ndarray):
    """Read from ONE index file only the row groups whose [min, max]
    key statistics can contain one of ``keys`` (sorted int64), then keep
    only exact-match rows. Returns ``(table, n_rg_read, n_rg_total)``.
    Row groups without stats are read (safe fallback) — pruning can only
    skip what provably holds no probe key."""
    import pyarrow.parquet as pq
    f = pq.ParquetFile(path)
    md = f.metadata
    if md.num_row_groups == 0:
        return f.schema_arrow.empty_table().select(columns), 0, 0
    names = [md.row_group(0).column(i).path_in_schema
             for i in range(md.num_columns)]
    ci = names.index(key_col)
    take = []
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(ci).statistics
        if st is None or not st.has_min_max:
            take.append(g)
            continue
        lo = int(np.searchsorted(keys, int(st.min), "left"))
        if lo < len(keys) and int(keys[lo]) <= int(st.max):
            take.append(g)
    if not take:
        return (f.schema_arrow.empty_table().select(columns),
                0, md.num_row_groups)
    t = f.read_row_groups(take, columns=columns)
    v = np.asarray(t[key_col]).astype(np.int64)
    pos = np.minimum(np.searchsorted(keys, v), len(keys) - 1)
    return (t.filter(pa.array(keys[pos] == v)),
            len(take), md.num_row_groups)


def _pruned_scan(files: list[str], key_col: str, columns: list[str],
                 keys_ref):
    """Distributed membership scan over index files: one map task per
    file batch opens each footer, prunes row groups by key stats, and
    emits only rows whose key is in the broadcast sorted key array.
    Replaces ``read_parquet`` for broadcast probes — the touched buckets'
    bytes mostly never leave storage."""
    import ray
    import ray.data

    def rd(b: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        outs = [_scan_file_pruned(p, key_col, columns, keys)[0]
                for p in b["path"].to_pylist()]
        return pa.concat_tables(outs, promote_options="none")

    return ray.data.from_items(
        [{"path": p} for p in files],
        override_num_blocks=min(len(files), 32)) \
        .map_batches(rd, batch_format="pyarrow")


def _probe_broadcast(sigs, index_dir: str, meta: dict,
                     sim_threshold: float) -> list:
    """Join-free probe for count-gated increments: the increment's sorted
    key arrays + signature matrix ship ONCE via ``ray.put`` (≤ ~25 MB at
    the 65536-doc gate); the pruned index scans match map-side with
    searchsorted and verdict in the same map. No shuffle, no join — the
    fixed multi-second actor-pool cost of two hash joins disappears from
    the steady-state ingest loop."""
    import ray
    import ray.data

    id_col, bands = meta["id_col"], meta["bands"]
    nb = meta["num_buckets"]
    tbl = pa.concat_tables(ray.get(sigs.to_arrow_refs()))
    new_ids = np.asarray(tbl[id_col]).astype(np.int64)
    fp = np.asarray(tbl["fp"]).astype(np.int64)
    nsig = _matrix_from_bin(tbl["sig"], _N_PERM)
    out = []

    # ---- exact tier: fp equality against exact/bucket=<fp % B> ----
    order = np.lexsort((new_ids, fp))
    fp_s, fid_s = fp[order], new_ids[order]
    files = _bucket_files(
        os.path.join(index_dir, "exact"),
        [int(b) for b in np.unique(fp_s.view(np.uint64) % np.uint64(nb))])
    if files:
        ref_ek = ray.put(fp_s)
        ref_e = ray.put((fp_s, fid_s))

        def exact_match(t: pa.Table) -> pa.Table:
            fps, fids = ray.get(ref_e)
            sf = np.asarray(t["fp"]).astype(np.int64)
            lo = np.searchsorted(fps, sf, "left")
            cnt = np.searchsorted(fps, sf, "right") - lo
            srow = np.repeat(np.arange(len(sf)), cnt)
            nidx = _span_indices(lo, cnt)
            sid = np.asarray(t[id_col]).astype(np.int64)
            return _min_per_new(pa.table({
                "__new_id": pa.array(fids[nidx]),
                "dup_of": pa.array(sid[srow])}))

        out.append(_pruned_scan(files, "fp", ["fp", id_col], ref_ek)
                   .map_batches(exact_match, batch_format="pyarrow")
                   .materialize())

    # ---- near tier: band-key collision + signature agreement ----
    keys = band_key_matrix(nsig, bands)            # (n_new, bands)
    kflat = keys.reshape(-1)
    docidx = np.repeat(np.arange(len(new_ids), dtype=np.int64), bands)
    korder = np.argsort(kflat, kind="stable")
    k_s, didx_s = kflat[korder], docidx[korder]
    files = _bucket_files(
        os.path.join(index_dir, "near"),
        [int(b) for b in np.unique(k_s.view(np.uint64) % np.uint64(nb))])
    if files:
        ref_nk = ray.put(k_s)
        ref_n = ray.put((k_s, didx_s, new_ids, nsig))
        thr = sim_threshold

        def near_match(t: pa.Table) -> pa.Table:
            ks_s, di_s, nids, nsigs = ray.get(ref_n)
            sk = np.asarray(t["k"]).astype(np.int64)
            lo = np.searchsorted(ks_s, sk, "left")
            cnt = np.searchsorted(ks_s, sk, "right") - lo
            if not cnt.sum():
                return _min_per_new(pa.table(
                    {"__new_id": pa.array([], pa.int64()),
                     "dup_of": pa.array([], pa.int64())}))
            srow = np.repeat(np.arange(len(sk)), cnt)
            nidx = di_s[_span_indices(lo, cnt)]
            ssig = _matrix_from_bin(t["sig"], _N_PERM)
            keep = (ssig[srow] == nsigs[nidx]).mean(axis=1) >= thr
            sid = np.asarray(t[id_col]).astype(np.int64)
            return _min_per_new(pa.table({
                "__new_id": pa.array(nids[nidx[keep]]),
                "dup_of": pa.array(sid[srow[keep]])}))

        out.append(_pruned_scan(files, "k", ["k", id_col, "sig"], ref_nk)
                   .map_batches(near_match, batch_format="pyarrow")
                   .materialize())
    return [m for m in out if m.count()]


def _probe_join(sigs, index_dir: str, meta: dict, sim_threshold: float,
                empty: pa.Table) -> list:
    """Distributed probe for increments above the broadcast gate: the
    pruned index scans hash-join the increment's key tables; verdicts are
    vectorized signature-matrix compares per joined batch. Degenerate
    corpora where one band key holds h stored and m incoming docs join
    h×m candidate rows — but byte-equal floods are caught by the exact
    tier first, and the verdict map runs where the join output lives,
    never on the driver."""
    import ray.data

    id_col, bands = meta["id_col"], meta["bands"]
    nb = meta["num_buckets"]
    matches = []

    # ---- exact tier: fp equality against exact/bucket=<fp % B> ----
    new_fp = sigs.map_batches(
        lambda t: _exact_rows_fn(id_col, nb)(t).rename_columns(
            ["fp", "__new_id", "bucket"]),
        batch_format="pyarrow").materialize()
    exact_root = os.path.join(index_dir, "exact")
    waves = _bucket_waves(exact_root, _touched_buckets(new_fp, "bucket"),
                          _JOIN_WAVE_BYTES)
    for wave in waves:
        files = _bucket_files(exact_root, wave)
        if not files:
            continue
        inc = new_fp if len(waves) == 1 else new_fp.map_batches(
            _bucket_filter(wave), batch_format="pyarrow")
        # repartition: a join partition built only from schema-less
        # empty blocks is rejected by Acero (same guard as
        # ops.join.semi_join_ds)
        m = _strip(ray.data.read_parquet(files, columns=["fp", id_col])) \
            .repartition(_JOIN_PARTITIONS).join(
            _strip(inc.select_columns(["fp", "__new_id"]))
            .repartition(_JOIN_PARTITIONS),
            join_type="inner",
            num_partitions=_JOIN_PARTITIONS, on=("fp",)) \
            .map_batches(lambda t: pa.table(
                {"__new_id": t["__new_id"],
                 "dup_of": t[id_col]}), batch_format="pyarrow") \
            .materialize()
        if m.count():
            matches.append(m)

    # ---- near tier: band-key collision + signature agreement ----
    new_near = sigs.map_batches(
        lambda t: _near_rows_fn(id_col, bands, nb)(t).rename_columns(
            ["k", "__new_id", "__nsig", "bucket"]),
        batch_format="pyarrow").materialize()
    near_root = os.path.join(index_dir, "near")
    waves = _bucket_waves(near_root, _touched_buckets(new_near, "bucket"),
                          _JOIN_WAVE_BYTES)

    def verdicts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty.rename_columns(["__new_id", "dup_of"])
        a = _matrix_from_bin(t["sig"], _N_PERM)
        b = _matrix_from_bin(t["__nsig"], _N_PERM)
        keep = (a == b).mean(axis=1) >= sim_threshold
        return pa.table({"__new_id": t["__new_id"].filter(
            pa.array(keep)),
            "dup_of": t[id_col].filter(pa.array(keep))})

    for wave in waves:
        files = _bucket_files(near_root, wave)
        if not files:
            continue
        inc = new_near if len(waves) == 1 else new_near.map_batches(
            _bucket_filter(wave), batch_format="pyarrow")
        m = _strip(ray.data.read_parquet(files,
                                         columns=["k", id_col, "sig"])) \
            .repartition(_JOIN_PARTITIONS).join(
                _strip(inc.select_columns(["k", "__new_id",
                                           "__nsig"]))
                .repartition(_JOIN_PARTITIONS),
                join_type="inner",
                num_partitions=_JOIN_PARTITIONS, on=("k",)) \
            .map_batches(verdicts, batch_format="pyarrow",
                         batch_size=32768).materialize()
        if m.count():
            matches.append(m)
    return matches


def _touched_buckets(sigs, col: str) -> list[int]:
    """Distinct partition buckets of the increment — ≤ num_buckets values
    per batch reach the driver (map-side np.unique, no shuffle)."""
    b = sigs.map_batches(
        lambda t: pa.table({"bucket": pa.array(np.unique(
            np.asarray(t[col], dtype=np.int64)))}),
        batch_format="pyarrow").to_pandas()
    return sorted(set(b["bucket"].astype(int))) if len(b) else []


def _bucket_files(root: str, buckets: list[int]) -> list[str]:
    return [f for b in buckets for f in sorted(
        _glob.glob(os.path.join(root, f"bucket={b}", "*.parquet")))]


def _bucket_waves(root: str, buckets: list[int],
                  budget_bytes: int) -> list[list[int]]:
    """Greedy split of the touched buckets into waves whose index bytes
    (on-disk parquet, stat only) stay under ``budget_bytes``, ≥1 bucket
    per wave. The join key's bucket partitions both join sides, so
    per-wave joins run sequentially and their union equals the single
    big join — with aggregator memory bounded by one wave."""
    waves: list[list[int]] = []
    cur: list[int] = []
    cur_bytes = 0
    for b in buckets:
        nbytes = sum(os.path.getsize(f) for f in _bucket_files(root, [b]))
        if cur and cur_bytes + nbytes > budget_bytes:
            waves.append(cur)
            cur, cur_bytes = [], 0
        cur.append(b)
        cur_bytes += nbytes
    if cur:
        waves.append(cur)
    return waves


def _bucket_filter(wave: list[int]):
    """Batch filter keeping only rows whose ``bucket`` is in the wave."""
    wv = np.array(sorted(wave), dtype=np.int64)

    def fn(t: pa.Table) -> pa.Table:
        mask = np.isin(np.asarray(t["bucket"], dtype=np.int64), wv)
        return t.filter(pa.array(mask))

    return fn


def dedup_increment(new_ds, index_dir: str, sim_threshold: float = 0.7):
    """Which incoming documents duplicate the INDEXED corpus?  Returns a
    Dataset of ``(<id_col>, dup_of)`` — one row per incoming doc that is a
    byte-exact (fingerprint) or near (shared band key + signature
    agreement ≥ ``sim_threshold``) duplicate of a stored doc, ``dup_of``
    the minimum matching stored id. Incoming ids must be disjoint from
    indexed ids (probing docs already in the index flags them against
    themselves).

    Scale shape: the increment reduces to its signature table once; the
    index read is pruned to the touched ``bucket=`` dirs; the pairing is
    count-gated — increments ≤ ``_BROADCAST_LIMIT`` docs broadcast their
    sorted keys and match map-side inside the scan (zero joins,
    :func:`_probe_broadcast`), larger increments take distributed hash
    joins (:func:`_probe_join`); verdicts are vectorized matrix compares
    inside ``map_batches``, never on the driver."""
    import ray.data

    with open(os.path.join(index_dir, _META)) as f:
        meta = json.load(f)
    id_col = meta["id_col"]
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "dup_of": pa.array([], pa.int64())})

    sigs = _signature_table(new_ds, meta["text_col"], id_col)
    n_new = int(sigs.count())
    if n_new == 0 or meta["n_docs"] == 0:
        return ray.data.from_arrow(empty)

    if n_new <= _BROADCAST_LIMIT:
        matches = _probe_broadcast(sigs, index_dir, meta, sim_threshold)
    else:
        matches = _probe_join(sigs, index_dir, meta, sim_threshold, empty)

    if not matches:
        return ray.data.from_arrow(empty)
    out = matches[0]
    for m in matches[1:]:
        out = out.union(m)
    # a doc may match via fp AND several band keys → one verdict
    return out.groupby("__new_id").min("dup_of").map_batches(
        lambda t: t.rename_columns([id_col, "dup_of"]),
        batch_format="pyarrow")


def ingest_dedup(new_ds, index_dir: str, text_col: str = "text",
                 id_col: str = "doc_id", sim_threshold: float = 0.7,
                 num_buckets: int = 64, bands: int = 8,
                 tag: str | None = None):
    """The maintenance loop for a growing deduped corpus, one increment at
    a time: dedup WITHIN the increment (exact + minhash-LSH, the one-shot
    operators), drop incoming docs that duplicate the INDEXED corpus
    (:func:`dedup_increment` — corpus priority: stored content always
    wins), append the survivors' signatures to the index, and return the
    surviving documents as a Dataset. First call on a missing index
    builds it. Greedy semantics: a doc dropped within the increment is
    not revived if its keeper then loses to the corpus — it was a near
    duplicate of corpus-duplicating content either way.

    Pass a ``tag`` (e.g. the crawl day) to make the loop refuse an
    increment it has already ingested: re-running the same increment
    would otherwise flag every previously-admitted doc against itself
    and silently return (almost) nothing — failing loudly beats that."""
    from .dedup import exact_dup_ids, minhash_lsh_dedup
    from .join import semi_join, semi_join_bloom

    if tag is not None and os.path.exists(os.path.join(index_dir, _META)):
        with open(os.path.join(index_dir, _META)) as f:
            if tag in json.load(f).get("applied", []):
                raise ValueError(
                    f"increment tag {tag!r} already ingested into "
                    f"{index_dir} — a re-run would dedup the increment "
                    "against its own first ingestion")

    kept = new_ds

    def _drop(ds, ids_ds):
        ids_ds = ids_ds.materialize()
        n = ids_ds.count()
        if not n:
            return ds
        if n <= _BROADCAST_LIMIT:
            return semi_join(ds, list(ids_ds.to_pandas()[id_col]),
                             on=id_col, anti=True)
        return semi_join_bloom(ds.materialize(),
                               ids_ds.select_columns([id_col]),
                               on=id_col, anti=True,
                               broadcast_limit=_BROADCAST_LIMIT) \
            .materialize()

    kept = _drop(kept, exact_dup_ids(kept, text_col, id_col))
    kept = _drop(kept, minhash_lsh_dedup(
        kept, text_col=text_col, id_col=id_col,
        sim_threshold=sim_threshold).select_columns([id_col]))

    has_index = os.path.exists(os.path.join(index_dir, _META))
    if has_index:
        kept = _drop(kept, dedup_increment(
            kept, index_dir, sim_threshold=sim_threshold)
            .select_columns([id_col]))
        kept = kept.materialize()
        append_dedup_index(kept, index_dir, tag=tag)
    else:
        kept = kept.materialize()
        build_dedup_index(kept, index_dir, text_col=text_col,
                          id_col=id_col, num_buckets=num_buckets,
                          bands=bands)
        if tag is not None:
            with open(os.path.join(index_dir, _META)) as f:
                meta = json.load(f)
            meta["applied"] = [tag]
            with open(os.path.join(index_dir, _META), "w") as f:
                json.dump(meta, f)
    return kept
