"""Deterministic, exactly-resumable training-batch reader.

Composes three existing primitives into the surface an LLM trainer
actually consumes — fixed-length token sequences in a seeded epoch
order, fetchable by sequence RANGE:

1. epoch order — the :func:`raystack.ops.text.seeded_shuffle`
   permutation (``rank = splitmix64(id ^ seed)``, bijective, identical
   on any cluster size, zero RNG state);
2. packing — :func:`raystack.ops.packing.sequence_pack_plan` keyed by
   the RANK instead of the id (ranks are unique, so the plan is the
   exact concat-and-cut layout of the shuffled stream), ranks inverted
   back to doc ids on the output spans
   (:func:`raystack.ops.hashing.unsplitmix64` — no join);
3. random access — span slices are cut from the token lists WHERE the
   tokens live (map-side); only the requested window's tokens ever
   move.

Resume semantics: a training step maps to a sequence range, and
``fetch_sequences(tokens, plan, lo, hi)`` is a pure function of
``(corpus, seed, seq_len, lo, hi)`` — a job restarted at step *k*
re-fetches exactly the sequences a continuous run would have seen,
with no loader state to checkpoint beyond the step counter.

100 TB shape: both the plan and the token lists persist
hive-partitioned by the fetch key — the plan by sequence-id bucket
(:func:`persist_plan`), the tokens by RANK bucket
(:func:`persist_epoch_tokens`; ranks are uniform on uint64, so buckets
are balanced, and a sequence window touches a CONTIGUOUS rank range —
docs are packed in rank order). A window fetch then opens only the
overlapping bucket directories: filesystem pruning, no shuffle, no
corpus scan. (Un-persisted Datasets work too — each fetch is then a
column-pruned corpus scan, fine for tests and small corpora.)

No reference counterpart (d6tstack has no notion of token streams);
training-data graft capability (SURVEY.md §2, "beyond the reference").
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from .hashing import splitmix64, unsplitmix64

__all__ = ["epoch_pack_plan", "persist_plan", "persist_epoch_tokens",
           "fetch_sequences", "iter_epoch", "materialize_epoch"]

_FLIP = np.uint64(1 << 63)


def _rank_key(ids: np.ndarray, seed: int) -> np.ndarray:
    """Epoch rank as an int64 SORT KEY: uint64 rank with the sign bit
    flipped, so int64 ascending == uint64 ascending == the
    seeded_shuffle order."""
    u = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
    return (u ^ _FLIP).view(np.int64)


def _key_to_id(rank_key: np.ndarray, seed: int) -> np.ndarray:
    u = rank_key.astype(np.int64).view(np.uint64) ^ _FLIP
    return (unsplitmix64(u) ^ np.uint64(seed)).view(np.int64)


def epoch_pack_plan(ds, seq_len: int, seed: int, *,
                    id_col: str = "doc_id", count_col: str = "n_tokens",
                    sep_tokens: int = 1, n_buckets: int = 64):
    """Concat-and-cut packing plan of the SHUFFLED epoch stream: docs
    contribute in ``splitmix64(id ^ seed)`` order (exactly the
    :func:`seeded_shuffle` permutation). Returns one row per
    (doc, sequence) span with columns ``doc_id, rank_key, seq_id,
    seq_off, doc_off, n_toks`` — :func:`sequence_pack_plan`'s contract,
    plus the rank key for bucket routing. Deterministic for any
    partitioning/cluster size; a different seed is an independent
    epoch."""
    from .packing import sequence_pack_plan
    s = int(seed)

    def add_rank(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col]).astype(np.int64)
        return pa.table({"__rank": pa.array(_rank_key(ids, s)),
                         count_col: t[count_col]})

    ranked = ds.select_columns([id_col, count_col]) \
        .map_batches(add_rank, batch_format="pyarrow")
    plan = sequence_pack_plan(ranked, seq_len, id_col="__rank",
                              tokens_col=count_col, sep_tokens=sep_tokens,
                              n_buckets=n_buckets)

    def restore_ids(t: pa.Table) -> pa.Table:
        rk = np.asarray(t["doc_id"]).astype(np.int64)  # ranks, per keying
        return pa.table({
            "doc_id": pa.array(_key_to_id(rk, s)),
            "rank_key": pa.array(rk),
            "seq_id": t["seq_id"], "seq_off": t["seq_off"],
            "doc_off": t["doc_off"], "n_toks": t["n_toks"],
        })

    return plan.map_batches(restore_ids, batch_format="pyarrow")


def persist_plan(plan_ds, out_dir: str, seq_len: int, *,
                 seqs_per_bucket: int = 8192) -> dict:
    """Write a pack plan hive-partitioned by sequence bucket
    (``bucket = seq_id // seqs_per_bucket``): a window fetch then reads
    only the overlapping bucket directories."""
    spb = int(seqs_per_bucket)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = np.asarray(t["seq_id"]).astype(np.int64) // spb
        return t.append_column("bucket", pa.array(b)) \
            .replace_schema_metadata(None)

    plan_ds.map_batches(add_bucket, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["bucket"])
    meta = {"kind": "epoch_plan", "seq_len": int(seq_len),
            "seqs_per_bucket": spb}
    with open(os.path.join(out_dir, "_plan.json"), "w") as f:
        json.dump(meta, f)
    return meta


def persist_epoch_tokens(tokens_ds, out_dir: str, seed: int, *,
                         id_col: str = "doc_id",
                         tokens_col: str = "bpe_ids",
                         n_buckets: int = 256) -> dict:
    """Write (id, token-list) rows hive-partitioned by epoch RANK bucket
    (top ``log2(n_buckets)`` bits of the uint64 rank — uniform, so
    buckets are balanced at any corpus size). Docs are packed in rank
    order, so a sequence window touches a contiguous rank range and a
    fetch opens only the overlapping bucket directories."""
    nb = int(n_buckets)
    if nb < 2 or nb & (nb - 1):
        raise ValueError("n_buckets must be a power of two >= 2")
    shift = np.uint64(64 - nb.bit_length() + 1)
    s = int(seed)

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col]).astype(np.int64)
        u = splitmix64(ids.astype(np.uint64) ^ np.uint64(s))
        return pa.table({id_col: t[id_col], tokens_col: t[tokens_col],
                         "bucket": pa.array((u >> shift).view(np.int64))}) \
            .replace_schema_metadata(None)

    tokens_ds.select_columns([id_col, tokens_col]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["bucket"])
    meta = {"kind": "epoch_tokens", "seed": s, "n_buckets": nb,
            "id_col": id_col, "tokens_col": tokens_col}
    with open(os.path.join(out_dir, "_tokens.json"), "w") as f:
        json.dump(meta, f)
    return meta


def _bucket_paths(root: str, buckets) -> list[str]:
    """Page files of the requested bucket dirs. Expanded to FILE paths
    here: ray.data.read_parquet rejects a list holding more than one
    directory (single-dir lists expand, multi-dir lists are opened as
    files — pyarrow ParquetDataset semantics)."""
    out = []
    for b in buckets:
        d = os.path.join(root, f"bucket={int(b)}")
        if os.path.isdir(d):
            out.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                       if f.endswith(".parquet"))
    return out


#: driver-side span cap per fetch — a window is a training-step range,
#: so this bounds fetches to ~GB-scale token volume; larger ranges
#: should iterate (iter_epoch), not fetch at once
MAX_FETCH_SPANS = 2_000_000


def fetch_sequences(tokens, plan, seq_lo: int, seq_hi: int, *,
                    seq_len: int | None = None,
                    id_col: str = "doc_id", tokens_col: str = "bpe_ids",
                    sep_id: int = 0, sep_tokens: int = 1) -> pa.Table:
    """Materialize training sequences ``seq_lo <= seq_id < seq_hi`` of an
    epoch: table ``(seq_id, tokens: list<int32>, doc_starts:
    list<int32>)`` sorted by seq_id. Every sequence is exactly
    ``seq_len`` tokens (the final sequence of the epoch may be shorter);
    document boundaries carry ``sep_tokens`` copies of ``sep_id``.
    ``doc_starts`` lists the in-sequence offsets where a NEW document
    begins (attention-reset positions for block-diagonal masking; a doc
    continuing from the previous sequence is not a boundary). ``tokens``/``plan`` are Datasets or the
    directories :func:`persist_epoch_tokens` / :func:`persist_plan`
    wrote — persisted inputs are pruned to the overlapping buckets.

    Exact-resume contract: the result is a pure function of
    (corpus, seed, seq_len, range) — a restarted trainer re-fetches
    byte-identical sequences from the step counter alone."""
    import ray
    import ray.data

    if seq_hi <= seq_lo:
        raise ValueError("empty sequence range")
    # ---- span window (driver-side, bounded by the window size)
    if isinstance(plan, str):
        with open(os.path.join(plan, "_plan.json")) as f:
            pmeta = json.load(f)
        if seq_len is None:
            seq_len = int(pmeta["seq_len"])
        spb = int(pmeta["seqs_per_bucket"])
        paths = _bucket_paths(plan, range(seq_lo // spb,
                                          (seq_hi - 1) // spb + 1))
        if not paths:
            return pa.table({
                "seq_id": pa.array([], pa.int64()),
                "tokens": pa.array([], pa.large_list(pa.int32())),
                "doc_starts": pa.array([], pa.large_list(pa.int32()))})
        plan_ds = ray.data.read_parquet(paths)
    else:
        plan_ds = plan
    if seq_len is None:
        raise ValueError("seq_len is required with a non-persisted plan")
    lo, hi = int(seq_lo), int(seq_hi)

    def in_window(t: pa.Table) -> pa.Table:
        sid = np.asarray(t["seq_id"])
        return t.filter(pa.array((sid >= lo) & (sid < hi)))

    spans = plan_ds.map_batches(in_window, batch_format="pyarrow") \
        .to_pandas()
    if len(spans) > MAX_FETCH_SPANS:
        raise ValueError(
            f"fetch_sequences: {len(spans)} spans exceed MAX_FETCH_SPANS "
            f"({MAX_FETCH_SPANS}) — fetch a smaller window (iter_epoch)")
    if not len(spans):
        return pa.table({
                "seq_id": pa.array([], pa.int64()),
                "tokens": pa.array([], pa.large_list(pa.int32())),
                "doc_starts": pa.array([], pa.large_list(pa.int32()))})
    order = np.argsort(spans["doc_id"].to_numpy(), kind="stable")
    sp = {c: spans[c].to_numpy()[order]
          for c in ("doc_id", "seq_id", "seq_off", "doc_off", "n_toks")}
    span_ref = ray.put(sp)  # broadcast once, read per map task

    # ---- token source, pruned to the window's rank range if persisted
    if isinstance(tokens, str):
        with open(os.path.join(tokens, "_tokens.json")) as f:
            tmeta = json.load(f)
        id_col, tokens_col = tmeta["id_col"], tmeta["tokens_col"]
        nb = int(tmeta["n_buckets"])
        shift = np.uint64(64 - nb.bit_length() + 1)
        u = splitmix64(sp["doc_id"].astype(np.uint64)
                       ^ np.uint64(tmeta["seed"]))
        paths = _bucket_paths(tokens, np.unique(u >> shift).tolist())
        tokens_ds = ray.data.read_parquet(paths,
                                          columns=[id_col, tokens_col])
    else:
        tokens_ds = tokens.select_columns([id_col, tokens_col])

    def slice_spans(t: pa.Table) -> pa.Table:
        s = ray.get(span_ref)
        ids = np.asarray(t[id_col]).astype(np.int64)
        a = np.searchsorted(s["doc_id"], ids, "left")
        b = np.searchsorted(s["doc_id"], ids, "right")
        rows = np.flatnonzero(b > a)
        if not len(rows):
            return pa.table({"seq_id": pa.array([], pa.int64()),
                             "seq_off": pa.array([], pa.int64()),
                             "is_start": pa.array([], pa.bool_()),
                             "tokens": pa.array([], pa.large_list(pa.int32()))})
        col = t[tokens_col].combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = np.asarray(col.offsets)
        flat = np.asarray(col.values).astype(np.int32, copy=False)
        out_sid, out_soff, out_tok, out_st = [], [], [], []
        for r in rows:
            start, length = int(offs[r]), int(offs[r + 1] - offs[r])
            for k in range(int(a[r]), int(b[r])):
                doff = int(s["doc_off"][k])
                n = int(s["n_toks"][k])
                if doff + n > length + sep_tokens:
                    raise ValueError(
                        f"doc {ids[r]}: span covers {doff + n} positions "
                        f"but the token list has {length} (+{sep_tokens} "
                        "sep) — the plan's count column disagrees with "
                        "the token lists")
                take = max(0, min(length - doff, n))
                piece = np.full(n, sep_id, np.int32)
                piece[:take] = flat[start + doff:start + doff + take]
                out_sid.append(int(s["seq_id"][k]))
                out_soff.append(int(s["seq_off"][k]))
                out_st.append(doff == 0)  # doc STARTS here (not a
                out_tok.append(piece)     # continuation from prev seq)
        lens = np.array([len(p) for p in out_tok], np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        values = np.concatenate(out_tok) if out_tok \
            else np.zeros(0, np.int32)
        lst = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()),
                                            pa.array(values, pa.int32()))
        return pa.table({"seq_id": pa.array(out_sid, pa.int64()),
                         "seq_off": pa.array(out_soff, pa.int64()),
                         "is_start": pa.array(out_st, pa.bool_()),
                         "tokens": lst})

    def assemble(g: pa.Table) -> pa.Table:
        soff = np.asarray(g["seq_off"])
        order = np.argsort(soff, kind="stable")
        toks = g["tokens"].combine_chunks() \
            if isinstance(g["tokens"], pa.ChunkedArray) else g["tokens"]
        pieces = [np.asarray(toks[int(i)].values) for i in order]
        lens = np.array([len(p) for p in pieces], np.int64)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        if not (soff[order] == starts).all():
            raise ValueError(
                f"seq {g['seq_id'][0]}: spans do not tile the sequence "
                "(missing document?)")
        seq = np.concatenate(pieces).astype(np.int32, copy=False)
        # attention-reset positions: offsets where a NEW doc begins
        # (doc_off==0 spans; a doc continuing from the previous sequence
        # starts at seq_off=0 but is NOT a boundary)
        is_start = np.asarray(g["is_start"])[order]
        bounds = starts[is_start].astype(np.int32)
        return pa.table({
            "seq_id": pa.array([g["seq_id"][0].as_py()], pa.int64()),
            "tokens": pa.LargeListArray.from_arrays(
                pa.array([0, len(seq)], pa.int64()),
                pa.array(seq, pa.int32())),
            "doc_starts": pa.LargeListArray.from_arrays(
                pa.array([0, len(bounds)], pa.int64()),
                pa.array(bounds, pa.int32())),
        })

    out = tokens_ds.map_batches(slice_spans, batch_format="pyarrow") \
        .groupby("seq_id").map_groups(assemble, batch_format="pyarrow") \
        .to_arrow_refs()
    tbl = pa.concat_tables([ray.get(r) for r in out],
                           promote_options="default")
    return tbl.sort_by("seq_id")


def materialize_epoch(tokens, plan, out_dir: str, *,
                      shard_sequences: int = 8192,
                      start_seq: int = 0, seq_len: int | None = None,
                      **kw) -> dict:
    """Pre-materialize an epoch as numbered parquet shards (one file per
    ``shard_sequences`` training sequences) for trainers that stream
    files instead of fetching windows. RESUMABLE OUTPUT: each shard
    lands atomically (tmp + rename) and an existing shard is skipped,
    so a crashed run re-invoked with the same arguments finishes
    exactly the missing shards — and determinism makes the skip safe
    (the shard a re-run would write is byte-identical to the one on
    disk). Returns ``{shards, sequences, skipped}``."""
    import pyarrow.parquet as _pq
    os.makedirs(out_dir, exist_ok=True)
    lo, written, skipped, n_seq = int(start_seq), 0, 0, 0
    while True:
        shard = os.path.join(out_dir, f"shard-{lo:010d}.parquet")
        if os.path.exists(shard):
            # metadata-only skip: a finished shard costs a footer read,
            # never a re-fetch; a short shard marks the epoch end
            nrows = _pq.ParquetFile(shard).metadata.num_rows
            skipped += 1
            n_seq += nrows
            if nrows < shard_sequences:
                break
            lo += shard_sequences
            continue
        t = fetch_sequences(tokens, plan, lo, lo + shard_sequences,
                            seq_len=seq_len, **kw)
        if t.num_rows == 0:
            break
        tmp = os.path.join(out_dir, f".shard-{lo:010d}.parquet.tmp")
        _pq.write_table(t, tmp)
        os.replace(tmp, shard)
        written += 1
        n_seq += t.num_rows
        if t.num_rows < shard_sequences:
            break
        lo += shard_sequences
    return {"shards": written + skipped, "sequences": n_seq,
            "skipped": skipped}


def iter_epoch(tokens, plan, *, window: int = 1024, start_seq: int = 0,
               end_seq: int | None = None, seq_len: int | None = None,
               prefetch: bool = False, **kw):
    """Generator of ``(first_seq_id, table)`` windows over an epoch —
    the trainer's feed loop. Resumable: pass the step counter's sequence
    offset as ``start_seq`` and the stream continues exactly where a
    continuous run would be. ``end_seq=None`` iterates until a window
    comes back empty (epoch end). ``prefetch=True`` double-buffers: the
    next window's fetch runs in a background thread while the trainer
    consumes the current one (each fetch is an independent pure
    function, so overlap cannot change the bytes)."""
    lo = int(start_seq)

    def bound(x: int) -> int:
        return x + window if end_seq is None else min(x + window, end_seq)

    if not prefetch:
        while end_seq is None or lo < end_seq:
            hi = bound(lo)
            t = fetch_sequences(tokens, plan, lo, hi, seq_len=seq_len, **kw)
            if t.num_rows == 0:
                return
            yield lo, t
            if t.num_rows < hi - lo:  # short final window: epoch done
                return
            lo = hi
        return

    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(fetch_sequences, tokens, plan, lo, bound(lo),
                        seq_len=seq_len, **kw)
        while end_seq is None or lo < end_seq:
            hi = bound(lo)
            t = fut.result()
            full = t.num_rows == hi - lo
            if full and (end_seq is None or hi < end_seq):
                fut = ex.submit(fetch_sequences, tokens, plan, hi,
                                bound(hi), seq_len=seq_len, **kw)
            if t.num_rows == 0:
                return
            yield lo, t
            if not full:
                return
            lo = hi
