"""ExactSubstr-style duplicate-span dedup (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better"): find every span of at least
``min_tokens`` word tokens that occurs more than once ANYWHERE in the
corpus, keep only its first occurrence (smallest ``(doc_id, byte offset)``),
and strip the rest — the substring-granularity companion to the whole-doc
(``exact_dedup``) and near-doc (``minhash_lsh_dedup``) operators.

Matching is token-content based (runs of word bytes; separators between
tokens don't affect equality) but spans are BYTE-exact: a stripped window
removes exactly the bytes from its first token's first byte to its last
token's last byte, so everything outside stripped spans stays
byte-identical to the input. Word bytes are ASCII alphanumerics, ``_`` and
every byte >= 0x80 (UTF-8 lead/continuation), so multi-byte characters
never straddle a token boundary and every cut is UTF-8 safe.

Scale shape (mirrors the minhash/paragraph dedup pattern in
:mod:`raystack.ops.dedup`):

1. window-hash counting — one vectorized ``map_batches`` pass emits
   per-batch pre-aggregated ``(hash, n)`` partials (8+8 bytes per DISTINCT
   window per batch), one ``groupby`` sums them; only hashes with n >= 2
   survive.
2. duplicate-window occurrences — a second pass re-derives the windows and
   keeps the duplicated ones. The dup-hash set is count-gated: broadcast
   as a sorted array below ``broadcast_limit`` (map-only filter), else a
   distributed hash semi-join.
3. winner election — exact lexicographic min over ``(doc_id, byte_pos)``
   via two skew-safe ``groupby().min()`` aggregates (never a per-hash
   ``map_groups``: a boilerplate window repeated 10^9 times stays a
   pre-aggregated Min, not a 10^9-row group). Non-winner windows become
   strip spans.
4. strip — spans are count-gated again: broadcast and cut in place per
   batch (flat-buffer delta mask, no per-row Python), else a
   union + ``groupby(id).map_groups`` reassembly whose group size is one
   document plus its spans.

Matching is by 64-bit hash (token hashes cover each token's exact bytes;
windows combine them order-sensitively): a false strip needs a 2^-64
collision. Multi-pass: the input Dataset executes once per pass — pass a
re-readable source (``read_parquet``) rather than materializing the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _BROADCAST_LIMIT
from .hashing import flatten_column, splitmix64

_U64 = np.uint64
_FNV = _U64(0x100000001B3)

#: word-byte classes: ASCII alnum + '_' + every byte >= 0x80
_WORD_BYTE = np.zeros(256, dtype=bool)
for _b in range(0x80):
    _WORD_BYTE[_b] = chr(_b).isalnum() or _b == 0x5F
_WORD_BYTE[0x80:] = True


def _token_spans(data: np.ndarray, starts: np.ndarray, lengths: np.ndarray):
    """Byte spans of word-byte runs over the flat buffer, never crossing a
    row boundary: ``(b0, b1, doc)`` — start (incl.), end (excl.), row
    ordinal of each token."""
    n = len(data)
    empty = np.zeros(0, np.int64)
    if n == 0:
        return empty, empty, empty
    word = _WORD_BYTE[data]
    prev = np.empty(n, bool)
    prev[0] = False
    prev[1:] = word[:-1]
    nxt = np.empty(n, bool)
    nxt[-1] = False
    nxt[:-1] = word[1:]
    nonempty = lengths > 0
    rs = starts[nonempty]
    prev[rs] = False
    nxt[rs + lengths[nonempty] - 1] = False
    b0 = np.flatnonzero(word & ~prev).astype(np.int64)
    b1 = (np.flatnonzero(word & ~nxt) + 1).astype(np.int64)
    ends = starts + lengths
    doc = np.searchsorted(ends, b0, side="right").astype(np.int64)
    return b0, b1, doc


def _token_hashes(data: np.ndarray, b0: np.ndarray,
                  b1: np.ndarray) -> np.ndarray:
    """Order-sensitive 64-bit hash of each token's EXACT bytes in
    O(total token bytes): every byte is mixed with its in-token position
    (``splitmix64(pos << 8 | byte)``), summed per token with one
    ``reduceat``, and finalized with the token length. No truncation —
    equal hashes mean equal bytes up to a 2^-64 collision."""
    lens = b1 - b0
    if not len(lens):
        return np.zeros(0, _U64)
    total = int(lens.sum())
    seg0 = (np.cumsum(lens) - lens).astype(np.int64)
    rel = np.arange(total, dtype=np.int64) - np.repeat(seg0, lens)
    sel = np.repeat(b0, lens) + rel
    v = splitmix64((rel.astype(_U64) << _U64(8)) | data[sel].astype(_U64))
    with np.errstate(over="ignore"):
        sums = np.add.reduceat(v, seg0)
    return splitmix64(sums ^ lens.astype(_U64))


def _window_rows(t: pa.Table, text_col: str, id_col: str, L: int):
    """All ``L``-token windows of a batch: ``(hash i64-view, doc_id,
    pos, b1)`` where ``pos``/``b1`` are the window's byte start/end
    WITHIN its document (pos doubles as the in-doc tie-break)."""
    col = t[text_col]
    data, starts, lengths = flatten_column(col)
    b0, b1, doc = _token_spans(data, starts, lengths)
    empty = np.zeros(0, np.int64)
    if len(b0) < L:
        return empty, empty, empty, empty
    th = _token_hashes(data, b0, b1)
    m = len(b0) - (L - 1)
    same = doc[L - 1:] == doc[:m]
    key = th[:m].copy()
    with np.errstate(over="ignore"):
        for j in range(1, L):
            key = key * _FNV + th[j:m + j]
    key = splitmix64(key[same]).view(np.int64)
    wdoc = doc[:m][same]
    ids = np.asarray(pc.cast(t[id_col].combine_chunks()
                             if isinstance(t[id_col], pa.ChunkedArray)
                             else t[id_col], pa.int64())).astype(np.int64)
    return (key, ids[wdoc], b0[:m][same] - starts[wdoc],
            b1[L - 1:][same] - starts[wdoc])


def _mix2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        return splitmix64(a.astype(_U64) * _FNV
                          + splitmix64(b.astype(_U64))).view(np.int64)


def _probe_sorted(sorted_keys: np.ndarray, keys: np.ndarray) -> np.ndarray:
    if not len(keys) or not len(sorted_keys):
        return np.zeros(len(keys), bool)
    p = np.searchsorted(sorted_keys, keys)
    return (p < len(sorted_keys)) & \
        (sorted_keys[np.minimum(p, len(sorted_keys) - 1)] == keys)


def duplicate_span_plan(ds, min_tokens: int = 32, text_col: str = "text",
                        id_col: str = "doc_id",
                        broadcast_limit: int = _BROADCAST_LIMIT):
    """Byte spans to strip: one row ``(id_col, b0, b1)`` per NON-FIRST
    occurrence of every duplicated ``min_tokens``-token window (spans of
    overlapping windows may overlap; :func:`strip_duplicate_spans` unions
    them). See the module docstring for the pass structure."""
    import ray

    L = int(min_tokens)
    if L < 2:
        raise ValueError("min_tokens must be >= 2")

    def partial_counts(t: pa.Table) -> pa.Table:
        h, _, _, _ = _window_rows(t, text_col, id_col, L)
        u, c = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64))})

    counts = ds.map_batches(partial_counts, batch_format="pyarrow",
                            batch_size=1024)
    dup = counts.groupby("h").sum("n").map_batches(
        lambda t: t.filter(pc.greater_equal(t["sum(n)"], 2)).select(["h"]),
        batch_format="pyarrow").materialize()
    n_dup = dup.count()

    if n_dup <= broadcast_limit:
        dup_sorted = (np.sort(dup.to_pandas()["h"].to_numpy())
                      if n_dup else np.zeros(0, np.int64))
        dup_ref = ray.put(dup_sorted)

        def emit_dup(t: pa.Table) -> pa.Table:
            import ray as _ray
            dk = _ray.get(dup_ref)
            h, ids, pos, b1 = _window_rows(t, text_col, id_col, L)
            keep = _probe_sorted(dk, h)
            return pa.table({"h": pa.array(h[keep]),
                             id_col: pa.array(ids[keep]),
                             "pos": pa.array(pos[keep]),
                             "b1": pa.array(b1[keep])})

        dupwin = ds.map_batches(emit_dup, batch_format="pyarrow",
                                batch_size=1024).materialize()
        if not dupwin.count():
            return dupwin.map_batches(
                lambda t: t.select([id_col, "pos", "b1"]).rename_columns(
                    [id_col, "b0", "b1"]), batch_format="pyarrow")

        # winner doc per hash (<= n_dup rows <= broadcast_limit)
        w1 = dupwin.groupby("h").min(id_col).to_pandas()
        o = np.argsort(w1["h"].to_numpy(), kind="stable")
        w1h = w1["h"].to_numpy()[o]
        w1d = w1[f"min({id_col})"].to_numpy().astype(np.int64)[o]
        w1_ref = ray.put((w1h, w1d))

        def in_windoc(t: pa.Table) -> pa.Table:
            import ray as _ray
            hh, dd = _ray.get(w1_ref)
            h = np.asarray(t["h"]).astype(np.int64)
            ids = np.asarray(t[id_col]).astype(np.int64)
            p = np.searchsorted(hh, h)
            return t.filter(pa.array(dd[p] == ids))

        w2 = dupwin.map_batches(in_windoc, batch_format="pyarrow") \
            .groupby("h").min("pos").to_pandas()
        o2 = np.argsort(w2["h"].to_numpy(), kind="stable")
        w2h = w2["h"].to_numpy()[o2]
        w2p = w2["min(pos)"].to_numpy().astype(np.int64)[o2]
        w2_ref = ray.put((w1h, w1d, w2h, w2p))

        def non_winner(t: pa.Table) -> pa.Table:
            import ray as _ray
            hh, dd, h2, pp = _ray.get(w2_ref)
            h = np.asarray(t["h"]).astype(np.int64)
            ids = np.asarray(t[id_col]).astype(np.int64)
            pos = np.asarray(t["pos"]).astype(np.int64)
            p = np.searchsorted(hh, h)
            win = (dd[p] == ids) & (pp[np.searchsorted(h2, h)] == pos)
            kept = t.filter(pa.array(~win))
            return pa.table({id_col: kept[id_col], "b0": kept["pos"],
                             "b1": kept["b1"]})

        return dupwin.map_batches(non_winner, batch_format="pyarrow")

    # scale path: everything distributed — semi-join the dup set, then
    # composite-key joins for the two winner stages
    from .join import semi_join_ds

    def emit_all(t: pa.Table) -> pa.Table:
        h, ids, pos, b1 = _window_rows(t, text_col, id_col, L)
        return pa.table({"h": pa.array(h), id_col: pa.array(ids),
                         "pos": pa.array(pos), "b1": pa.array(b1)})

    allwin = ds.map_batches(emit_all, batch_format="pyarrow",
                            batch_size=1024)
    dupwin = semi_join_ds(allwin, dup, on="h").materialize()

    w1 = dupwin.groupby("h").min(id_col)
    w1k = w1.map_batches(
        lambda t: pa.table({"__k": pa.array(_mix2(
            np.asarray(t["h"]).astype(np.int64),
            np.asarray(t[f"min({id_col})"]).astype(np.int64)))}),
        batch_format="pyarrow")

    def add_k(t: pa.Table) -> pa.Table:
        k = _mix2(np.asarray(t["h"]).astype(np.int64),
                  np.asarray(t[id_col]).astype(np.int64))
        return t.append_column("__k", pa.array(k))

    # materialize between chained joins: two hash joins sharing the
    # streaming executor can deadlock on operator back-pressure (same
    # precaution as curate_corpus's chained-join barrier)
    keyed = dupwin.map_batches(add_k, batch_format="pyarrow")
    cand = semi_join_ds(keyed, w1k.materialize(), on="__k").materialize()
    w2 = cand.groupby("__k").min("pos")
    w2k = w2.map_batches(
        lambda t: pa.table({"__k2": pa.array(_mix2(
            np.asarray(t["__k"]).astype(np.int64),
            np.asarray(t["min(pos)"]).astype(np.int64)))}),
        batch_format="pyarrow")

    def add_k2(t: pa.Table) -> pa.Table:
        k = _mix2(np.asarray(t["__k"]).astype(np.int64),
                  np.asarray(t["pos"]).astype(np.int64))
        return t.append_column("__k2", pa.array(k))

    losers = semi_join_ds(keyed.map_batches(add_k2, batch_format="pyarrow"),
                          w2k.materialize(), on="__k2", anti=True)
    return losers.map_batches(
        lambda t: pa.table({id_col: t[id_col], "b0": t["pos"],
                            "b1": t["b1"]}), batch_format="pyarrow")


def strip_duplicate_spans(ds, spans, text_col: str = "text",
                          id_col: str = "doc_id",
                          broadcast_limit: int = _BROADCAST_LIMIT):
    """Remove byte spans ``[b0, b1)`` (possibly overlapping — they are
    unioned) from each document's text. Bytes outside stripped spans are
    byte-identical to the input; null texts stay null. Returns
    ``(id_col, text_col)``.

    Count-gated: below ``broadcast_limit`` the span list is broadcast and
    every batch cuts its own rows in place (flat-buffer delta mask, one
    gather, no shuffle); above it, docs and spans co-locate via one
    ``groupby(id)`` whose groups are one document plus its spans."""
    spans = spans.materialize()
    n = spans.count()

    if n <= broadcast_limit:
        import ray
        if n:
            sp = spans.to_pandas()
            sp_ids = sp[id_col].to_numpy().astype(np.int64)
            sp_b0 = sp["b0"].to_numpy().astype(np.int64)
            sp_b1 = sp["b1"].to_numpy().astype(np.int64)
            o = np.argsort(sp_ids, kind="stable")
            sp_ids, sp_b0, sp_b1 = sp_ids[o], sp_b0[o], sp_b1[o]
        else:
            sp_ids = sp_b0 = sp_b1 = np.zeros(0, np.int64)
        ref = ray.put((sp_ids, sp_b0, sp_b1))

        def rebuild(t: pa.Table) -> pa.Table:
            import ray as _ray
            ids_s, b0_s, b1_s = _ray.get(ref)
            col = t[text_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            row_ids = np.asarray(pc.cast(t[id_col].combine_chunks()
                                         if isinstance(t[id_col],
                                                       pa.ChunkedArray)
                                         else t[id_col],
                                         pa.int64())).astype(np.int64)
            lo = np.searchsorted(ids_s, row_ids, "left")
            hi = np.searchsorted(ids_s, row_ids, "right")
            if not (hi > lo).any():
                return pa.table({id_col: t[id_col], text_col: col})
            data, starts, lengths = flatten_column(col)
            # expand each affected row's span list to flat-buffer ranges
            per_row = hi - lo
            span_row = np.repeat(np.arange(t.num_rows), per_row)
            span_idx = (np.arange(int(per_row.sum()))
                        - np.repeat(np.cumsum(per_row) - per_row, per_row)
                        + lo[span_row])
            s0 = starts[span_row] + b0_s[span_idx]
            s1 = starts[span_row] + np.minimum(
                b1_s[span_idx], lengths[span_row])
            new_col = _cut_flat(data, starts, lengths, s0, s1, col.type)
            if col.null_count:
                new_col = pc.if_else(pc.is_null(col),
                                     pa.nulls(len(col), new_col.type),
                                     new_col)
            return pa.table({id_col: t[id_col], text_col: new_col})

        return ds.map_batches(rebuild, batch_format="pyarrow")

    # scale path: co-locate each doc with its spans via one groupby
    def doc_rows(t: pa.Table) -> pa.Table:
        col = pc.cast(t[text_col], pa.large_string())
        return pa.table({id_col: pc.cast(t[id_col], pa.int64()),
                         "b0": pa.array(np.full(t.num_rows, -1, np.int64)),
                         "b1": pa.array(np.zeros(t.num_rows, np.int64)),
                         "__txt": col})

    def span_rows(t: pa.Table) -> pa.Table:
        return pa.table({id_col: pc.cast(t[id_col], pa.int64()),
                         "b0": pc.cast(t["b0"], pa.int64()),
                         "b1": pc.cast(t["b1"], pa.int64()),
                         "__txt": pa.nulls(t.num_rows, pa.large_string())})

    u = ds.map_batches(doc_rows, batch_format="pyarrow").union(
        spans.map_batches(span_rows, batch_format="pyarrow"))

    def cut_one(g: pa.Table) -> pa.Table:
        b0 = np.asarray(g["b0"]).astype(np.int64)
        is_doc = b0 < 0
        di = int(np.flatnonzero(is_doc)[0])
        txt = g["__txt"][di].as_py()
        out_id = pa.array([int(g[id_col][di].as_py())], pa.int64())
        if txt is None:
            return pa.table({id_col: out_id,
                             text_col: pa.nulls(1, pa.large_string())})
        raw = txt.encode("utf-8")
        b1 = np.asarray(g["b1"]).astype(np.int64)
        s0 = np.minimum(b0[~is_doc], len(raw))
        s1 = np.minimum(b1[~is_doc], len(raw))
        delta = np.zeros(len(raw) + 1, np.int64)
        np.add.at(delta, s0, 1)
        np.add.at(delta, s1, -1)
        keep = np.cumsum(delta[:-1]) == 0
        out = np.frombuffer(raw, np.uint8)[keep].tobytes().decode("utf-8")
        return pa.table({id_col: out_id,
                         text_col: pa.array([out], pa.large_string())})

    return u.groupby(id_col).map_groups(cut_one, batch_format="pyarrow")


def _cut_flat(data: np.ndarray, starts: np.ndarray, lengths: np.ndarray,
              s0: np.ndarray, s1: np.ndarray, out_type) -> pa.Array:
    """Drop flat-buffer ranges ``[s0, s1)`` (absolute positions, may
    overlap) and rebuild the string column — one delta-mask cumsum + one
    gather, no per-row work."""
    n = len(starts)
    delta = np.zeros(len(data) + 1, np.int64)
    np.add.at(delta, s0, 1)
    np.add.at(delta, s1, -1)
    keep = np.cumsum(delta[:-1]) == 0
    cs = np.concatenate([[0], np.cumsum(keep)]).astype(np.int64)
    new_lens = cs[starts + lengths] - cs[starts]
    buf = data[keep]
    offsets = np.concatenate([[0], np.cumsum(new_lens)]).astype(np.int64)
    bin_arr = pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf.tobytes())])
    out = bin_arr.cast(pa.large_string())
    if out_type in (pa.string(), pa.utf8()):
        out = out.cast(pa.string())
    return out


def dedup_substrings(ds, min_tokens: int = 32, text_col: str = "text",
                     id_col: str = "doc_id",
                     broadcast_limit: int = _BROADCAST_LIMIT):
    """Compose :func:`duplicate_span_plan` + :func:`strip_duplicate_spans`:
    every duplicated ``min_tokens``-token span survives only at its first
    occurrence. Returns ``(id_col, text_col)``."""
    spans = duplicate_span_plan(ds, min_tokens, text_col, id_col,
                                broadcast_limit)
    return strip_duplicate_spans(ds, spans, text_col, id_col,
                                 broadcast_limit)
