"""Cross-document sequence packing for LLM training data.

The standard pretraining layout concatenates every document's tokens
(plus a separator/EOS after each doc) into ONE global token stream in a
deterministic document order, then cuts the stream into fixed-length
training sequences of exactly ``seq_len`` tokens — documents flow
across sequence boundaries, so there is zero padding (GPT-style
"concat and chunk" packing; public, e.g. the GPT-3 / T5 data papers).

:func:`sequence_pack_plan` computes that layout EXACTLY and
distributedly without ever materializing tokens: the only per-doc fact
it needs is the token count. Output is one row per (document, sequence)
span — enough for a downstream tokenize-and-fill stage to build every
training sequence independently (each span says which slice of which
doc lands at which offset of which sequence).

Distributed shape (100 TB): the global stream offset of doc *d* is the
prefix sum of ``n_tokens + sep`` over all docs with id < d. That is
computed in two bounded steps:

1. one column-pruned pass computes the id range and per-id-range-bucket
   token sums (``n_buckets`` partial rows per batch, pre-aggregated →
   a ≤ ``n_buckets``-row groupby to the driver — the ONLY driver
   collect, bounded by the bucket count, never by corpus size);
2. one ``groupby(bucket).map_groups`` pass sorts each bucket by id,
   cumsums locally, adds the broadcast bucket base offset, and emits
   span rows with pure repeat/arange math — vectorized within groups,
   one shuffle total, no Python per row.

Buckets are id-RANGE buckets (order-preserving, required for the
prefix sum). Ids must be unique; uniqueness within each bucket is
asserted (cross-bucket duplicates cannot collide because ranges are
disjoint). A heavily skewed id distribution can unbalance buckets —
raise ``n_buckets`` (each group's work is O(rows in bucket)).

No reference counterpart (d6tstack has no notion of token streams);
this is graft capability for the training-data operator family
(SURVEY.md §2, "beyond the reference").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["sequence_pack_plan", "pack_stats"]

_EMPTY_PLAN = pa.table({
    "doc_id": pa.array([], pa.int64()),
    "seq_id": pa.array([], pa.int64()),
    "seq_off": pa.array([], pa.int64()),
    "doc_off": pa.array([], pa.int64()),
    "n_toks": pa.array([], pa.int64()),
})


def _bucket_of(ids: np.ndarray, lo: int, hi: int, n_buckets: int) -> np.ndarray:
    """Order-preserving id-range bucket in [0, n_buckets).

    All math stays exact for the FULL int64 id range: ``span`` and the
    bucket width are Python ints (arbitrary precision), and the offset
    ``ids - lo`` is computed as a wrapping uint64 subtraction (two's
    complement makes it the true unsigned difference for any
    ``lo <= id <= hi``) — a plain ``(ids - lo) * n_buckets`` would
    overflow int64/uint64 for wide id ranges and silently scramble the
    bucket order, corrupting every prefix sum downstream."""
    span = hi - lo + 1
    width = -(-span // n_buckets)  # ceil; exact in Python ints
    off = ids.astype(np.int64).view(np.uint64) - np.int64(lo).view(np.uint64)
    return (off // np.uint64(width)).astype(np.int64)


def sequence_pack_plan(ds, seq_len: int, *, id_col: str = "doc_id",
                       tokens_col: str = "n_tokens",
                       text_col: str = "text",
                       sep_tokens: int = 1, n_buckets: int = 64):
    """Exact global concat-and-cut packing plan.

    Every doc contributes ``n_tokens + sep_tokens`` stream positions in
    ``id_col`` order; sequences are consecutive ``seq_len``-token
    windows over the stream. Returns a Dataset with one row per
    (doc, sequence) span:

    - ``doc_id`` — the document
    - ``seq_id`` — which training sequence the span lands in
    - ``seq_off`` — offset of the span inside that sequence
    - ``doc_off`` — offset of the span inside the doc's contribution
      (the trailing ``sep_tokens`` positions are part of it)
    - ``n_toks`` — span length (> 0)

    Spans of one ``seq_id`` tile [0, seq_len) exactly (the last
    sequence may end short); spans of one doc tile its contribution
    exactly. Docs contributing 0 positions emit no rows.

    If ``tokens_col`` is absent, it is derived with the whitespace
    tokenizer (:func:`raystack.ops.text.add_token_count`) from
    ``text_col`` — pass a precomputed count column for any other
    tokenizer.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if sep_tokens < 0:
        raise ValueError("sep_tokens must be >= 0")
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")

    if tokens_col not in ds.schema().names:
        from .text import add_token_count
        ds = add_token_count(ds, text_col=text_col, out_col=tokens_col)
    slim = ds.select_columns([id_col, tokens_col])

    # ---- pass 1a: id range (column-pruned scan, 1 row to the driver)
    from ray.data.aggregate import Max, Min
    mm = slim.aggregate(Min(id_col), Max(id_col))
    if mm is None or mm.get(f"min({id_col})") is None:
        import ray.data
        return ray.data.from_arrow(_EMPTY_PLAN)
    lo, hi = int(mm[f"min({id_col})"]), int(mm[f"max({id_col})"])

    # ---- pass 1b: per-bucket contribution sums (pre-aggregated partials;
    # the groupby sees ≤ n_buckets rows per input batch, the driver sees
    # ≤ n_buckets rows total)
    def partial_sums(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        c = t[tokens_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64) + sep_tokens
        b = _bucket_of(ids.astype(np.int64), lo, hi, n_buckets)
        # integer accumulation — bincount's float64 weights would lose
        # exactness once a bucket's token sum passes 2**53 (reachable at
        # 10^12-doc corpus scale), silently shifting every later offset
        sums = np.zeros(n_buckets, np.int64)
        np.add.at(sums, b, c)
        nz = np.flatnonzero(sums)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "c_sum": pa.array(sums[nz])})

    agg = slim.map_batches(partial_sums, batch_format="pyarrow") \
        .groupby("bucket").sum("c_sum").to_pandas()
    base = np.zeros(n_buckets, np.int64)
    base[agg["bucket"].to_numpy()] = agg["sum(c_sum)"].to_numpy()
    # bucket base offset = total contribution of all LOWER buckets
    base = np.concatenate([[0], np.cumsum(base)[:-1]])

    # ---- pass 2: per-bucket local prefix + span emission (one shuffle)
    def spans(g: pa.Table) -> pa.Table:
        ids = g[id_col].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c = g[tokens_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64) + sep_tokens
        if len(ids) == 0:
            return _EMPTY_PLAN
        order = np.argsort(ids, kind="stable")
        ids, c = ids[order], c[order]
        if len(ids) > 1 and (ids[1:] == ids[:-1]).any():
            raise ValueError(
                f"sequence_pack_plan: duplicate {id_col} values — the "
                "packing order (and therefore the plan) is undefined")
        b = int(_bucket_of(ids[:1], lo, hi, n_buckets)[0]) if len(ids) else 0
        o = base[b] + np.concatenate([[0], np.cumsum(c)[:-1]])
        keep = c > 0
        ids, c, o = ids[keep], c[keep], o[keep]
        first = o // seq_len
        last = (o + c - 1) // seq_len
        n_spans = last - first + 1
        total = int(n_spans.sum())
        doc = np.repeat(np.arange(len(ids)), n_spans)
        first0 = np.concatenate([[0], np.cumsum(n_spans)[:-1]])
        k = np.arange(total) - first0[doc]
        seq_id = first[doc] + k
        s = np.maximum(o[doc], seq_id * seq_len)
        e = np.minimum(o[doc] + c[doc], (seq_id + 1) * seq_len)
        return pa.table({
            "doc_id": pa.array(ids[doc], pa.int64()),
            "seq_id": pa.array(seq_id, pa.int64()),
            "seq_off": pa.array(s - seq_id * seq_len, pa.int64()),
            "doc_off": pa.array(s - o[doc], pa.int64()),
            "n_toks": pa.array(e - s, pa.int64()),
        })

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "__bkt", pa.array(_bucket_of(ids, lo, hi, n_buckets)))

    return slim.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__bkt").map_groups(spans, batch_format="pyarrow")


def pack_stats(plan_ds, seq_len: int) -> dict:
    """Summary of a packing plan: sequence count, token total, and the
    fill of the final (only possibly-short) sequence. One small
    aggregate — the plan never lands on the driver."""
    from ray.data.aggregate import Max, Sum
    agg = plan_ds.aggregate(Max("seq_id"), Sum("n_toks"))
    n_seq = int(agg["max(seq_id)"]) + 1
    total = int(agg["sum(n_toks)"])
    last_fill = total - (n_seq - 1) * seq_len
    return {"n_sequences": n_seq, "total_tokens": total,
            "last_fill": last_fill, "seq_len": seq_len}
