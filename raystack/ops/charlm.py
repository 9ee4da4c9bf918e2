"""Character n-gram language-model quality scoring (the CCNet /
Gopher-style "does this look like natural language" signal, without
KenLM).

Model: order-3 character LM over a 29-symbol reduced alphabet
(space, a–z folded to lowercase, digits collapsed, everything else one
OTHER symbol). Training counts trigrams into a dense ``29³`` table —
24 KB of int64 per partial — so distributed training is a map over a
bounded sample emitting ONE partial count row per batch, summed on the
driver (the sample size is explicit; the full corpus is never
counted). Scoring is map-only: the ~100 KB log-prob table is captured
once in the batch function (Ray ships it with the task closure, not
per batch) and each document's mean log-probability per character
comes from one LUT gather + one reduceat — no shuffle, no Python per
row.

100 TB shape: train on ``ds.limit(sample_rows)`` (a few hundred MB at
most), score the full corpus embarrassingly parallel. Low
``logprob_per_char`` (high perplexity) flags gibberish, base64 blobs,
boilerplate soup; the threshold is corpus-dependent and belongs to the
caller.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_A = 29  # alphabet size: 0 space, 1-26 a-z, 27 digit, 28 other


def _byte_lut() -> np.ndarray:
    lut = np.full(256, 28, np.int32)
    for ws in b" \t\r\n\f\v":
        lut[ws] = 0
    for i in range(26):
        lut[ord("a") + i] = 1 + i
        lut[ord("A") + i] = 1 + i
    for d in range(10):
        lut[ord("0") + d] = 27
    return lut


_LUT = _byte_lut()


def _flatten_text(col):
    """(data bytes, starts, lengths) of a string column (shared helper
    semantics of :func:`raystack.ops.hashing.flatten_column`)."""
    from raystack.ops.hashing import flatten_column
    return flatten_column(col)


def _trigram_counts_batch(t: pa.Table, text_col: str) -> np.ndarray:
    data, starts, lengths = _flatten_text(t[text_col])
    ids = _LUT[data]
    n = len(ids)
    counts = np.zeros(_A * _A * _A, np.int64)
    if n < 3:
        return counts
    # rolling trigram index over the flat buffer
    tri = ids[: n - 2] * (_A * _A) + ids[1: n - 1] * _A + ids[2:]
    # mask trigrams that straddle document boundaries: a window starting
    # at i crosses boundary s iff i ∈ {s-2, s-1}
    valid = np.ones(n - 2, bool)
    bs = starts[1:].astype(np.int64)
    for off in (1, 2):
        idx = bs - off
        sel = (idx >= 0) & (idx < n - 2)
        valid[idx[sel]] = False
    np.add.at(counts, tri[valid], 1)
    return counts


def train_char_lm(ds, text_col: str = "text",
                  sample_rows: int = 100_000,
                  alpha: float = 0.1) -> np.ndarray:
    """Train the order-3 char LM on a bounded sample → float32
    log-prob table of shape ``(29³,)`` (log P(c | prev two), add-alpha
    smoothed). The driver only ever sees one 24 KB partial per batch of
    the SAMPLE, never corpus-sized state."""
    def partial(t: pa.Table) -> pa.Table:
        c = _trigram_counts_batch(t, text_col)
        return pa.table({"counts": pa.array([c.tobytes()],
                                            pa.large_binary())})

    parts = ds.limit(sample_rows).map_batches(
        partial, batch_format="pyarrow").take_all()
    counts = np.zeros(_A * _A * _A, np.int64)
    for r in parts:
        counts += np.frombuffer(r["counts"], np.int64)
    return counts_to_logprob(counts, alpha)


def counts_to_logprob(counts: np.ndarray, alpha: float = 0.1) \
        -> np.ndarray:
    """Add-alpha smoothing toward the corpus UNIGRAM prior (not
    uniform): an unseen context scores ≈ log P_unigram(c), so symbols
    rare in the training corpus stay expensive even where the trigram
    context is novel — uniform smoothing would score pure gibberish
    ABOVE in-alphabet text with sharp (wrong-target) contexts."""
    ctx = counts.reshape(_A * _A, _A)
    uni = ctx.sum(axis=0).astype(np.float64)
    p_uni = (uni + 1.0) / (uni.sum() + _A)
    totals = ctx.sum(axis=1, keepdims=True)
    beta = alpha * _A
    logp = np.log((ctx + beta * p_uni[None, :]) / (totals + beta))
    return logp.reshape(-1).astype(np.float32)


def score_char_lm(ds, logprob: np.ndarray, text_col: str = "text",
                  out_col: str = "logprob_per_char"):
    """Append each document's mean trigram log-probability per
    character (0.0 for docs shorter than 3 symbols). Map-only; the
    table rides the task closure."""
    lp = np.ascontiguousarray(logprob, np.float32)
    if lp.shape != (_A * _A * _A,):
        raise ValueError("logprob table must have shape (29^3,)")

    def fn(t: pa.Table) -> pa.Table:
        data, starts, lengths = _flatten_text(t[text_col])
        ids = _LUT[data]
        n = len(ids)
        nrows = len(starts)
        scores = np.zeros(nrows, np.float64)
        if n >= 3:
            tri = ids[: n - 2] * (_A * _A) + ids[1: n - 1] * _A + ids[2:]
            vals = lp[tri].astype(np.float64)
            # per-doc sums over each doc's INTERIOR trigrams only: doc d
            # owns window starts [s_d, s_d + L_d - 2), which never cross
            # into the next doc, so a cumsum difference suffices
            ntri = np.maximum(lengths - 2, 0)
            has = ntri > 0
            if has.any():
                cs = np.concatenate([[0.0], np.cumsum(vals)])
                s = starts[has]
                k = ntri[has]
                scores[has] = (cs[s + k] - cs[s]) / k
        return t.append_column(out_col,
                               pa.array(scores, pa.float64()))
    return ds.map_batches(fn, batch_format="pyarrow")


def perplexity_filter(ds, logprob: np.ndarray, min_logprob: float,
                      text_col: str = "text"):
    """Keep documents whose mean char log-prob clears the floor (i.e.
    perplexity below the corresponding ceiling)."""
    import pyarrow.compute as pc
    scored = score_char_lm(ds, logprob, text_col)
    return scored.map_batches(
        lambda t: t.filter(pc.greater_equal(t["logprob_per_char"],
                                            min_logprob)),
        batch_format="pyarrow")
