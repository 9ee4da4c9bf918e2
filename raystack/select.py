"""Sampling-based codec auto-selection (SURVEY.md §2.10 "codec auto-selection",
§7 step 3).

Two-stage cost model per column chunk:

1. **Cheap stats prefilter** on a deterministic sample (distinct ratio, run
   ratio, average value width) prunes the candidate list — no point
   sample-encoding an FSST table for a 3-value categorical, or RLE for a
   column with no runs.
2. **Sample-encode** the survivors (sample capped by rows *and* bytes so
   wide html values don't make selection cost rival encoding cost) and pick
   the smallest estimate, with hysteresis toward ``plain``.

Seeding is (column, part_key)-stable so Ray task retries pick the same codec
(SURVEY.md §7 "retries must not change codec choices").
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .codecs import get_codec
from .codecs import forbp, fsst
from .codecs.base import EncodedChunk

_SAMPLE_ROWS = 512
_SAMPLE_MAX_BYTES = 128 * 1024
_HYSTERESIS = 0.95  # non-plain must beat plain by ≥5%
_SLOW_HYSTERESIS = 0.90  # full-column FSST must beat the best fast codec by ≥10%


def _stable_seed(*parts: str | int) -> int:
    return zlib.crc32("|".join(str(p) for p in parts).encode()) & 0xFFFFFFFF


def _sample(arr: pa.Array, seed: int) -> pa.Array:
    n = len(arr)
    if n <= _SAMPLE_ROWS:
        sample = arr
    else:
        rng = np.random.default_rng(seed)
        idx = np.sort(rng.choice(n, size=_SAMPLE_ROWS, replace=False))
        sample = arr.take(pa.array(idx))
    if sample.nbytes > _SAMPLE_MAX_BYTES and len(sample) > 32:
        keep = max(32, int(len(sample) * _SAMPLE_MAX_BYTES / sample.nbytes))
        sample = sample.slice(0, keep)
    return sample


def _stats(sample: pa.Array) -> dict:
    n = max(len(sample), 1)
    try:
        distinct = len(pc.dictionary_encode(sample).dictionary)
    except Exception:
        distinct = n
    if len(sample) > 1:
        try:
            neq = pc.not_equal(sample.slice(1), sample.slice(0, len(sample) - 1))
            runs = 1 + int(np.asarray(pc.fill_null(neq, True)).sum())
        except Exception:  # nested types: no equality kernel → assume no runs
            runs = len(sample)
    else:
        runs = len(sample)
    return {"distinct_ratio": distinct / n, "run_ratio": runs / n,
            "avg_bytes": sample.nbytes / n}


def candidates_for(t: pa.DataType, stats: dict | None = None) -> list[str]:
    """Candidate codecs for a type, pruned by sample stats when given."""
    from .codecs import alp, listwrap
    if listwrap.is_supported(t):
        child = t.value_type
        if alp.is_supported(child):
            inner = ["alprd", "alp"]
        elif pa.types.is_floating(child):
            inner = ["bytesplit"]
        elif forbp.is_supported(child):
            inner = ["for_bitpack", "delta_bitpack", "dict"]
        elif fsst.is_supported(child):
            inner = ["fsst", "dict", "plain+zs"]
        elif listwrap.is_supported(child):
            inner = [c for c in candidates_for(child)
                     if c.startswith("list->")]
        else:
            inner = ["plain+zs"]
        wrapped = [f"list->{c}" for c in inner]
        # an LZ stage over the packed list chunk often beats both the bare
        # pack and plain+zs (e.g. bit-packed token ids -> zstd)
        wrapped += [f"{w}+zs" for w in wrapped[:2] if not w.endswith("+zs")]
        return ["plain", "plain+zs"] + wrapped
    if forbp.is_supported(t):
        out = ["plain", "for_bitpack", "for_bitpack+zs", "delta_bitpack",
               "delta_bitpack+zs"]
        if stats is None or stats["distinct_ratio"] < 0.5:
            out.append("dict")
        if stats is None or stats["run_ratio"] < 0.5:
            out.append("rle")
        return out
    if fsst.is_supported(t):
        out = ["plain", "plain+zs"]
        low_card = stats is None or stats["distinct_ratio"] < 0.5
        wide = stats is None or stats["avg_bytes"] >= 8
        if low_card:
            out += ["dict", "dict+zs", "dict->fsst"]
            if stats is not None and stats["run_ratio"] < 0.5:
                out.append("rle->dict")
        if wide and not (stats is not None and low_card):
            out += ["fsst+zs", "fc+zs"]
        if stats is None:
            out += ["fsst", "fsst+zs", "rle->dict", "fc", "fc+zs"]
        return out
    out = ["plain", "plain+zs"]
    if pa.types.is_floating(t):
        if alp.is_supported(t):
            out += ["alp", "alprd"]
        out.append("bytesplit")
    if stats is None or stats["distinct_ratio"] < 0.5:
        out.append("dict")
    if stats is None or stats["run_ratio"] < 0.5:
        out.append("rle")
    return out


#: per-process (codec, arrow type) round-trip verdicts — the defense-in-
#: depth check runs once per pair, not once per (column, partition)
_VERIFIED: dict = {}


def choose_codec(arr: pa.Array, column: str = "", part_key: int | str = 0) -> str:
    """Pick the cheapest candidate codec for this chunk by sample-encoding."""
    n = len(arr)
    if n == 0:
        return "plain"
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    sample = _sample(arr, _stable_seed(column, part_key))
    cands = candidates_for(arr.type, _stats(sample))
    sn = len(sample)
    est: dict[str, float] = {}
    chunks: dict[str, object] = {}
    for name in cands:
        try:
            chunk = get_codec(name).encode(sample)
        except Exception:
            continue
        chunks[name] = chunk
        # scale per-value cost; table/meta overhead counted once (not scaled)
        meta_overhead = len(chunk.to_bytes()) - chunk.nbytes
        est[name] = chunk.nbytes * (n / sn) + meta_overhead
    if not est:
        return "plain"
    plain_cost = est.get("plain", float("inf"))
    best = min(est, key=est.get)  # type: ignore[arg-type]
    # speed-aware hysteresis: full-column FSST encodes ~20x slower than the
    # buffer-level codecs, and front coding's writer-trick decode is ~10-40x
    # slower than plain; only pick them when the size win is decisive
    # (> 10%), not sampling noise
    slow = {"fsst", "fsst+z", "fsst+zs", "fc", "fc+z", "fc+zs"}
    if best in slow:
        fast = {k: v for k, v in est.items() if k not in slow}
        if fast:
            best_fast = min(fast, key=fast.get)  # type: ignore[arg-type]
            if est[best] > _SLOW_HYSTERESIS * fast[best_fast]:
                best = best_fast
    if best != "plain" and est[best] > _HYSTERESIS * plain_cost:
        return "plain"
    if best != "plain":
        # defense in depth: the winner must ROUND-TRIP the sample
        # bit-identically, else fall back to plain (which always does) —
        # a codec edge case (unusual type, odd width) degrades to a
        # bigger file, never to corrupt data. Corruption classes are
        # TYPE-driven, so the verdict caches per (codec, arrow type) per
        # worker process: the decode runs once per pair, not once per
        # (column, partition) — zero steady-state cost on the encode
        # hot path (the per-partition version measurably dragged the
        # scaling job)
        key = (best, str(arr.type))
        cached = _VERIFIED.get(key)
        if cached is None:
            from .codecs import decode_blob
            from .codecs.base import arrays_bit_identical
            try:
                back = decode_blob(chunks[best].to_bytes())
                cached = arrays_bit_identical(back, sample)
            except Exception:
                cached = False
            _VERIFIED[key] = cached
        if not cached:
            return "plain"
    return best


def encode_auto(arr: pa.Array, column: str = "", part_key: int | str = 0) -> EncodedChunk:
    """Auto-select a codec for ``arr`` and encode the full chunk with it."""
    name = choose_codec(arr, column, part_key)
    return get_codec(name).encode(arr)
