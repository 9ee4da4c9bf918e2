"""Sampling-based codec auto-selection (SURVEY.md §2.10 "codec auto-selection",
§7 step 3).

Per column chunk: draw a deterministic sample (seeded by (column, part_key) so
Ray task retries pick the same codec — SURVEY.md §7 "retries must not change
codec choices"), sample-encode every candidate codec, estimate full-chunk
bytes, pick the argmin with hysteresis toward ``plain``.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .codecs import get_codec
from .codecs import forbp, fsst
from .codecs.base import EncodedChunk

_SAMPLE_ROWS = 1024
_HYSTERESIS = 0.95  # non-plain must beat plain by ≥5%


def candidates_for(t: pa.DataType) -> list[str]:
    if forbp.is_supported(t):
        return ["plain", "for_bitpack", "dict", "rle", "for_bitpack+z"]
    if fsst.is_supported(t):
        return ["plain", "dict", "dict->fsst", "rle->dict", "fsst",
                "fsst+z", "dict+z", "plain+z"]
    return ["plain", "dict", "rle", "plain+z"]


def _stable_seed(*parts: str | int) -> int:
    return zlib.crc32("|".join(str(p) for p in parts).encode()) & 0xFFFFFFFF


def _sample(arr: pa.Array, seed: int) -> pa.Array:
    n = len(arr)
    if n <= _SAMPLE_ROWS:
        return arr
    rng = np.random.default_rng(seed)
    idx = np.sort(rng.choice(n, size=_SAMPLE_ROWS, replace=False))
    return arr.take(pa.array(idx))


def choose_codec(arr: pa.Array, column: str = "", part_key: int | str = 0) -> str:
    """Pick the cheapest candidate codec for this chunk by sample-encoding."""
    n = len(arr)
    cands = candidates_for(arr.type)
    if n == 0:
        return "plain"
    sample = _sample(arr, _stable_seed(column, part_key))
    sn = len(sample)
    est: dict[str, float] = {}
    for name in cands:
        try:
            chunk = get_codec(name).encode(sample)
        except Exception:
            continue
        # scale per-value cost; table/meta overhead counted once (not scaled)
        meta_overhead = len(chunk.to_bytes()) - chunk.nbytes
        est[name] = chunk.nbytes * (n / sn) + meta_overhead
    if not est:
        return "plain"
    plain_cost = est.get("plain", float("inf"))
    best = min(est, key=est.get)  # type: ignore[arg-type]
    if best != "plain" and est[best] > _HYSTERESIS * plain_cost:
        return "plain"
    return best


def encode_auto(arr: pa.Array, column: str = "", part_key: int | str = 0) -> EncodedChunk:
    """Auto-select a codec for ``arr`` and encode the full chunk with it."""
    name = choose_codec(arr, column, part_key)
    return get_codec(name).encode(arr)
