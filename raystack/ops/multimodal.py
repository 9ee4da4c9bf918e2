"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBS (the container ships no image/audio
libraries — clearly marked below); everything Ray-side is real and tested:
the media schema, actor-pool ``map_batches`` stages with small batch sizes
(large binary payloads), the per-actor one-time setup, and the output
layout. Swap ``_decode_image_real`` for a PIL/ffmpeg call on a cluster that
has them and nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.large_binary()),
    ("mime", pa.string()),
    ("meta", pa.string()),  # JSON: source-specific metadata
])

#: small batches — payload bytes dominate block size
MEDIA_BATCH_SIZE = 64


def _decode_image_real(payload: bytes):  # pragma: no cover
    """STUB: real image decode (PIL.Image.open) — library not in container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; not available in this container")


def _fake_decode_shape(payload_lens: np.ndarray, hashes: np.ndarray = None):
    """Deterministic fake decode: (w, h, c) derived from the payload byte
    length via SQL-expressible int64 arithmetic (so the driver's DuckDB
    oracle can recompute it). Stands in for the real decoder so the
    pipeline plumbing is testable end-to-end."""
    L = payload_lens.astype(np.int64)
    w = (L * 40503 % 65536) % 1920 + 16
    h = (L * 9973 % 65536) % 1080 + 16
    c = np.full(len(L), 3, dtype=np.int64)
    return w, h, c


class ImageFeatureExtractor:
    """Actor-pool stage: byte-histogram features + fake-decoded dimensions.

    Real plumbing: one-time setup in ``__init__`` (histogram bin edges /
    would-be model load), vectorized per-batch work, list<float> feature
    output. ``use_real_decode=True`` raises NotImplementedError per the stub
    contract."""

    def __init__(self, n_bins: int = 16, use_real_decode: bool = False):
        self.n_bins = n_bins
        self.use_real_decode = use_real_decode
        self.edges = np.linspace(0, 256, n_bins + 1)

    def __call__(self, t: pa.Table) -> pa.Table:
        from .hashing import flatten_column
        if self.use_real_decode:
            _decode_image_real(b"")
        data, starts, lengths = flatten_column(t["payload"])
        feats = []
        # histogram per row via one global bincount pass + reduceat
        bins = (data // (256 // self.n_bins)).astype(np.int64)
        onehot_sum = np.zeros((len(starts), self.n_bins), dtype=np.float64)
        for b in range(self.n_bins):
            ind = (bins == b).astype(np.float64)
            if len(ind):
                s = np.add.reduceat(ind, np.minimum(starts, len(ind) - 1))
                s[lengths == 0] = 0.0
                onehot_sum[:, b] = s
        norm = np.maximum(lengths, 1).astype(np.float64)
        feats = onehot_sum / norm[:, None]
        w, h, c = _fake_decode_shape(lengths)
        return pa.table({
            "media_id": t["media_id"].combine_chunks()
            if isinstance(t["media_id"], pa.ChunkedArray) else t["media_id"],
            "width": pa.array(w), "height": pa.array(h),
            "channels": pa.array(c),
            "features": pa.array(list(feats), type=pa.list_(pa.float64())),
        })


def extract_image_features(ds, concurrency=(1, 4),
                           batch_size: int = MEDIA_BATCH_SIZE,
                           use_real_decode: bool = False):
    return ds.map_batches(ImageFeatureExtractor, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs={
                              "use_real_decode": use_real_decode})


def frame_sample_stub(ds, every_n: int = 30):
    """Video frame sampling stub: real plumbing (flat_map-style explode of
    one media row into frame rows with frame_idx), fake frame payloads
    (64-byte slices of the source bytes). Fully vectorized: the explode,
    the per-frame byte gather and the output offsets are numpy over the
    flattened payload buffer — no per-row Python."""
    def fn(t: pa.Table) -> pa.Table:
        from .hashing import flatten_column
        data, starts, lengths = flatten_column(t["payload"])
        mids = np.asarray(t["media_id"]).astype(np.int64)
        n_frames = np.clip(lengths // (every_n * 64), 1, 8).astype(np.int64)
        total = int(n_frames.sum())
        row_rep = np.repeat(np.arange(len(mids)), n_frames)
        fi = (np.arange(total)
              - np.repeat(np.cumsum(n_frames) - n_frames, n_frames))
        f_start = starts[row_rep] + fi * 64
        f_end = np.minimum(f_start + 64, starts[row_rep] + lengths[row_rep])
        span = np.arange(64)
        gather = f_start[:, None] + span  # (total, 64)
        valid = gather < f_end[:, None]
        buf = data[gather[valid]] if total else np.empty(0, np.uint8)
        out_lens = valid.sum(axis=1) if total else np.empty(0, np.int64)
        offsets = np.concatenate([[0], np.cumsum(out_lens)]).astype(np.int64)
        frames = pa.Array.from_buffers(
            pa.large_binary(), total,
            [None, pa.py_buffer(offsets.tobytes()),
             pa.py_buffer(buf.tobytes())])
        return pa.table({"media_id": pa.array(mids[row_rep], pa.int64()),
                         "frame_idx": pa.array(fi, pa.int64()),
                         "frame": frames})
    return ds.map_batches(fn, batch_format="pyarrow",
                          batch_size=MEDIA_BATCH_SIZE)
