"""Audio near-duplicate fingerprinting: 64-bit spectral-delta hash
(chromaprint-style construction) over PCM WAV payloads, feeding the
same banded-LSH pair generator as the image path
(:func:`raystack.ops.imagehash.phash_dup_pairs` — the pair machinery
is hash-agnostic).

The hash: mono mix → 17 equal time frames → per-frame FFT magnitude →
energy in 4 log-spaced bands over a FIXED absolute frequency range
(100–3500 Hz, converted to bins via the stream's sample rate) →
bit[t, b] = band energy rose from frame t to t+1 (16 deltas × 4 bands
= 64 bits). Comparisons are sign-of-difference and bands are anchored
in Hz, so the fingerprint is invariant to amplitude scaling, sample
width AND sample rate — the properties a crawl dedup needs (same clip
ripped at different volumes / bit depths / rates).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_N_FRAMES = 17
_N_BANDS = 4
#: absolute band range (Hz) — anchors the hash across sample rates
_F_LO = 100.0
_F_HI = 3500.0


def audio_hash64(samples: np.ndarray, rate: int) -> int:
    """(n, channels) float samples in [-1, 1] → 64-bit fingerprint
    (uint64). Deterministic; amplitude- and sample-width-invariant."""
    if samples.size == 0:
        return 0
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n < _N_FRAMES * 2:  # too short for spectral deltas: pad
        mono = np.pad(mono, (0, _N_FRAMES * 2 - n))
        n = len(mono)
    flen = n // _N_FRAMES
    frames = mono[: flen * _N_FRAMES].reshape(_N_FRAMES, flen)
    # Hann window: cuts spectral leakage so band energies (and their
    # delta signs) line up across sample rates with different bin grids
    frames = frames * np.hanning(flen)
    mag = np.abs(np.fft.rfft(frames, axis=1))  # (frames, flen//2+1)
    nbins = mag.shape[1]
    # 4 log-spaced band edges over a FIXED Hz range: bin k covers
    # frequency k * rate / flen, so edges_hz → bins via flen / rate
    rate = max(float(rate), 1.0)
    hi = min(_F_HI, rate / 2.0)
    lo = min(_F_LO, hi / 8.0) if hi <= _F_LO else _F_LO
    edges_hz = np.geomspace(max(lo, 1e-3), hi, _N_BANDS + 1)
    edges = np.unique(np.clip(
        np.round(edges_hz * flen / rate).astype(np.int64), 1, nbins - 1))
    if len(edges) < _N_BANDS + 1:  # tiny spectra: fill from free bins
        free = np.setdiff1d(np.arange(1, nbins), edges)
        edges = np.sort(np.append(
            edges, free[: _N_BANDS + 1 - len(edges)]))
    if len(edges) < _N_BANDS + 1:  # truly degenerate: per-bin zero-pad
        energy = np.zeros((_N_FRAMES, _N_BANDS))
        energy[:, : max(nbins - 1, 0)] = (mag[:, 1:] ** 2)
    else:
        # reduceat over ALL 5 edges: the 5th segment [edges[4]:nyquist]
        # holds everything ABOVE the top band edge and is dropped —
        # without it the 4th band ran to Nyquist, breaking sample-rate
        # invariance for clips with energy above _F_HI
        energy = np.add.reduceat((mag ** 2), edges,
                                 axis=1)[:, :_N_BANDS]
    delta = energy[1:] > energy[:-1]  # (16, 4)
    bits = delta.ravel().astype(np.uint64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return int(bits @ weights)


class AudioHash:
    """Actor-pool stage: WAV payloads → (media_id, phash:int64|null).
    Output column name matches the image path so
    :func:`raystack.ops.imagehash.phash_dup_pairs` consumes either."""

    def __init__(self):
        from raystack.ops.multimodal import decode_wav
        self._decode = decode_wav

    def __call__(self, t: pa.Table) -> pa.Table:
        import struct
        import wave
        n = t.num_rows
        hashes = np.zeros(n, np.uint64)
        ok = np.zeros(n, bool)
        col = t["payload"]
        for i in range(n):
            p = col[i].as_py()
            if p is None or bytes(p[:4]) != b"RIFF":
                continue
            try:
                samples, rate = self._decode(p)
            except (ValueError, EOFError, wave.Error, struct.error):
                continue
            hashes[i] = audio_hash64(samples, rate)
            ok[i] = True
        return pa.table({
            "media_id": t["media_id"],
            "phash": pa.array(np.where(ok, hashes, 0).view(np.int64),
                              mask=~ok),
        })


def add_audio_hash(ds, concurrency=(1, 4), batch_size: int = 64):
    return ds.map_batches(AudioHash, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


def audio_dedup(ds, max_distance: int = 5, bands: int = 8,
                concurrency=(1, 4)):
    """End-to-end audio near-dedup over a ``MEDIA_SCHEMA`` dataset:
    fingerprint → banded-LSH verified pairs (shared machinery with
    :func:`raystack.ops.imagehash.image_dedup`)."""
    from raystack.ops.imagehash import phash_dup_pairs
    return phash_dup_pairs(add_audio_hash(ds, concurrency=concurrency),
                           max_distance=max_distance, bands=bands)
