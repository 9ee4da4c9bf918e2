"""Audio fingerprint tests: invariance properties and the end-to-end
Ray dedup path shared with the image-hash machinery."""

import io
import wave

import numpy as np
import pyarrow as pa

from raystack.ops.audiohash import (add_audio_hash, audio_dedup,
                                    audio_hash64)
from raystack.ops.imagehash import hamming64


def _wav(x, rate=8000, width=2, channels=1):
    if channels == 2 and x.ndim == 1:
        x = np.stack([x, x], -1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 2:
            w.writeframes((np.clip(x, -1, 1) * 32767)
                          .astype("<i2").tobytes())
        else:
            w.writeframes(((np.clip(x, -1, 1) * 127) + 128)
                          .astype(np.uint8).tobytes())
    return buf.getvalue()


def _sig(seed=7, n=16000, rate=8000):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    return (np.sin(2 * np.pi * 440 * t) * np.exp(-t)
            + 0.3 * np.sin(2 * np.pi * 1200 * t ** 1.5)
            + 0.1 * rng.standard_normal(n))


def _hash_of(payload):
    from raystack.ops.multimodal import decode_wav
    return audio_hash64(*decode_wav(payload))


def test_audio_hash_invariances():
    sig = _sig()
    h0 = _hash_of(_wav(sig))
    assert h0 == _hash_of(_wav(sig))  # deterministic
    # re-leveled: sign comparisons are scale-invariant; the residual
    # few bits come from int16 requantization flipping near-tie deltas
    assert hamming64([h0], [_hash_of(_wav(sig * 0.25))])[0] <= 4
    assert hamming64([h0], [_hash_of(_wav(sig, width=1))])[0] <= 6
    rng = np.random.default_rng(1)
    noisy = sig + 0.02 * rng.standard_normal(len(sig))
    assert hamming64([h0], [_hash_of(_wav(noisy))])[0] <= 8
    # stereo mix of the same content stays identical
    assert _hash_of(_wav(sig, channels=2)) == h0
    # degenerate inputs don't crash
    assert audio_hash64(np.zeros((0, 1)), 8000) == 0
    assert isinstance(audio_hash64(np.ones((5, 1)) * 0.5, 8000), int)


def test_audio_hash_rate_invariance():
    # same 2-second clip sampled at different rates: Hz-anchored bands
    # + Hann windowing keep the fingerprints near-identical
    dur = 2.0

    def sig_at(rate):
        t = np.arange(int(dur * rate)) / rate
        return (np.sin(2 * np.pi * 440 * t) * np.exp(-t)
                + 0.3 * np.sin(2 * np.pi * 1200 * t ** 1.5))

    h8 = _hash_of(_wav(sig_at(8000), rate=8000))
    h16 = _hash_of(_wav(sig_at(16000), rate=16000))
    h44 = _hash_of(_wav(sig_at(44100), rate=44100))
    assert hamming64([h8], [h16])[0] <= 4
    assert hamming64([h8], [h44])[0] <= 8


def test_audio_hash_discriminates():
    t = np.arange(16000) / 8000
    h0 = _hash_of(_wav(_sig()))
    far = []
    for s in range(6):
        r = np.random.default_rng(100 + s)
        o = (np.sin(2 * np.pi * (200 + 80 * s) * t)
             * np.cos(2 * np.pi * 3 * t)
             + 0.2 * r.standard_normal(16000))
        far.append(_hash_of(_wav(o)))
    assert (hamming64(np.full(6, h0, np.uint64),
                      np.array(far, np.uint64)) > 12).all()


def test_audio_dedup_end_to_end(ray_session):
    import ray

    from raystack.ops.multimodal import MEDIA_SCHEMA
    sig = _sig()
    rng = np.random.default_rng(9)
    other = 0.5 * np.sin(2 * np.pi * 220 * np.arange(16000) / 8000) \
        + 0.2 * rng.standard_normal(16000)
    payloads = [_wav(sig),          # 1
                _wav(sig * 0.5),    # 2: re-leveled dup of 1
                _wav(other),        # 3: unrelated
                b"NOTAUDIO"]        # 4: undecodable
    t = pa.table({"media_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "payload": pa.array(payloads, pa.large_binary()),
                  "mime": pa.array(["audio/wav"] * 4),
                  "meta": pa.array(["{}"] * 4)}, schema=MEDIA_SCHEMA)
    ds = ray.data.from_arrow(t)
    # take_all keeps 64-bit ints exact (to_pandas would float them)
    hashes = {r["media_id"]: r["phash"]
              for r in add_audio_hash(ds, concurrency=1).take_all()}
    assert hashes[4] is None
    assert hamming64([np.int64(hashes[1]).view(np.uint64)],
                     [np.int64(hashes[2]).view(np.uint64)])[0] <= 5
    pairs = audio_dedup(ds, max_distance=5, bands=8, concurrency=1) \
        .to_pandas()
    assert [(r.id_a, r.id_b) for r in pairs.itertuples()] == [(1, 2)]
    assert pairs["distance"].iloc[0] <= 5
