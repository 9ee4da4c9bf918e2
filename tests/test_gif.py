"""GIF codec + frame-sampling tests. LZW is lossless, so every decode
assertion here is bit-exact against the fixture encoder."""

import numpy as np
import pyarrow as pa
import pytest

from raystack.ops.gif import (_lzw_decode, _lzw_encode, decode_gif,
                              decode_gif_frames, encode_gif)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(5)


def test_lzw_roundtrip_exact(rng):
    for mcs in (2, 4, 8):
        for n in (0, 1, 7, 300, 20000):
            idx = bytes(rng.integers(0, 1 << mcs, n, dtype=np.uint8))
            assert bytes(_lzw_decode(_lzw_encode(idx, mcs), mcs)) == idx, \
                (mcs, n)
    # repetitive stream forces dictionary growth through every code
    # width and a 4096-entry reset
    rep = bytes((np.arange(200000) % 3).astype(np.uint8))
    assert bytes(_lzw_decode(_lzw_encode(rep, 2), 2)) == rep


def test_gif_single_frame_palettes_interlace(rng):
    for npal in (4, 16, 256):
        pal = rng.integers(0, 256, (npal, 3), dtype=np.uint8)
        fr = rng.integers(0, npal, (23, 31), dtype=np.uint8)
        for il in (False, True):
            out = decode_gif(encode_gif(fr, pal, interlace=il))
            assert np.array_equal(out, pal[fr]), (npal, il)


def test_gif_transparency(rng):
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    fr = rng.integers(0, 8, (10, 12), dtype=np.uint8)
    out = decode_gif(encode_gif(fr, pal, transparent=3))
    assert out.shape == (10, 12, 4)
    assert np.array_equal(out[..., 3] == 0, fr == 3)
    assert np.array_equal(out[fr != 3][:, :3], pal[fr[fr != 3]])


def test_gif_animation_sampling(rng):
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    fs = [np.full((6, 6), v, np.uint8) for v in (0, 1, 2)]
    frames = decode_gif_frames(encode_gif(fs, pal), every_n=2)
    assert len(frames) == 2
    assert np.array_equal(frames[0], np.broadcast_to(pal[0], (6, 6, 3)))
    assert np.array_equal(frames[1], np.broadcast_to(pal[2], (6, 6, 3)))
    # max_frames cap
    assert len(decode_gif_frames(encode_gif(fs, pal), max_frames=1)) == 1


def test_gif_disposal_restore_background(rng):
    # disposal=2 wipes the frame's region before the next frame renders
    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0]], np.uint8)
    f1 = np.ones((4, 4), np.uint8)   # red
    f2 = np.full((4, 4), 2, np.uint8)
    frames = decode_gif_frames(
        encode_gif([f1, f2], pal, transparent=0, disposal=2), every_n=1)
    # frame 2's transparent-free full canvas replaces everything
    assert np.array_equal(frames[1][..., :3],
                          np.broadcast_to(pal[2], (4, 4, 3)))


def test_gif_rejects_malformed(rng):
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    fr = rng.integers(0, 8, (5, 5), dtype=np.uint8)
    good = encode_gif(fr, pal)
    import struct
    for bad in (b"JUNK", b"GIF89a" + b"\x00" * 5, good[:30]):
        with pytest.raises((ValueError, IndexError, struct.error)):
            decode_gif(bad)


def test_gif_media_decoder_and_frame_sampler(ray_session):
    import ray

    from raystack.ops.multimodal import (MEDIA_SCHEMA, decode_media,
                                         decode_png, sample_gif_frames)
    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    fs = [rng.integers(0, 16, (9, 13), dtype=np.uint8) for _ in range(5)]
    anim = encode_gif(fs, pal)
    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([anim, anim[:25]], pa.large_binary()),
        "mime": pa.array(["image/gif"] * 2),
        "meta": pa.array(["{}"] * 2),
    }, schema=MEDIA_SCHEMA)
    ds = ray.data.from_arrow(t)
    got = decode_media(ds, concurrency=1).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert got["decoded"].tolist() == [True, False]
    assert (got.loc[0, "width"], got.loc[0, "height"]) == (13, 9)

    frames = sample_gif_frames(ds, every_n=2, concurrency=1).to_pandas() \
        .sort_values("frame_idx").reset_index(drop=True)
    # 5 frames sampled every 2 → indices 0, 2, 4; truncated row drops out
    assert frames["media_id"].tolist() == [1, 1, 1]
    assert frames["frame_idx"].tolist() == [0, 2, 4]
    # frame payloads are decodable PNGs with the right dims; frame 0
    # is exactly frame 1 of the animation (disposal 0 accumulates, but
    # frame 0 is just the first render)
    img0 = decode_png(frames.loc[0, "frame"])
    assert img0.shape == (9, 13, 3)
    assert np.array_equal(img0, pal[fs[0]])
