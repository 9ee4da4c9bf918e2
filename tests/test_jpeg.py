"""Baseline JPEG codec tests (library-free decode + fixture encoder).

The encoder is the lossy inverse of the decoder, so the round-trip
assertions are tolerance-based (PSNR floors on smooth images) plus the
exact invariants lossy coding still guarantees: constant-color blocks
survive exactly, entropy coding is lossless (restart-marker framing
cannot change a single pixel), and decode is deterministic.
"""

import numpy as np
import pyarrow as pa
import pytest

from raystack.ops.jpeg import decode_jpeg, encode_jpeg


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _smooth_rgb(h=64, w=96):
    yy, xx = np.mgrid[0:h, 0:w]
    r = (128 + 100 * np.sin(xx / 17) * np.cos(yy / 11)).clip(0, 255)
    g = xx * 255 / max(w - 1, 1)
    b = yy * 255 / max(h - 1, 1)
    return np.stack([r, g, b], -1).astype(np.uint8)


def test_jpeg_roundtrip_quality_and_subsampling():
    img = _smooth_rgb()
    floors = {("444", 95): 45, ("420", 95): 38, ("422", 90): 38,
              ("440", 90): 38, ("444", 75): 40}
    for (mode, q), floor in floors.items():
        out = decode_jpeg(encode_jpeg(img, quality=q, subsample=mode))
        assert out.shape == img.shape
        assert _psnr(img, out) > floor, (mode, q, _psnr(img, out))


def test_jpeg_grayscale_and_odd_dims():
    yy, xx = np.mgrid[0:41, 0:53]
    g = ((xx + yy) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=92))
    assert out.shape == (41, 53, 1)
    assert _psnr(g[:, :, None], out) > 40
    # odd dims with 4:2:0 — padding/cropping must be exact
    img = _smooth_rgb(33, 29)
    out = decode_jpeg(encode_jpeg(img, quality=92, subsample=True))
    assert out.shape == (33, 29, 3)
    assert _psnr(img, out) > 36


def test_jpeg_constant_color_exact():
    # a constant block is pure DC; quantized DC round-trips exactly
    img = np.full((24, 40, 3), 137, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert int(np.abs(out.astype(int) - 137).max()) == 0
    gray = np.full((16, 16), 200, np.uint8)
    out = decode_jpeg(encode_jpeg(gray, quality=50))
    assert int(np.abs(out.astype(int) - 200).max()) == 0


def test_jpeg_restart_markers_change_nothing():
    # entropy coding is lossless: DRI/RSTn framing must decode
    # bit-identically to the unframed stream
    img = _smooth_rgb(48, 80)
    plain = decode_jpeg(encode_jpeg(img, quality=85, subsample=True))
    for interval in (1, 2, 7):
        framed = decode_jpeg(encode_jpeg(img, quality=85, subsample=True,
                                         restart_interval=interval))
        assert np.array_equal(plain, framed), interval


def test_jpeg_decode_deterministic():
    img = _smooth_rgb(32, 32)
    jp = encode_jpeg(img, quality=80)
    assert np.array_equal(decode_jpeg(jp), decode_jpeg(jp))


def test_jpeg_rejects_unsupported_and_malformed():
    img = _smooth_rgb(16, 16)
    jp = bytearray(encode_jpeg(img, quality=90))
    # not a JPEG at all
    with pytest.raises(ValueError):
        decode_jpeg(b"JUNKJUNK")
    # flip SOF0 → SOF2 (progressive) — must refuse, not mis-decode;
    # the SOF0 marker is the first \xff\xc0 in the stream
    sof = bytes(jp).index(b"\xff\xc0")
    prog = bytes(jp[:sof + 1]) + b"\xc2" + bytes(jp[sof + 2:])
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(prog)
    # truncation anywhere → ValueError or a well-shaped (garbage) image,
    # never an uncontrolled crash: zero-fill past the end decodes as
    # valid huffman symbols, so mid-entropy cuts can legally "succeed"
    for cut in range(4, len(jp), 37):
        try:
            out = decode_jpeg(bytes(jp[:cut]) + b"\xff\xd9")
        except ValueError:
            continue
        assert out.shape == (16, 16, 3)


def test_jpeg_media_decoder_stage(ray_session):
    import ray

    from raystack.ops.multimodal import MEDIA_SCHEMA, decode_media
    img = _smooth_rgb(20, 30)
    good = encode_jpeg(img, quality=90, subsample=True)
    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([good, good[:40]], pa.large_binary()),
        "mime": pa.array(["image/jpeg"] * 2),
        "meta": pa.array(["{}"] * 2),
    }, schema=MEDIA_SCHEMA)
    got = decode_media(ray.data.from_arrow(t), concurrency=1).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert got["decoded"].tolist() == [True, False]
    assert got.loc[0, "kind"] == "image"
    assert (got.loc[0, "width"], got.loc[0, "height"],
            got.loc[0, "channels"]) == (30, 20, 3)
