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


# ---------------------------------------------------------------------------
# progressive (SOF2): every scan-script knob must decode identically to
# the baseline encode of the same image (same quantized coefficients,
# both entropy layers lossless over them)
# ---------------------------------------------------------------------------

def _test_img(shape, seed=11, smooth=True):
    rng = np.random.default_rng(seed)
    if smooth:
        h, w = shape[:2]
        base = (np.linspace(0, 255, w)[None, :]
                + np.linspace(0, 128, h)[:, None]) / 1.5
        noise = rng.normal(0, 24, shape)
        if len(shape) == 3:
            base = base[:, :, None]
        return np.clip(base + noise, 0, 255).astype(np.uint8)
    return rng.integers(0, 256, shape, dtype=np.uint8)


def test_progressive_matches_baseline_gray_and_rgb():
    from raystack.ops.jpeg import (decode_jpeg, encode_jpeg,
                                   encode_jpeg_progressive)
    for shape, sub in [((24, 40), False), ((33, 50, 3), "420"),
                       ((17, 23, 3), "444"), ((31, 38, 3), "422"),
                       ((26, 19, 3), "440")]:
        img = _test_img(shape)
        base = decode_jpeg(encode_jpeg(img, quality=80, subsample=sub))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=80,
                                                   subsample=sub))
        assert np.array_equal(base, prog), (shape, sub)


def test_progressive_scan_script_knobs():
    from raystack.ops.jpeg import (decode_jpeg, encode_jpeg,
                                   encode_jpeg_progressive)
    img = _test_img((29, 43, 3), seed=3)
    want = decode_jpeg(encode_jpeg(img, quality=70, subsample="420"))
    for kw in [dict(dc_al=0, ac_al=0),            # spectral selection only
               dict(dc_al=2, ac_al=2),            # two refinement levels
               dict(band_split=1),                # minimal first band
               dict(band_split=63),               # single AC band
               dict(eobrun_cap=1),                # every EOB emitted alone
               dict(eobrun_cap=2),                # multi-block EOB runs
               dict(restart_interval=3)]:         # RSTn in every scan kind
        got = decode_jpeg(encode_jpeg_progressive(
            img, quality=70, subsample="420", **kw))
        assert np.array_equal(want, got), kw


def test_progressive_flat_image_pure_eobruns():
    # constant image: every AC band is zero -> the scans are one long
    # EOB run; DC still refines correctly
    from raystack.ops.jpeg import (decode_jpeg, encode_jpeg,
                                   encode_jpeg_progressive)
    img = np.full((40, 56, 3), 137, np.uint8)
    want = decode_jpeg(encode_jpeg(img, quality=90))
    got = decode_jpeg(encode_jpeg_progressive(img, quality=90))
    assert np.array_equal(want, got)
    assert np.all(np.abs(got.astype(int) - 137) <= 2)


def test_progressive_noise_image_and_tiny():
    from raystack.ops.jpeg import (decode_jpeg, encode_jpeg,
                                   encode_jpeg_progressive)
    for shape in [(8, 8), (7, 5, 3), (9, 16, 3), (64, 64)]:
        img = _test_img(shape, seed=5, smooth=False)
        want = decode_jpeg(encode_jpeg(img, quality=95))
        got = decode_jpeg(encode_jpeg_progressive(img, quality=95,
                                                  dc_al=1, ac_al=2,
                                                  eobrun_cap=3))
        assert np.array_equal(want, got), shape


def test_progressive_media_decoder_dispatch(ray_session):
    # the actor stage's magic-byte sniff routes SOF2 streams through the
    # same decode_jpeg entry
    import pyarrow as pa
    import ray.data

    from raystack.ops.jpeg import encode_jpeg_progressive
    from raystack.ops.multimodal import decode_media
    img = _test_img((21, 34, 3))
    payload = encode_jpeg_progressive(img, quality=80, subsample="420")
    t = pa.table({"media_id": pa.array([1], pa.int64()),
                  "payload": pa.array([payload], pa.binary()),
                  "mime": pa.array(["image/jpeg"]),
                  "meta": pa.array(["{}"])})
    out = decode_media(ray.data.from_arrow(t)).to_pandas()
    assert out["width"].tolist() == [34]
    assert out["height"].tolist() == [21]
    assert out["channels"].tolist() == [3]


def test_progressive_coefficient_property(ray_session=None):
    # coefficient-level round trip: drive the scan writers over synthetic
    # sparse blocks (heavy on the |1| newly-significant edge) and check
    # the decoder reproduces every coefficient exactly, across scan-script
    # knobs. Catches bit-order bugs pixel tests can average away.
    import raystack.ops.jpeg as J
    orig_q, orig_r = J._quantize_planes, J._reconstruct
    captured, target = [], [None]
    J._quantize_planes = lambda img, q, s: target[0]

    def spy(comps, geo, qt, h, w, hmax, vmax):
        captured.append([g[3].copy() for g in geo])
        return orig_r(comps, geo, qt, h, w, hmax, vmax)
    J._reconstruct = spy
    try:
        rng = np.random.default_rng(42)
        qtab = np.ones(64, np.int64)
        for _ in range(150):
            nbw = int(rng.integers(1, 4))
            nbh = int(rng.integers(1, 3))
            n = nbw * nbh
            qz = np.zeros((n, 64), np.int32)
            for b in range(n):
                kidx = rng.choice(63, size=int(rng.integers(0, 12)),
                                  replace=False) + 1
                qz[b, kidx] = rng.choice([-7, -3, -2, -1, -1, 1, 1, 2, 3, 7],
                                         size=len(kidx))
            qz[:, 0] = rng.integers(-200, 200, n)
            target[0] = ([(1, 1, nbw, qz)], [(1, 1)], [0], [qtab],
                         nbh * 8, nbw * 8, nbw, nbh)
            payload = J.encode_jpeg_progressive(
                np.zeros((nbh * 8, nbw * 8), np.uint8),
                dc_al=int(rng.integers(0, 4)), ac_al=int(rng.integers(0, 4)),
                band_split=int(rng.integers(1, 64)),
                eobrun_cap=int(rng.choice([1, 2, 3, 32767])),
                restart_interval=int(rng.choice([0, 0, 1, 2, 5])))
            captured.clear()
            J.decode_jpeg(payload)
            want = np.zeros_like(qz)
            want[:, np.asarray(J.ZIGZAG)] = qz
            assert np.array_equal(captured[0][0], want)
    finally:
        J._quantize_planes, J._reconstruct = orig_q, orig_r
