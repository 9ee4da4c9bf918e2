"""VP8L (lossless WebP) decoder vs the fixture encoder: every decode
path roundtrips bit-exactly, and the MediaDecoder stage picks VP8L up
as a REAL image decode (lossy VP8 stays a dims probe)."""

import numpy as np
import pytest

from raystack.ops.vp8l import Vp8lError, decode_webp, encode_vp8l


def _rng():
    return np.random.default_rng(7)


def test_plain_literals_roundtrip():
    img = _rng().integers(0, 256, (13, 17, 4), dtype=np.uint8)
    assert (decode_webp(encode_vp8l(img)) == img).all()


def test_constant_image_simple_codes():
    img = np.full((5, 9, 4), 200, np.uint8)
    assert (decode_webp(encode_vp8l(img)) == img).all()
    # 1x1 edge
    img1 = np.array([[[1, 2, 3, 4]]], dtype=np.uint8)
    assert (decode_webp(encode_vp8l(img1)) == img1).all()


def test_subtract_green_roundtrip():
    img = _rng().integers(0, 256, (8, 8, 4), dtype=np.uint8)
    assert (decode_webp(encode_vp8l(img, subtract_green=True))
            == img).all()


def test_lz77_and_color_cache():
    rng = _rng()
    base = rng.integers(0, 4, (20, 24, 4), dtype=np.uint8) * 60
    base[5:9] = base[4]              # repeated rows → dist-w backrefs
    base[:, 10:15] = base[:, [9]]    # horizontal runs → dist-1 backrefs
    for lz in (False, True):
        for cb in (0, 4, 8):
            got = decode_webp(encode_vp8l(base, use_lz77=lz,
                                          cache_bits=cb))
            assert (got == base).all(), (lz, cb)


@pytest.mark.parametrize("mode", range(14))
def test_all_predictor_modes(mode):
    img = _rng().integers(0, 256, (11, 13, 4), dtype=np.uint8)
    assert (decode_webp(encode_vp8l(img, predictor=mode)) == img).all()


def test_color_transform_roundtrip():
    img = _rng().integers(0, 256, (10, 12, 4), dtype=np.uint8)
    for cte in ((10, -20, 5), (-128, 127, 64), (0, 0, 0)):
        assert (decode_webp(encode_vp8l(img, color_transform=cte))
                == img).all(), cte


@pytest.mark.parametrize("ncol", [2, 3, 11, 200])
def test_palette_bundled_and_plain(ncol):
    rng = _rng()
    pal = rng.integers(0, 256, (ncol, 4), dtype=np.uint8)
    img = pal[rng.integers(0, ncol, (9, 31))]
    assert (decode_webp(encode_vp8l(img, palette=True)) == img).all()


def test_composed_transforms():
    img = _rng().integers(0, 8, (16, 16, 4), dtype=np.uint8) * 30
    got = decode_webp(encode_vp8l(img, predictor=7, subtract_green=True,
                                  cache_bits=4, use_lz77=True))
    assert (got == img).all()


def test_malformed_inputs_raise_never_wrong():
    img = _rng().integers(0, 256, (6, 6, 4), dtype=np.uint8)
    data = encode_vp8l(img)
    with pytest.raises(Vp8lError):
        decode_webp(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(Vp8lError):
        decode_webp(data[:40])          # truncated bitstream
    bad = bytearray(data)
    bad[20] ^= 0xFF                     # corrupt the header area
    try:
        out = decode_webp(bytes(bad))
        assert out.shape[-1] == 4       # decoded SOMETHING structured
    except Vp8lError:
        pass                            # or failed loudly — never silent


def test_media_decoder_stage_decodes_vp8l(ray_session):
    import pyarrow as pa
    import ray.data

    from raystack.ops.multimodal import MEDIA_BATCH_SIZE, MediaDecoder
    img = _rng().integers(0, 256, (15, 22, 4), dtype=np.uint8)
    t = pa.table({"media_id": pa.array([1], pa.int64()),
                  "payload": pa.array([encode_vp8l(img)], pa.binary())})
    out = ray.data.from_arrow(t).map_batches(
        MediaDecoder, concurrency=1, batch_size=MEDIA_BATCH_SIZE,
        batch_format="pyarrow").to_pandas()
    row = out.iloc[0]
    assert row["kind"] == "image" and bool(row["decoded"])
    assert (row["width"], row["height"], row["channels"]) == (22, 15, 4)


def test_hypothesis_roundtrip_random_options():
    """Property sweep: random images × random option combos roundtrip
    bit-exactly (bounded examples — the decoder is a reference
    implementation, not a throughput path)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None)
    @given(st.integers(0, 2**32 - 1), st.integers(1, 24),
           st.integers(1, 24), st.booleans(),
           st.sampled_from([None, 0, 1, 7, 11, 12, 13]),
           st.sampled_from([0, 3, 6]), st.booleans())
    def case(seed, w, h, subg, pred, cache, lz):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        got = decode_webp(encode_vp8l(
            img, subtract_green=subg, predictor=pred,
            cache_bits=cache, use_lz77=lz))
        assert (got == img).all()

    case()
