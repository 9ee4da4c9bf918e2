"""Full-envelope PNG codec tests: every legal depth × color type,
all five scanline filters, Adam7 interlacing and tRNS transparency,
round-tripped bit-exact through the fixture writer."""

import struct

import numpy as np
import pytest

from raystack.ops.multimodal import decode_png, encode_png


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_png_16bit_all_channels_filters_interlace(rng):
    for nch in (1, 2, 3, 4):
        img = rng.integers(0, 65536, (9, 10, nch), dtype=np.uint16)
        for ft in range(5):
            for il in (False, True):
                out = decode_png(encode_png(img, filter_type=ft,
                                            depth=16, interlace=il))
                assert out.dtype == np.uint16
                assert np.array_equal(out, img), (nch, ft, il)


def test_png_8bit_interlaced_all_filters(rng):
    for nch in (1, 2, 3, 4):
        img = rng.integers(0, 256, (13, 7, nch), dtype=np.uint8)
        for ft in range(5):
            out = decode_png(encode_png(img, filter_type=ft,
                                        interlace=True))
            assert np.array_equal(out, img), (nch, ft)


def test_png_subbyte_gray_depths(rng):
    for depth in (1, 2, 4):
        maxv = (1 << depth) - 1
        img = rng.integers(0, maxv + 1, (11, 14, 1), dtype=np.uint8)
        for ft in range(5):
            for il in (False, True):
                out = decode_png(encode_png(img, filter_type=ft,
                                            depth=depth, interlace=il))
                # sub-byte gray scales to 8-bit
                assert np.array_equal(out, img * (255 // maxv)), \
                    (depth, ft, il)


def test_png_palette_with_trns_alpha(rng):
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (8, 9, 1), dtype=np.uint8)
    alpha = bytes(rng.integers(0, 256, 10, dtype=np.uint8))  # partial
    out = decode_png(encode_png(idx, depth=4, palette=plte, trns=alpha))
    a_full = np.frombuffer(alpha + b"\xff" * 6, np.uint8)
    exp = np.dstack([plte[idx[..., 0]], a_full[idx[..., 0]]])
    assert np.array_equal(out, exp)
    out = decode_png(encode_png(idx, depth=4, palette=plte))
    assert np.array_equal(out, plte[idx[..., 0]])


def test_png_color_key_transparency(rng):
    # gray key, 8- and 16-bit
    img = rng.integers(0, 4, (6, 6, 1), dtype=np.uint8)
    out = decode_png(encode_png(img, trns=struct.pack(">H", 2)))
    assert np.array_equal(out[..., 1] == 0, img[..., 0] == 2)
    img16 = rng.integers(0, 3, (6, 6, 1), dtype=np.uint16) * 30000
    out = decode_png(encode_png(img16, depth=16,
                                trns=struct.pack(">H", 30000)))
    assert out.shape == (6, 6, 2)
    assert np.array_equal(out[..., 1] == 0, img16[..., 0] == 30000)
    # RGB key
    img = np.zeros((4, 5, 3), np.uint8)
    img[1, 2] = [9, 8, 7]
    img[3, 3] = [9, 8, 7]
    out = decode_png(encode_png(img, trns=struct.pack(">HHH", 9, 8, 7)))
    assert out.shape == (4, 5, 4)
    assert (out[..., 3] == 0).sum() == 2
    assert out[1, 2, 3] == 0 and out[3, 3, 3] == 0


def test_png_adam7_edge_shapes(rng):
    # shapes where several Adam7 passes are empty
    for shape in [(1, 1), (2, 3), (5, 3), (8, 8), (16, 17), (3, 1)]:
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        out = decode_png(encode_png(img, filter_type=4, interlace=True))
        assert np.array_equal(out, img), shape


def test_png_rejects_illegal_combos(rng):
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_png(img, depth=4)  # RGB sub-byte is illegal
    # corrupt: flip the depth field of a valid stream to an illegal one
    good = bytearray(encode_png(img))
    good[24] = 3  # IHDR depth byte
    with pytest.raises(ValueError):
        decode_png(bytes(good))
