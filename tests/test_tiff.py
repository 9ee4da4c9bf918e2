"""Baseline TIFF decode: strip layout, both byte orders, PackBits,
WhiteIsZero, fixture-writer roundtrips, unsupported-feature refusals,
and the MediaDecoder integration."""

import numpy as np
import pyarrow as pa
import pytest

from raystack.ops.tiff import (_packbits, _unpackbits, decode_tiff,
                               encode_tiff)


def test_packbits_fuzz_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(300):
        n = int(rng.integers(0, 500))
        data = bytes(rng.integers(0, 3, n, dtype=np.uint8))
        assert _unpackbits(_packbits(data), n) == data
    # long runs cross the 128 cap
    assert _unpackbits(_packbits(b"a" * 1000), 1000) == b"a" * 1000


@pytest.mark.parametrize("shape,comp,bo,wiz", [
    ((13, 7), "none", "<", False),
    ((13, 7, 3), "none", ">", False),
    ((20, 9), "packbits", "<", True),
    ((33, 5, 3), "packbits", ">", False),
])
@pytest.mark.parametrize("rps", [None, 4])
def test_roundtrip(shape, comp, bo, wiz, rps):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, shape).astype(np.uint8)
    blob = encode_tiff(img, compression=comp, byteorder=bo,
                       white_is_zero=wiz, rows_per_strip=rps)
    back = decode_tiff(blob)
    assert back.shape == img.shape
    assert np.array_equal(back, img)


def test_refusals():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (6, 6)).astype(np.uint8)
    blob = bytearray(encode_tiff(img))
    with pytest.raises(ValueError, match="TIFF payload"):
        decode_tiff(b"NOPE" + bytes(blob[4:]))
    with pytest.raises(ValueError, match="truncated|short"):
        decode_tiff(bytes(blob[: len(blob) - 10]))


def test_media_decoder_sniffs_tiff(ray_session):
    import ray
    from raystack.ops.multimodal import MEDIA_SCHEMA, decode_media
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (11, 17, 3)).astype(np.uint8)
    t = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([encode_tiff(img, compression="packbits"),
                             encode_tiff(img)[:16]], pa.large_binary()),
        "mime": pa.array(["image/tiff"] * 2),
        "meta": pa.array(["{}"] * 2),
    }, schema=MEDIA_SCHEMA)
    got = decode_media(ray.data.from_arrow(t), concurrency=1).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert got["decoded"].tolist() == [True, False]
    assert got.loc[0, ["width", "height", "channels"]].tolist() == [17, 11, 3]


def _webp_vp8l(w, h, alpha=False) -> bytes:
    import struct
    bits = (w - 1) | ((h - 1) << 14) | ((1 if alpha else 0) << 28)
    chunk = bytes([0x2F]) + struct.pack("<I", bits)
    body = b"VP8L" + struct.pack("<I", len(chunk)) + chunk
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def test_webp_probe_and_media_decoder(ray_session):
    import ray
    from raystack.ops.multimodal import (MEDIA_SCHEMA, decode_media,
                                         probe_webp)
    p = probe_webp(_webp_vp8l(200, 100, alpha=True))
    assert (p["width"], p["height"], p["alpha"]) == (200, 100, True)
    with pytest.raises(ValueError, match="not a WebP"):
        probe_webp(b"RIFFxxxxWAVE")

    t = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "payload": pa.array([_webp_vp8l(64, 32)], pa.large_binary()),
        "mime": pa.array(["image/webp"]),
        "meta": pa.array(["{}"]),
    }, schema=MEDIA_SCHEMA)
    got = decode_media(ray.data.from_arrow(t), concurrency=1).to_pandas()
    assert got.loc[0, "decoded"] and got.loc[0, "kind"] == "image"
    assert got.loc[0, ["width", "height"]].tolist() == [64, 32]
