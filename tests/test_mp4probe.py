"""MP4/ISO-BMFF container probe tests. The probe is metadata-only
(no codec decode), so every assertion is against the fixture writer's
box tree, which follows the published ISO/IEC 14496-12 layout."""

import struct

import pyarrow as pa
import pytest

from raystack.ops.mp4probe import (Mp4Probe, encode_mp4_stub, probe_mp4,
                                   probe_mp4_tracks)


def test_probe_video_roundtrip():
    p = encode_mp4_stub(duration_s=2.5, width=640, height=360,
                        codec="avc1", n_samples=60, kind="video")
    info = probe_mp4(p)
    assert info["duration_s"] == pytest.approx(2.5)
    assert len(info["tracks"]) == 1
    tr = info["tracks"][0]
    assert tr == {"kind": "video", "codec": "avc1", "width": 640,
                  "height": 360, "n_samples": 60}


def test_probe_audio_and_text_tracks():
    for kind, codec in (("audio", "mp4a"), ("text", "tx3g")):
        p = encode_mp4_stub(duration_s=1.0, codec=codec, n_samples=43,
                            kind=kind, width=0, height=0)
        tr = probe_mp4(p)["tracks"][0]
        assert tr["kind"] == kind
        assert tr["codec"] == codec
        assert tr["n_samples"] == 43


def test_stsd_coded_size_fallback_when_tkhd_zero():
    # zero out the tkhd 16.16 presentation size; probe must recover the
    # coded size from the VisualSampleEntry (spec offset 8+8+16 into
    # the entry box)
    p = bytearray(encode_mp4_stub(width=320, height=240))
    i = p.find(b"tkhd")
    assert i > 0
    # tkhd body: 4 fullbox + 5*4 + 52 pad, then 8 bytes of w/h
    off = i + 4 + 4 + 20 + 52
    assert struct.unpack_from(">II", p, off) == (320 << 16, 240 << 16)
    p[off:off + 8] = b"\x00" * 8
    tr = probe_mp4(bytes(p))["tracks"][0]
    assert (tr["width"], tr["height"]) == (320, 240)


def test_probe_64bit_and_version1_boxes():
    # rewrap moov with a 64-bit largesize header; bump mvhd to v1
    p = bytearray(encode_mp4_stub(duration_s=3.0, timescale=90000))
    i = p.find(b"moov") - 4
    (size,) = struct.unpack_from(">I", p, i)
    body = bytes(p[i + 8:i + size])
    wrapped = struct.pack(">I", 1) + b"moov" + \
        struct.pack(">Q", 16 + len(body)) + body
    head = bytes(p[:i])
    info = probe_mp4(head + wrapped)
    assert info["duration_s"] == pytest.approx(3.0)
    # version-1 mvhd: 64-bit creation/modification times and duration
    v1_body = struct.pack(">BxxxQQIQ", 1, 0, 0, 90000, 270000) + \
        b"\x00" * 80
    mvhd_v1 = struct.pack(">I", 8 + len(v1_body)) + b"mvhd" + v1_body
    # rebuild stub with the v1 mvhd swapped in
    orig = bytearray(encode_mp4_stub(duration_s=3.0, timescale=90000))
    k = orig.find(b"mvhd") - 4
    (msize,) = struct.unpack_from(">I", orig, k)
    rebuilt = bytes(orig[:k]) + mvhd_v1 + bytes(orig[k + msize:])
    # fix enclosing moov size (+8 for the two extra 64-bit time words
    # and the larger header — compute exactly)
    grow = len(mvhd_v1) - msize
    m = rebuilt.find(b"moov") - 4
    rebuilt = bytearray(rebuilt)
    (osize,) = struct.unpack_from(">I", rebuilt, m)
    struct.pack_into(">I", rebuilt, m, osize + grow)
    assert probe_mp4(bytes(rebuilt))["duration_s"] == pytest.approx(3.0)


def test_probe_rejects_garbage():
    with pytest.raises(ValueError):
        probe_mp4(b"\x89PNG\r\n\x1a\n" + b"\x00" * 100)
    with pytest.raises(ValueError):
        probe_mp4(b"")
    # valid head type but no moov
    with pytest.raises(ValueError):
        probe_mp4(struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4)
    # lying box size
    bad = bytearray(encode_mp4_stub())
    i = bad.find(b"trak") - 4
    struct.pack_into(">I", bad, i, 1 << 30)
    with pytest.raises(ValueError):
        probe_mp4(bytes(bad))


def test_mp4_probe_stage(ray_session):
    import ray

    from raystack.ops.multimodal import MEDIA_SCHEMA

    vids = [encode_mp4_stub(duration_s=d, width=w, height=h,
                            n_samples=n)
            for d, w, h, n in ((1.0, 320, 240, 30), (4.0, 1280, 720, 96))]
    t = pa.table({
        "media_id": pa.array([1, 2, 3, 4], pa.int64()),
        "payload": pa.array(
            [vids[0], vids[1], b"not a video", None], pa.large_binary()),
        "mime": pa.array(["video/mp4"] * 4),
        "meta": pa.array(["{}"] * 4),
    }, schema=MEDIA_SCHEMA)
    got = probe_mp4_tracks(ray.data.from_arrow(t), concurrency=1) \
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    assert got["media_id"].tolist() == [1, 2]
    assert got["width"].tolist() == [320, 1280]
    assert got["height"].tolist() == [240, 720]
    assert got["n_samples"].tolist() == [30, 96]
    assert got["duration_s"].tolist() == pytest.approx([1.0, 4.0])
    assert got["codec"].tolist() == ["avc1", "avc1"]
