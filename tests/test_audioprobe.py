"""Audio probes (MP3/FLAC/OGG) against hand-built spec-shaped streams,
and G.711 µ-law/A-law WAV decode against the stdlib audioop oracle."""

import struct

import numpy as np
import pytest

from raystack.ops.audioprobe import (decode_wav_any, probe_audio,
                                     probe_flac, probe_mp3, probe_ogg)


def _mp3_frames(n_frames=10, bitrate_idx=9, sr_idx=0, id3=False) -> bytes:
    # MPEG-1 Layer III: 0xFFFB = sync + version 1 + layer III + no CRC
    out = bytearray()
    if id3:
        body = b"x" * 20
        size = len(body)
        out += b"ID3\x04\x00\x00" + bytes([(size >> 21) & 0x7F,
                                           (size >> 14) & 0x7F,
                                           (size >> 7) & 0x7F,
                                           size & 0x7F]) + body
    rates = [44100, 48000, 32000]
    brs = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
           320]
    size = 144 * brs[bitrate_idx] * 1000 // rates[sr_idx]
    for _ in range(n_frames):
        h = bytes([0xFF, 0xFB, (bitrate_idx << 4) | (sr_idx << 2), 0x00])
        out += h + b"\x00" * (size - 4)
    return bytes(out)


def test_probe_mp3():
    p = probe_mp3(_mp3_frames(10))
    assert p["codec"] == "mp3" and p["sample_rate"] == 44100
    assert p["channels"] == 2 and p["n_frames"] == 10
    assert p["duration_s"] == pytest.approx(10 * 1152 / 44100)
    assert p["avg_bitrate_kbps"] == pytest.approx(128)
    # ID3 tag skipped, junk between frames resynced
    p2 = probe_mp3(b"junk" + _mp3_frames(5, id3=True))
    assert p2["n_frames"] == 5
    with pytest.raises(ValueError, match="no MP3 frames"):
        probe_mp3(b"\x00" * 100)


def _flac(rate=22050, ch=2, bps=16, total=44100) -> bytes:
    bits = (rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
    si = b"\x00" * 10 + bits.to_bytes(8, "big") + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si


def test_probe_flac():
    p = probe_flac(_flac())
    assert (p["sample_rate"], p["channels"], p["bits_per_sample"]) == \
        (22050, 2, 16)
    assert p["duration_s"] == pytest.approx(2.0)
    with pytest.raises(ValueError, match="not a FLAC"):
        probe_flac(b"nope")


def _ogg_page(body: bytes, granule: int, htype: int, seq: int) -> bytes:
    segs = []
    rest = len(body)
    while rest >= 255:
        segs.append(255)
        rest -= 255
    segs.append(rest)
    return (b"OggS" + bytes([0, htype]) + struct.pack("<q", granule)
            + struct.pack("<III", 1, seq, 0) + bytes([len(segs)])
            + bytes(segs) + body)


def test_probe_ogg_vorbis_and_opus():
    vhead = b"\x01vorbis" + bytes(4) + bytes([2]) + \
        struct.pack("<I", 8000) + bytes(10)
    blob = _ogg_page(vhead, 0, 2, 0) + _ogg_page(b"d" * 50, 16000, 0, 1) \
        + _ogg_page(b"d" * 10, 24000, 4, 2)
    p = probe_ogg(blob)
    assert (p["codec"], p["sample_rate"], p["channels"]) == \
        ("vorbis", 8000, 2)
    assert p["duration_s"] == pytest.approx(3.0)

    ohead = b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312) + bytes(8)
    blob2 = _ogg_page(ohead, 0, 2, 0) + _ogg_page(b"d", 48312, 4, 1)
    p2 = probe_ogg(blob2)
    assert (p2["codec"], p2["channels"]) == ("opus", 2)
    assert p2["duration_s"] == pytest.approx(1.0)  # pre-skip removed

    with pytest.raises(ValueError, match="vorbis/opus"):
        probe_ogg(_ogg_page(b"other", 0, 2, 0))


def test_probe_audio_dispatch():
    assert probe_audio(_flac())["codec"] == "flac"
    assert probe_audio(_mp3_frames(3))["codec"] == "mp3"
    assert probe_audio(b"\x00nothing") is None


def _wav(tag: int, data: bytes, rate=8000, ch=1, bps=8) -> bytes:
    fmt = struct.pack("<HHIIHH", tag, ch, rate, rate * ch * bps // 8,
                      ch * bps // 8, bps)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_wav_g711_vs_audioop():
    audioop = pytest.importorskip("audioop")
    codes = bytes(range(256)) * 4
    for tag, fn in ((7, audioop.ulaw2lin), (6, audioop.alaw2lin)):
        s, rate = decode_wav_any(_wav(tag, codes))
        assert rate == 8000 and s.shape == (1024, 1)
        ref = np.frombuffer(fn(codes, 2), "<i2").astype(np.float64)
        scale = 32124.0 if tag == 7 else 32768.0
        assert np.allclose(s[:, 0] * scale, ref, atol=1.0), tag


def test_wav_pcm_paths_and_refusals():
    pcm = (np.sin(np.linspace(0, 20, 400)) * 30000).astype("<i2")
    s, rate = decode_wav_any(_wav(1, pcm.tobytes(), ch=2, bps=16))
    assert s.shape == (200, 2)
    assert np.allclose(s.reshape(-1) * 32768.0, pcm.astype(np.float64))
    with pytest.raises(ValueError, match="format tag"):
        decode_wav_any(_wav(85, b"\x00" * 8))  # mp3-in-wav: refuse
    with pytest.raises(ValueError, match="not a WAV"):
        decode_wav_any(b"RIFFxxxxAVI ")


def test_media_decoder_audio_tier(ray_session):
    import pyarrow as pa
    import ray
    from raystack.ops.multimodal import MEDIA_SCHEMA, decode_media

    ulaw_wav = _wav(7, bytes(range(256)) * 4)
    t = pa.table({
        "media_id": pa.array([0, 1, 2, 3], pa.int64()),
        "payload": pa.array([_mp3_frames(20), _flac(), ulaw_wav,
                             b"\x00garbage"], pa.large_binary()),
        "mime": pa.array(["audio/mpeg", "audio/flac", "audio/wav",
                          "application/octet-stream"]),
        "meta": pa.array(["{}"] * 4),
    }, schema=MEDIA_SCHEMA)
    got = decode_media(ray.data.from_arrow(t), concurrency=1).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert got["decoded"].tolist() == [True, True, True, False]
    assert got["kind"].tolist()[:3] == ["audio"] * 3
    assert got.loc[0, "sample_rate"] == 44100
    assert got.loc[0, "duration_s"] == pytest.approx(20 * 1152 / 44100)
    assert got.loc[1, "sample_rate"] == 22050
    assert got.loc[2, "sample_rate"] == 8000
    assert got.loc[2, "mean_level"] > 0  # real G.711 sample decode
