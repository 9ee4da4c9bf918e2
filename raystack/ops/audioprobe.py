"""Library-free audio metadata probes — the audio sibling of
:mod:`raystack.ops.mp4probe`: the (duration, rate, channels, codec)
a curation filter needs, without decoding a single sample. All from the
public format specs:

- **MP3** (ISO 11172-3 / 13818-3 frame headers): skip an ID3v2 tag,
  then walk frame syncs using the public bitrate/samplerate tables;
  duration = frames × samples-per-frame / rate. VBR-safe because every
  frame header is visited (bounded by ``max_frames``).
- **FLAC**: the mandatory STREAMINFO block carries sample rate, channel
  count, bits/sample and total samples directly.
- **OGG**: page walk; codec identified from the first packet
  (``\\x01vorbis`` / ``OpusHead``), duration from the last page's
  granule position (Vorbis: granule = pcm samples; Opus: 48 kHz ticks
  minus pre-skip).

Plus :func:`decode_wav_any` — extends the PCM WAV decoder with G.711
µ-law / A-law companding (one 256-entry table each, ITU-T G.711).
"""

from __future__ import annotations

import struct

import numpy as np

# MPEG-1 Layer III bitrates (kbps) and sample rates by version — public
# tables from the spec
_BITRATES = {
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160],
}
_RATES = {1: [44100, 48000, 32000], 2: [22050, 24000, 16000],
          25: [11025, 12000, 8000]}


def _id3_size(b: bytes) -> int:
    if b[:3] != b"ID3" or len(b) < 10:
        return 0
    # syncsafe 28-bit size
    s = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) | \
        ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
    return 10 + s


def probe_mp3(payload: bytes, max_frames: int = 2_000_000) -> dict:
    """Walk MP3 frame headers. Returns {codec, sample_rate, channels,
    duration_s, n_frames, avg_bitrate_kbps}."""
    b = memoryview(payload)
    i = _id3_size(bytes(b[:10]))
    n = len(b)
    frames = 0
    total_bits = 0
    rate = channels = 0
    while i + 4 <= n and frames < max_frames:
        h = bytes(b[i:i + 4])
        if h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
            i += 1  # resync byte by byte (junk between tags and audio)
            continue
        ver_bits = (h[1] >> 3) & 0x3
        layer_bits = (h[1] >> 1) & 0x3
        if ver_bits == 1 or layer_bits != 1:  # reserved / not Layer III
            i += 1
            continue
        version = {0: 25, 2: 2, 3: 1}[ver_bits]
        br_idx = (h[2] >> 4) & 0xF
        sr_idx = (h[2] >> 2) & 0x3
        if br_idx in (0, 15) or sr_idx == 3:
            i += 1
            continue
        table = _BITRATES[(1 if version == 1 else 2, 3)]
        bitrate = table[br_idx] * 1000
        rate = _RATES[version][sr_idx]
        padding = (h[2] >> 1) & 0x1
        channels = 1 if (h[3] >> 6) & 0x3 == 3 else 2
        spf = 1152 if version == 1 else 576
        size = spf // 8 * bitrate // rate + padding
        if size <= 4:
            i += 1
            continue
        frames += 1
        total_bits += bitrate
        i += size
    if not frames:
        raise ValueError("no MP3 frames found")
    spf = 1152 if rate >= 32000 else 576
    dur = frames * spf / rate
    return {"codec": "mp3", "sample_rate": rate, "channels": channels,
            "duration_s": dur, "n_frames": frames,
            "avg_bitrate_kbps": total_bits / frames / 1000}


def probe_flac(payload: bytes) -> dict:
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    i = 4
    while i + 4 <= len(payload):
        hdr = payload[i]
        btype = hdr & 0x7F
        size = int.from_bytes(payload[i + 1:i + 4], "big")
        if btype == 0:  # STREAMINFO
            si = payload[i + 4:i + 4 + size]
            if len(si) < 18:
                raise ValueError("truncated STREAMINFO")
            bits = int.from_bytes(si[10:18], "big")
            rate = (bits >> 44) & 0xFFFFF
            channels = ((bits >> 41) & 0x7) + 1
            bps = ((bits >> 36) & 0x1F) + 1
            total = bits & ((1 << 36) - 1)
            if not rate:
                raise ValueError("invalid FLAC sample rate")
            return {"codec": "flac", "sample_rate": rate,
                    "channels": channels, "bits_per_sample": bps,
                    "duration_s": total / rate, "total_samples": total}
        if hdr & 0x80:  # last block and no STREAMINFO seen
            break
        i += 4 + size
    raise ValueError("FLAC STREAMINFO not found")


def probe_ogg(payload: bytes) -> dict:
    b = memoryview(payload)
    if bytes(b[:4]) != b"OggS":
        raise ValueError("not an OGG payload")
    codec = "unknown"
    rate = channels = 0
    pre_skip = 0
    last_granule = 0
    i, n = 0, len(b)
    first = True
    while i + 27 <= n:
        if bytes(b[i:i + 4]) != b"OggS":
            break
        granule = struct.unpack_from("<q", b, i + 6)[0]
        nseg = b[i + 26]
        if i + 27 + nseg > n:
            break
        segs = bytes(b[i + 27:i + 27 + nseg])
        body_len = sum(segs)
        body_off = i + 27 + nseg
        if first:
            head = bytes(b[body_off:body_off + 19])
            if head[:7] == b"\x01vorbis" and len(head) >= 16:
                codec = "vorbis"
                channels = head[11]
                rate = struct.unpack_from("<I", head, 12)[0]
            elif head[:8] == b"OpusHead":
                codec = "opus"
                channels = head[9]
                pre_skip = struct.unpack_from("<H", head, 10)[0]
                rate = 48000  # opus granules are always 48 kHz ticks
            first = False
        if granule > 0:
            last_granule = granule
        i = body_off + body_len
    if codec == "unknown":
        raise ValueError("no vorbis/opus header in first OGG page")
    if not rate:
        raise ValueError("invalid OGG header rate")
    samples = max(0, last_granule - (pre_skip if codec == "opus" else 0))
    return {"codec": codec, "sample_rate": rate, "channels": channels,
            "duration_s": samples / rate}


def probe_audio(payload: bytes) -> dict | None:
    """Magic-byte dispatch over the probe tier; None when unrecognized."""
    head = bytes(payload[:4])
    if head == b"fLaC":
        return probe_flac(payload)
    if head == b"OggS":
        return probe_ogg(payload)
    if head[:3] == b"ID3" or (len(payload) > 1 and payload[0] == 0xFF
                              and (payload[1] & 0xE0) == 0xE0):
        return probe_mp3(payload)
    return None


# ---------------------------------------------------------------------------
# G.711 companded WAV (µ-law / A-law) — real decode, table-driven
# ---------------------------------------------------------------------------

def _ulaw_table() -> np.ndarray:
    u = np.arange(256, dtype=np.int64) ^ 0xFF
    sign = np.where(u & 0x80, -1, 1)
    exp = (u >> 4) & 0x7
    mant = u & 0xF
    mag = ((mant << 3) + 0x84 << exp) - 0x84
    return (sign * mag).astype(np.float64) / 32124.0


def _alaw_table() -> np.ndarray:
    a = np.arange(256, dtype=np.int64) ^ 0x55
    sign = np.where(a & 0x80, 1, -1)  # A-law: MSB set == positive (G.711)
    exp = (a >> 4) & 0x7
    mant = a & 0xF
    mag = np.where(exp == 0, (mant << 4) + 8,
                   ((mant << 4) + 0x108) << (exp - 1))
    return (sign * mag).astype(np.float64) / 32768.0


def decode_wav_any(payload: bytes):
    """PCM / µ-law / A-law WAV → (samples (n, ch) float64, rate). RIFF
    chunk walk (no stdlib ``wave`` — it rejects non-PCM formats)."""
    b = memoryview(payload)
    if bytes(b[:4]) != b"RIFF" or bytes(b[8:12]) != b"WAVE":
        raise ValueError("not a WAV payload")
    i, n = 12, len(b)
    fmt = None
    data = None
    while i + 8 <= n:
        cid = bytes(b[i:i + 4])
        size = struct.unpack_from("<I", b, i + 4)[0]
        body = b[i + 8:i + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = bytes(body)
        i += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, nch, rate, _, _, bps = fmt
    if tag == 1:  # PCM — same widths as decode_wav
        if bps == 8:
            s = (np.frombuffer(data, np.uint8).astype(np.float64)
                 - 128.0) / 128.0
        elif bps == 16:
            s = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
        elif bps == 32:
            s = np.frombuffer(data, "<i4").astype(np.float64) / 2147483648.0
        else:
            raise ValueError(f"unsupported PCM width {bps}")
    elif tag == 7:  # µ-law
        s = _ulaw_table()[np.frombuffer(data, np.uint8)]
    elif tag == 6:  # A-law
        s = _alaw_table()[np.frombuffer(data, np.uint8)]
    else:
        raise ValueError(f"unsupported WAV format tag {tag}")
    usable = (len(s) // nch) * nch
    return s[:usable].reshape(-1, nch), rate
