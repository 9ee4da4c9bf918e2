"""MP4 / ISO-BMFF container probing, library-free.

Video *decoding* stays honestly gated on ffmpeg (no codec work here),
but the container metadata a curation pipeline filters on — duration,
track dimensions, codec fourcc, frame count — lives in the plain
box (atom) tree of the published ISO base media file format
(ISO/IEC 14496-12) and needs only struct math:

- :func:`probe_mp4` — walk ``moov`` → ``mvhd`` (timescale/duration),
  per-``trak`` ``tkhd`` (presentation size) / ``mdia`` → ``mdhd`` +
  ``hdlr`` (track kind) / ``stsd`` (sample-entry fourcc + coded size)
  / ``stts`` (sample count). Handles 32- and 64-bit box sizes and
  version-0/1 full boxes.
- :func:`encode_mp4_stub` — fixture writer emitting a minimal valid
  box tree (no media data) so the probe round-trips in tests.
- :class:`Mp4Probe` — the actor-pool stage: ``MEDIA_SCHEMA`` rows →
  per-track metadata rows.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk(payload: bytes, lo: int, hi: int):
    """Yield (box_type, body_lo, body_hi) for each box in [lo, hi)."""
    i = lo
    while i + 8 <= hi:
        (size,) = struct.unpack_from(">I", payload, i)
        btype = payload[i + 4: i + 8]
        body = i + 8
        if size == 1:  # 64-bit largesize
            if i + 16 > hi:
                raise ValueError("truncated MP4 largesize box")
            (size,) = struct.unpack_from(">Q", payload, i + 8)
            body = i + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = hi - i
        if size < body - i or i + size > hi:
            raise ValueError("bad MP4 box size")
        yield btype, body, i + size
        i += size


def _find(payload: bytes, lo: int, hi: int, btype: bytes):
    for t, b_lo, b_hi in _walk(payload, lo, hi):
        if t == btype:
            return b_lo, b_hi
    return None


def _fullbox(payload: bytes, lo: int):
    """(version, flags, payload offset after the fullbox header)."""
    v = payload[lo]
    return v, lo + 4


def probe_mp4(payload: bytes) -> dict:
    """MP4/MOV container → ``{duration_s, tracks: [{kind, codec,
    width, height, n_samples}]}``. Raises ``ValueError`` on anything
    that is not a parseable ISO-BMFF stream."""
    if len(payload) < 12:
        raise ValueError("truncated MP4")
    # sanity: first box should be ftyp/moov/mdat/free/styp
    head_type = payload[4:8]
    if head_type not in (b"ftyp", b"moov", b"mdat", b"free", b"styp",
                         b"wide", b"skip"):
        raise ValueError("not an MP4 payload")
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov box")
    out = {"duration_s": 0.0, "tracks": []}
    mvhd = _find(payload, *moov, b"mvhd")
    if mvhd is not None:
        v, p = _fullbox(payload, mvhd[0])
        if v == 1:
            _, _, ts, dur = struct.unpack_from(">QQIQ", payload, p)
        else:
            _, _, ts, dur = struct.unpack_from(">IIII", payload, p)
        out["duration_s"] = dur / ts if ts else 0.0
    for t, lo, hi in _walk(payload, *moov):
        if t != b"trak":
            continue
        track = {"kind": "unknown", "codec": "", "width": 0,
                 "height": 0, "n_samples": 0}
        tkhd = _find(payload, lo, hi, b"tkhd")
        if tkhd is not None:
            v, p = _fullbox(payload, tkhd[0])
            # fixed-point 16.16 width/height are the last 8 bytes
            w_fp, h_fp = struct.unpack_from(">II", payload, tkhd[1] - 8)
            track["width"] = w_fp >> 16
            track["height"] = h_fp >> 16
        mdia = _find(payload, lo, hi, b"mdia")
        if mdia is not None:
            hdlr = _find(payload, *mdia, b"hdlr")
            if hdlr is not None:
                handler = payload[hdlr[0] + 8: hdlr[0] + 12]
                track["kind"] = {b"vide": "video", b"soun": "audio",
                                 b"text": "text", b"subt": "text"} \
                    .get(handler, "unknown")
            minf = _find(payload, *mdia, b"minf")
            stbl = _find(payload, *minf, b"stbl") if minf else None
            if stbl is not None:
                stsd = _find(payload, *stbl, b"stsd")
                if stsd is not None:
                    _, p = _fullbox(payload, stsd[0])
                    (n_entries,) = struct.unpack_from(">I", payload, p)
                    if n_entries:
                        # first sample entry: size + fourcc
                        track["codec"] = payload[p + 8: p + 12] \
                            .decode("latin1").strip()
                        if track["kind"] == "video":
                            # VisualSampleEntry: box header (8) +
                            # SampleEntry reserved/dri (8) +
                            # pre_defined/reserved (16) → width/height
                            cw, ch = struct.unpack_from(
                                ">HH", payload, p + 4 + 8 + 8 + 16)
                            if track["width"] == 0:
                                track["width"] = cw
                            if track["height"] == 0:
                                track["height"] = ch
                stts = _find(payload, *stbl, b"stts")
                if stts is not None:
                    _, p = _fullbox(payload, stts[0])
                    (n_ent,) = struct.unpack_from(">I", payload, p)
                    cnt = 0
                    for k in range(n_ent):
                        c, _d = struct.unpack_from(">II", payload,
                                                   p + 4 + 8 * k)
                        cnt += c
                    track["n_samples"] = cnt
        out["tracks"].append(track)
    return out


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------

def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def encode_mp4_stub(duration_s: float = 2.0, width: int = 640,
                    height: int = 360, codec: str = "avc1",
                    n_samples: int = 48, kind: str = "video",
                    timescale: int = 1000) -> bytes:
    """Minimal valid MP4 box tree (ftyp + moov, no media data) whose
    :func:`probe_mp4` output matches the arguments — the fixture for
    container-parse tests."""
    dur = int(round(duration_s * timescale))
    mvhd = _box(b"mvhd", struct.pack(">BxxxIIII", 0, 0, 0, timescale,
                                     dur) + b"\x00" * 80)
    tkhd = _box(b"tkhd", struct.pack(">BxxxIIIII", 0, 0, 0, 1, 0, dur)
                + b"\x00" * 52
                + struct.pack(">II", width << 16, height << 16))
    handler = {"video": b"vide", "audio": b"soun",
               "text": b"text"}[kind]
    hdlr = _box(b"hdlr", struct.pack(">Bxxx", 0) + b"\x00" * 4
                + handler + b"\x00" * 12 + b"raystack\x00")
    mdhd = _box(b"mdhd", struct.pack(">BxxxIIIIHH", 0, 0, 0, timescale,
                                     dur, 0x55C4, 0))
    # sample entry: 16 reserved/index + video fields
    entry_body = b"\x00" * 6 + struct.pack(">H", 1)
    if kind == "video":
        entry_body += (struct.pack(">HHIII", 0, 0, 0, 0, 0)
                       + struct.pack(">HH", width, height)
                       + b"\x00" * 50)
    else:
        entry_body += b"\x00" * 20
    stsd = _box(b"stsd", struct.pack(">BxxxI", 0, 1)
                + _box(codec.encode("latin1").ljust(4), entry_body))
    stts = _box(b"stts", struct.pack(">BxxxIII", 0, 1, n_samples,
                                     max(dur // max(n_samples, 1), 1)))
    stbl = _box(b"stbl", stsd + stts)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512)
                + b"isomiso2avc1mp41")
    return ftyp + moov


class Mp4Probe:
    """Actor-pool stage: MP4 payloads → one row per track with
    container metadata (no codec decode — the honest envelope)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        mids, kinds, codecs, ws, hs, ns, durs = \
            [], [], [], [], [], [], []
        col = t["payload"]
        ids = t["media_id"]
        for i in range(t.num_rows):
            p = col[i].as_py()
            if p is None or len(p) < 12 or \
                    bytes(p[4:8]) not in (b"ftyp", b"moov", b"styp"):
                continue
            try:
                info = probe_mp4(p)
            except (ValueError, struct.error, IndexError,
                    UnicodeDecodeError):
                continue
            for tr in info["tracks"]:
                mids.append(ids[i].as_py())
                kinds.append(tr["kind"])
                codecs.append(tr["codec"])
                ws.append(tr["width"])
                hs.append(tr["height"])
                ns.append(tr["n_samples"])
                durs.append(info["duration_s"])
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "codec": pa.array(codecs, pa.string()),
            "width": pa.array(np.array(ws, np.int64)),
            "height": pa.array(np.array(hs, np.int64)),
            "n_samples": pa.array(np.array(ns, np.int64)),
            "duration_s": pa.array(np.array(durs, np.float64)),
        })


def probe_mp4_tracks(ds, concurrency=(1, 4), batch_size: int = 64):
    """``MEDIA_SCHEMA`` dataset → per-track MP4 container metadata."""
    return ds.map_batches(Mp4Probe, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)
