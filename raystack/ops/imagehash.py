"""Image near-duplicate detection: 64-bit perceptual hash (pHash) +
banded-LSH candidate generation, built on the library-free decoders in
:mod:`raystack.ops.multimodal` / :mod:`raystack.ops.jpeg` /
:mod:`raystack.ops.gif`.

100 TB shape (mirrors the MinHash family in :mod:`raystack.ops.dedup`):

- hashing is embarrassingly parallel — an actor-pool ``map_batches``
  over small payload batches, 8 output bytes per image;
- candidate generation shuffles ONLY ``(band_id, band_val, id, phash)``
  rows (≈26 B × bands per image), never pixels: any pair within
  Hamming distance ``bands - 1`` shares at least one of ``bands``
  equal-width bit-bands (pigeonhole), so a groupby on the band value
  co-locates every candidate pair;
- within a bucket, pairs are verified between DISTINCT phash values
  (identical hashes collapse to their min-id representative first), so
  a million byte-identical logos cost O(n) rows, not O(n²) pairs.

The pHash itself is the classic DCT construction: 32×32 area-mean
grayscale → 2-D DCT-II → top-left 8×8 low-frequency block → bit k =
coefficient > median. Deterministic, so the same image always lands
the same 64-bit value across workers and runs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_U64 = np.uint64


def _dct_basis_n(n: int) -> np.ndarray:
    k = np.arange(n)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / (2 * n))
    C *= np.sqrt(2.0 / n)
    C[0] *= np.sqrt(0.5)
    return C


_C32 = _dct_basis_n(32)


def _area_resize_32(gray: np.ndarray) -> np.ndarray:
    """(h, w) float → (32, 32) block-mean downsample (area averaging;
    nearest replication when an axis is smaller than 32). Vectorized
    with add.reduceat over the row/col block boundaries."""
    h, w = gray.shape
    if h < 32:
        gray = gray[(np.arange(32) * h // 32)]
        h = 32
    if w < 32:
        gray = gray[:, (np.arange(32) * w // 32)]
        w = 32
    rb = np.arange(32) * h // 32
    cb = np.arange(32) * w // 32
    rows = np.add.reduceat(gray, rb, axis=0)
    cells = np.add.reduceat(rows, cb, axis=1)
    rcount = np.diff(np.append(rb, h)).astype(np.float64)
    ccount = np.diff(np.append(cb, w)).astype(np.float64)
    return cells / (rcount[:, None] * ccount[None, :])


def phash64(img: np.ndarray) -> int:
    """(h, w[, c]) image array → 64-bit perceptual hash (uint64).
    Alpha is ignored; color collapses to Rec.601 luma; 16-bit samples
    scale to the 8-bit range first so dtype never changes the hash."""
    a = img.astype(np.float64)
    if a.ndim == 3:
        if img.dtype != np.uint8:
            a = a * (255.0 / 65535.0)
        c = a.shape[2]
        if c >= 3:
            a = (0.299 * a[..., 0] + 0.587 * a[..., 1]
                 + 0.114 * a[..., 2])
        else:  # gray or gray+alpha
            a = a[..., 0]
    elif img.dtype != np.uint8:
        a = a * (255.0 / 65535.0)
    small = _area_resize_32(a)
    coef = (_C32 @ small @ _C32.T)[:8, :8].ravel()
    bits = coef > np.median(coef)
    weights = _U64(1) << np.arange(64, dtype=np.uint64)
    return int(bits.astype(np.uint64) @ weights)


def hamming64(a, b) -> np.ndarray:
    """Element-wise Hamming distance between uint64 arrays (numpy<2:
    popcount via unpackbits on the byte view)."""
    x = (np.asarray(a, np.uint64) ^ np.asarray(b, np.uint64))
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1) \
        .sum(axis=1).astype(np.int64)


class ImagePhash:
    """Actor-pool stage: decode each payload (magic-byte sniff over the
    real decoder set) and emit its pHash. Undecodable rows emit null."""

    def __init__(self):
        from raystack.ops.multimodal import decode_image_any
        self._decode = decode_image_any  # import once per actor

    def __call__(self, t: pa.Table) -> pa.Table:
        import struct
        import zlib
        n = t.num_rows
        hashes = np.zeros(n, np.uint64)
        ok = np.zeros(n, bool)
        col = t["payload"]
        for i in range(n):
            p = col[i].as_py()
            if p is None:
                continue
            try:
                img = self._decode(p)
            except (ValueError, EOFError, IndexError, struct.error,
                    zlib.error):
                continue
            if img is None:
                continue
            hashes[i] = phash64(img)
            ok[i] = True
        return pa.table({
            "media_id": t["media_id"],
            "phash": pa.array(np.where(ok, hashes, 0).view(np.int64),
                              mask=~ok),
        })


def add_image_phash(ds, concurrency=(1, 4), batch_size: int = 64):
    """``MEDIA_SCHEMA``-shaped dataset → (media_id, phash:int64|null)."""
    return ds.map_batches(ImagePhash, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


def phash_dup_pairs(hashes_ds, max_distance: int = 3, bands: int = 4,
                    id_col: str = "media_id"):
    """(id, phash) dataset → near-duplicate pairs
    ``(id_a, id_b, distance)`` with ``distance ≤ max_distance`` and
    ``id_a < id_b``, via banded LSH. With the default 4 bands of
    16 bits the candidate generation is EXACT for ``max_distance ≤ 3``
    (pigeonhole); larger distances need more bands
    (``bands ≥ max_distance + 1`` keeps the guarantee).

    Identical phashes pair only to their min-id representative
    (distance 0), and cross-hash verification runs between distinct
    values — hot buckets of byte-identical images stay linear. Pairs
    found in several bands dedupe through a final groupby."""
    if bands < max_distance + 1:
        raise ValueError(
            f"bands={bands} cannot guarantee max_distance={max_distance}; "
            f"need bands >= max_distance + 1")
    if 64 % bands:
        raise ValueError("bands must divide 64")
    width = 64 // bands
    mask = _U64((1 << width) - 1)

    def explode(t: pa.Table) -> pa.Table:
        colp = t["phash"]
        if isinstance(colp, pa.ChunkedArray):
            colp = colp.combine_chunks()
        valid = np.asarray(colp.is_valid())
        v = np.asarray(colp.fill_null(0)).astype(np.int64).view(np.uint64)
        ids = np.asarray(t[id_col]).astype(np.int64)
        v, ids = v[valid], ids[valid]
        n = len(v)
        band_id = np.repeat(np.arange(bands, dtype=np.int64), n)
        vv = np.tile(v, bands)
        shifts = np.repeat(np.arange(bands, dtype=np.uint64)
                           * _U64(width), n)
        band_val = ((vv >> shifts) & mask).view(np.int64)
        return pa.table({
            "band": pa.array(band_id),
            "bval": pa.array(band_val),
            id_col: pa.array(np.tile(ids, bands)),
            "phash": pa.array(vv.view(np.int64)),
        })

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = np.asarray(g[id_col]).astype(np.int64)
        ph = np.asarray(g["phash"]).astype(np.int64).view(np.uint64)
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "distance": pa.array([], pa.int64())})
        if len(ids) < 2:
            return empty
        order = np.argsort(ids, kind="stable")
        ids, ph = ids[order], ph[order]
        uniq, first_idx, inv = np.unique(ph, return_index=True,
                                         return_inverse=True)
        rep = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(rep, inv, ids)
        a_out, b_out, d_out = [], [], []
        # members of an identical-hash group pair to the representative
        dup_members = ids != rep[inv]
        if dup_members.any():
            a_out.append(rep[inv][dup_members])
            b_out.append(ids[dup_members])
            d_out.append(np.zeros(int(dup_members.sum()), np.int64))
        # distinct hashes: pairwise Hamming among representatives
        m = len(uniq)
        if m >= 2:
            ii, jj = np.triu_indices(m, k=1)
            dist = hamming64(uniq[ii], uniq[jj])
            keep = dist <= max_distance
            if keep.any():
                ra, rb = rep[ii[keep]], rep[jj[keep]]
                lo = np.minimum(ra, rb)
                hi = np.maximum(ra, rb)
                a_out.append(lo)
                b_out.append(hi)
                d_out.append(dist[keep])
        if not a_out:
            return empty
        return pa.table({"id_a": pa.array(np.concatenate(a_out)),
                         "id_b": pa.array(np.concatenate(b_out)),
                         "distance": pa.array(np.concatenate(d_out))})

    exploded = hashes_ds.map_batches(explode, batch_format="pyarrow")
    pairs = exploded.groupby(["band", "bval"]) \
        .map_groups(bucket_pairs, batch_format="pyarrow")
    # a pair can surface in several bands — keep one row
    return pairs.groupby(["id_a", "id_b"]).min("distance") \
        .map_batches(lambda t: t.rename_columns(
            ["id_a", "id_b", "distance"]), batch_format="pyarrow")


def image_dedup(ds, max_distance: int = 3, bands: int = 4,
                concurrency=(1, 4)):
    """End-to-end image near-dedup over a ``MEDIA_SCHEMA`` dataset:
    hash → banded candidate pairs → verified near-dup pairs. Returns
    the pairs dataset; feed it to
    :func:`raystack.ops.dedup.resolve_clusters` /
    ``propagate_labels`` (same pair schema) for keep/drop decisions."""
    hashes = add_image_phash(ds, concurrency=concurrency)
    return phash_dup_pairs(hashes, max_distance=max_distance,
                           bands=bands)
