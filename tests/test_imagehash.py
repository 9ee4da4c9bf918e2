"""Perceptual-hash image near-dedup tests: hash properties (dtype /
scale invariance, JPEG-re-encode robustness), banded-LSH exactness vs
brute force, hot-bucket linearity, and the end-to-end Ray pipeline."""

import numpy as np
import pyarrow as pa
import pytest

from raystack.ops.imagehash import (add_image_phash, hamming64,
                                    image_dedup, phash64,
                                    phash_dup_pairs)


def _smooth(h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(128 + 100 * np.sin(xx / 11) * np.cos(yy / 7))
                     .clip(0, 255),
                     xx * 255 / max(w - 1, 1),
                     yy * 255 / max(h - 1, 1)], -1).astype(np.uint8)


def test_phash_invariances():
    img = _smooth()
    h0 = phash64(img)
    assert h0 == phash64(img)  # deterministic
    # 16-bit samples of the same content hash identically
    assert phash64((img.astype(np.uint16) * 257)) == h0
    # resolution invariance (nearest upscale)
    assert hamming64([h0], [phash64(img.repeat(3, 0).repeat(3, 1))])[0] \
        <= 2
    # grayscale of the luma is close to the color hash by construction
    assert phash64(np.ones((5, 4), np.uint8)) == \
        phash64(np.ones((80, 90), np.uint8))  # flat fields collapse


def test_phash_jpeg_reencode_near_distinct_far():
    from raystack.ops.jpeg import decode_jpeg, encode_jpeg
    img = _smooth()
    h0 = phash64(img)
    hq = phash64(decode_jpeg(encode_jpeg(img, quality=90,
                                         subsample=True)))
    assert hamming64([h0], [hq])[0] <= 8
    rng = np.random.default_rng(3)
    far = [phash64(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8))
           for _ in range(6)]
    assert (hamming64(np.full(6, h0, np.uint64),
                      np.array(far, np.uint64)) > 16).all()


def test_banded_lsh_exact_vs_brute_force(ray_session):
    import ray
    # random 64-bit hashes + planted near pairs; the banded pipeline
    # must find EXACTLY the brute-force pair set for d <= bands-1
    rng = np.random.default_rng(11)
    base = rng.integers(0, 1 << 63, 60, dtype=np.int64).view(np.uint64)
    planted = []
    for i in range(0, 20, 2):
        v = base[i]
        nflip = rng.integers(0, 4)  # 0..3 bit flips
        for b in rng.choice(64, nflip, replace=False):
            v = v ^ (np.uint64(1) << np.uint64(b))
        planted.append(v)
    hashes = np.concatenate([base, np.array(planted, np.uint64)])
    ids = np.arange(len(hashes), dtype=np.int64)
    t = pa.table({"media_id": pa.array(ids),
                  "phash": pa.array(hashes.view(np.int64))})
    got = phash_dup_pairs(ray.data.from_arrow(t), max_distance=3,
                          bands=4).to_pandas()
    got_set = {(a, b, d) for a, b, d in
               zip(got.id_a, got.id_b, got.distance)}
    # brute force ground truth
    ii, jj = np.triu_indices(len(hashes), k=1)
    dist = hamming64(hashes[ii], hashes[jj])
    keep = dist <= 3
    exp_set = {(int(ids[i]), int(ids[j]), int(d))
               for i, j, d in zip(ii[keep], jj[keep], dist[keep])}
    assert got_set == exp_set and len(exp_set) >= 5


def test_identical_hash_hot_bucket_stays_linear(ray_session):
    import ray
    # 500 byte-identical hashes: output pairs to the representative
    # only (499 rows), never O(n^2)
    ids = np.arange(500, dtype=np.int64)
    t = pa.table({"media_id": pa.array(ids),
                  "phash": pa.array(np.full(500, 42, np.int64))})
    got = phash_dup_pairs(ray.data.from_arrow(t), max_distance=3,
                          bands=4).to_pandas()
    assert len(got) == 499
    assert (got["id_a"] == 0).all() and (got["distance"] == 0).all()
    assert sorted(got["id_b"]) == list(range(1, 500))


def test_image_dedup_end_to_end(ray_session):
    import ray

    from raystack.ops.jpeg import encode_jpeg
    from raystack.ops.multimodal import MEDIA_SCHEMA, encode_png
    rng = np.random.default_rng(23)
    base = _smooth()
    other = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    payloads = [encode_png(base),                       # 1
                encode_jpeg(base, quality=95),          # 2: near-dup of 1
                encode_png(base),                       # 3: exact dup of 1
                encode_png(other),                      # 4: unrelated
                b"NOTANIMAGE"]                          # 5: undecodable
    t = pa.table({"media_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                  "payload": pa.array(payloads, pa.large_binary()),
                  "mime": pa.array(["x"] * 5),
                  "meta": pa.array(["{}"] * 5)}, schema=MEDIA_SCHEMA)
    ds = ray.data.from_arrow(t)
    hashes = add_image_phash(ds, concurrency=1).to_pandas() \
        .set_index("media_id")["phash"]
    assert hashes[1] == hashes[3] and np.isnan(hashes[5])
    pairs = image_dedup(ds, max_distance=6, bands=8, concurrency=1) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert [(r.id_a, r.id_b) for r in pairs.itertuples()] == \
        [(1, 2), (1, 3)]
    assert pairs.loc[1, "distance"] == 0 and pairs.loc[0, "distance"] <= 6


def test_bands_guarantee_validation(ray_session):
    import ray
    t = pa.table({"media_id": pa.array([1], pa.int64()),
                  "phash": pa.array([7], pa.int64())})
    with pytest.raises(ValueError, match="bands"):
        phash_dup_pairs(ray.data.from_arrow(t), max_distance=5, bands=4)
    with pytest.raises(ValueError, match="divide"):
        phash_dup_pairs(ray.data.from_arrow(t), max_distance=3, bands=5)
