"""Product quantization: exactness in the lossless configuration (codes
reconstruct the input perfectly -> ADC ranking == brute force), recall on
clustered data, reconstruction error, storage roundtrip of the code
column, and argument validation."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from raystack.ops.pq import (pq_encode, pq_reconstruct, pq_topk, train_pq)
from raystack.ops.similarity import ann_topk


def _emb_table(mat: np.ndarray) -> pa.Table:
    return pa.table({
        "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
        "embedding": pa.array(mat.tolist(),
                              type=pa.list_(pa.float32())),
    })


def test_lossless_codebook_matches_brute_force(ray_session):
    # vectors drawn from a small discrete set per subspace: with k >= the
    # distinct count, k-means converges to the exact points, quantization
    # is lossless and the ADC ranking equals ann_topk exactly
    rng = np.random.default_rng(0)
    base = rng.standard_normal((16, 4))
    rows = base[rng.integers(0, 16, 400)]  # dim 4, m=2 -> dsub 2
    mat = rows.astype(np.float32)
    pq = train_pq(mat, m=2, k=256, iters=25, seed=3)
    ds = ray.data.from_arrow(_emb_table(mat)).repartition(4)
    coded = pq_encode(ds, pq).materialize()

    # quantization is actually lossless on the normalized vectors
    t = pa.concat_tables(coded.iter_batches(batch_format="pyarrow"))
    codes = np.asarray(t["pq_code"].combine_chunks().values).reshape(-1, 2)
    recon = pq_reconstruct(codes, pq)
    normed = mat.astype(np.float64)
    normed /= np.linalg.norm(normed, axis=1, keepdims=True)
    assert np.allclose(recon, normed, atol=1e-9)

    q = mat[:5].astype(np.float64)
    qids = np.arange(5)
    got = pq_topk(coded, q, qids, pq, k=8).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    exp = ann_topk(ds, q, qids, k=8).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got["neighbor_id"].tolist() == exp["neighbor_id"].tolist()


def test_recall_on_clustered_data(ray_session):
    # fine quantization (scalar subspaces, k=128): PQ@10 must recover
    # most true cosine neighbors. (Coarse codes on tight clusters
    # legitimately tie within a cluster — that regime is covered by the
    # lossless test above, which pins exactness when codes suffice.)
    rng = np.random.default_rng(1)
    centers = rng.standard_normal((20, 16)) * 8
    mat = (centers[rng.integers(0, 20, 2000)]
           + rng.standard_normal((2000, 16)) * 0.3).astype(np.float32)
    pq = train_pq(mat[:1000], m=16, k=128, iters=12, seed=5)
    ds = ray.data.from_arrow(_emb_table(mat)).repartition(8)
    coded = pq_encode(ds, pq).materialize()
    q = mat[:8].astype(np.float64)
    qids = np.arange(8)
    got = pq_topk(coded, q, qids, pq, k=10).to_pandas()
    exp = ann_topk(ds, q, qids, k=10).to_pandas()
    recalls = []
    for qi in qids:
        g = set(got[got.query_id == qi]["neighbor_id"])
        e = set(exp[exp.query_id == qi]["neighbor_id"])
        recalls.append(len(g & e) / len(e))
    assert np.mean(recalls) >= 0.8, recalls


def test_reconstruction_error_small_on_clusters():
    rng = np.random.default_rng(2)
    centers = rng.standard_normal((8, 8)) * 5
    mat = centers[rng.integers(0, 8, 500)] + \
        rng.standard_normal((500, 8)) * 0.05
    pq = train_pq(mat, m=2, k=32, iters=10, seed=7, normalize=False)
    # encode driver-side via the same math the stage uses
    books = np.asarray(pq["codebooks"])
    codes = np.empty((500, 2), dtype=np.uint8)
    for s in range(2):
        xs = mat[:, s * 4:(s + 1) * 4]
        d2 = (-2 * xs @ books[s].T) + (books[s] ** 2).sum(axis=1)[None, :]
        codes[:, s] = np.argmin(d2, axis=1)
    recon = pq_reconstruct(codes, pq)
    rel = np.linalg.norm(recon - mat) / np.linalg.norm(mat)
    assert rel < 0.05, rel


def test_code_column_storage_roundtrip(ray_session, tmp_path):
    # pq codes ride the partitioned encode/decode like any list column
    from raystack import pipeline as pl
    rng = np.random.default_rng(3)
    mat = rng.standard_normal((600, 8)).astype(np.float32)
    pq = train_pq(mat, m=4, k=16, iters=5, seed=9)
    ds = ray.data.from_arrow(_emb_table(mat))
    coded = pq_encode(ds, pq, code_col="pq_code") \
        .drop_columns(["embedding"])
    out = str(tmp_path / "pq_enc")
    pl.encode_partitioned(coded, out, url_col="vec_id", num_partitions=2)
    got = pl.decode_pages(pl.read_encoded(out)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    t = pa.concat_tables(pq_encode(ds, pq).iter_batches(
        batch_format="pyarrow"))
    exp = np.asarray(t["pq_code"].combine_chunks().values).reshape(-1, 4)
    back = np.stack(got["pq_code"].to_numpy())
    assert np.array_equal(back, exp)


def test_validation():
    rng = np.random.default_rng(4)
    with pytest.raises(ValueError, match="divisible"):
        train_pq(rng.standard_normal((10, 7)), m=2)
    with pytest.raises(ValueError, match="uint8"):
        train_pq(rng.standard_normal((10, 8)), m=2, k=512)
    with pytest.raises(ValueError, match="sample"):
        train_pq(np.zeros((0, 8)), m=2)


def test_ivfadc_persisted_index(ray_session, tmp_path):
    """IVF + PQ composition (IVFADC): codes stored per bucket row; the
    ADC query path reads (id, pq_code, bucket) only. In the lossless-
    codebook configuration the ADC ranking equals the exact probed
    query; an index built without pq_m refuses use_pq."""
    from raystack.ops.similarity import build_ivf_index, query_ivf_index

    rng = np.random.default_rng(5)
    base = rng.standard_normal((16, 4))
    mat = base[rng.integers(0, 16, 500)].astype(np.float32)
    ds = ray.data.from_arrow(_emb_table(mat)).repartition(4)
    out = str(tmp_path / "ivfadc")
    meta = build_ivf_index(ds, out, n_centroids=4, sample_size=500,
                           iters=25, pq_m=2, pq_k=256)
    assert meta["pq"]["m"] == 2
    q = mat[:5].astype(np.float64)
    qids = np.arange(5)
    exact = query_ivf_index(out, q, qids, k=8, n_probe=4).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    adc = query_ivf_index(out, q, qids, k=8, n_probe=4,
                          use_pq=True).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert adc["neighbor_id"].tolist() == exact["neighbor_id"].tolist()
    # partial probe still returns k rows per query
    part = query_ivf_index(out, q, qids, k=8, n_probe=2,
                           use_pq=True).to_pandas()
    assert set(part["query_id"]) == set(qids)

    out2 = str(tmp_path / "ivf_plain")
    build_ivf_index(ds, out2, n_centroids=4, sample_size=500)
    with pytest.raises(ValueError, match="pq_m"):
        query_ivf_index(out2, q, qids, use_pq=True)


def test_semantic_dedup_removes_planted_near_dups(ray_session):
    """SemDeDup composition: planted near-duplicates collapse to their
    lowest-id representative; distinct vectors all survive. With
    n_clusters=1 the result equals the brute-force greedy (the
    oracle-checkable configuration)."""
    from raystack.ops.similarity import semantic_dedup

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 12))  # 40 distinct directions
    rows = []
    exp_kept = []
    next_id = 0
    for b in range(40):
        n_copies = 1 + (b % 3)  # 1-3 near-copies per direction
        for c in range(n_copies):
            v = base[b] + rng.standard_normal(12) * 1e-4
            rows.append((next_id, v))
            if c == 0:
                exp_kept.append(next_id)  # lowest id of the group wins
            next_id += 1
    mat = np.stack([v for _, v in rows]).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array([i for i, _ in rows], pa.int64()),
        "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(tbl).repartition(4)

    # brute-force configuration: one cluster == global greedy
    kept = semantic_dedup(ds, threshold=0.99, n_clusters=1,
                          sample_size=len(rows)).to_pandas()
    assert sorted(kept["vec_id"]) == sorted(exp_kept)

    # clustered configuration: same answer when clusters separate well
    kept2 = semantic_dedup(ds, threshold=0.99, n_clusters=8,
                           sample_size=len(rows)).to_pandas()
    assert sorted(kept2["vec_id"]) == sorted(exp_kept)

    # sub-bucket cap: tiny max_cluster still returns a superset
    # (near-dups split across sub-buckets may both survive — documented)
    kept3 = semantic_dedup(ds, threshold=0.99, n_clusters=1,
                           sample_size=len(rows),
                           max_cluster=7).to_pandas()
    assert set(exp_kept).issubset(set(kept3["vec_id"]))
