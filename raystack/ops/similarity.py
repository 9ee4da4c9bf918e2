"""Similarity search over an embedding column (list<float>).

- :func:`ann_topk` — brute-force cosine baseline: the query matrix is
  broadcast once (``ray.put``), every batch does one numpy matmul and emits
  its local top-k per query (tiny partials), a final per-query merge picks
  the global top-k. No full-dataset shuffle: only k·Q partial rows move.
- :func:`ivf_topk` — scale path: seeded random centroids (IVF-style
  buckets); vectors are assigned to their nearest centroid in a map_batches
  pass and only the query's ``n_probe`` closest buckets are scanned.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _as_matrix(col) -> np.ndarray:
    from .hashing import list_to_matrix
    return list_to_matrix(col, np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def ann_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
             emb_col: str = "embedding", id_col: str = "vec_id",
             exclude_self: bool = True):
    """Global cosine top-k per query. Returns (query_id, neighbor_id, rank),
    rank 1..k, ties broken by neighbor id (deterministic)."""
    import ray

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((qm, np.asarray(query_ids)))

    def partial(t: pa.Table) -> pa.Table:
        qm, qids = ray.get(q_ref)
        m = _normalize(_as_matrix(t[emb_col]))
        ids = np.asarray(t[id_col])
        sim = m @ qm.T  # (n, Q)
        kk = min(k + (1 if exclude_self else 0), len(ids))
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        for qi in range(qm.shape[0]):
            s = sim[:, qi]
            idx = np.argpartition(-s, kk - 1)[:kk] if kk < len(s) else np.arange(len(s))
            out["query_id"].append(np.full(len(idx), qids[qi]))
            out["neighbor_id"].append(ids[idx])
            out["sim"].append(s[idx])
        return pa.table({k2: np.concatenate(v) for k2, v in out.items()})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        qid = g["query_id"].iloc[0]
        if exclude_self:
            g = g[g["neighbor_id"] != qid]
        # deterministic: sim desc, neighbor id asc
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(k)
        return pd.DataFrame({"query_id": qid,
                             "neighbor_id": g["neighbor_id"].to_numpy(),
                             "rank": np.arange(1, len(g) + 1)})

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def train_centroids(sample: np.ndarray, n_centroids: int, iters: int = 8,
                    seed: int = 13) -> np.ndarray:
    """Spherical k-means on a driver-side sample (the classic IVF training
    recipe): seeded init from sample points, assign → mean → renormalize.
    Deterministic per seed; at 100 TB the sample is a tiny ``ds.limit(...)``
    pulled once, never the full dataset."""
    m = _normalize(np.asarray(sample, dtype=np.float64))
    n_centroids = min(n_centroids, len(m))
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(len(m), size=n_centroids, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(n_centroids):
            pts = m[assign == c]
            if len(pts):
                cent[c] = pts.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
             emb_col: str = "embedding", id_col: str = "vec_id",
             n_centroids: int = 16, n_probe: int = 4, seed: int = 13,
             exclude_self: bool = True, centroids: np.ndarray | None = None):
    """IVF-bucketed approximate top-k: scan only the ``n_probe`` buckets
    whose centroids are closest to each query (recall < 1.0 by design —
    that's the scale trade-off; the partitioning assumption is that
    centroid assignment is deterministic per seed). Pass ``centroids``
    (e.g. from :func:`train_centroids`) for data-adapted buckets; with
    ``n_probe == n_centroids`` every bucket is scanned and the result is
    exactly the brute-force top-k (the oracle-checkable configuration)."""
    import ray

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    dim = qm.shape[1]
    if centroids is not None:
        cent = _normalize(np.asarray(centroids, dtype=np.float64))
        n_centroids = len(cent)
    else:
        rng = np.random.default_rng(seed)
        cent = _normalize(rng.standard_normal((n_centroids, dim)))
    probe = np.argsort(-(qm @ cent.T), axis=1)[:, :n_probe]  # (Q, n_probe)
    probe_sets = [set(map(int, row)) for row in probe]
    q_ref = ray.put((qm, np.asarray(query_ids), cent, probe_sets))

    def partial(t: pa.Table) -> pa.Table:
        qm, qids, cent, probe_sets = ray.get(q_ref)
        m = _normalize(_as_matrix(t[emb_col]))
        ids = np.asarray(t[id_col])
        assign = np.argmax(m @ cent.T, axis=1)
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        for qi in range(qm.shape[0]):
            mask = np.isin(assign, list(probe_sets[qi]))
            if not mask.any():
                continue
            s = (m[mask] @ qm[qi])
            sel_ids = ids[mask]
            kk = min(k + (1 if exclude_self else 0), len(s))
            idx = np.argpartition(-s, kk - 1)[:kk] if kk < len(s) else np.arange(len(s))
            out["query_id"].append(np.full(len(idx), qids[qi]))
            out["neighbor_id"].append(sel_ids[idx])
            out["sim"].append(s[idx])
        if not out["query_id"]:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({k2: np.concatenate(v) for k2, v in out.items()})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        qid = g["query_id"].iloc[0]
        if exclude_self:
            g = g[g["neighbor_id"] != qid]
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(k)
        return pd.DataFrame({"query_id": qid,
                             "neighbor_id": g["neighbor_id"].to_numpy(),
                             "rank": np.arange(1, len(g) + 1)})

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def assign_clusters(ds, centroids: np.ndarray, id_col: str = "vec_id",
                    vec_col: str = "embedding"):
    """Embedding clustering assignment (data-curation primitive): each
    vector goes to its max-cosine centroid. Centroids are broadcast via
    ``ray.put`` (tiny), the per-batch work is one numpy matmul — no
    shuffle; at 100 TB this is a pure streaming map. Ties break toward
    the lowest cluster id (argmax)."""
    import ray
    cent = _normalize(np.asarray(centroids, dtype=np.float64))
    ref = ray.put(cent)

    def fn(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _normalize(_as_matrix(t[vec_col]))
        a = np.argmax(m @ c.T, axis=1)
        return pa.table({id_col: t[id_col],
                         "cluster": pa.array(a.astype(np.int64))})

    return ds.map_batches(fn, batch_format="pyarrow")
