"""Product quantization for embedding columns — from the public paper
Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor Search"
(IEEE TPAMI 2011). Implemented from the paper's description, numpy only.

The 100 TB story for similarity search: a 768-dim float32 embedding is
3 KB/row; PQ with m=96 subspaces stores 96 bytes (32× smaller) and ANN
queries scan CODES, not vectors — asymmetric distance computation (ADC)
turns each query into m lookup tables of 256 entries, so scoring a row
is m table gathers + a sum, no floating-point vector math per row.

- :func:`train_pq` — driver-side on a bounded sample (the classic
  recipe; at scale the sample is a ``ds.limit(...)``, never the corpus):
  plain Lloyd k-means per contiguous subspace, deterministic per seed,
  empty clusters reseeded from the data.
- :func:`pq_encode` — ``map_batches``: vectors → ``fixed_size_list
  <uint8, m>`` codes (one byte per subspace; the structural list codec
  stores them raw).
- :func:`pq_topk` — ADC top-k, same distributed shape as
  :func:`raystack.ops.similarity.ann_topk`: the per-query LUTs broadcast
  once via ``ray.put``, every batch emits tiny per-query top-k partials,
  one per-query merge picks the global k. Only k·Q partial rows move.
- :func:`pq_reconstruct` — codebook lookup back to approximate vectors
  (tests + diagnostics).

With ``normalize=True`` (default) vectors and queries are unit-scaled
first, so squared-L2 ranking equals cosine ranking (``||a-b||² =
2-2·cos``) and results are comparable to ``ann_topk``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _kmeans(x: np.ndarray, k: int, iters: int, rng) -> np.ndarray:
    """Plain Lloyd on one subspace. Deterministic; empty clusters reseed
    from random data points so every code stays usable."""
    k = min(k, len(x))
    cent = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(iters):
        d2 = (-2.0 * x @ cent.T) + (cent * cent).sum(axis=1)[None, :]
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            pts = x[assign == c]
            cent[c] = pts.mean(axis=0) if len(pts) else \
                x[rng.integers(0, len(x))]
    return cent


def train_pq(sample: np.ndarray, m: int = 8, k: int = 256, iters: int = 10,
             seed: int = 13, normalize: bool = True) -> dict:
    """Train m per-subspace codebooks of k entries on a driver-side
    sample. dim must divide evenly into m contiguous subspaces."""
    x = np.asarray(sample, dtype=np.float64)
    if x.ndim != 2 or not len(x):
        raise ValueError("train_pq needs a (rows, dim) sample")
    if k > 256:
        raise ValueError("k > 256 does not fit uint8 codes")
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if normalize:
        x = _normalize(x)
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = [_kmeans(np.ascontiguousarray(x[:, s * dsub:(s + 1) * dsub]),
                     k, iters, rng) for s in range(m)]
    return {"m": m, "k": int(min(k, len(x))), "dim": dim, "dsub": dsub,
            "normalize": bool(normalize),
            "codebooks": [b.tolist() for b in books]}


def _books(pq: dict) -> np.ndarray:
    return np.asarray(pq["codebooks"], dtype=np.float64)  # (m, k, dsub)


def pq_encode(ds, pq: dict, emb_col: str = "embedding",
              code_col: str = "pq_code"):
    """Append a ``fixed_size_list<uint8, m>`` code column: per subspace,
    one argmin against that subspace's codebook (vectorized matmul)."""
    import ray

    pq_ref = ray.put(pq)

    def enc(t: pa.Table) -> pa.Table:
        from .hashing import list_to_matrix
        p = ray.get(pq_ref)
        m, dsub = p["m"], p["dsub"]
        books = _books(p)
        n = t.num_rows
        if n == 0:
            codes = np.zeros((0, m), dtype=np.uint8)
        else:
            x = list_to_matrix(t[emb_col], np.float64)
            if p["normalize"]:
                x = _normalize(x)
            codes = np.empty((n, m), dtype=np.uint8)
            for s in range(m):
                xs = x[:, s * dsub:(s + 1) * dsub]
                c = books[s]
                d2 = (-2.0 * xs @ c.T) + (c * c).sum(axis=1)[None, :]
                codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
        lst = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.reshape(-1), type=pa.uint8()), m)
        return t.append_column(code_col, lst).replace_schema_metadata(None)

    return ds.map_batches(enc, batch_format="pyarrow")


def pq_reconstruct(codes: np.ndarray, pq: dict) -> np.ndarray:
    """codes (n, m) uint8 → approximate vectors (n, dim)."""
    books = _books(pq)
    cols = [books[s][codes[:, s]] for s in range(pq["m"])]
    return np.concatenate(cols, axis=1)


def pq_topk(ds, queries: np.ndarray, query_ids: np.ndarray, pq: dict,
            k: int = 10, code_col: str = "pq_code", id_col: str = "vec_id",
            exclude_self: bool = True):
    """ADC top-k per query over a PQ-coded dataset. Returns
    (query_id, neighbor_id, rank), rank 1..k by ascending approximate
    squared-L2 distance, ties broken by neighbor id. Same movement shape
    as ann_topk: LUTs broadcast once, k·Q partial rows move."""
    import ray

    q = np.asarray(queries, dtype=np.float64)
    if pq["normalize"]:
        q = _normalize(q)
    m, dsub = pq["m"], pq["dsub"]
    books = _books(pq)
    nq = len(q)
    # per-query lookup tables: lut[qi, s, j] = ||q_s - C_sj||^2
    lut = np.empty((nq, m, books.shape[1]), dtype=np.float64)
    for s in range(m):
        qs = q[:, s * dsub:(s + 1) * dsub]
        c = books[s]
        lut[:, s, :] = ((qs * qs).sum(axis=1)[:, None]
                        - 2.0 * qs @ c.T + (c * c).sum(axis=1)[None, :])
    q_ref = ray.put((lut, np.asarray(query_ids)))
    srange = np.arange(m)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.float64())})
        lut, qids = ray.get(q_ref)
        codes_flat = t[code_col].combine_chunks() if isinstance(
            t[code_col], pa.ChunkedArray) else t[code_col]
        codes = np.asarray(codes_flat.values, dtype=np.int64) \
            .reshape(-1, m)
        ids = np.asarray(t[id_col])
        kk = min(k + (1 if exclude_self else 0), len(ids))
        out = {"query_id": [], "neighbor_id": [], "dist": []}
        from .similarity import _top_candidates
        for qi in range(lut.shape[0]):
            # boundary ties forwarded whole so the global merge's
            # (dist asc, id asc) tie-break sees every candidate
            d = np.nan_to_num(lut[qi][srange[:, None], codes.T].sum(axis=0),
                              nan=np.inf)
            idx = _top_candidates(-d, kk)
            out["query_id"].append(np.full(len(idx), qids[qi]))
            out["neighbor_id"].append(ids[idx])
            out["dist"].append(d[idx])
        return pa.table({c: np.concatenate(v) for c, v in out.items()})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        qid = g["query_id"].iloc[0]
        if exclude_self:
            g = g[g["neighbor_id"] != qid]
        g = g.sort_values(["dist", "neighbor_id"],
                          ascending=[True, True]).head(k)
        return pd.DataFrame({"query_id": qid,
                             "neighbor_id": g["neighbor_id"].to_numpy(),
                             "rank": np.arange(1, len(g) + 1)})

    return partials.groupby("query_id").map_groups(merge,
                                                   batch_format="pandas")
