"""Similarity search over an embedding column (list<float>).

- :func:`ann_topk` — brute-force cosine baseline: the query matrix is
  broadcast once (``ray.put``), every batch does one numpy matmul and emits
  its local top-k per query (tiny partials), a final per-query merge picks
  the global top-k. No full-dataset shuffle: only k·Q partial rows move.
- :func:`ivf_topk` — scale path: seeded random centroids (IVF-style
  buckets); vectors are assigned to their nearest centroid in a map_batches
  pass and only the query's ``n_probe`` closest buckets are scanned.
- :func:`build_ivf_index` / :func:`query_ivf_index` — the persisted
  variant: bucket-partitioned Parquet layout built once (sample-trained
  centroids saved in ``ivf_meta.json``), queried many times with
  filesystem-level partition pruning — only probed ``bucket=`` dirs are
  ever read.
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


def _top_candidates(s: np.ndarray, kk: int) -> np.ndarray:
    """Indices of the ``kk`` highest sims PLUS every row tied with the
    boundary value. A bare ``argpartition(...)[:kk]`` keeps an arbitrary
    member of a tie straddling the cut, which breaks the documented
    deterministic (sim desc, neighbor id asc) ordering when the dropped
    tied row has the smaller id — the global merge can only tie-break
    among the candidates each batch actually forwarded. Keeping the full
    boundary tie costs only the tied rows and restores the invariant:
    any row a batch drops is strictly worse than ≥ kk forwarded rows."""
    if kk >= len(s):
        return np.arange(len(s))
    part = np.argpartition(-s, kk - 1)[:kk]
    smin = s[part].min()
    if smin == -np.inf:  # all-NaN tail: forward the cut as-is
        return part
    return np.flatnonzero(s >= smin)


def ann_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
             emb_col: str = "embedding", id_col: str = "vec_id",
             exclude_self: bool = True):
    """Global cosine top-k per query. Returns (query_id, neighbor_id, rank),
    rank 1..k, ties broken by neighbor id (deterministic)."""
    import ray

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((qm, np.asarray(query_ids)))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty blocks are routine after filters
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        qm, qids = ray.get(q_ref)
        m = _normalize(_as_matrix(t[emb_col]))
        ids = np.asarray(t[id_col])
        sim = m @ qm.T  # (n, Q)
        kk = min(k + (1 if exclude_self else 0), len(ids))
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        for qi in range(qm.shape[0]):
            s = np.nan_to_num(sim[:, qi], nan=-np.inf)
            idx = _top_candidates(s, kk)
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
        if t.num_rows == 0:  # empty blocks are routine after filters
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        qm, qids, cent, probe_sets = ray.get(q_ref)
        m = _normalize(_as_matrix(t[emb_col]))
        ids = np.asarray(t[id_col])
        assign = np.argmax(m @ cent.T, axis=1)
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        for qi in range(qm.shape[0]):
            mask = np.isin(assign, list(probe_sets[qi]))
            if not mask.any():
                continue
            s = np.nan_to_num(m[mask] @ qm[qi], nan=-np.inf)
            sel_ids = ids[mask]
            kk = min(k + (1 if exclude_self else 0), len(s))
            idx = _top_candidates(s, kk)
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


def build_ivf_index(ds, out_dir: str, emb_col: str = "embedding",
                    id_col: str = "vec_id", n_centroids: int = 16,
                    sample_size: int = 2048, iters: int = 8, seed: int = 13,
                    centroids: np.ndarray | None = None,
                    pq_m: int | None = None, pq_k: int = 256) -> dict:
    """Persist an IVF layout: train spherical-k-means centroids on a
    bounded driver-side sample (``ds.limit(sample_size)`` — never the
    corpus), assign every vector to its nearest centroid in one streaming
    ``map_batches`` pass, and write Parquet hive-partitioned by
    ``bucket`` (one directory per centroid, the same layout the encode
    pipeline uses for pages). Centroids + config go to
    ``<out_dir>/ivf_meta.json`` so queries are reproducible without the
    build-time dataset. At 100 TB this is the index you build once and
    query many times: the query path below reads ONLY the probed bucket
    directories — filesystem-level partition pruning, no full scan."""
    import json
    import os

    sample = None
    if centroids is None or pq_m:
        tabs = list(ds.limit(sample_size).select_columns([emb_col])
                    .iter_batches(batch_format="pyarrow",
                                  batch_size=sample_size))
        sample = _as_matrix(pa.concat_tables(tabs)[emb_col])
    if centroids is None:
        cent = train_centroids(sample, n_centroids, iters=iters, seed=seed)
    else:
        cent = _normalize(np.asarray(centroids, dtype=np.float64))
    pq_model = None
    if pq_m:
        # IVFADC (Jégou et al.): PQ codes stored alongside each bucket
        # row so queries can scan m bytes/row instead of the vector
        from .pq import train_pq
        pq_model = train_pq(sample, m=pq_m, k=pq_k, iters=iters, seed=seed)

    bucketed = assign_clusters(ds, cent, id_col=id_col, vec_col=emb_col,
                               keep_cols=[emb_col], out_col="bucket_id")
    if pq_model is not None:
        from .pq import pq_encode
        bucketed = pq_encode(bucketed, pq_model, emb_col=emb_col,
                             code_col="pq_code")
    # bucket twice: as the hive partition dir (pruned listing) and as a
    # data column (survives explicit per-file reads on the query path)
    bucketed = bucketed.map_batches(
        lambda t: t.append_column("bucket", t["bucket_id"]),
        batch_format="pyarrow")
    # a rebuild into an existing dir must not leave stale bucket files
    # (write_parquet appends uniquely-named files; queries would read old
    # and new rows side by side)
    import shutil as _shutil
    _shutil.rmtree(out_dir, ignore_errors=True)
    bucketed.write_parquet(out_dir, partition_cols=["bucket"])
    meta = {"n_centroids": int(len(cent)), "emb_col": emb_col,
            "id_col": id_col, "centroids": cent.tolist()}
    if pq_model is not None:
        meta["pq"] = pq_model
    with open(os.path.join(out_dir, "ivf_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def append_ivf_index(ds, index_dir: str, tag: str | None = None) -> dict:
    """Incremental ingest into a persisted IVF layout (the vector
    sibling of ``append_text_index`` / ``append_dedup_index``): new
    vectors are assigned with the index's STORED centroids — they never
    move, so existing buckets are untouched — and, when the index
    carries a PQ codebook, coded with the stored codebook; the rows land
    in the same ``bucket=`` dirs as uniquely-named files (queries glob
    the dir, so old and new rows serve together). ``build(A,
    centroids=C)`` then ``append(B)`` answers every query identically to
    ``build(A ∪ B, centroids=C)`` (equivalence-tested). ``tag`` makes
    the append exactly-once per increment (a re-run with an applied tag
    is a no-op — duplicate rows would surface twice in top-k).

    Honest trade: centroids trained at build time drift from the true
    corpus distribution as appends accumulate, so recall on appended
    regions can sag — rebuild once the corpus has grown far past the
    trained sample (inherent to any fixed-coarse-quantizer IVF)."""
    import json
    import os

    with open(os.path.join(index_dir, "ivf_meta.json")) as f:
        meta = json.load(f)
    if tag is not None and tag in meta.get("applied", []):
        return meta
    cent = np.asarray(meta["centroids"], dtype=np.float64)
    emb_col, id_col = meta["emb_col"], meta["id_col"]
    bucketed = assign_clusters(ds, cent, id_col=id_col, vec_col=emb_col,
                               keep_cols=[emb_col], out_col="bucket_id")
    if "pq" in meta:
        from .pq import pq_encode
        bucketed = pq_encode(bucketed, meta["pq"], emb_col=emb_col,
                             code_col="pq_code")
    bucketed = bucketed.map_batches(
        lambda t: t.append_column("bucket", t["bucket_id"]),
        batch_format="pyarrow")
    bucketed.write_parquet(index_dir, partition_cols=["bucket"])
    if tag is not None:
        meta["applied"] = meta.get("applied", []) + [tag]
        with open(os.path.join(index_dir, "ivf_meta.json"), "w") as f:
            json.dump(meta, f)
    return meta


def query_ivf_index(index_dir: str, queries: np.ndarray,
                    query_ids: np.ndarray, k: int = 10, n_probe: int = 4,
                    exclude_self: bool = True, use_pq: bool = False):
    """Top-k over a persisted IVF index (:func:`build_ivf_index`): pick
    each query's ``n_probe`` nearest centroids, ``read_parquet`` ONLY the
    union of probed ``bucket=`` directories (every other bucket's bytes
    never leave storage), brute-force cosine inside the probed buckets
    with a per-query bucket mask, and merge per-query top-k exactly like
    :func:`ann_topk`. ``n_probe == n_centroids`` scans everything and
    equals the brute-force result (the oracle-checkable configuration)."""
    import json
    import os

    import ray

    with open(os.path.join(index_dir, "ivf_meta.json")) as f:
        meta = json.load(f)
    cent = np.asarray(meta["centroids"], dtype=np.float64)
    emb_col, id_col = meta["emb_col"], meta["id_col"]
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(qm @ cent.T), axis=1)[:, :n_probe]  # (Q, n_probe)
    probe_sets = [set(map(int, row)) for row in probe]
    wanted = sorted(set().union(*probe_sets))
    import glob as _glob
    files = [f for b in wanted for f in sorted(_glob.glob(
        os.path.join(index_dir, f"bucket={b}", "*.parquet")))]
    if not files:
        return ray.data.from_arrow(pa.table(
            {"query_id": pa.array([], pa.int64()),
             "neighbor_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64())}))
    if use_pq:
        # IVFADC: scan PQ codes, never the vectors — the probed buckets'
        # embedding bytes stay in storage (m bytes/row vs dim*4)
        if "pq" not in meta:
            raise ValueError("index was built without pq_m; rebuild with "
                             "build_ivf_index(..., pq_m=...) for ADC "
                             "queries")
        return _query_ivf_pq(files, meta, qm, query_ids, probe_sets, k,
                             exclude_self)
    ds = ray.data.read_parquet(files,
                               columns=[id_col, emb_col, "bucket_id"])
    q_ref = ray.put((qm, np.asarray(query_ids), probe_sets))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty blocks are routine after filters
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        qm, qids, probe_sets = ray.get(q_ref)
        m = _normalize(_as_matrix(t[emb_col]))
        ids = np.asarray(t[id_col])
        bucket = np.asarray(t["bucket_id"]).astype(np.int64)
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        for qi in range(qm.shape[0]):
            mask = np.isin(bucket, list(probe_sets[qi]))
            if not mask.any():
                continue
            s = np.nan_to_num(m[mask] @ qm[qi], nan=-np.inf)
            sel_ids = ids[mask]
            kk = min(k + (1 if exclude_self else 0), len(s))
            idx = _top_candidates(s, kk)
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

    return partials.groupby("query_id").map_groups(merge,
                                                   batch_format="pandas")


def _query_ivf_pq(files: list[str], meta: dict, qm: np.ndarray,
                  query_ids, probe_sets, k: int, exclude_self: bool):
    """ADC over probed bucket files: per-query LUTs broadcast once; each
    row costs m table gathers + a sum. Ranking by ascending approximate
    squared L2 on the normalized vectors == descending approximate
    cosine."""
    import ray

    pq = meta["pq"]
    id_col = meta["id_col"]
    m, dsub = pq["m"], pq["dsub"]
    books = np.asarray(pq["codebooks"], dtype=np.float64)
    nq = len(qm)
    lut = np.empty((nq, m, books.shape[1]), dtype=np.float64)
    for s in range(m):
        qs = qm[:, s * dsub:(s + 1) * dsub]
        c = books[s]
        lut[:, s, :] = ((qs * qs).sum(axis=1)[:, None]
                        - 2.0 * qs @ c.T + (c * c).sum(axis=1)[None, :])
    ds = ray.data.read_parquet(files,
                               columns=[id_col, "pq_code", "bucket_id"])
    q_ref = ray.put((lut, np.asarray(query_ids), probe_sets))
    srange = np.arange(m)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        lut, qids, probe_sets = ray.get(q_ref)
        col = t["pq_code"].combine_chunks() if isinstance(
            t["pq_code"], pa.ChunkedArray) else t["pq_code"]
        codes = np.asarray(col.values, dtype=np.int64).reshape(-1, m)
        ids = np.asarray(t[id_col])
        bucket = np.asarray(t["bucket_id"]).astype(np.int64)
        out = {"query_id": [], "neighbor_id": [], "dist": []}
        for qi in range(lut.shape[0]):
            mask = np.isin(bucket, list(probe_sets[qi]))
            if not mask.any():
                continue
            d = np.nan_to_num(
                lut[qi][srange[:, None], codes[mask].T].sum(axis=0),
                nan=np.inf)
            sel_ids = ids[mask]
            kk = min(k + (1 if exclude_self else 0), len(d))
            idx = _top_candidates(-d, kk)
            out["query_id"].append(np.full(len(idx), qids[qi]))
            out["neighbor_id"].append(sel_ids[idx])
            out["dist"].append(d[idx])
        if not out["query_id"]:
            return empty
        return pa.table({k2: np.concatenate(v) for k2, v in out.items()})

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


def assign_clusters(ds, centroids: np.ndarray, id_col: str = "vec_id",
                    vec_col: str = "embedding", out_col: str = "cluster",
                    keep_cols: list | None = None):
    """Embedding clustering assignment (data-curation primitive): each
    vector goes to its max-cosine centroid. Centroids are broadcast via
    ``ray.put`` (tiny), the per-batch work is one numpy matmul — no
    shuffle; at 100 TB this is a pure streaming map. Ties break toward
    the lowest cluster id (argmax). ``keep_cols`` carries extra columns
    through (e.g. the vectors themselves for an IVF index build)."""
    import ray
    cent = _normalize(np.asarray(centroids, dtype=np.float64))
    ref = ray.put(cent)
    keep = list(keep_cols or [])

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {id_col: t[id_col]}
            for kc in keep:
                cols[kc] = t[kc]
            cols[out_col] = pa.array([], pa.int64())
            return pa.table(cols)
        c = ray.get(ref)
        m = _normalize(_as_matrix(t[vec_col]))
        a = np.argmax(m @ c.T, axis=1)
        cols = {id_col: t[id_col]}
        for kc in keep:
            cols[kc] = t[kc]
        cols[out_col] = pa.array(a.astype(np.int64))
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def semantic_dedup(ds, threshold: float = 0.95, n_clusters: int = 64,
                   emb_col: str = "embedding", id_col: str = "vec_id",
                   sample_size: int = 2048, seed: int = 13,
                   centroids: np.ndarray | None = None,
                   max_cluster: int = 8192):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    paper): cluster the embedding space, then inside each cluster drop
    every vector whose cosine similarity to an already-kept vector
    exceeds ``threshold``. Returns the KEPT rows as (id, cluster).

    Shape at scale: centroids train on a bounded driver-side sample;
    assignment is map-only; the one shuffle is the ``groupby(cluster)``
    — and pairwise work is quadratic only WITHIN a cluster, which is the
    paper's core trick. Determinism: within a cluster the keep order is
    ascending id (first-seen wins), so results don't depend on
    partitioning. Clusters larger than ``max_cluster`` are subdivided by
    an id-hash salt before the pairwise pass (bounded memory; near-dups
    split across sub-buckets can both survive — the documented recall
    trade, disable with ``max_cluster=0``). With ``n_clusters=1`` the
    result equals the brute-force greedy over the whole dataset (the
    oracle-checkable configuration)."""
    import pandas as pd

    if centroids is None:
        tabs = list(ds.limit(sample_size).select_columns([emb_col])
                    .iter_batches(batch_format="pyarrow",
                                  batch_size=sample_size))
        sample = _as_matrix(pa.concat_tables(tabs)[emb_col])
        centroids = train_centroids(sample, n_clusters, seed=seed)
    assigned = assign_clusters(ds, centroids, id_col=id_col,
                               vec_col=emb_col, keep_cols=[emb_col],
                               out_col="cluster")
    thr = float(threshold)

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable").reset_index(drop=True)
        out_ids = []
        clusters = []
        for lo in range(0, len(g), max_cluster or len(g) or 1):
            sub = g.iloc[lo: lo + (max_cluster or len(g))]
            m = np.stack(sub[emb_col].to_numpy()).astype(np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True),
                            1e-12)
            kept_idx: list[int] = []
            kept_mat = np.zeros((0, m.shape[1]))
            for i in range(len(sub)):
                if len(kept_idx) and \
                        (kept_mat @ m[i]).max(initial=-1.0) > thr:
                    continue
                kept_idx.append(i)
                kept_mat = np.vstack([kept_mat, m[i:i + 1]])
            out_ids.extend(sub[id_col].to_numpy()[kept_idx])
            clusters.extend(sub["cluster"].to_numpy()[kept_idx])
        return pd.DataFrame({id_col: out_ids, "cluster": clusters})

    return assigned.groupby("cluster").map_groups(dedup_group,
                                                  batch_format="pandas")
