"""Property sweep: ann_topk / ivf_topk (exact n_probe == n_centroids
config) vs a pure numpy oracle, with EXACT similarity ties planted.

Tie construction that is safe against float noise: every row is a base
direction scaled by a power of two. IEEE scaling by 2^j is exact, so
normalized rows sharing a direction are BITWISE identical and their
cosines tie exactly — while distinct directions are required (via
``assume``) to be ≥1e-9 apart per query, far above matmul summation-
order noise. Ties therefore occur only between bitwise-equal vectors,
where the documented (sim desc, neighbor id asc) order is well defined
regardless of batching. This sweep caught the per-batch argpartition
boundary cut dropping an arbitrary member of a tie (the global merge
can only tie-break among candidates a batch forwarded)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from hypothesis import assume, given, settings, strategies as st

from raystack.ops.similarity import _normalize, ann_topk, ivf_topk


def _mk_rows(dirs: np.ndarray, dir_of_row: list[int],
             scales: list[int], ids: list[int]) -> pa.Table:
    m = np.stack([dirs[j] * float(2 ** s)
                  for j, s in zip(dir_of_row, scales)])
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([row.tolist() for row in m],
                              pa.list_(pa.float64()))})


def _oracle(m: np.ndarray, ids: np.ndarray, q: np.ndarray, qid: int,
            k: int, exclude_self: bool) -> list[tuple[int, int]]:
    """(neighbor_id, rank) by (sim desc, id asc), self dropped."""
    sims = _normalize(m) @ (q / max(np.linalg.norm(q), 1e-12))
    order = sorted(range(len(ids)), key=lambda i: (-sims[i], ids[i]))
    out = []
    for i in order:
        if exclude_self and int(ids[i]) == qid:
            continue
        out.append((int(ids[i]), len(out) + 1))
        if len(out) == k:
            break
    return out


_dirs = st.integers(min_value=2, max_value=5)


@settings(max_examples=10, deadline=None)
@given(data=st.data())
def test_ann_topk_matches_oracle_with_ties(ray_session, data):
    rng_seed = data.draw(st.integers(0, 2**31))
    rng = np.random.default_rng(rng_seed)
    n_dirs = data.draw(_dirs)
    dim = data.draw(st.integers(min_value=3, max_value=5))
    dirs = rng.integers(-2, 4, size=(n_dirs, dim)).astype(np.float64)
    assume(all(np.linalg.norm(d) > 0 for d in dirs))
    n = data.draw(st.integers(min_value=3, max_value=24))
    dir_of_row = [data.draw(st.integers(0, n_dirs - 1),
                            label=f"dir{i}") for i in range(n)]
    assume(len(set(dir_of_row)) >= 2)
    scales = [data.draw(st.integers(0, 2), label=f"s{i}")
              for i in range(n)]
    ids = rng.permutation(10 * n)[:n].tolist()
    k = data.draw(st.integers(min_value=1, max_value=4))
    exclude_self = data.draw(st.booleans())

    qrow = data.draw(st.integers(0, n - 1))
    q = dirs[dir_of_row[qrow]].copy()
    qid = ids[qrow]

    # distinct directions must be well separated for THIS query, so the
    # only ties are the bitwise ones planted by the scale trick
    nd = _normalize(dirs)
    qsims = nd @ (q / np.linalg.norm(q))
    gaps = np.abs(qsims[:, None] - qsims[None, :])
    iu = np.triu_indices(n_dirs, 1)
    assume((gaps[iu] > 1e-9).all())

    t = _mk_rows(dirs, dir_of_row, scales, ids)
    m = np.stack([dirs[j] * float(2 ** s)
                  for j, s in zip(dir_of_row, scales)])
    want = _oracle(m, np.array(ids), q, qid, k, exclude_self)

    ds = ray.data.from_arrow(t).repartition(data.draw(
        st.sampled_from([1, 3, 7])))
    got = ann_topk(ds, np.array([q]), np.array([qid]), k=k,
                   exclude_self=exclude_self).to_pandas()
    got_pairs = list(map(tuple, got.sort_values("rank")[
        ["neighbor_id", "rank"]].to_numpy()))
    assert got_pairs == want, (rng_seed, dir_of_row, scales, ids, k)


@settings(max_examples=6, deadline=None)
@given(data=st.data())
def test_ivf_topk_full_probe_equals_brute_force(ray_session, data):
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    n_dirs = data.draw(_dirs)
    dim = 4
    dirs = rng.integers(-2, 4, size=(n_dirs, dim)).astype(np.float64)
    assume(all(np.linalg.norm(d) > 0 for d in dirs))
    n = data.draw(st.integers(min_value=4, max_value=20))
    dir_of_row = [int(x) for x in rng.integers(0, n_dirs, n)]
    scales = [int(x) for x in rng.integers(0, 3, n)]
    ids = rng.permutation(10 * n)[:n].tolist()
    k = data.draw(st.integers(min_value=1, max_value=3))

    qrow = int(rng.integers(0, n))
    q = dirs[dir_of_row[qrow]].copy()
    qid = ids[qrow]
    nd = _normalize(dirs)
    qsims = nd @ (q / np.linalg.norm(q))
    gaps = np.abs(qsims[:, None] - qsims[None, :])
    iu = np.triu_indices(n_dirs, 1)
    assume((gaps[iu] > 1e-9).all())

    t = _mk_rows(dirs, dir_of_row, scales, ids)
    m = np.stack([dirs[j] * float(2 ** s)
                  for j, s in zip(dir_of_row, scales)])
    want = _oracle(m, np.array(ids), q, qid, k, True)

    ds = ray.data.from_arrow(t).repartition(3)
    got = ivf_topk(ds, np.array([q]), np.array([qid]), k=k,
                   n_centroids=4, n_probe=4).to_pandas()
    got_pairs = list(map(tuple, got.sort_values("rank")[
        ["neighbor_id", "rank"]].to_numpy()))
    assert got_pairs == want


def test_ann_topk_partitioning_invariant_on_planted_ties(ray_session):
    """Regression pin for the boundary-cut fix: 12 copies of the SAME
    direction (ids interleaved across partitions) + one distinct row,
    k=3 — every partitioning must return the 3 smallest tied ids."""
    dirs = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    n = 13
    dir_of_row = [0] * 12 + [1]
    scales = [0, 1, 2] * 4 + [0]
    ids = [90, 10, 80, 20, 70, 30, 60, 40, 50, 45, 35, 25, 99]
    t = _mk_rows(dirs, dir_of_row, scales, ids)
    q = np.array([2.0, 0.0, 0.0])
    want = [(10, 1), (20, 2), (25, 3)]
    for parts in (1, 2, 5, 13):
        ds = ray.data.from_arrow(t).repartition(parts)
        got = ann_topk(ds, np.array([q]), np.array([7777]), k=3,
                       exclude_self=True).to_pandas()
        got_pairs = list(map(tuple, got.sort_values("rank")[
            ["neighbor_id", "rank"]].to_numpy()))
        assert got_pairs == want, parts
