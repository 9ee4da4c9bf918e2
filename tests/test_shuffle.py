"""Deterministic seeded epoch shuffle: exact-order oracle via an
independent pure-int splitmix64, invariance to input partitioning/order,
seed independence, and multiset preservation."""

import numpy as np
import pyarrow as pa
import ray

from raystack.ops.text import seeded_shuffle

_M = (1 << 64) - 1


def _sm64(x: int) -> int:
    """Pure-Python-int splitmix64 (independent of the numpy kernel)."""
    x &= _M
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _M
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _M
    x ^= x >> 31
    return x


def _mk(ids, nparts=3):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([f"doc {i}" for i in ids], pa.string()),
    })).repartition(nparts)


def test_order_matches_pure_python_oracle(ray_session):
    ids = list(range(200))
    out = seeded_shuffle(_mk(ids), seed=42).to_pandas()
    want = sorted(ids, key=lambda i: _sm64(i ^ 42))
    assert out.doc_id.tolist() == want
    assert out.text.tolist() == [f"doc {i}" for i in want]
    assert "__epoch_key" not in out.columns


def test_invariant_to_partitioning_and_input_order(ray_session):
    ids = list(range(150))
    a = seeded_shuffle(_mk(ids, nparts=1), seed=7).to_pandas()
    b = seeded_shuffle(_mk(ids, nparts=8), seed=7).to_pandas()
    c = seeded_shuffle(_mk(ids[::-1], nparts=5), seed=7).to_pandas()
    assert a.doc_id.tolist() == b.doc_id.tolist() == c.doc_id.tolist()


def test_different_seeds_differ_and_preserve_multiset(ray_session):
    ids = list(range(100))
    e0 = seeded_shuffle(_mk(ids), seed=0).to_pandas()
    e1 = seeded_shuffle(_mk(ids), seed=1).to_pandas()
    assert e0.doc_id.tolist() != e1.doc_id.tolist()
    assert sorted(e0.doc_id) == sorted(e1.doc_id) == ids


def test_negative_and_wide_ids(ray_session):
    ids = [-5, -1, 0, 1, 2**62, -(2**62), 17]
    out = seeded_shuffle(_mk(ids), seed=3).to_pandas()
    want = sorted(ids, key=lambda i: _sm64((i & _M) ^ 3))
    assert out.doc_id.tolist() == want
