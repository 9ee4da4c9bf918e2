"""Property sweep: propagate_labels vs a pure union-find oracle over
random duplicate-pair graphs, plus the long-chain case the sweep was
built for: pre-fix, min-label propagation moved labels ONE hop per
round, so a 40-node drift chain silently returned non-converged labels
at the default max_iter=10. Label chasing (pointer doubling) now
converges in O(log diameter) rounds, and hitting max_iter without a
fixpoint raises instead of returning partial labels."""

import pyarrow as pa
import pytest
import ray.data
from hypothesis import given, settings, strategies as st

from raystack.ops.dedup import propagate_labels


def _oracle(pairs):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    nodes = {n for p in pairs for n in p}
    return {n: find(n) for n in nodes}


def _run(pairs, **kw):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([a for a, _ in pairs], pa.int64()),
        "dup_of": pa.array([b for _, b in pairs], pa.int64())}))
    df = propagate_labels(ds, **kw).to_pandas()
    return dict(zip(df["node"].astype(int), df["label"].astype(int)))


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 60), st.integers(0, 60)),
                min_size=1, max_size=40))
def test_propagate_labels_matches_union_find(ray_session, pairs):
    assert _run(pairs) == _oracle(pairs)


def test_propagate_labels_long_chain(ray_session):
    """The pre-fix silent failure: a 40-node path needs 39 one-hop
    rounds but only log2(39)≈6 doubling rounds — must be exact at the
    default max_iter."""
    pairs = [(i + 1, i) for i in range(39)]
    got = _run(pairs)
    assert got == {n: 0 for n in range(40)}


def test_propagate_labels_raises_without_fixpoint(ray_session):
    pairs = [(i + 1, i) for i in range(9)]
    with pytest.raises(RuntimeError, match="no fixpoint"):
        _run(pairs, max_iter=1)
