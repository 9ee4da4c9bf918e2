"""Property sweep: frequent_items(per_batch_cut=m) tail guarantees.

Documented contract (ops/colstats.py:170-175): the cut bounds shuffle
volume at the cost of exactness on adversarially spread tails — a value
can only be missed (or undercounted) when it falls outside the top-m of
a block's partial. Batching granularity is Ray's to choose, so the
sweep asserts only guarantees that hold for ANY batching:

- reported counts never exceed true counts (undercount-only);
- cut >= total distinct values ≡ the exact result, any layout;
- a value that is the strict PLURALITY of every contiguous window
  (interleaved construction) is reported first with its exact count.
"""

import numpy as np
import pyarrow as pa
import ray.data
from hypothesis import given, settings, strategies as st

from raystack.ops.colstats import frequent_items

_blocks = st.lists(
    st.lists(st.integers(min_value=0, max_value=9), min_size=1,
             max_size=40),
    min_size=1, max_size=4)


def _ds(blocks):
    tables = [pa.table({"v": pa.array(b, pa.int64())}) for b in blocks]
    return ray.data.from_arrow(tables)


@settings(max_examples=10, deadline=None)
@given(_blocks, st.integers(min_value=1, max_value=4))
def test_cut_only_undercounts(ray_session, blocks, m):
    got = frequent_items(_ds(blocks), "v", k=10, per_batch_cut=m)
    true = {}
    for b in blocks:
        for v in b:
            true[v] = true.get(v, 0) + 1
    for _, row in got.iterrows():
        assert row["n"] <= true[row["value"]], (blocks, m)
    # order is by reported count desc, value asc on ties
    ns = got["n"].tolist()
    assert ns == sorted(ns, reverse=True)


@settings(max_examples=10, deadline=None)
@given(_blocks)
def test_cut_at_alphabet_size_is_exact(ray_session, blocks):
    distinct = len({v for b in blocks for v in b})
    exact = frequent_items(_ds(blocks), "v", k=10)
    cut = frequent_items(_ds(blocks), "v", k=10, per_batch_cut=distinct)
    assert exact["value"].tolist() == cut["value"].tolist()
    assert exact["n"].tolist() == cut["n"].tolist()


def test_everywhere_plurality_survives_cut_1(ray_session):
    """Interleave A with a cycling tail alphabet: A is the strict
    plurality of EVERY contiguous window of length >= 3, so even
    per_batch_cut=1 must report A first with its exact count."""
    tail = list(range(100, 160))
    data = []
    for i, x in enumerate(tail):
        data.extend([7, 7, x])  # every window is >= 2/3 sevens
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(data, pa.int64())})).repartition(5)
    got = frequent_items(ds, "v", k=3, per_batch_cut=1)
    assert got["value"].iloc[0] == 7
    assert got["n"].iloc[0] == 2 * len(tail)


def test_spread_tail_can_be_missed_but_top_stays(ray_session):
    """The documented failure mode: a tail value spread one-per-block
    may vanish under the cut, but every SURVIVING count stays a true
    undercount and the global top item is unaffected."""
    blocks = [[1, 1, 1, 9]] * 4  # 9 appears once in every block
    exact = frequent_items(_ds(blocks), "v", k=5)
    cut = frequent_items(_ds(blocks), "v", k=5, per_batch_cut=1)
    assert exact.set_index("value")["n"].to_dict() == {1: 12, 9: 4}
    assert cut["value"].iloc[0] == 1 and cut["n"].iloc[0] == 12
    as_map = cut.set_index("value")["n"].to_dict()
    assert as_map.get(9, 0) <= 4
