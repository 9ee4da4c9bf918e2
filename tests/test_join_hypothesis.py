"""Property sweep: broadcast_join and hash_join vs a pure pandas merge
oracle over random keyed tables — duplicate keys (row multiplication),
keys on one side only, inner vs left semantics, any partitioning."""

import pandas as pd
import pyarrow as pa
import ray.data
from hypothesis import given, settings, strategies as st

from raystack.ops.join import broadcast_join, hash_join

_keys = st.lists(st.integers(0, 6), min_size=1, max_size=15)


def _left_tbl(keys):
    return pa.table({"k": pa.array(keys, pa.int64()),
                     "lv": pa.array(list(range(len(keys))), pa.int64())})


def _right_df(keys):
    return pd.DataFrame({"k": pd.Series(keys, dtype="int64"),
                         "rv": pd.Series(range(100, 100 + len(keys)),
                                         dtype="int64")})


def _canon(df):
    df = df[sorted(df.columns)]
    return sorted(map(tuple, df.fillna(-1).to_numpy().tolist()))


@settings(max_examples=8, deadline=None)
@given(_keys, _keys, st.sampled_from(["inner", "left"]),
       st.sampled_from([1, 3, 6]))
def test_broadcast_join_matches_pandas(ray_session, lk, rk, how, parts):
    ds = ray.data.from_arrow(_left_tbl(lk)).repartition(parts)
    small = _right_df(rk)
    got = broadcast_join(ds, small, on="k", how=how).to_pandas()
    want = _left_tbl(lk).to_pandas().merge(small, on="k", how=how)
    if len(want) == 0:
        assert len(got) == 0
    else:
        assert _canon(got) == _canon(want), (lk, rk, how)


@settings(max_examples=6, deadline=None)
@given(_keys, _keys, st.sampled_from([1, 4]))
def test_hash_join_inner_matches_pandas(ray_session, lk, rk, parts):
    left = ray.data.from_arrow(_left_tbl(lk)).repartition(parts)
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(rk, pa.int64()),
        "rv": pa.array([100 + i for i in range(len(rk))],
                       pa.int64())})).repartition(parts)
    got = hash_join(left, right, on="k").to_pandas()
    want = _left_tbl(lk).to_pandas().merge(_right_df(rk), on="k",
                                           how="inner")
    if len(want) == 0:
        assert len(got) == 0
    else:
        assert _canon(got) == _canon(want), (lk, rk)
