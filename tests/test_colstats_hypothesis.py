"""Property sweep: column_stats vs a pure oracle under nulls, NaN, ±inf
and any partitioning. Pins the all-NaN float column case: arrow's
``min_max`` SKIPS NaN, so a batch whose valid values are all NaN yields
the impossible (inf, -inf) sentinel — which must become "no stats", not
a reported min_v > max_v."""

import math

import numpy as np
import pyarrow as pa
import ray.data
from hypothesis import given, settings, strategies as st

from raystack.ops.colstats import column_stats

_float_vals = st.one_of(
    st.none(),
    st.just(float("nan")),
    st.just(float("inf")),
    st.just(float("-inf")),
    # -0.0 canonicalized: min() among 0.0 == -0.0 ties is encounter-order
    # dependent, so its str() would differ between batchings — not a
    # stats defect, just a representation ambiguity the sweep avoids
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False).map(lambda v: v + 0.0))

_int_vals = st.one_of(st.none(), st.integers(-10**9, 10**9))


def _oracle(vals):
    """(n_rows, n_valid, min_v, max_v) per the documented contract:
    null invalid; NaN valid but skipped by min/max."""
    n = len(vals)
    nv = sum(v is not None for v in vals)
    comp = [v for v in vals
            if v is not None and not (isinstance(v, float) and math.isnan(v))]
    return (n, nv, str(min(comp)) if comp else "",
            str(max(comp)) if comp else "")


@settings(max_examples=12, deadline=None)
@given(st.lists(_float_vals, min_size=1, max_size=60),
       st.sampled_from([1, 3, 7]))
def test_column_stats_floats_match_oracle(ray_session, vals, parts):
    t = pa.table({"x": pa.array(vals, pa.float64())})
    got = column_stats(ray.data.from_arrow(t).repartition(parts),
                       columns=["x"], with_distinct=False).to_pandas()
    row = got[got["column"] == "x"].iloc[0]
    n, nv, mn, mx = _oracle(vals)
    assert (int(row["n_rows"]), int(row["n_valid"])) == (n, nv)
    # strings of floats compare exactly (same str() both sides)
    assert (row["min_v"], row["max_v"]) == (mn, mx), vals
    if row["min_v"] and row["max_v"]:
        assert not float(row["min_v"]) > float(row["max_v"])


@settings(max_examples=8, deadline=None)
@given(st.lists(_int_vals, min_size=1, max_size=60),
       st.sampled_from([1, 4]))
def test_column_stats_ints_match_oracle(ray_session, vals, parts):
    t = pa.table({"x": pa.array(vals, pa.int64())})
    got = column_stats(ray.data.from_arrow(t).repartition(parts),
                       columns=["x"], with_distinct=False).to_pandas()
    row = got[got["column"] == "x"].iloc[0]
    n, nv, mn, mx = _oracle(vals)
    assert (int(row["n_rows"]), int(row["n_valid"]),
            row["min_v"], row["max_v"]) == (n, nv, mn, mx)


def test_column_stats_all_nan_column(ray_session):
    """The pinned sentinel case: valid rows, every one NaN — no min/max,
    never inf > -inf."""
    t = pa.table({"x": pa.array([float("nan")] * 5, pa.float64())})
    got = column_stats(ray.data.from_arrow(t).repartition(2),
                       columns=["x"], with_distinct=False).to_pandas()
    row = got.iloc[0]
    assert int(row["n_valid"]) == 5  # NaN is a value, not a null
    assert row["min_v"] == "" and row["max_v"] == ""
