"""Property sweep: the three (anti-)semi-join paths — broadcast
``semi_join``, Acero ``semi_join_ds``, bloom ``semi_join_bloom`` (below
AND above its broadcast gate) — against one pure oracle, over random
int/float keys with nulls, NaN and ±0.0.

Documented contract (ops/join.py): a null key never equals anything;
NaN never equals anything (IEEE, unlike DuckDB's total order); -0.0
equals 0.0; anti keeps null/NaN-key rows (NOT EXISTS semantics). The
sweep caught Acero matching NaN == NaN on the build side — which also
made ``semi_join_bloom``'s answer FLIP with key-set size, since its
exact tier is the broadcast join below the gate and the Acero join
above it."""

import math

import pyarrow as pa
import ray.data
from hypothesis import given, settings, strategies as st

from raystack.ops.join import semi_join, semi_join_bloom, semi_join_ds

_fkey = st.one_of(st.none(), st.just(float("nan")), st.just(-0.0),
                  st.sampled_from([0.0, 1.0, 2.5, -3.5, 7.0]))
_ikey = st.one_of(st.none(), st.integers(-3, 6))


def _canon(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None  # never matches
    return v + 0.0 if isinstance(v, float) else v


def _oracle(left_keys, key_set, anti):
    ks = {_canon(k) for k in key_set} - {None}
    out = []
    for i, v in enumerate(left_keys):
        hit = _canon(v) in ks
        if hit != anti:
            out.append(i)
    return out


def _rows(ds):
    # ray 2.49: to_pandas() on a 0-row Dataset loses the columns (the
    # documented quirk) — an empty result is just []
    df = ds.to_pandas()
    return sorted(df["row"]) if len(df) else []


def _check(left_vals, key_vals, typ, ray_session=None):
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(left_vals, typ),
        "row": pa.array(list(range(len(left_vals))), pa.int64())}))
    keys_ds = ray.data.from_arrow(pa.table({"k": pa.array(key_vals, typ)}))
    for anti in (False, True):
        want = _oracle(left_vals, key_vals, anti)
        a = _rows(semi_join(left, key_vals, on="k", anti=anti))
        b = _rows(semi_join_ds(left, keys_ds, on="k", anti=anti))
        c = _rows(semi_join_bloom(left, keys_ds, on="k", anti=anti))
        d = _rows(semi_join_bloom(left, keys_ds, on="k", anti=anti,
                                  broadcast_limit=0))
        assert a == b == c == d == want, (anti, a, b, c, d, want)


@settings(max_examples=6, deadline=None)
@given(st.lists(_fkey, min_size=1, max_size=20),
       st.lists(_fkey, min_size=1, max_size=8))
def test_semi_join_paths_agree_floats(ray_session, left_vals, key_vals):
    _check(left_vals, key_vals, pa.float64())


@settings(max_examples=6, deadline=None)
@given(st.lists(_ikey, min_size=1, max_size=20),
       st.lists(_ikey, min_size=1, max_size=8))
def test_semi_join_paths_agree_ints(ray_session, left_vals, key_vals):
    _check(left_vals, key_vals, pa.int64())
