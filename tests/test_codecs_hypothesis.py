"""Property-based codec round-trips (hypothesis): arbitrary typed arrays
with nulls/empties/extremes must decode bit-identically under every
applicable codec."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from raystack.codecs import decode_blob, get_codec
from raystack.codecs.base import arrays_bit_identical
from raystack.select import candidates_for, choose_codec


def _roundtrip_all(arr: pa.Array):
    for name in candidates_for(arr.type):
        try:
            blob = get_codec(name).encode(arr).to_bytes()
        except TypeError:
            continue
        back = decode_blob(blob)
        assert arrays_bit_identical(back, arr), name
    # and the auto-selected path end to end
    chosen = choose_codec(arr, "c", 0)
    assert arrays_bit_identical(
        decode_blob(get_codec(chosen).encode(arr).to_bytes()), arr), chosen


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.integers(min_value=-2**63, max_value=2**63 - 1)),
                max_size=200))
def test_int64_roundtrip(vals):
    _roundtrip_all(pa.array(vals, type=pa.int64()))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.floats(allow_nan=True,
                                               allow_infinity=True,
                                               width=64)),
                max_size=200))
def test_float64_roundtrip(vals):
    _roundtrip_all(pa.array(vals, type=pa.float64()))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=40)), max_size=150))
def test_string_roundtrip(vals):
    _roundtrip_all(pa.array(vals, type=pa.string()))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.binary(max_size=60)), max_size=120))
def test_binary_roundtrip(vals):
    _roundtrip_all(pa.array(vals, type=pa.binary()))


@settings(max_examples=20, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.integers(min_value=0, max_value=2**62)),
                max_size=150))
def test_timestamp_roundtrip(vals):
    arr = pa.array(vals, type=pa.int64()).cast(pa.timestamp("us"))
    _roundtrip_all(arr)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.one_of(
    st.none(),
    st.lists(st.one_of(st.none(),
                       st.integers(min_value=-2**31, max_value=2**31 - 1)),
             max_size=8)),
    max_size=60))
def test_list_int_roundtrip(vals):
    # null list vs EMPTY list vs null element are three different
    # states — the structural codec must preserve all three
    _roundtrip_all(pa.array(vals, type=pa.list_(pa.int64())))


@settings(max_examples=25, deadline=None)
@given(st.lists(st.one_of(
    st.none(),
    st.lists(st.floats(allow_nan=True, allow_infinity=True, width=32),
             min_size=4, max_size=4)),
    max_size=40))
def test_fixed_size_list_float_roundtrip(vals):
    # the embeddings shape: fixed_size_list<float32> with null rows
    # (null slots still carry child buffer positions — bit-exactness
    # includes NaN payloads)
    _roundtrip_all(pa.array(vals, type=pa.list_(pa.float32(), 4)))


@settings(max_examples=20, deadline=None)
@given(st.lists(st.one_of(
    st.none(),
    st.lists(st.one_of(st.none(), st.text(max_size=12)), max_size=5)),
    max_size=40))
def test_list_string_roundtrip(vals):
    _roundtrip_all(pa.array(vals, type=pa.list_(pa.string())))


@settings(max_examples=20, deadline=None)
@given(st.lists(st.one_of(
    st.none(),
    st.lists(st.one_of(st.none(),
                       st.lists(st.integers(min_value=0, max_value=255),
                                max_size=4)),
             max_size=4)),
    max_size=30))
def test_nested_list_roundtrip(vals):
    # list<list<int>> — the structural codec composes with itself
    _roundtrip_all(pa.array(vals, type=pa.list_(pa.list_(pa.int64()))))
