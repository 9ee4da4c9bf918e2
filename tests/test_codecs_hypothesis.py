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
