"""ALP / ALP-RD float codecs: bit-identical round trips on every float
pattern (decimals, reals, NaN payloads, subnormals, overflow), exception
patching, and the compression claims that justify their existence."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from raystack.codecs import decode_blob, get_codec
from raystack.codecs.base import arrays_bit_identical
from raystack.select import choose_codec


def _rt(name: str, arr: pa.Array) -> bytes:
    blob = get_codec(name).encode(arr).to_bytes()
    assert arrays_bit_identical(decode_blob(blob), arr), name
    return blob


WEIRD64 = pa.array([None, float("nan"), float("inf"), float("-inf"), -0.0,
                    0.0, 5e-324, 1.7e308, 123.456, 1e-10, None],
                   type=pa.float64())
WEIRD32 = pa.array([None, float("nan"), float("inf"), -0.0, 1e-45,
                    3.4e38, 1.5, None], type=pa.float32())


@pytest.mark.parametrize("name", ["alp", "alprd"])
@pytest.mark.parametrize("arr", [WEIRD64, WEIRD32,
                                 pa.array([], type=pa.float64()),
                                 pa.array([], type=pa.float32()),
                                 pa.array([None, None], type=pa.float64()),
                                 pa.array([7.25], type=pa.float32())],
                         ids=["weird64", "weird32", "empty64", "empty32",
                              "allnull", "single32"])
def test_edge_roundtrips(name, arr):
    _rt(name, arr)


def test_alp_rejects_unsupported():
    with pytest.raises(TypeError):
        get_codec("alp").encode(pa.array([1, 2], type=pa.int64()))
    with pytest.raises(TypeError):
        get_codec("alprd").encode(pa.array(["a"], type=pa.string()))


def test_alp_compresses_decimal_prices():
    rng = np.random.default_rng(7)
    prices = np.round(rng.uniform(1.0, 100_000.0, 50_000), 2)
    arr = pa.array(prices, type=pa.float64())
    alp = _rt("alp", arr)
    plain = _rt("plain", arr)
    bsp = _rt("bytesplit", arr)
    # 2-decimal values over a 1e7 range need ~24 bits -> at least 2.5x
    assert len(alp) < len(plain) / 2.5
    assert len(alp) < len(bsp)


def test_alp_negative_exponent_for_coarse_integers():
    rng = np.random.default_rng(8)
    vals = (rng.integers(0, 10**6, 20_000) * 1000).astype(np.float64)
    arr = pa.array(vals, type=pa.float64())
    chunk = get_codec("alp").encode(arr)
    assert chunk.meta["k"] < 0  # divides away the trailing zeros
    assert arrays_bit_identical(decode_blob(chunk.to_bytes()), arr)
    assert len(chunk.to_bytes()) < arr.nbytes / 2


def test_alp_exception_patching_mixed_column():
    # mostly 2-decimal values with scattered true reals / specials: the
    # non-conforming rows travel as patches, everything stays bit-exact
    rng = np.random.default_rng(9)
    vals = np.round(rng.uniform(0, 1000, 5000), 2)
    idx = rng.choice(5000, 50, replace=False)
    vals[idx[:20]] = rng.standard_normal(20) * 1e-7
    vals[idx[20:40]] = np.nan
    vals[idx[40:]] = np.inf
    arr = pa.array(vals, type=pa.float64())
    chunk = get_codec("alp").encode(arr)
    n_exc = len(chunk.buffers[1]) // 4
    assert 0 < n_exc <= 50 + 20  # specials + the tiny reals
    assert arrays_bit_identical(decode_blob(chunk.to_bytes()), arr)


def test_alprd_beats_plain_on_clustered_reals():
    # embeddings-like: values in a narrow magnitude band share exponents,
    # so the left-bits dictionary is tiny
    rng = np.random.default_rng(10)
    emb = (rng.standard_normal(50_000) * 0.1).astype(np.float32)
    arr = pa.array(emb, type=pa.float32())
    blob = _rt("alprd", arr)
    assert len(blob) < arr.nbytes * 0.95


def test_alprd_dictionary_overflow_roundtrips():
    # more distinct left parts than the dictionary cap -> exception path
    rng = np.random.default_rng(11)
    # full-range doubles: sign/exponent/top-mantissa highly distinct
    bits = rng.integers(0, 2**63, 3000, dtype=np.uint64)
    arr = pa.array(bits.view(np.float64), type=pa.float64())
    chunk = get_codec("alprd").encode(arr)
    assert arrays_bit_identical(decode_blob(chunk.to_bytes()), arr)


def test_choose_codec_picks_alp_for_decimals():
    rng = np.random.default_rng(12)
    arr = pa.array(np.round(rng.uniform(1, 9999, 20_000), 2),
                   type=pa.float64())
    assert choose_codec(arr, "l_extendedprice", 3) == "alp"


def test_alp_deterministic_choice():
    rng = np.random.default_rng(13)
    arr = pa.array(np.round(rng.uniform(0, 10, 10_000), 1),
                   type=pa.float64())
    k1 = get_codec("alp").encode(arr).meta["k"]
    k2 = get_codec("alp").encode(arr).meta["k"]
    assert k1 == k2


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.floats(allow_nan=True,
                                               allow_infinity=True,
                                               width=32)),
                max_size=200))
def test_alp_family_float32_property(vals):
    arr = pa.array(vals, type=pa.float32())
    _rt("alp", arr)
    _rt("alprd", arr)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(
    st.none(),
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    # decimal-ish values, the ALP fast path
    st.integers(min_value=-10**9, max_value=10**9).map(lambda i: i / 100.0)),
    max_size=200))
def test_alp_family_float64_property(vals):
    arr = pa.array(vals, type=pa.float64())
    _rt("alp", arr)
    _rt("alprd", arr)
