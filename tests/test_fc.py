"""Front-coding codec: bit-identical round trips (nulls, embedded NUL,
binary, huge values spanning block budgets), compression on sorted /
host-clustered urls, and block-boundary carry correctness."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from raystack.codecs import decode_blob, get_codec
from raystack.codecs import fc as fc_mod
from raystack.codecs.base import arrays_bit_identical


def _rt(name: str, arr: pa.Array) -> bytes:
    blob = get_codec(name).encode(arr).to_bytes()
    assert arrays_bit_identical(decode_blob(blob), arr), name
    return blob


def test_sorted_urls_beat_fsst_zs():
    rng = np.random.default_rng(0)
    urls = sorted(f"https://site{i % 200:03d}.example.com/articles/2024/"
                  f"{rng.integers(0, 10**6):06d}/page-{i}"
                  for i in range(20000))
    arr = pa.array(urls)
    fc = _rt("fc+zs", arr)
    fsst = _rt("fsst+zs", arr)
    plain = _rt("plain", arr)
    assert len(fc) < len(fsst)
    assert len(fc) < len(plain) / 5


def test_host_clustered_unsorted_still_compresses():
    rng = np.random.default_rng(1)
    urls = [f"https://site{(i * 7) % 5}.example.com/p/"
            f"{rng.integers(0, 10**8)}" for i in range(20000)]
    arr = pa.array(urls)
    fc = _rt("fc+zs", arr)
    assert len(fc) < len(_rt("plain", arr)) / 3


def test_edge_values():
    arr = pa.array([None, "", "a", "a", "ab\x00c", None, "ab",
                    "abcdef" * 500, "abcdef" * 500, "", "abc"],
                   type=pa.string())
    _rt("fc", arr)
    _rt("fc+zs", arr)


def test_binary_and_large_types():
    b = pa.array([b"\x00\x01", None, b"\x00\x01\x02", b"\xff\xfe", b""],
                 type=pa.binary())
    _rt("fc", b)
    lb = pa.array([b"zz" * 100, None, b"zz" * 100 + b"q"],
                  type=pa.large_binary())
    _rt("fc", lb)
    ls = pa.array(["abc", None, "abd"], type=pa.large_string())
    _rt("fc", ls)


def test_empty_and_all_null():
    _rt("fc", pa.array([], type=pa.string()))
    _rt("fc", pa.array([None, None], type=pa.string()))


def test_block_boundary_carry(monkeypatch):
    # force tiny blocks so every carry path executes
    monkeypatch.setattr(fc_mod, "_MAX_BLOCK_ROWS", 7)
    monkeypatch.setattr(fc_mod, "_MIN_BLOCK_ROWS", 7)
    rng = np.random.default_rng(2)
    vals = sorted(f"prefix/{rng.integers(0, 50)}/x{i}" for i in range(100))
    arr = pa.array(vals)
    _rt("fc", arr)


def test_wide_values_bound_the_matrix():
    # one 3 MB value: the block sizer must shrink rows, not the budget
    big = "z" * (3 * 1024 * 1024)
    arr = pa.array(["a", big, big + "q", "ab"], type=pa.string())
    assert fc_mod._block_rows(len(big)) >= fc_mod._MIN_BLOCK_ROWS
    _rt("fc", arr)


def test_unsupported_raises():
    with pytest.raises(TypeError):
        get_codec("fc").encode(pa.array([1, 2], type=pa.int64()))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=30)), max_size=120))
def test_fc_string_property(vals):
    arr = pa.array(vals, type=pa.string())
    _rt("fc", arr)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.binary(max_size=40)), max_size=120))
def test_fc_binary_property(vals):
    arr = pa.array(vals, type=pa.binary())
    _rt("fc", arr)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=20)), min_size=20,
                max_size=90))
def test_fc_tiny_blocks_property(vals):
    # force multi-block encode AND decode so every carry path runs under
    # arbitrary inputs (sorted input maximizes cross-block prefix reuse)
    old_max, old_min = fc_mod._MAX_BLOCK_ROWS, fc_mod._MIN_BLOCK_ROWS
    fc_mod._MAX_BLOCK_ROWS = fc_mod._MIN_BLOCK_ROWS = 7
    try:
        arr = pa.array(sorted(vals, key=lambda v: (v is None, v)),
                       type=pa.string())
        _rt("fc", arr)
    finally:
        fc_mod._MAX_BLOCK_ROWS, fc_mod._MIN_BLOCK_ROWS = old_max, old_min
