"""Property-based soundness of the zone-pruning math (hypothesis):
for arbitrary pages and predicates, the page-level proofs must never
contradict the exact row-level semantics —

- ``predicate_mask`` ≡ a brute-force per-row evaluation (the one
  definition of predicate truth);
- a page ``_page_classify`` marks DISJOINT has zero matching rows;
- a page it marks CONTAINED has every row matching;
- a page ``_overlap_pages``-style min/max(+bloom) logic would prune is
  always disjoint (checked through ``_page_classify``'s disjoint flag,
  which subsumes it).

False positives (keeping a page with no matches) only cost work, so
they are NOT errors; false negatives would corrupt results and are what
these invariants forbid.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings, strategies as st

from raystack.zones import _page_bloom, _page_classify, predicate_mask

_vals = st.lists(st.one_of(st.none(),
                           st.integers(min_value=-1000, max_value=1000)),
                 min_size=1, max_size=40)

_range_pred = st.tuples(
    st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000)),
    st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000)))
_in_pred = st.builds(lambda v: {"in": v},
                     st.lists(st.integers(min_value=-1000, max_value=1000),
                              max_size=5))
_pred_st = st.one_of(_range_pred, _in_pred)


def _row_matches(v, spec) -> bool:
    """Independent brute-force predicate truth for one value."""
    if v is None:
        return False if isinstance(spec, dict) else (
            False if (spec[0] is not None or spec[1] is not None) else True)
    if isinstance(spec, dict):
        return v in spec["in"]
    lo, hi = spec
    return (lo is None or v >= lo) and (hi is None or v <= hi)


def _zone_table(pages: list[list], with_bloom: bool) -> pa.Table:
    rows = {"page_idx": [], "nrows": [], "nnull": [], "zmin": [],
            "zmax": []}
    blooms = []
    for i, vals in enumerate(pages):
        arr = pa.array(vals, type=pa.int64())
        mm = pc.min_max(arr)
        rows["page_idx"].append(i)
        rows["nrows"].append(len(vals))
        rows["nnull"].append(arr.null_count)
        rows["zmin"].append(mm["min"].as_py())
        rows["zmax"].append(mm["max"].as_py())
        blooms.append(_page_bloom(arr))
    t = pa.table({**{k: pa.array(v) for k, v in rows.items()},
                  "zmin": pa.array(rows["zmin"], type=pa.int64()),
                  "zmax": pa.array(rows["zmax"], type=pa.int64())})
    if with_bloom:
        t = t.append_column("bloom", pa.array(blooms, type=pa.binary()))
    return t


@settings(max_examples=120, deadline=None)
@given(st.lists(_vals, min_size=1, max_size=6), _pred_st, st.booleans())
def test_page_proofs_never_lie(pages, spec, with_bloom):
    z = _zone_table(pages, with_bloom)
    disjoint, contained = _page_classify(z, spec)
    for i, vals in enumerate(pages):
        matches = [_row_matches(v, spec) for v in vals]
        if disjoint[i]:
            assert not any(matches), (vals, spec, "disjoint page matched")
        if contained[i] and not disjoint[i]:
            assert all(matches), (vals, spec, "contained page missed")


@settings(max_examples=120, deadline=None)
@given(_vals, _pred_st)
def test_predicate_mask_matches_bruteforce(vals, spec):
    t = pa.table({"c": pa.array(vals, type=pa.int64())})
    got = predicate_mask(t, {"c": spec}).to_pylist()
    exp = [_row_matches(v, spec) for v in vals]
    assert got == exp


_fvals = st.lists(st.one_of(st.none(),
                            st.floats(allow_nan=True, allow_infinity=True,
                                      width=64)),
                  min_size=1, max_size=30)
_fbound = st.one_of(st.none(), st.floats(allow_nan=False,
                                         allow_infinity=True, width=64))
_fpred = st.one_of(
    st.tuples(_fbound, _fbound),
    st.builds(lambda v: {"in": v},
              st.lists(st.floats(allow_nan=False, width=64), max_size=4)))


def _zone_table_typed(pages, typ, with_bloom=False):
    # stats computed by the PRODUCT's builder helper — the sweep must
    # exercise the same NaN handling the real sidecars carry
    from raystack.zones import _page_min_max
    rows = {"page_idx": [], "nrows": [], "nnull": []}
    mins, maxs, blooms = [], [], []
    for i, vals in enumerate(pages):
        arr = pa.array(vals, type=typ)
        zlo, zhi = _page_min_max(arr)
        rows["page_idx"].append(i)
        rows["nrows"].append(len(vals))
        rows["nnull"].append(arr.null_count)
        mins.append(zlo)
        maxs.append(zhi)
        blooms.append(_page_bloom(arr))
    t = pa.table({**{k: pa.array(v) for k, v in rows.items()},
                  "zmin": pa.array(mins, type=typ),
                  "zmax": pa.array(maxs, type=typ)})
    if with_bloom:
        t = t.append_column("bloom", pa.array(blooms, type=pa.binary()))
    return t


def _row_matches_f(v, spec) -> bool:
    # NaN data values never match any predicate (comparisons are False,
    # SQL IN is equality-based) — the page proofs must stay conservative
    if v is None:
        return False if isinstance(spec, dict) else (
            spec[0] is None and spec[1] is None)
    if isinstance(spec, dict):
        return any(v == x for x in spec["in"])
    lo, hi = spec
    return (lo is None or v >= lo) and (hi is None or v <= hi)


@settings(max_examples=120, deadline=None)
@given(st.lists(_fvals, min_size=1, max_size=5), _fpred)
def test_float_page_proofs_never_lie(pages, spec):
    # float pages may carry NaN values; min/max stats then hold NaN,
    # whose comparisons are all False — every proof must degrade to
    # "boundary" (decode), never to a wrong disjoint/contained verdict
    z = _zone_table_typed(pages, pa.float64())
    disjoint, contained = _page_classify(z, spec)
    t_all = [pa.table({"c": pa.array(vals, type=pa.float64())})
             for vals in pages]
    for i, vals in enumerate(pages):
        matches = [_row_matches_f(v, spec) for v in vals]
        mask = predicate_mask(t_all[i], {"c": spec}).to_pylist()
        assert mask == matches, (vals, spec, "mask vs brute force")
        if disjoint[i]:
            assert not any(matches), (vals, spec, "disjoint page matched")
        if contained[i] and not disjoint[i]:
            assert all(matches), (vals, spec, "contained page missed")


_svals = st.lists(st.one_of(st.none(), st.text(max_size=6)),
                  min_size=1, max_size=20)
_spred = st.one_of(
    st.tuples(st.one_of(st.none(), st.text(max_size=6)),
              st.one_of(st.none(), st.text(max_size=6))),
    st.builds(lambda v: {"in": v}, st.lists(st.text(max_size=6),
                                            max_size=4)))


@settings(max_examples=120, deadline=None)
@given(st.lists(_svals, min_size=1, max_size=5), _spred, st.booleans())
def test_string_page_proofs_never_lie(pages, spec, with_bloom):
    z = _zone_table_typed(pages, pa.string(), with_bloom=with_bloom)
    disjoint, contained = _page_classify(z, spec)
    for i, vals in enumerate(pages):
        matches = [_row_matches(v, spec) for v in vals]
        if disjoint[i]:
            assert not any(matches), (vals, spec, "disjoint page matched")
        if contained[i] and not disjoint[i]:
            assert all(matches), (vals, spec, "contained page missed")


def test_nan_membership_value_rejected():
    import pytest as _pytest

    from raystack.zones import _pred
    with _pytest.raises(ValueError, match="NaN"):
        _pred({"in": [1.0, float("nan")]})
