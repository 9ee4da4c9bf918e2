"""Property sweep: char-LM add-alpha smoothing (ops/charlm.py).

counts_to_logprob's documented semantics: add-alpha smoothing toward the
corpus UNIGRAM prior. Pure-numpy kernel, so the sweep is cheap and
exhaustive: every context row must be a proper distribution, unseen
contexts must reproduce the smoothed unigram prior exactly, adding a
count must raise that trigram's logprob and lower its siblings', and
alpha → ∞ must wash every context toward the prior."""

import numpy as np
from hypothesis import given, settings, strategies as st

from raystack.ops.charlm import _A, counts_to_logprob

_N = _A * _A * _A


def _counts_from(entries):
    c = np.zeros(_N, np.int64)
    for idx, n in entries:
        c[idx % _N] += n
    return c


_entries = st.lists(
    st.tuples(st.integers(min_value=0, max_value=_N - 1),
              st.integers(min_value=1, max_value=1000)),
    min_size=0, max_size=40)


@settings(max_examples=60, deadline=None)
@given(_entries, st.floats(min_value=1e-3, max_value=10.0))
def test_rows_are_proper_distributions(entries, alpha):
    lp = counts_to_logprob(_counts_from(entries), alpha).reshape(
        _A * _A, _A).astype(np.float64)
    sums = np.exp(lp).sum(axis=1)
    assert np.allclose(sums, 1.0, atol=1e-4)


@settings(max_examples=40, deadline=None)
@given(_entries, st.floats(min_value=1e-3, max_value=10.0))
def test_unseen_context_equals_unigram_prior(entries, alpha):
    counts = _counts_from(entries)
    lp = counts_to_logprob(counts, alpha).reshape(_A * _A, _A)
    ctx = counts.reshape(_A * _A, _A)
    uni = ctx.sum(axis=0).astype(np.float64)
    p_uni = (uni + 1.0) / (uni.sum() + _A)
    empty = ctx.sum(axis=1) == 0
    assert empty.any()  # 40 entries can't fill 841 contexts
    got = np.exp(lp[empty].astype(np.float64))
    assert np.allclose(got, p_uni[None, :], rtol=1e-4)


@settings(max_examples=40, deadline=None)
@given(_entries,
       st.integers(min_value=0, max_value=_N - 1),
       st.floats(min_value=1e-2, max_value=1.0))
def test_adding_a_count_is_monotone(entries, idx, alpha):
    base = _counts_from(entries)
    bumped = base.copy()
    bumped[idx] += 5
    lp0 = counts_to_logprob(base, alpha).astype(np.float64)
    lp1 = counts_to_logprob(bumped, alpha).astype(np.float64)
    row = idx // _A
    sym = idx % _A
    r0 = lp0.reshape(_A * _A, _A)[row]
    r1 = lp1.reshape(_A * _A, _A)[row]
    assert r1[sym] > r0[sym] - 1e-12
    # siblings in the SAME context lose mass (their smoothing target may
    # shift a little through the unigram prior, hence the tolerance)
    others = np.arange(_A) != sym
    assert (r1[others] <= r0[others] + 1e-3).all()


@settings(max_examples=20, deadline=None)
@given(_entries)
def test_huge_alpha_washes_to_prior(entries):
    counts = _counts_from(entries)
    lp = counts_to_logprob(counts, alpha=10**9).reshape(
        _A * _A, _A).astype(np.float64)
    ctx = counts.reshape(_A * _A, _A)
    uni = ctx.sum(axis=0).astype(np.float64)
    p_uni = (uni + 1.0) / (uni.sum() + _A)
    assert np.allclose(np.exp(lp), p_uni[None, :], rtol=1e-3)


def test_seen_beats_unseen_in_same_context():
    counts = np.zeros(_N, np.int64)
    counts[0] = 100  # context (0,0) symbol 0
    lp = counts_to_logprob(counts, alpha=0.1).reshape(_A * _A, _A)
    assert lp[0, 0] > lp[0, 1]
