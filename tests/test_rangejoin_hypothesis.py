"""Property sweep: range_join vs a brute-force oracle of the declared
rule — value v matches the unique non-overlapping interval with
``lo <= v < hi``. Adversarial shapes: values exactly on lo (match) and
exactly on hi (no match), adjacent intervals sharing an endpoint, gaps,
values outside every interval (inner drops, left nulls)."""

import pyarrow as pa
import ray
from hypothesis import given, settings, strategies as st

_bounds = st.lists(st.integers(min_value=0, max_value=20),
                   min_size=2, max_size=8, unique=True)
_vals = st.lists(st.integers(min_value=-2, max_value=22),
                 min_size=1, max_size=15)


def _intervals(bounds):
    """Non-overlapping [lo, hi) intervals from sorted unique bounds —
    consecutive pairs, so adjacent intervals share endpoints."""
    b = sorted(bounds)
    return [(b[i], b[i + 1], i) for i in range(len(b) - 1)]


@settings(max_examples=25, deadline=None)
@given(_bounds, _vals, st.booleans())
def test_range_join_matches_bruteforce(ray_session, bounds, vals, left):
    from raystack.ops.join import range_join
    iv = _intervals(bounds)
    ranges = pa.table({"lo": pa.array([x[0] for x in iv], pa.int64()),
                       "hi": pa.array([x[1] for x in iv], pa.int64()),
                       "band": pa.array([x[2] for x in iv], pa.int64())})
    ds = ray.data.from_arrow(pa.table(
        {"v": pa.array(vals, pa.int64()),
         "rid": pa.array(range(len(vals)), pa.int64())}))
    got = range_join(ds, ranges, "v", how="left" if left else "inner") \
        .to_pandas()

    def match(v):
        for lo, hi, band in iv:
            if lo <= v < hi:
                return band
        return None

    exp = [(i, v, match(v)) for i, v in enumerate(vals)]
    if not left:
        exp = [e for e in exp if e[2] is not None]
    if not exp:
        assert len(got) == 0, (bounds, vals)
        return
    got = got.sort_values("rid").reset_index(drop=True)
    assert got["rid"].tolist() == [e[0] for e in exp], (bounds, vals)
    got_band = [None if b != b else int(b) for b in got["band"]]
    assert got_band == [e[2] for e in exp], (bounds, vals, left)
