"""Property sweep: tumbling and hopping window aggregates vs a
pure-Python oracle — events exactly on window boundaries, single-event
windows, keys with gaps, window/hop combinations where one event lands
in several hopping windows."""

import datetime as dt

import pyarrow as pa
import ray
from hypothesis import given, settings, strategies as st

_events = st.lists(st.tuples(st.integers(min_value=0, max_value=1),
                             st.integers(min_value=0, max_value=40),
                             st.integers(min_value=-5, max_value=5)),
                   min_size=1, max_size=16)


def _table(events):
    base = dt.datetime(2024, 1, 1)
    return pa.table({
        "ts": pa.array([base + dt.timedelta(seconds=s)
                        for _, s, _ in events], pa.timestamp("us")),
        "user_id": pa.array([k for k, _, _ in events], pa.int64()),
        "value": pa.array([float(v) for _, _, v in events], pa.float64()),
    })


_EPOCH_BASE = int(dt.datetime(2024, 1, 1,
                               tzinfo=dt.timezone.utc).timestamp())


@settings(max_examples=20, deadline=None)
@given(_events, st.integers(min_value=1, max_value=7))
def test_tumbling_matches_oracle(ray_session, events, win):
    # windows are UNIX-EPOCH-aligned ((epoch // win) * win — the same
    # rule the SQL mirrors use), NOT aligned to the data's first event
    from raystack.ops.window import tumbling_window_agg
    got = tumbling_window_agg(ray.data.from_arrow(_table(events)),
                              "ts", "user_id", win).to_pandas()
    oracle = {}
    for k, s, _ in events:
        es = _EPOCH_BASE + s
        w = (es // win) * win
        e = oracle.setdefault((k, w), [0, None, None])
        e[0] += 1
        e[1] = es if e[1] is None else min(e[1], es)
        e[2] = es if e[2] is None else max(e[2], es)
    assert len(got) == len(oracle), (events, win)
    for _, row in got.iterrows():
        w = int(row["window_start"].timestamp())
        n, lo, hi = oracle[(row["user_id"], w)]
        assert row["n_events"] == n, (events, win)
        assert int(row["min_ts"].timestamp()) == lo
        assert int(row["max_ts"].timestamp()) == hi


@settings(max_examples=15, deadline=None)
@given(_events, st.integers(min_value=1, max_value=3),
       st.integers(min_value=1, max_value=3))
def test_hopping_matches_oracle(ray_session, events, hop, mult):
    # window = hop * mult: every event belongs to exactly `mult` windows
    from raystack.ops.window import hopping_window_agg
    win = hop * mult
    got = hopping_window_agg(ray.data.from_arrow(_table(events)),
                             "ts", "user_id", win, hop).to_pandas()
    oracle = {}
    for k, s, _ in events:
        es = _EPOCH_BASE + s
        last = (es // hop) * hop  # latest window start containing es
        for j in range(mult):
            w = last - j * hop
            if w + win > es >= w:
                oracle[(k, w)] = oracle.get((k, w), 0) + 1
    assert len(got) == len(oracle), (events, hop, mult)
    for _, row in got.iterrows():
        w = int(row["window_start"].timestamp())
        assert row["n_events"] == oracle[(row["user_id"], w)], \
            (events, hop, mult)
