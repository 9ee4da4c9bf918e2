"""Property sweep: sessionize (plain AND hot-key-safe bucketed variant)
vs a pure-Python oracle of the declared rule — events of a key sorted
by (ts, id), a NEW session when the gap to the previous event strictly
exceeds gap_sec (an exactly-gap_sec gap continues the session).
Adversarial shapes: equal timestamps (tie order by id), gaps exactly at
the threshold, bucket boundaries landing inside sessions."""

import datetime as dt

import pyarrow as pa
import ray
from hypothesis import given, settings, strategies as st

_events = st.lists(st.tuples(st.integers(min_value=0, max_value=1),
                             st.integers(min_value=0, max_value=30)),
                   min_size=1, max_size=16)


def _oracle(events, gap_sec):
    """(key, ts_sec, id) -> {id: session_id} by the declared rule."""
    out = {}
    by_key = {}
    for i, (k, ts) in enumerate(events):
        by_key.setdefault(k, []).append((ts, i))
    for k, rows in by_key.items():
        rows.sort()
        sid, prev = 0, None
        for ts, i in rows:
            if prev is None or ts - prev > gap_sec:
                sid += 1
            out[i] = sid
            prev = ts
    return out


@settings(max_examples=20, deadline=None)
@given(_events, st.integers(min_value=1, max_value=5))
def test_sessionize_plain_and_bucketed_match_oracle(ray_session, events,
                                                    gap_sec):
    from raystack.ops.window import sessionize, sessionize_bucketed
    base = dt.datetime(2024, 1, 1)
    t = pa.table({
        "ts": pa.array([base + dt.timedelta(seconds=ts)
                        for _, ts in events], pa.timestamp("us")),
        "user_id": pa.array([k for k, _ in events], pa.int64()),
        "event_id": pa.array(range(len(events)), pa.int64()),
    })
    want = _oracle(events, gap_sec)
    got = sessionize(ray.data.from_arrow(t), "ts", "user_id",
                     "event_id", gap_sec=gap_sec).to_pandas()
    got_map = dict(zip(got["event_id"], got["session_id"]))
    assert got_map == want, (events, gap_sec, "plain")
    # the hot-key-safe variant with a TINY bucket (4 s) forces session
    # spans across many bucket boundaries — must stay output-identical
    got_b = sessionize_bucketed(ray.data.from_arrow(t), "ts", "user_id",
                                "event_id", gap_sec=gap_sec,
                                bucket_sec=4).to_pandas()
    got_b_map = dict(zip(got_b["event_id"], got_b["session_id"]))
    assert got_b_map == want, (events, gap_sec, "bucketed")
