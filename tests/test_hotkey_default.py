"""Planted hot key: the PLAIN-NAME sessionize/asof_join calls must
survive a key carrying 10^6 events (the round-4 verdict's done
criterion for the default-route change). The default route is the
bucketed shape, so no task ever holds the hot key's full history; the
assertions verify the OUTPUT is exact at that volume, not merely that
the job finishes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from raystack.ops.join import asof_join
from raystack.ops.window import sessionize

HOT_N = 1_000_000
BASE_US = 1_700_000_000_000_000


def _hot_events():
    # hot user 7: 1M events 1s apart; cold users 1..5: 3 events each with
    # a >gap hole between the 2nd and 3rd (so they produce 2 sessions)
    ts_hot = BASE_US + np.arange(HOT_N, dtype=np.int64) * 1_000_000
    users = [7] * HOT_N
    ts = list(ts_hot)
    eids = list(range(HOT_N))
    nxt = HOT_N
    for u in range(1, 6):
        for k, off in enumerate((0, 1_000_000, 3_600_000_000)):
            users.append(u)
            ts.append(BASE_US + off)
            eids.append(nxt)
            nxt += 1
    return pa.table({
        "eid": pa.array(eids, pa.int64()),
        "user": pa.array(users, pa.int64()),
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
    })


def test_default_sessionize_survives_hot_key(ray_session):
    ds = ray.data.from_arrow(_hot_events()).repartition(8)
    # gap 2s, bucket 1h: the hot key spans ~278 buckets that must all
    # merge back into ONE session — the worst case for the merge pass
    out = sessionize(ds, "ts", "user", "eid", gap_sec=2, bucket_sec=3600) \
        .to_pandas()
    assert len(out) == HOT_N + 15
    hot = out[out["user"] == 7]
    assert len(hot) == HOT_N
    assert (hot["session_id"] == 1).all()          # one unbroken session
    cold = out[out["user"] != 7]
    per = cold.groupby("user")["session_id"].max()
    assert (per == 2).all()                        # the planted hole


def test_default_asof_join_survives_hot_key(ray_session):
    t = _hot_events()
    left = ray.data.from_arrow(t).repartition(8)
    # 10 quotes on the hot key, one per ~100k-event stretch
    q_ts = BASE_US + np.arange(10, dtype=np.int64) * 100_000 * 1_000_000
    right = ray.data.from_arrow(pa.table({
        "user": pa.array([7] * 10, pa.int64()),
        "ts": pa.array(q_ts, pa.int64()).cast(pa.timestamp("us")),
        "quote": pa.array(np.arange(10.0)),
    }))
    out = asof_join(left, right, key="user", ts="ts",
                    right_cols=["quote"], bucket_sec=3600).to_pandas()
    assert len(out) == HOT_N + 15
    hot = out[out["user"] == 7].sort_values("eid")
    # oracle: quote i covers events [i*100k, (i+1)*100k)
    want = np.minimum(np.arange(HOT_N) // 100_000, 9).astype(float)
    got = hot["quote"].to_numpy()
    assert np.array_equal(got, want)
    # cold users have no quotes: all nulls
    cold = out[out["user"] != 7]
    assert cold["quote"].isna().all()
