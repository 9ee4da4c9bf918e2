"""Windowed aggregation over stream-shaped tables (guide pattern: Ray Data
has no event-time windows, so a tumbling window is ``floor(ts/size)`` as a
derived column + partial per-batch pre-aggregation + one small groupby).

The pre-aggregation inside ``map_batches`` means the shuffle moves one row
per (key, window) per *block*, not per event — the aggregation-at-scale
pattern from the Ray guide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window_agg(ds, ts_col: str, key_col: str, window_sec: int,
                        value_col: str | None = None):
    """Per (key, tumbling window): event count + min/max timestamp (+ min/max
    of ``value_col``). Returns columns: ``key_col, window_start, n_events,
    min_ts, max_ts[, min_val, max_val]`` — all exactly SQL-expressible."""
    from ray.data.aggregate import Max, Min, Sum

    win_us = window_sec * 1_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select([c for c in {key_col, ts_col, value_col} if c]
                      ).to_pandas()
        epoch = df[ts_col].astype("int64")
        df["window_start"] = pd.to_datetime(
            (epoch // win_us) * win_us, unit="us")
        gb = df.groupby([key_col, "window_start"], sort=False)
        out = gb.agg(n=(ts_col, "size"), min_ts=(ts_col, "min"),
                     max_ts=(ts_col, "max"))
        if value_col:
            mm = gb.agg(min_val=(value_col, "min"),
                        max_val=(value_col, "max"))
            out = out.join(mm)
        return out.reset_index()

    partials = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum("n", alias_name="n_events"),
            Min("min_ts", alias_name="min_ts"),
            Max("max_ts", alias_name="max_ts")]
    if value_col:
        aggs += [Min("min_val", alias_name="min_val"),
                 Max("max_val", alias_name="max_val")]
    return partials.groupby([key_col, "window_start"]).aggregate(*aggs)


def sessionize(ds, ts_col: str, key_col: str, id_col: str,
               gap_sec: int = 1800):
    """Gap-based session ids per key: events of one key sorted by
    (ts, id); a new session starts when the gap to the previous event
    exceeds ``gap_sec``. One ``groupby(key).map_groups`` — the ordering
    assumption (sort within group) is explicit here; the oracle is the
    equivalent SQL window function. Returns (id_col, key_col, session_id
    starting at 1 per key)."""
    gap_us = gap_sec * 1_000_000

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col])
        epoch = g[ts_col].astype("int64")
        new = (epoch.diff().isna() | (epoch.diff() > gap_us)).astype(np.int64)
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             key_col: g[key_col].to_numpy(),
                             "session_id": new.cumsum().to_numpy()})

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def hopping_window_agg(ds, ts_col: str, key_col: str, window_sec: int,
                       hop_sec: int, value_col: str | None = None):
    """Per (key, hopping window): overlapping windows of ``window_sec``
    starting every ``hop_sec`` (``hop_sec == window_sec`` degenerates to
    the tumbling case). Each event lands in ``window_sec / hop_sec``
    windows; the explode happens inside ``map_batches`` WITH per-batch
    pre-aggregation, so the shuffle still moves one row per (key, window)
    per block — not per (event, window)."""
    from ray.data.aggregate import Max, Min, Sum

    if window_sec % hop_sec:
        raise ValueError("window_sec must be a multiple of hop_sec")
    k = window_sec // hop_sec
    hop_us = hop_sec * 1_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select([c for c in {key_col, ts_col, value_col} if c]
                      ).to_pandas()
        epoch = df[ts_col].astype("int64").to_numpy()
        last_hop = epoch // hop_us  # last window (by start) containing ts
        frames = []
        for i in range(k):
            f = df.copy()
            f["window_start"] = pd.to_datetime((last_hop - i) * hop_us,
                                               unit="us")
            frames.append(f)
        big = pd.concat(frames, ignore_index=True)
        gb = big.groupby([key_col, "window_start"], sort=False)
        out = gb.agg(n=(ts_col, "size"), min_ts=(ts_col, "min"),
                     max_ts=(ts_col, "max"))
        if value_col:
            mm = gb.agg(min_val=(value_col, "min"),
                        max_val=(value_col, "max"))
            out = out.join(mm)
        return out.reset_index()

    partials = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum("n", alias_name="n_events"),
            Min("min_ts", alias_name="min_ts"),
            Max("max_ts", alias_name="max_ts")]
    if value_col:
        aggs += [Min("min_val", alias_name="min_val"),
                 Max("max_val", alias_name="max_val")]
    return partials.groupby([key_col, "window_start"]).aggregate(*aggs)
