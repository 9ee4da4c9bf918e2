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
