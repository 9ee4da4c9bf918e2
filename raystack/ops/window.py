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


def _epoch_us(ser) -> "pd.Series":
    """Pandas datetime series → int64 MICROSECOND epoch regardless of the
    column's native unit. ``astype("int64")`` alone returns the epoch in
    the series' own unit (ns for pandas-written parquet), silently off by
    1000x against the *_us window constants."""
    import pandas as pd
    return pd.Series(ser.to_numpy().astype("datetime64[us]").astype("int64"),
                     index=ser.index)


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
        epoch = _epoch_us(df[ts_col])
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
               gap_sec: int = 1800, *, bucket_sec: int = 86400,
               plain: bool = False):
    """Gap-based session ids per key: events of one key sorted by
    (ts, id); a new session starts when the gap to the previous event
    exceeds ``gap_sec``. Returns (id_col, key_col, session_id starting
    at 1 per key); the oracle is the equivalent SQL window function.

    DEFAULT ROUTE is the hot-key-safe :func:`sessionize_bucketed`
    (single streaming pass, no task ever holds one key's full history —
    a bot key with 10^9 events would pin a task otherwise). Pass
    ``plain=True`` for the one-``groupby(key).map_groups`` shape as a
    micro-optimization when every key is KNOWN to fit a task (output is
    identical — equivalence-tested)."""
    if not plain:
        return sessionize_bucketed(ds, ts_col, key_col, id_col,
                                   gap_sec=gap_sec, bucket_sec=bucket_sec)
    gap_us = gap_sec * 1_000_000

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col])
        epoch = _epoch_us(g[ts_col])
        new = (epoch.diff().isna() | (epoch.diff() > gap_us)).astype(np.int64)
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             key_col: g[key_col].to_numpy(),
                             "session_id": new.cumsum().to_numpy()})

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def sessionize_bucketed(ds, ts_col: str, key_col: str, id_col: str,
                        gap_sec: int = 1800, bucket_sec: int = 86400):
    """Hot-key-safe :func:`sessionize`: identical output, but no single
    task ever holds one key's full history (a bot user with 10^9 events
    pins a task in the plain ``groupby(key)`` version).

    Two phases:

    1. ``groupby(key, time_bucket)`` — local sessionization inside each
       (key, ``bucket_sec``) slice; the per-task working set is bounded by
       one key's events per bucket.
    2. Boundary merge on the per-(key, bucket) SUMMARIES only (first/last
       event time + local session count — a few rows per key): consecutive
       non-empty buckets whose boundary gap is ≤ ``gap_sec`` share a
       session, giving each bucket a global session-id base. The bases are
       joined back count-gated (broadcast when provably small, hash join
       otherwise).

    ``bucket_sec`` should be ≳ a few × ``gap_sec`` so most sessions fit
    one bucket and the merge touches few boundaries."""
    import pyarrow as pa

    gap_us = gap_sec * 1_000_000
    bucket_us = bucket_sec * 1_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        epoch = np.asarray(t[ts_col]).astype("datetime64[us]").view("int64")
        return t.append_column("__bucket",
                               pa.array(epoch // bucket_us, pa.int64()))

    def per_key_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col])
        epoch = _epoch_us(g[ts_col])
        new = (epoch.diff().isna()
               | (epoch.diff() > gap_us)).astype(np.int64)
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             key_col: g[key_col].to_numpy(),
                             "__bucket": g["__bucket"].to_numpy(),
                             "__local": new.cumsum().to_numpy(),
                             "__epoch": epoch.to_numpy()})

    local = ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby([key_col, "__bucket"]) \
        .map_groups(per_key_bucket, batch_format="pandas").materialize()

    from ray.data.aggregate import Max, Min
    summaries = local.groupby([key_col, "__bucket"]).aggregate(
        Max("__local", alias_name="n_sessions"),
        Min("__epoch", alias_name="first_ts"),
        Max("__epoch", alias_name="last_ts"))

    def merge_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__bucket")
        first = g["first_ts"].to_numpy()
        last = g["last_ts"].to_numpy()
        n = g["n_sessions"].to_numpy()
        merged = np.zeros(len(g), dtype=bool)
        merged[1:] = (first[1:] - last[:-1]) <= gap_us
        base = np.empty(len(g), dtype=np.int64)
        total = 0
        for i in range(len(g)):  # a handful of buckets per key
            base[i] = total - 1 if merged[i] else total
            total = base[i] + n[i]
        return pd.DataFrame({key_col: g[key_col].to_numpy(),
                             "__bucket": g["__bucket"].to_numpy(),
                             "__base": base})

    adj = summaries.groupby(key_col).map_groups(
        merge_key, batch_format="pandas").materialize()

    from raystack.ops.dedup import _BROADCAST_LIMIT
    if adj.count() <= _BROADCAST_LIMIT:
        import ray
        adf = adj.to_pandas()
        lut = {(k, b): o for k, b, o in zip(adf[key_col], adf["__bucket"],
                                            adf["__base"])}
        ref = ray.put(lut)

        def apply_base(df: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(ref)
            off = np.fromiter(
                (m[(k, b)] for k, b in zip(df[key_col], df["__bucket"])),
                dtype=np.int64, count=len(df))
            return pd.DataFrame({id_col: df[id_col].to_numpy(),
                                 key_col: df[key_col].to_numpy(),
                                 "session_id": df["__local"].to_numpy()
                                 + off})
        return local.map_batches(apply_base, batch_format="pandas")

    joined = local.join(adj.repartition(16), join_type="inner",
                        num_partitions=16, on=(key_col, "__bucket"))
    return joined.map_batches(
        lambda t: pa.table({
            id_col: t[id_col],
            key_col: t[key_col],
            "session_id": pc.add(t["__local"], t["__base"])}),
        batch_format="pyarrow")


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
        epoch = _epoch_us(df[ts_col]).to_numpy()
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
