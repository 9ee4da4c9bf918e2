"""Per-column statistics operator (SURVEY.md §2.5 graft addition): exact
row/valid counts and min/max plus a mergeable KMV (k-minimum-values)
distinct-count sketch — partial per batch inside ``map_batches``, merged in
one tiny ``groupby(column)`` reduce. The sketch is the classic
Bar-Yossef et al. KMV estimator: keep the k smallest 64-bit value hashes;
``D ≈ (k-1) / U_(k)`` with U_(k) the k-th smallest hash scaled to [0,1);
partials merge by union + re-truncation, so the shuffle moves at most
k hashes per column per block."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import (flatten_column, row_valid_mask, splitmix64, tail_hash8,
                      window_hashes)

_K = 256
_MAXU = float(2**64)


def _value_hashes(arr: pa.Array) -> np.ndarray:
    """Vectorized 64-bit hash per (valid) value."""
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t) \
            or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        data, starts, lengths = flatten_column(arr)
        h = window_hashes(data)
        valid = row_valid_mask(starts, lengths, len(data), 8)
        hv = np.where(valid, h, np.uint64(0))
        if len(hv):
            x = np.bitwise_xor.reduceat(hv, np.minimum(starts, len(hv) - 1))
            x = x.astype(np.uint64)
            x[np.maximum(lengths - 7, 0) == 0] = np.uint64(0)
        else:
            x = np.zeros(len(starts), dtype=np.uint64)
        # short values (<8 bytes) have no shingle window — fold the actual
        # tail bytes in so they still hash distinctly
        x ^= tail_hash8(data, starts, lengths)
        return splitmix64(x ^ splitmix64(lengths.astype(np.uint64)))
    if pa.types.is_floating(t):
        # drop_null instead of fill_null (no float16 kernel); hashing the
        # valid values only is fine — the caller counts distinct VALUES
        # and nulls are accounted for separately. View width follows the
        # element size (float16 bits live in uint16)
        v = np.asarray(arr.drop_null()) if arr.null_count else \
            np.asarray(arr)
        view = {2: np.uint16, 4: np.uint32,
                8: np.uint64}[v.dtype.itemsize]
        return splitmix64(v.view(view).astype(np.uint64))
    # ints / temporal / bool
    from ..codecs.forbp import _to_int64
    v = _to_int64(pc.fill_null(arr, 0) if arr.null_count else arr)
    return splitmix64(v.view(np.uint64))


def _kmv(hashes: np.ndarray, k: int = _K) -> np.ndarray:
    u = np.unique(hashes)
    return u[:k]


def kmv_estimate(kmv: np.ndarray, k: int = _K) -> int:
    if len(kmv) < k:
        return int(len(kmv))  # exact below k
    return int((k - 1) / (float(kmv[k - 1]) / _MAXU))


def column_stats(ds, columns: list[str] | None = None, k: int = _K,
                 with_distinct: bool = True):
    """One row per column: (column, n_rows, n_valid, min_v, max_v[,
    distinct_est]). min/max carried as strings for a uniform schema."""

    def partial(t: pa.Table) -> pd.DataFrame:
        rows = []
        for name in (columns or t.schema.names):
            arr = t[name]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            n = len(arr)
            nv = n - arr.null_count
            try:
                mm = pc.min_max(arr)
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
                # arrow min_max SKIPS NaN; a float batch whose valid
                # values are all NaN yields the (inf, -inf) sentinel —
                # an impossible min>max that must not reach the merge
                # (same guard as the zone sidecars, see zones.py)
                if (isinstance(mn, float) and isinstance(mx, float)
                        and mn > mx):
                    mn = mx = None
            except Exception:
                mn = mx = None
            # keep NATIVE values through the merge — stringified numbers
            # would compare lexically ("100" < "20")
            row = {"column": name, "n_rows": n, "n_valid": nv,
                   "min_raw": mn, "max_raw": mx}
            if with_distinct:
                valid = arr.drop_null() if arr.null_count else arr
                h = _value_hashes(valid) if len(valid) else \
                    np.zeros(0, dtype=np.uint64)
                row["kmv"] = _kmv(h, k).tolist()
            rows.append(row)
        return pd.DataFrame(rows)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # m == m: an all-null batch's None min/max turns into NaN when
        # pandas types the partial frame's column float64, and NaN
        # poisons min()/max() (sweep-found: [None] + [inf] batches
        # reported min_v="nan")
        mins = [m for m in g["min_raw"] if m is not None and m == m]
        maxs = [m for m in g["max_raw"] if m is not None and m == m]
        out = {"column": g["column"].iloc[0],
               "n_rows": int(g["n_rows"].sum()),
               "n_valid": int(g["n_valid"].sum()),
               "min_v": str(min(mins)) if mins else "",
               "max_v": str(max(maxs)) if maxs else ""}
        if with_distinct:
            allh = np.concatenate([np.asarray(x, dtype=np.uint64)
                                   for x in g["kmv"]]) if len(g) else \
                np.zeros(0, dtype=np.uint64)
            out["distinct_est"] = kmv_estimate(_kmv(allh, k), k)
        return pd.DataFrame([out])

    return partials.groupby("column").map_groups(merge, batch_format="pandas")


def value_quantiles(ds, col: str, quantiles=(0.5, 0.9, 0.99),
                    max_distinct: int = 1_000_000):
    """Exact quantiles (SQL ``quantile_disc`` definition: the smallest
    value whose cumulative count reaches ``ceil(q * n)``) via a
    distributed value histogram: per-batch ``value_counts`` partials →
    one small groupby on the distinct values → cumulative walk on the
    driver. Exact and shuffle-light whenever the column's distinct count
    is bounded (prices, scores, categorical codes — checked against
    ``max_distinct``); for unbounded continuous columns, quantize first
    or sample."""
    import math

    import pandas as pd
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vc = arr.drop_null().value_counts()
        return pa.table({"v": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    hist = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("v").sum("n").to_pandas()   # one row per distinct value
    if len(hist) > max_distinct:
        raise ValueError(f"{col}: {len(hist)} distinct values exceed "
                         f"max_distinct={max_distinct}; quantize or sample")
    if not len(hist):
        # all-null/empty column: the 0-row frame has no columns to sort
        return pd.DataFrame([{"quantile": q, "value": None}
                             for q in quantiles])
    hist = hist.sort_values("v").reset_index(drop=True)
    cum = hist["sum(n)"].cumsum()
    total = int(cum.iloc[-1]) if len(cum) else 0
    rows = []
    for q in quantiles:
        if total == 0:
            rows.append({"quantile": q, "value": None})
            continue
        rank = max(1, math.ceil(q * total))
        idx = int((cum >= rank).idxmax())
        rows.append({"quantile": q, "value": hist["v"].iloc[idx]})
    return pd.DataFrame(rows)


def frequent_items(ds, col: str, k: int = 10,
                   per_batch_cut: int | None = None):
    """Exact heavy hitters: per-batch ``value_counts`` partials → one
    small groupby over distinct values → DISTRIBUTED top-k cut (ties
    broken by value) → k rows to the driver. The shuffle moves one row
    per distinct value per block and the driver never sees more than k
    rows, whatever the column's cardinality.

    ``per_batch_cut`` (m >> k) additionally caps each block's partial at
    its m most frequent values, bounding the SHUFFLE volume too on
    unbounded-cardinality columns — at the cost of exactness on
    adversarially spread tails (a value can only be missed if it is
    outside the top-m of every block it appears in). Default None keeps
    the result exact."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vc = arr.drop_null().value_counts()
        out = pa.table({"value": vc.field("values"),
                        "n": vc.field("counts").cast(pa.int64())})
        if per_batch_cut is not None and out.num_rows > per_batch_cut:
            order = pc.sort_indices(
                out, sort_keys=[("n", "descending"),
                                ("value", "ascending")])
            out = out.take(order[:per_batch_cut])
        return out

    totals = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("value").sum("n") \
        .rename_columns({"sum(n)": "n"}) \
        .sort(["n", "value"], descending=[True, False]) \
        .limit(k).to_pandas()   # ≤ k rows ever reach the driver
    if not len(totals):
        # all-null/empty column: Ray's to_pandas drops a 0-row Dataset's
        # columns — keep the documented (value, n) shape (sweep-found)
        import pandas as pd
        return pd.DataFrame({"value": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    return totals[["value", "n"]].reset_index(drop=True)


def _summarize_weighted(vals: "np.ndarray", wts: "np.ndarray", k: int):
    """Collapse weighted points to ≤k equi-depth order statistics
    (value, weight) — sorted by value, deterministic."""
    import numpy as np
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    total = wts.sum()
    if len(vals) <= k:
        return vals, wts
    # k ranks evenly spaced through the cumulative weight; each summary
    # point is the value AT that rank and carries 1/k of the total weight
    cum = np.cumsum(wts)
    ranks = (np.arange(1, k + 1) * (total / k))
    idx = np.searchsorted(cum, ranks - 1e-9)
    idx = np.minimum(idx, len(vals) - 1)
    return vals[idx], np.full(k, total / k)


def approx_quantiles(ds, col: str, quantiles=(0.5, 0.9, 0.99),
                     k: int = 512, fanin: int = 32):
    """One-pass MERGEABLE approximate quantiles — the 100 TB companion
    to :func:`value_quantiles` (which is exact but needs a bounded
    distinct count). Each batch collapses to ≤``k`` equi-depth order
    statistics (value, weight); summaries tree-reduce through a
    ``fanin``-way repartition level and a final single-task merge, so no
    stage — driver included — ever sees more than ``k × fanin`` rows,
    regardless of corpus size. Rank error is O(1/k) per merge level
    (two levels here → ~``2/k`` of the total weight, ≈0.4% at the
    default k); values returned are always actual column values, and
    the result is deterministic for a fixed block layout.
    Returns a pandas DataFrame (quantile, value)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vals = np.asarray(arr.drop_null())
        if not len(vals):
            return pa.table({"v": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        v, w = _summarize_weighted(vals.astype(np.float64),
                                   np.ones(len(vals)), k)
        return pa.table({"v": pa.array(v), "w": pa.array(w)})

    def remerge(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t
        v, w = _summarize_weighted(np.asarray(t["v"]), np.asarray(t["w"]), k)
        return pa.table({"v": pa.array(v), "w": pa.array(w)})

    summ = ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(fanin).map_batches(remerge, batch_format="pyarrow") \
        .repartition(1).map_batches(remerge, batch_format="pyarrow")
    final = summ.to_pandas()  # ≤ k rows
    rows = []
    if not len(final):
        return pd.DataFrame([{"quantile": q, "value": None}
                             for q in quantiles])
    final = final.sort_values("v").reset_index(drop=True)
    cum = final["w"].cumsum()
    total = float(cum.iloc[-1])
    for q in quantiles:
        idx = int((cum >= q * total - 1e-9).idxmax())
        rows.append({"quantile": q, "value": final["v"].iloc[idx]})
    return pd.DataFrame(rows)
