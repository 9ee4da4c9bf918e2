"""Joins and lookups (guide patterns; the reference itself has none —
SURVEY.md §2.4 — these are the training-pipeline additions).

- :func:`broadcast_join` — small side ``ray.put`` once, pandas merge per
  batch inside an actor pool (the dimension-table case; no shuffle).
- :func:`semi_join` / :func:`anti_join` — broadcast the key set, filter
  vectorized inside ``map_batches``.
- Both-sides-large joins: recent Ray ships ``Dataset.join`` (hash
  partitioned); we delegate (:func:`hash_join`) and document the key/skew
  assumptions rather than reimplementing it.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


class _BroadcastJoiner:
    def __init__(self, small_ref, on: str, how: str):
        import ray
        self.small: pd.DataFrame = ray.get(small_ref)
        self.on = on
        self.how = how

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(self.small, on=self.on, how=self.how)


def broadcast_join(ds, small_df: pd.DataFrame, on: str, how: str = "inner",
                   concurrency=(1, 4)):
    """Join a Dataset against a small in-memory table: the small side is put
    in the object store ONCE and read in each actor's ``__init__`` — never
    re-shipped per batch."""
    import ray
    ref = ray.put(small_df)
    return ds.map_batches(_BroadcastJoiner, batch_format="pandas",
                          concurrency=concurrency,
                          fn_constructor_kwargs={"small_ref": ref, "on": on,
                                                 "how": how})


def semi_join(ds, keys, on: str, anti: bool = False):
    """Keep rows whose ``on`` value is (not) in the broadcast key set.
    Null/NaN keys are dropped from the set — a null never equals
    anything (SQL join semantics), so it can't select rows. Float keys
    join by IEEE equality: -0.0 and 0.0 are canonicalized on BOTH sides
    (``is_in`` alone matches bit patterns and would split them)."""
    import ray
    keys = [k + 0.0 if isinstance(k, float) else k
            for k in keys if k is not None and k == k]
    key_arr = pa.array(sorted(set(keys)))
    ref = ray.put(key_arr)

    def fn(t: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        col = t[on]
        if pa.types.is_floating(col.type):
            col = pc.add(col, 0.0)  # -0.0 → +0.0; nulls/NaN unchanged
        mask = pc.is_in(col, value_set=ks)
        if anti:
            mask = pc.invert(mask)
        return t.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def anti_join(ds, keys, on: str):
    return semi_join(ds, keys, on, anti=True)


def _bare_meta(t: pa.Table) -> pa.Table:
    """Drop schema- and field-level metadata (zero-copy). A ``pa.Schema``
    carrying metadata is UNHASHABLE (``hash()`` hits the metadata dict),
    which defeats Ray's hash-shuffle schema-dedup fast path — every
    aggregator actor logs "Failed to hash the schemas" and takes the slow
    unify route. Parquet-sourced blocks routinely carry pandas metadata,
    so every join entry point strips both sides first."""
    schema = t.schema
    if schema.metadata is None and all(f.metadata is None for f in schema):
        return t
    fields = [pa.field(f.name, f.type, f.nullable) for f in schema]
    return pa.table(t.columns, schema=pa.schema(fields))


def strip_schema_metadata(ds):
    """Map-only pass clearing schema/field metadata from every block —
    see :func:`_bare_meta` for why hash-shuffle inputs need it."""
    return ds.map_batches(_bare_meta, batch_format="pyarrow")


def semi_join_ds(ds, keys_ds, on: str, anti: bool = False,
                 num_partitions: int = 16):
    """Distributed (anti-)semi join against a key *Dataset* — the scale
    path when the key set is too large to broadcast (pair with a count
    gate: broadcast via :func:`semi_join` below the limit, shuffle here
    above it). Rides Ray's hash-partitioned ``left_semi``/``left_anti``
    join; output columns are the left side's only. The key side is
    repartitioned first: aggregate outputs can carry schema-less empty
    blocks, which Acero rejects on the build side. Both sides are
    metadata-stripped so the shuffle's schema dedup stays on the fast
    path (:func:`_bare_meta`). Float keys join by IEEE equality: both
    sides join on a canonicalized temp column (-0.0 → +0.0, the join
    engine matches bit patterns) which is dropped from the output, so
    result rows keep their original bytes."""
    left = strip_schema_metadata(ds)
    right = strip_schema_metadata(keys_ds)
    join_on, tmp = on, None
    _sch = left.schema()  # ray.data Schema: parallel .names / .types
    if _sch is None:
        # only an all-empty left resolves no schema (the 0-row quirk) —
        # e.g. the bloom tier's exact join when every row was a bloom
        # miss; the (anti-)semi join of nothing is nothing
        return left
    _t = _sch.types[_sch.names.index(on)]
    if isinstance(_t, pa.DataType) and pa.types.is_floating(_t):
        tmp = f"__{on}_ieee"

        def canon(t: pa.Table) -> pa.Table:
            return t.append_column(tmp, pc.add(t[on], 0.0))

        def canon_keys(t: pa.Table) -> pa.Table:
            # Acero's hash join matches NaN == NaN (bit-pattern); the
            # documented contract is IEEE — NaN never equals anything —
            # which the broadcast and bloom tiers already follow, so a
            # NaN key must not build. Dropping it here keeps all three
            # paths identical at ANY key-set size (the bloom path's
            # exact tier is this join above the broadcast gate).
            keep = pc.invert(pc.coalesce(pc.is_nan(t[on]),
                                         pa.scalar(False)))
            return canon(t.filter(keep))

        left = left.map_batches(canon, batch_format="pyarrow")
        right = right.map_batches(canon_keys, batch_format="pyarrow")
        join_on = tmp
    # a key side with ONLY 0-row blocks (empty keys_ds, or every float
    # key NaN-dropped above) loses its schema in the shuffle and Acero
    # errors on the missing build-side key field — and a schema'd empty
    # block union does NOT survive the hash shuffle. Materialize (the
    # join executes this lineage anyway; this just pins its output) and
    # short-circuit the trivial answer
    right = right.materialize()
    if right.count() == 0:
        out = left if anti else left.limit(0)
    else:
        out = left.join(
            right.repartition(num_partitions),
            join_type="left_anti" if anti else "left_semi",
            on=(join_on,), num_partitions=num_partitions)
    if tmp is not None:
        out = out.map_batches(lambda t: t.drop_columns([tmp]),
                              batch_format="pyarrow")
    return out


#: bloom filters above this size fall back to the plain distributed join
#: (the bitmap must broadcast to every probe task and briefly live on the
#: driver during the build)
_BLOOM_MAX_BYTES = 256 << 20

#: hash assigned to NULL keys (any constant works: a collision with a real
#: key's hash only creates a bloom false positive, which the exact join
#: re-checks — never a false negative)
_NULL_KEY_HASH = 0x9E3779B97F4A7C15


def _key_hashes(arr) -> "np.ndarray":
    """Deterministic uint64 hash of a key column, IDENTICAL for the same
    value regardless of which batch it sits in. The naive route (hash the
    batch's numpy view) breaks exactly there: an int64 batch containing
    one null materializes as float64, so the same key hashes differently
    across batches and a bloom membership test silently inverts. Keys
    are therefore canonicalized per Arrow TYPE first — integers/
    temporals/bools via null-filled int64, floats via null-filled
    float64, everything else via the object path — and null slots get a
    fixed sentinel hash afterwards."""
    import numpy as np

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if (pa.types.is_integer(t) or pa.types.is_temporal(t)
            or pa.types.is_boolean(t)):
        base = np.asarray(pc.fill_null(arr.cast(pa.int64()), 0))
    elif pa.types.is_floating(t):
        # + 0.0 canonicalizes negative zero (IEEE: -0.0 + 0.0 = +0.0):
        # SQL join equality says -0.0 = 0.0, and the hash-join fallback
        # tiers (pandas merge / Ray join) agree — a bit-pattern hash
        # would make the bloom tier disagree with its own fallback
        base = np.asarray(pc.fill_null(arr.cast(pa.float64()), 0.0)) + 0.0
    else:
        base = np.asarray(arr.to_numpy(zero_copy_only=False), dtype=object)
    h = pd.util.hash_array(base, categorize=False)
    if arr.null_count:
        h = h.copy()
        h[~np.asarray(arr.is_valid())] = np.uint64(_NULL_KEY_HASH)
    return h


def build_key_bloom(keys_ds, on: str, bits_per_key: int = 12,
                    n_hashes: int = 6):
    """Bloom filter over a key Dataset's ``on`` column. Returns
    ``(bitmap uint64 array, mask, n_hashes)`` or ``None`` when the sized
    bitmap would exceed ``_BLOOM_MAX_BYTES``. Key hashes are pandas'
    fixed-key siphash (deterministic across workers, any dtype); the j-th
    probe position is ``splitmix64(h ^ seed_j)``. The build STREAMS the
    key column through the driver (`iter_batches`) — bounded memory (the
    bitmap), O(n_keys) driver CPU; at key cardinalities where that loop
    matters the bitmap has outgrown the cap anyway and the caller should
    be on the plain shuffle path."""
    import numpy as np

    from .hashing import splitmix64
    n = keys_ds.count()
    m_bits = 1 << max(10, int(np.ceil(np.log2(max(1, n) * bits_per_key))))
    if m_bits // 8 > _BLOOM_MAX_BYTES:
        return None
    mask = np.uint64(m_bits - 1)
    bloom = np.zeros(m_bits // 64, dtype=np.uint64)
    seeds = splitmix64(np.arange(1, n_hashes + 1, dtype=np.uint64))
    for batch in keys_ds.select_columns([on]) \
            .iter_batches(batch_format="pyarrow"):
        if not batch.num_rows:
            continue
        h = _key_hashes(batch[on])
        for s in seeds:
            idx = splitmix64(h ^ s) & mask
            w = (idx >> np.uint64(6)).astype(np.int64)
            bit = np.uint64(1) << (idx & np.uint64(63))
            order = np.argsort(w, kind="stable")
            w, bit = w[order], bit[order]
            uw, starts = np.unique(w, return_index=True)
            bloom[uw] |= np.bitwise_or.reduceat(bit, starts)
    return bloom, mask, seeds


def _bloom_probe(t: pa.Table, on: str, bloom, mask, seeds):
    """Boolean numpy mask: which rows' keys MIGHT be in the bloom set."""
    import numpy as np

    from .hashing import splitmix64
    h = _key_hashes(t[on])
    hit = np.ones(len(h), dtype=bool)
    for s in seeds:
        idx = splitmix64(h ^ s) & mask
        hit &= (bloom[(idx >> np.uint64(6)).astype(np.int64)]
                >> (idx & np.uint64(63))) & np.uint64(1) > 0
    return hit


def semi_join_bloom(ds, keys_ds, on: str, anti: bool = False,
                    num_partitions: int = 16, bits_per_key: int = 12,
                    n_hashes: int = 6, broadcast_limit: int = 65536):
    """Bloom-accelerated distributed (anti-)semi join — the big-corpus ×
    big-key-set shape (e.g. anti-joining a 100 TB crawl against a
    billion-row drop list). A bloom filter over the key side broadcasts
    once (~``bits_per_key``/8 bytes per key; 12 bits + 6 hashes ≈ 0.1%
    false positives) and every batch probes it locally, so only rows
    that MIGHT match enter the all-to-all exchange of the exact join —
    the shuffle shrinks from the corpus to roughly the match volume.
    Results are EXACT regardless of bloom false positives:

    - semi: a bloom miss proves the key absent → drop locally; bloom
      hits go through the exact distributed semi join.
    - anti: a bloom miss proves the key absent → keep locally (map-only,
      no shuffle for typically >99% of a lightly-contaminated corpus);
      bloom hits go through the exact distributed anti join and the two
      streams union.

    This is the universal (anti-)semi-join entry point — it degrades to
    the cheapest exact plan for the key count: ≤ ``broadcast_limit``
    keys collect to an exact broadcast ``is_in`` filter (no join
    operator at all); above it the bloom pre-filter + exact join; and
    when even the sized bitmap would exceed ``_BLOOM_MAX_BYTES`` it
    falls back to the plain hash join (:func:`semi_join_ds`). The anti
    path's bloom tier scans ``ds`` twice (two map-only passes beat
    shuffling the full corpus once)."""
    import ray

    # one execution of the key pipeline, reused by count, the bloom
    # stream AND the exact join (object-store blocks, spillable)
    keys_ds = keys_ds.materialize()
    n_keys = keys_ds.count()
    if n_keys <= broadcast_limit:
        # 0-row frames lose their columns through to_pandas — empty key
        # set means "drop nothing" (anti) / "keep nothing" (semi)
        keys = keys_ds.select_columns([on]).to_pandas()[on].tolist() \
            if n_keys else []
        return semi_join(ds, keys, on=on, anti=anti)
    built = build_key_bloom(keys_ds, on, bits_per_key, n_hashes)
    if built is None:
        return semi_join_ds(ds, keys_ds, on, anti=anti,
                            num_partitions=num_partitions)
    bloom, mask, seeds = built
    ref = ray.put(bloom)

    def probe(t: pa.Table, keep_hits: bool) -> pa.Table:
        hit = _bloom_probe(t, on, ray.get(ref), mask, seeds)
        # bare schema: the anti path unions this stream with the exact
        # join's (metadata-free) output — mismatched schema metadata
        # would fall off the schema-dedup fast path downstream
        return _bare_meta(t.filter(pa.array(hit if keep_hits else ~hit)))

    cand = ds.map_batches(lambda t: probe(t, True), batch_format="pyarrow")
    exact = semi_join_ds(cand, keys_ds, on, anti=anti,
                         num_partitions=num_partitions)
    if not anti:
        return exact
    sure = ds.map_batches(lambda t: probe(t, False), batch_format="pyarrow")
    return sure.union(exact)


def hash_join(left, right, on, how: str = "inner", num_partitions: int = 32):
    """Both-sides-large join → Ray's hash-partitioned ``Dataset.join``.
    Partitioning assumption: ``on`` hashes evenly; salt hot keys upstream
    (see raystack.pipeline.add_partition_key) if one key dominates."""
    return strip_schema_metadata(left).join(
        strip_schema_metadata(right), join_type=how, on=(on,),
        num_partitions=num_partitions)


def asof_join(left, right, key: str, ts: str,
              right_cols: list[str] | None = None,
              suffix: str = "_r", *, bucket_sec: int = 86400,
              plain: bool = False):
    """As-of join: for each left row, the right row with the same ``key``
    and the greatest ``ts`` ≤ the left row's ``ts`` (DuckDB
    ``ASOF LEFT JOIN`` semantics; unmatched lefts keep nulls). Ties on
    exactly-equal timestamps match (≤), and require (key, ts) unique on
    the right for a deterministic result.

    DEFAULT ROUTE is the hot-key-safe :func:`asof_join_bucketed` (the
    merge groups by (key, time-bucket), so no task ever holds one key's
    full history). Pass ``plain=True`` for the one-``groupby(key)``
    shape as a micro-optimization when every key is KNOWN to fit a task
    (output is identical — equivalence-tested): tag the two sides,
    union, ONE ``groupby(key)`` shuffle, then a vectorized merge inside
    each group (``np.searchsorted`` of left timestamps into the sorted
    right timestamps — no per-row Python)."""
    if not plain:
        return asof_join_bucketed(left, right, key, ts,
                                  right_cols=right_cols, suffix=suffix,
                                  bucket_sec=bucket_sec)
    import numpy as np

    r_schema = right.schema()
    right_cols = right_cols or [c for c in r_schema.names
                                if c not in (key, ts)]
    l_schema = left.schema()
    l_names = list(l_schema.names)
    out_r_names = [c + suffix if c in l_names else c for c in right_cols]
    rts_name = ts + suffix

    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    # unified exchange schema: left cols + right ts + suffixed right cols
    ex_fields = [(n, l_types[n]) for n in l_names]
    ex_fields += [(rts_name, r_types[ts])]
    ex_fields += [(o, r_types[c]) for o, c in zip(out_r_names, right_cols)]
    ex_fields += [("__side", pa.int8())]
    ex_schema = pa.schema(ex_fields)

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = [t[f.name] if f.name in t.schema.names else pa.nulls(n, f.type)
                for f in ex_schema]
        cols[-1] = pa.array([0] * n, pa.int8())
        return pa.table(cols, schema=ex_schema)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        vals = {key: t[key], rts_name: t[ts]}
        for o, c in zip(out_r_names, right_cols):
            vals[o] = t[c]
        cols = [vals.get(f.name, pa.nulls(n, f.type)) for f in ex_schema]
        cols[-1] = pa.array([1] * n, pa.int8())
        return pa.table(cols, schema=ex_schema)

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    def merge(g: pa.Table) -> pa.Table:
        side = np.asarray(g["__side"])
        lt = g.filter(pa.array(side == 0))
        rt = g.filter(pa.array(side == 1))
        lt = lt.select(l_names + [rts_name] + out_r_names)
        if lt.num_rows == 0:
            return lt
        if rt.num_rows == 0:
            return lt
        l_ts = np.asarray(lt[ts]).astype("int64")
        r_ts = np.sort(np.asarray(rt[rts_name]).astype("int64"))
        order = np.argsort(np.asarray(rt[rts_name]).astype("int64"),
                           kind="stable")
        idx = np.searchsorted(r_ts, l_ts, side="right") - 1
        matched = idx >= 0
        take = np.where(matched, order[np.maximum(idx, 0)], 0)
        cols = [lt[n] for n in l_names]
        for o in [rts_name] + out_r_names:
            picked = rt[o].combine_chunks().take(pa.array(take))
            if not matched.all():
                picked = pc.if_else(pa.array(matched), picked,
                                    pa.nulls(len(matched), picked.type))
            cols.append(picked)
        return pa.table(cols, names=l_names + [rts_name] + out_r_names)

    return both.groupby(key).map_groups(merge, batch_format="pyarrow")


def asof_join_bucketed(left, right, key: str, ts: str,
                       right_cols: list[str] | None = None,
                       suffix: str = "_r", bucket_sec: int = 86400):
    """Hot-key-safe :func:`asof_join`: identical output, but no task ever
    holds one key's full history. Three phases:

    1. Tag + union like :func:`asof_join`, with a ``floor(ts/bucket_sec)``
       bucket column; the merge groups by (key, bucket), bounding each
       task to one key's events per bucket.
    2. Per-(key, bucket) SUMMARIES (one row each: left-presence flag +
       that bucket's latest right row) are prefix-scanned per key into
       **carry-in** rows — for every bucket containing left rows, the
       latest right row from any strictly earlier bucket.
    3. Carry-ins are unioned in as extra right rows of their target
       bucket, then the standard vectorized searchsorted merge runs per
       (key, bucket).

    The summary/carry tables hold one row per (key, bucket) — tiny next
    to the data; both heavy stages are keyed by (key, bucket)."""
    import numpy as np

    r_schema = right.schema()
    right_cols = right_cols or [c for c in r_schema.names
                                if c not in (key, ts)]
    l_schema = left.schema()
    l_names = list(l_schema.names)
    out_r_names = [c + suffix if c in l_names else c for c in right_cols]
    rts_name = ts + suffix

    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    ex_fields = [(n, l_types[n]) for n in l_names]
    ex_fields += [(rts_name, r_types[ts])]
    ex_fields += [(o, r_types[c]) for o, c in zip(out_r_names, right_cols)]
    ex_fields += [("__bucket", pa.int64()), ("__side", pa.int8())]
    ex_schema = pa.schema(ex_fields)
    bucket_us = bucket_sec * 1_000_000
    r_payload = [rts_name] + out_r_names

    def _buckets(col) -> pa.Array:
        epoch = np.asarray(col).astype("datetime64[us]").view("int64")
        return pa.array(epoch // bucket_us, pa.int64())

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = [t[f.name] if f.name in t.schema.names else pa.nulls(n, f.type)
                for f in ex_schema]
        cols[-2] = _buckets(t[ts])
        cols[-1] = pa.array([0] * n, pa.int8())
        return pa.table(cols, schema=ex_schema)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        vals = {key: t[key], rts_name: t[ts]}
        for o, c in zip(out_r_names, right_cols):
            vals[o] = t[c]
        cols = [vals.get(f.name, pa.nulls(n, f.type)) for f in ex_schema]
        cols[-2] = _buckets(t[ts])
        cols[-1] = pa.array([1] * n, pa.int8())
        return pa.table(cols, schema=ex_schema)

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")).materialize()

    sum_fields = [(key, l_types[key]), ("__bucket", pa.int64()),
                  ("__has_left", pa.bool_())]
    sum_fields += [(c, dict(ex_fields)[c]) for c in r_payload]
    sum_schema = pa.schema(sum_fields)

    def summarize(g: pa.Table) -> pa.Table:
        side = np.asarray(g["__side"])
        cols = {key: g[key].combine_chunks().slice(0, 1),
                "__bucket": g["__bucket"].combine_chunks().slice(0, 1),
                "__has_left": pa.array([bool((side == 0).any())])}
        rt = g.filter(pa.array(side == 1))
        if rt.num_rows:
            i = int(np.argmax(np.asarray(rt[rts_name]).astype("int64")))
            for c in r_payload:
                cols[c] = rt[c].combine_chunks().slice(i, 1)
        else:
            for c in r_payload:
                cols[c] = pa.nulls(1, sum_schema.field(c).type)
        return pa.table(cols, schema=sum_schema)

    summaries = both.groupby([key, "__bucket"]).map_groups(
        summarize, batch_format="pyarrow")

    def carry_fn(g: pa.Table) -> pa.Table:
        order = np.argsort(np.asarray(g["__bucket"]), kind="stable")
        g = g.take(pa.array(order))
        has_left = np.asarray(g["__has_left"])
        has_right = np.asarray(
            pc.is_valid(g[rts_name].combine_chunks()))
        tgt, src = [], []
        carry = -1
        for i in range(g.num_rows):  # a handful of buckets per key
            if has_left[i] and carry >= 0:
                tgt.append(i)
                src.append(carry)
            if has_right[i]:
                carry = i
        n = len(tgt)
        taken = g.take(pa.array(src)) if n else g.slice(0, 0)
        cols = []
        for f in ex_schema:
            if f.name == key:
                cols.append(taken[key].combine_chunks())
            elif f.name == "__bucket":
                cols.append(g["__bucket"].combine_chunks()
                            .take(pa.array(tgt, pa.int64())))
            elif f.name in r_payload:
                cols.append(taken[f.name].combine_chunks())
            elif f.name == "__side":
                cols.append(pa.array([1] * n, pa.int8()))
            else:
                cols.append(pa.nulls(n, f.type))
        return pa.table(cols, schema=ex_schema)

    carry_ins = summaries.groupby(key).map_groups(
        carry_fn, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        side = np.asarray(g["__side"])
        lt = g.filter(pa.array(side == 0))
        rt = g.filter(pa.array(side == 1))
        lt = lt.select(l_names + [rts_name] + out_r_names)
        if lt.num_rows == 0 or rt.num_rows == 0:
            return lt
        l_ts = np.asarray(lt[ts]).astype("int64")
        r_raw = np.asarray(rt[rts_name]).astype("int64")
        order = np.argsort(r_raw, kind="stable")
        r_ts = r_raw[order]
        idx = np.searchsorted(r_ts, l_ts, side="right") - 1
        matched = idx >= 0
        take = np.where(matched, order[np.maximum(idx, 0)], 0)
        cols = [lt[n] for n in l_names]
        for o in [rts_name] + out_r_names:
            picked = rt[o].combine_chunks().take(pa.array(take))
            if not matched.all():
                picked = pc.if_else(pa.array(matched), picked,
                                    pa.nulls(len(matched), picked.type))
            cols.append(picked)
        return pa.table(cols, names=l_names + [rts_name] + out_r_names)

    return both.union(carry_ins).groupby([key, "__bucket"]).map_groups(
        merge, batch_format="pyarrow")


def range_join(ds, ranges, value_col: str,
               lo_col: str = "lo", hi_col: str = "hi",
               range_cols: list[str] | None = None, how: str = "inner"):
    """Range (interval) join: attach to each row the range whose
    ``[lo, hi)`` interval contains ``value_col``. ``ranges`` is a small
    in-memory pyarrow Table / pandas DataFrame of NON-OVERLAPPING sorted
    intervals (the dimension-table case: time buckets, value bands, IP
    blocks) — broadcast once via ``ray.put``, matched per batch with one
    ``np.searchsorted``; no shuffle. ``how='left'`` keeps unmatched rows
    with nulls. For large/overlapping range sets, pre-bucket both sides
    on a common grid and use :func:`hash_join` instead (documented scale
    path)."""
    import numpy as np
    import ray

    if hasattr(ranges, "to_pandas"):
        ranges = ranges.to_pandas()
    ranges = ranges.sort_values(lo_col).reset_index(drop=True)
    lo = ranges[lo_col].to_numpy()
    hi = ranges[hi_col].to_numpy()
    if (lo[1:] < hi[:-1]).any():
        raise ValueError("range_join requires non-overlapping intervals")
    range_cols = range_cols or [c for c in ranges.columns
                                if c not in (lo_col, hi_col)]
    ref = ray.put((lo, hi, ranges[[lo_col, hi_col] + range_cols]))

    def fn(t: pa.Table) -> pa.Table:
        lo_a, hi_a, rdf = ray.get(ref)
        v = np.asarray(t[value_col])
        if len(lo_a) == 0:
            # no intervals: inner keeps nothing, left keeps all rows with
            # null-filled range columns (indexing an empty hi_a would raise)
            cols = {n: t[n] for n in t.schema.names}
            rtypes = pa.Schema.from_pandas(rdf)
            for c in [lo_col, hi_col] + list(range_cols):
                cols[c if c not in cols else c + "_r"] = \
                    pa.nulls(t.num_rows, rtypes.field(c).type)
            out = pa.table(cols)
            return out.slice(0, 0) if how == "inner" else out
        idx = np.searchsorted(lo_a, v, side="right") - 1
        ok = (idx >= 0) & (v < hi_a[np.maximum(idx, 0)])
        cols = {n: t[n] for n in t.schema.names}
        take = np.where(ok, idx, 0)
        for c in [lo_col, hi_col] + list(range_cols):
            picked = pa.array(rdf[c].to_numpy()[take])
            if not ok.all():
                picked = pc.if_else(pa.array(ok), picked,
                                    pa.nulls(len(ok), picked.type))
            cols[c if c not in cols else c + "_r"] = picked
        out = pa.table(cols)
        if how == "inner" and not ok.all():
            out = out.filter(pa.array(ok))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")
