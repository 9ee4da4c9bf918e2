"""Zone maps: per-page min/max sidecars + pruned exact filtered decode
over the encoded pages layout."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def encoded_dir(ray_session, tmp_path_factory):
    import ray.data

    from raystack import pipeline as pl
    out = str(tmp_path_factory.mktemp("zones") / "enc")
    ds = ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source", "n_chars"])
    pl.encode_partitioned(ds, out, url_col="source", num_partitions=4,
                          page_rows=64)
    return out


def test_zone_build_and_plan_prunes(encoded_dir):
    from raystack.zones import build_zone_maps, zone_prune_plan
    res = build_zone_maps(encoded_dir, ["doc_id", "n_chars"])
    assert len(res) >= 2 and all(r["columns"] == ["doc_id", "n_chars"]
                                 for r in res)
    zroot = os.path.join(encoded_dir, "zones")
    assert all(os.path.exists(os.path.join(zroot, r["dir"], "doc_id.parquet"))
               for r in res)
    # doc_id is monotone within each partition's input order → a tight
    # doc_id range must prune most pages
    total_pages = 0
    import pyarrow.parquet as pq
    for r in res:
        total_pages += pq.read_table(
            os.path.join(zroot, r["dir"], "doc_id.parquet")).num_rows
    plan = zone_prune_plan(encoded_dir, {"doc_id": (10, 20)})
    kept = sum(len(p) if p is not None else 10**6 for p in plan.values())
    assert all(p is not None for p in plan.values())  # uniform layout
    assert kept < total_pages  # pruning actually happened
    # a range beyond the data prunes EVERY partition
    assert zone_prune_plan(encoded_dir, {"doc_id": (10**9, None)}) == {}


def test_decode_where_exact(encoded_dir):
    from raystack import pipeline as pl
    from raystack.zones import build_zone_maps, decode_dir_where
    build_zone_maps(encoded_dir, ["doc_id", "n_chars"])
    full = pl.decode_dir(
        encoded_dir, columns=["doc_id", "lang", "n_chars"]).to_pandas()

    for ranges in ({"doc_id": (10, 20)},
                   {"n_chars": (None, 300)},
                   {"doc_id": (0, 100), "n_chars": (100, None)},
                   {"doc_id": (10**9, None)}):
        got = decode_dir_where(encoded_dir, ranges,
                               columns=["doc_id", "lang", "n_chars"]) \
            .to_pandas()
        exp = full.copy()
        for col, (lo, hi) in ranges.items():
            if lo is not None:
                exp = exp[exp[col] >= lo]
            if hi is not None:
                exp = exp[exp[col] <= hi]
        assert len(got) == len(exp), ranges
        if len(got):
            got = got.sort_values("doc_id").reset_index(drop=True)
            exp = exp.sort_values("doc_id") \
                .reset_index(drop=True)[got.columns]
            assert got.equals(exp), ranges


def test_decode_where_without_zones_still_exact(ray_session, tmp_path):
    # no sidecars built → plan keeps everything (None) and the exact
    # filter alone produces the right answer
    import ray.data

    from raystack import pipeline as pl
    from raystack.zones import decode_dir_where, zone_prune_plan
    out = str(tmp_path / "enc")
    ds = ray.data.read_parquet(
        os.path.join(SF, "events.parquet"),
        columns=["event_id", "user_id", "value"])
    pl.encode_partitioned(ds, out, url_col="user_id", num_partitions=2)
    plan = zone_prune_plan(out, {"value": (0.0, 1.0)})
    assert plan and all(p is None for p in plan.values())
    got = decode_dir_where(out, {"value": (0.0, 1.0)},
                           columns=["event_id", "value"]).to_pandas()
    full = pl.decode_dir(out, columns=["event_id", "value"]).to_pandas()
    exp = full[(full["value"] >= 0.0) & (full["value"] <= 1.0)]
    assert sorted(got["event_id"]) == sorted(exp["event_id"])


def test_string_zone_pruning(encoded_dir):
    # min/max over a string column: lang ranges prune partitions too
    from raystack.zones import build_zone_maps, decode_dir_where
    build_zone_maps(encoded_dir, ["lang"])
    got = decode_dir_where(encoded_dir, {"lang": ("en", "en")},
                           columns=["doc_id", "lang"]).to_pandas()
    assert len(got) and (got["lang"] == "en").all()


def test_encode_time_zone_columns_groupby(ray_session, tmp_path):
    import ray.data

    from raystack import pipeline as pl
    from raystack.zones import decode_dir_where, zone_prune_plan
    out = str(tmp_path / "enc")
    ds = ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"),
        columns=["doc_id", "source", "n_chars"])
    pl.encode_partitioned(ds, out, url_col="source", num_partitions=4,
                          page_rows=64, zone_columns=["doc_id", "n_chars"])
    # sidecars exist without a build pass, and prune
    plan = zone_prune_plan(out, {"doc_id": (5, 15)})
    assert plan and all(p is not None for p in plan.values())
    got = decode_dir_where(out, {"doc_id": (5, 15)},
                           columns=["doc_id", "n_chars"]).to_pandas()
    assert sorted(got["doc_id"]) == list(range(5, 16))


def test_encode_time_zone_columns_tasks(ray_session, tmp_path):
    from raystack import pipeline as pl
    from raystack.zones import decode_dir_where
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks(
        [os.path.join(SF, "documents.parquet")], out, url_col="source",
        num_partitions=4, page_rows=64,
        zone_columns=["doc_id", "n_chars", "text"])
    full = pl.decode_dir(out, columns=["doc_id", "n_chars"]).to_pandas()
    got = decode_dir_where(out, {"n_chars": (None, 200)},
                           columns=["doc_id", "n_chars"]).to_pandas()
    exp = full[full["n_chars"] <= 200]
    assert sorted(got["doc_id"]) == sorted(exp["doc_id"])
    # heavy precoded columns (text is FSST-family) must not break zones:
    # meta says non-uniform OR text skipped — either way results exact
    got2 = decode_dir_where(out, {"doc_id": (0, 9)},
                            columns=["doc_id"]).to_pandas()
    assert sorted(got2["doc_id"]) == list(range(10))


def test_reencode_invalidates_stale_zones(ray_session, tmp_path):
    import ray.data

    from raystack import pipeline as pl
    from raystack.zones import zone_prune_plan
    out = str(tmp_path / "enc")
    ds = ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"),
        columns=["doc_id", "source", "n_chars"])
    pl.encode_partitioned(ds, out, url_col="source", num_partitions=2,
                          page_rows=64, zone_columns=["doc_id"])
    plan = zone_prune_plan(out, {"doc_id": (0, 5)})
    assert any(p is not None for p in plan.values())
    # re-encode WITHOUT zone_columns: sidecars must disappear, not go stale
    pl.encode_partitioned(ds, out, url_col="source", num_partitions=2,
                          page_rows=64)
    plan2 = zone_prune_plan(out, {"doc_id": (0, 5)})
    assert plan2 and all(p is None for p in plan2.values())


def test_count_where_matches_filtered_decode(encoded_dir):
    from raystack.zones import (build_zone_maps, count_where,
                                decode_dir_where)
    build_zone_maps(encoded_dir, ["doc_id", "n_chars"])
    for ranges in ({"doc_id": (10, 20)},
                   {"n_chars": (None, 300)},
                   {"doc_id": (0, 100), "n_chars": (100, None)},
                   {"doc_id": (10**9, None)},
                   {"doc_id": (None, None)}):
        got = count_where(encoded_dir, ranges)
        exp = decode_dir_where(encoded_dir, ranges,
                               columns=["doc_id"]).count()
        assert got == exp, ranges


def test_count_where_without_zones(ray_session, tmp_path):
    import ray.data

    from raystack import pipeline as pl
    from raystack.zones import count_where
    out = str(tmp_path / "enc")
    ds = ray.data.read_parquet(
        os.path.join(SF, "events.parquet"),
        columns=["event_id", "user_id", "value"])
    pl.encode_partitioned(ds, out, url_col="user_id", num_partitions=2)
    full = pl.decode_dir(out, columns=["value"]).to_pandas()
    exp = int(((full["value"] >= 0.0) & (full["value"] <= 1.0)).sum())
    assert count_where(out, {"value": (0.0, 1.0)}) == exp


def test_count_where_null_pages(ray_session, tmp_path):
    # pages containing nulls must never be counted via the metadata
    # shortcut (null rows fail the filter but are included in nrows)
    import ray.data

    from raystack import pipeline as pl
    from raystack.zones import count_where
    out = str(tmp_path / "enc")
    n = 512
    vals = [float(i) if i % 3 else None for i in range(n)]
    t = pa.table({"k": pa.array([f"h{i % 4}" for i in range(n)]),
                  "v": pa.array(vals, pa.float64())})
    pl.encode_partitioned(ray.data.from_arrow(t), out, url_col="k",
                          num_partitions=2, page_rows=64,
                          zone_columns=["v"])
    exp = sum(1 for v in vals if v is not None and v >= 0.0)
    assert count_where(out, {"v": (0.0, None)}) == exp


def test_zone_maps_after_union_drift_append(ray_session, tmp_path):
    # a drifted append makes column page boundaries non-uniform (the
    # back-fill page covers many rows); rebuilt sidecars must degrade to
    # partition-level pruning and filtered decode must stay exact
    import pyarrow.parquet as pq
    import pyarrow.compute as pc
    from raystack import pipeline as pl
    from raystack.zones import build_zone_maps, decode_dir_where

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "source", "n_chars"])
    day1 = str(tmp_path / "day1.parquet")
    day2 = str(tmp_path / "day2.parquet")
    pq.write_table(t.slice(0, 300).drop_columns(["n_chars"]), day1)
    pq.write_table(t.slice(300), day2)
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([day1], out, url_col="source",
                                num_partitions=4, add_filename=False)
    pl.encode_append([day2], out, add_filename=False, schema="union")
    res = build_zone_maps(out, ["doc_id"])
    assert any(not r["uniform"] for r in res)  # drift detected

    lo, hi = 100, 260
    got = decode_dir_where(out, {"doc_id": (lo, hi)}).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = t.to_pandas().query("@lo <= doc_id <= @hi") \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    # null back-fill visible through the pruned decode too: exactly the
    # day-1 rows in range have a null n_chars
    day1_ids = set(t.slice(0, 300)["doc_id"].to_pylist())
    assert set(got.loc[got["n_chars"].isna(), "doc_id"]) == \
        {i for i in want["doc_id"] if i in day1_ids}
    assert sorted(got.columns) == sorted(want.columns)


def test_zone_prune_nonuniform_never_intersects(tmp_path):
    # regression: with MIXED page boundaries the per-column page ids are
    # unrelated — intersecting them can be empty while rows match. The
    # plan must keep the partition (None) unless a SINGLE column's page
    # set is empty (sound under any layout)
    import json
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from raystack.zones import zone_prune_plan

    out = str(tmp_path / "enc")
    pdir = os.path.join(out, "pages", "part_key=0")
    os.makedirs(pdir)
    pq.write_table(pa.table({"page_idx": [0], "column": ["x"],
                             "data": [b""]}), os.path.join(pdir,
                                                           "p.parquet"))
    zdir = os.path.join(out, "zones", "part_key=0")
    os.makedirs(zdir)

    def sidecar(col, idx, lo, hi):
        pq.write_table(pa.table({"page_idx": idx, "zmin": lo, "zmax": hi,
                                 "nrows": [10] * len(idx),
                                 "nulls": [0] * len(idx)}),
                       os.path.join(zdir, f"{col}.parquet"))
    # column a: pages 0..1 (heavy numbering), only page 0 overlaps
    sidecar("a", [0, 1], [0, 100], [50, 150])
    # column b: pages 0..10 (light numbering), only page 7 overlaps
    sidecar("b", list(range(11)), list(range(0, 1100, 100)),
            list(range(99, 1100, 100)))
    with open(os.path.join(zdir, "meta.json"), "w") as f:
        json.dump({"uniform": False, "columns": ["a", "b"]}, f)

    plan = zone_prune_plan(out, {"a": (0, 10), "b": (700, 710)})
    # {0} ∩ {7} is empty but boundaries differ → must NOT prune
    assert plan == {"part_key=0": None}
    # a single column with NO overlapping page prunes soundly
    plan2 = zone_prune_plan(out, {"a": (9999, 10000), "b": (700, 710)})
    assert plan2 == {}
    # uniform layouts still intersect page sets
    with open(os.path.join(zdir, "meta.json"), "w") as f:
        json.dump({"uniform": True, "columns": ["a", "b"]}, f)
    plan3 = zone_prune_plan(out, {"a": (0, 10), "b": (0, 10)})
    assert plan3 == {"part_key=0": [0]}


def test_count_where_unbounded_range_counts_nulls(ray_session, tmp_path):
    # regression: (None, None) is documented as unbounded, and the exact
    # filter keeps null rows — but the all-null-page shortcut dropped
    # them from the metadata count, breaking the identity with
    # decode_dir_where().count()
    import pyarrow as pa
    import ray.data
    from raystack import pipeline as pl
    from raystack.zones import build_zone_maps, count_where, decode_dir_where
    n = 256
    t = pa.table({
        "k": [f"h{i % 4}" for i in range(n)],
        "v": pa.array([None] * n, pa.float64()),     # all-null column
        "w": pa.array([float(i) if i % 2 else None for i in range(n)]),
    })
    out = str(tmp_path / "enc")
    pl.encode_partitioned(ray.data.from_arrow(t), out, url_col="k",
                          num_partitions=2, page_rows=32)
    build_zone_maps(out, ["v", "w"])
    for ranges in ({"v": (None, None)}, {"w": (None, None)},
                   {"v": (None, None), "w": (10.0, None)}):
        got = count_where(out, ranges)
        want = decode_dir_where(out, ranges).count()
        assert got == want, ranges


def test_sorted_encode_tightens_zone_pruning(ray_session, tmp_path):
    # sort_by clusters each partition on the sorted column, so its zone
    # pages cover narrow ranges: a tight range query must prune MORE
    # pages than the shuffled layout, with identical decoded content
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from raystack import pipeline as pl
    from raystack.zones import zone_prune_plan

    rng = np.random.default_rng(7)
    n = 4000
    vals = rng.permutation(n)  # thoroughly shuffled sort key
    t = pa.table({"k": [f"h{i % 8}" for i in range(n)],
                  "v": pa.array(vals, pa.int64()),
                  "txt": [f"row {i}" for i in range(n)]})
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)

    def kept_pages(out):
        plan = zone_prune_plan(out, {"v": (100, 150)})
        return sum(len(p) if p is not None else 10**6
                   for p in plan.values())

    out_plain = str(tmp_path / "plain")
    out_sorted = str(tmp_path / "sorted")
    pl.encode_partitioned_tasks([src], out_plain, url_col="k",
                                num_partitions=2, page_rows=128,
                                add_filename=False, zone_columns=["v"])
    pl.encode_partitioned_tasks([src], out_sorted, url_col="k",
                                num_partitions=2, page_rows=128,
                                add_filename=False, zone_columns=["v"],
                                sort_by="v")
    assert kept_pages(out_sorted) < kept_pages(out_plain)
    # identical relation either way (order within partitions differs)
    a = pl.decode_dir(out_plain).to_pandas().sort_values("v") \
        .reset_index(drop=True)
    b = pl.decode_dir(out_sorted).to_pandas().sort_values("v") \
        .reset_index(drop=True)
    assert a.equals(b)
    # sorted layout answers the range query exactly too
    from raystack.zones import decode_dir_where
    got = decode_dir_where(out_sorted, {"v": (100, 150)}).to_pandas()
    assert sorted(got["v"]) == list(range(100, 151))


def test_sorted_encode_groupby_path(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from raystack import pipeline as pl
    rng = np.random.default_rng(3)
    t = pa.table({"k": [f"h{i % 4}" for i in range(1000)],
                  "v": pa.array(rng.permutation(1000), pa.int64())})
    out = str(tmp_path / "enc")
    pl.encode_partitioned(ray.data.from_arrow(t), out, url_col="k",
                          num_partitions=2, page_rows=64,
                          zone_columns=["v"], sort_by="v")
    # every partition's zone pages are non-overlapping after clustering
    import glob as _glob
    import pyarrow.parquet as pq
    for zf in _glob.glob(os.path.join(out, "zones", "*", "v.parquet")):
        z = pq.read_table(zf).sort_by("page_idx")
        lo = np.asarray(z["zmin"])
        hi = np.asarray(z["zmax"])
        assert (lo[1:] > hi[:-1]).all(), zf
    got = pl.decode_dir(out).to_pandas().sort_values("v")
    assert got["v"].tolist() == list(range(1000))


def test_string_zone_maps_url_range(ray_session, tmp_path):
    # zone sidecars are type-generic (pc.min_max): a url-range count over
    # a url-clustered layout must equal the decode+filter reference and
    # actually match rows
    import os
    from raystack import pipeline as pl
    from raystack.align import read_aligned
    from raystack.gen import write_webtext
    from raystack.zones import build_zone_maps, count_where

    d = str(tmp_path / "src")
    paths = write_webtext(d, n_rows=3000, n_files=2, drift=False)
    out = str(tmp_path / "enc")
    ds = read_aligned(paths, columns_rename={"body": "text"})
    pl.encode_partitioned(ds, out, num_partitions=4, sort_by="url")
    build_zone_maps(out, ["url"])

    full = pl.decode_pages(pl.read_encoded(out)).to_pandas()
    lo, hi = "https://www.site02", "https://www.site05"
    n = count_where(out, {"url": (lo, hi)})
    exp = int(((full.url >= lo) & (full.url <= hi)).sum())
    assert n == exp and n > 0, (n, exp)
    # open-ended bound too
    n2 = count_where(out, {"url": (lo, None)})
    assert n2 == int((full.url >= lo).sum()) and n2 > n


def test_zorder_encode_prunes_both_columns(ray_session, tmp_path):
    """sort_by=[a, b] Z-order clusters the partition so BOTH columns'
    zone pages cover narrow ranges: range queries on either column must
    prune better than the shuffled layout, and at least comparably to
    what a single-column sort gives its own column — while a
    single-column sort leaves the OTHER column's zones as wide as a
    shuffle. Decoded content identical in all layouts."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from raystack import pipeline as pl
    from raystack.zones import decode_dir_where, zone_prune_plan

    rng = np.random.default_rng(11)
    n = 4096
    t = pa.table({"k": [f"h{i % 8}" for i in range(n)],
                  "a": pa.array(rng.permutation(n), pa.int64()),
                  "b": pa.array(rng.permutation(n), pa.int64())})
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)

    def build(out, sort_by):
        pl.encode_partitioned_tasks([src], str(tmp_path / out),
                                    url_col="k", num_partitions=2,
                                    page_rows=128, add_filename=False,
                                    zone_columns=["a", "b"],
                                    sort_by=sort_by)
        return str(tmp_path / out)

    plain = build("plain", None)
    only_a = build("only_a", "a")
    zord = build("zord", ["a", "b"])

    def kept(out, col):
        plan = zone_prune_plan(out, {col: (100, 180)})
        return sum(len(p) if p is not None else 10 ** 6
                   for p in plan.values())

    # z-order prunes BOTH columns well below the shuffled layout
    assert kept(zord, "a") < kept(plain, "a") / 2
    assert kept(zord, "b") < kept(plain, "b") / 2
    # the single-column sort does nothing for the other column
    assert kept(only_a, "b") >= kept(zord, "b")
    # content identical across layouts, range query exact
    base = pl.decode_dir(plain).to_pandas().sort_values("a") \
        .reset_index(drop=True)
    for out in (only_a, zord):
        got = pl.decode_dir(out).to_pandas().sort_values("a") \
            .reset_index(drop=True)
        assert got.equals(base)
    got = decode_dir_where(zord, {"b": (100, 180)}).to_pandas()
    assert sorted(got["b"]) == list(range(100, 181))


def test_sum_where_matches_oracle(encoded_dir):
    """Metadata-pushed SUM: contained pages contribute their sidecar
    zsum without decoding; result equals DuckDB's SUM over the decoded
    relation for int sums, boundary/disjoint/unbounded cases."""
    import duckdb

    from raystack import pipeline as pl
    from raystack.zones import build_zone_maps, sum_where
    build_zone_maps(encoded_dir, ["doc_id", "n_chars"])
    full = pl.decode_dir(encoded_dir,
                         columns=["doc_id", "n_chars"]).to_pandas()
    con = duckdb.connect()
    con.register("t", full)
    for ranges in ({"doc_id": (10, 200)},
                   {"n_chars": (None, 300)},
                   {"doc_id": (0, 10**9), "n_chars": (100, None)},
                   {"doc_id": (10**9, None)},        # empty -> None
                   {"doc_id": (None, None)}):
        conds = " AND ".join(
            f"{c} >= {lo}" for c, (lo, hi) in ranges.items()
            if lo is not None) or "TRUE"
        conds_hi = " AND ".join(
            f"{c} <= {hi}" for c, (lo, hi) in ranges.items()
            if hi is not None) or "TRUE"
        exp = con.execute(
            f"SELECT SUM(n_chars) FROM t WHERE {conds} AND {conds_hi}"
        ).fetchone()[0]
        got = sum_where(encoded_dir, "n_chars", ranges)
        assert got == (int(exp) if exp is not None else None), ranges


def test_sum_where_nulls_and_fallbacks(ray_session, tmp_path):
    """Null values are skipped (SQL SUM), all-null pages contribute
    nothing, float sums are exact vs the decoded reference, and a
    sidecar WITHOUT zsum (pre-upgrade layout) falls back to the pruned
    decode with identical results."""
    import glob

    import pyarrow.parquet as pqt
    import ray.data

    from raystack import pipeline as pl
    from raystack.zones import sum_where
    out = str(tmp_path / "enc")
    n = 768
    vals = [float(i) if (i // 64) % 3 else None for i in range(n)]
    t = pa.table({"k": pa.array([f"h{i % 4}" for i in range(n)]),
                  "ts": pa.array(list(range(n)), pa.int64()),
                  "v": pa.array(vals, pa.float64())})
    pl.encode_partitioned(ray.data.from_arrow(t), out, url_col="k",
                          num_partitions=2, page_rows=64,
                          zone_columns=["ts", "v"], sort_by="ts")
    ref = sum(v for i, v in enumerate(vals)
              if v is not None and 100 <= i <= 500)
    got = sum_where(out, "v", {"ts": (100, 500)})
    assert got == pytest.approx(ref)
    # value-column self-predicate (nulls in the predicate column)
    ref2 = sum(v for v in vals if v is not None and v >= 300.0)
    assert sum_where(out, "v", {"v": (300.0, None)}) == pytest.approx(ref2)
    # strip zsum from every sidecar -> exact via decode fallback
    for zf in glob.glob(os.path.join(out, "zones", "*", "*.parquet")):
        z = pqt.read_table(zf)
        if "zsum" in z.schema.names:
            pqt.write_table(z.drop_columns(["zsum"]), zf)
    assert sum_where(out, "v", {"ts": (100, 500)}) == pytest.approx(ref)


def test_agg_where_matches_oracle(encoded_dir):
    """agg_where pushes SUM/COUNT(col)/MIN/MAX/AVG into the sidecars;
    every field equals DuckDB over the decoded relation."""
    import duckdb

    from raystack import pipeline as pl
    from raystack.zones import agg_where, build_zone_maps
    build_zone_maps(encoded_dir, ["doc_id", "n_chars"])
    full = pl.decode_dir(encoded_dir,
                         columns=["doc_id", "n_chars"]).to_pandas()
    con = duckdb.connect()
    con.register("t", full)
    for ranges in ({"doc_id": (10, 200)},
                   {"n_chars": (None, 300)},
                   {"doc_id": (10**9, None)},
                   {"doc_id": (None, None)}):
        lo_c = " AND ".join(f"{c} >= {lo}" for c, (lo, _) in ranges.items()
                            if lo is not None) or "TRUE"
        hi_c = " AND ".join(f"{c} <= {hi}" for c, (_, hi) in ranges.items()
                            if hi is not None) or "TRUE"
        s, n, mn, mx, av = con.execute(
            "SELECT SUM(n_chars), COUNT(n_chars), MIN(n_chars), "
            f"MAX(n_chars), AVG(n_chars) FROM t WHERE {lo_c} AND {hi_c}"
        ).fetchone()
        got = agg_where(encoded_dir, "n_chars", ranges)
        assert got["count"] == n, ranges
        assert got["sum"] == (int(s) if s is not None else None), ranges
        assert got["min"] == mn and got["max"] == mx, ranges
        if av is None:
            assert got["avg"] is None
        else:
            assert got["avg"] == pytest.approx(av), ranges


def test_scan_unified_entry(encoded_dir):
    """pl.scan routes to the most pruned decode for the request and each
    route equals its underlying call; invalid combinations raise."""
    from raystack import pipeline as pl
    from raystack.zones import build_zone_maps, decode_dir_where
    build_zone_maps(encoded_dir, ["doc_id"])

    full = pl.scan(encoded_dir, columns=["doc_id", "n_chars"]).to_pandas()
    ref = pl.decode_dir(encoded_dir,
                        columns=["doc_id", "n_chars"]).to_pandas()
    assert full.sort_values("doc_id").reset_index(drop=True).equals(
        ref.sort_values("doc_id").reset_index(drop=True))

    w = pl.scan(encoded_dir, where={"doc_id": (10, 30)}).to_pandas()
    wref = decode_dir_where(encoded_dir, {"doc_id": (10, 30)}).to_pandas()
    assert sorted(w["doc_id"]) == sorted(wref["doc_id"])

    srcs = ref  # keys route: look up two sources present in the layout
    some = pl.decode_dir(encoded_dir, columns=["source"]).to_pandas()
    key = some["source"].iloc[0]
    k = pl.scan(encoded_dir, keys=[key]).to_pandas()
    kref = pl.lookup_rows(encoded_dir, [key]).to_pandas()
    assert len(k) == len(kref) > 0

    lim = pl.scan(encoded_dir, where={"doc_id": (0, None)}, limit=7)
    assert lim.count() == 7

    with pytest.raises(ValueError, match="composes with neither"):
        pl.scan(encoded_dir, keys=[key], where={"doc_id": (0, 1)})
    with pytest.raises(ValueError, match="historical"):
        pl.scan(encoded_dir, where={"doc_id": (0, 1)}, snapshot=1)


def test_in_predicate_decode_count_agg_exact(encoded_dir):
    """{'in': [...]} membership predicates: the filtered decode, COUNT
    and aggregate pushdown all equal decode-everything + pandas isin —
    alone, combined with a range on another column, empty-list, and
    absent-value cases. DuckDB mirrors the aggregate."""
    import duckdb

    from raystack import pipeline as pl
    from raystack.zones import (agg_where, build_zone_maps, count_where,
                                decode_dir_where)
    build_zone_maps(encoded_dir, ["doc_id", "n_chars", "lang"])
    full = pl.decode_dir(encoded_dir).to_pandas()
    langs = sorted(full["lang"].dropna().unique())[:2]

    got = decode_dir_where(encoded_dir, {"lang": {"in": langs}}) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = full[full["lang"].isin(langs)] \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.reindex(sorted(got.columns), axis=1).equals(
        exp.reindex(sorted(exp.columns), axis=1))

    assert count_where(encoded_dir, {"lang": {"in": langs}}) == len(exp)
    # membership alongside a range on another column
    combined = {"lang": {"in": langs}, "n_chars": (100, None)}
    exp2 = exp[exp["n_chars"] >= 100]
    assert count_where(encoded_dir, combined) == len(exp2)
    got2 = decode_dir_where(encoded_dir, combined).to_pandas()
    assert sorted(got2["doc_id"]) == sorted(exp2["doc_id"])

    a = agg_where(encoded_dir, "n_chars", {"lang": {"in": langs}})
    langs_sql = ", ".join(f"'{v}'" for v in langs)
    ref = duckdb.sql(
        f"select sum(n_chars), count(n_chars), min(n_chars), "
        f"max(n_chars), avg(n_chars) from "
        f"read_parquet('{SF}/documents.parquet') "
        f"where lang in ({langs_sql})").fetchone()
    assert (a["sum"], a["count"], a["min"], a["max"]) == ref[:4]
    assert abs(a["avg"] - ref[4]) < 1e-9

    # a set literal is membership too
    assert count_where(encoded_dir, {"lang": set(langs)}) == len(exp)
    # empty list / absent value match nothing
    assert count_where(encoded_dir, {"lang": {"in": []}}) == 0
    assert count_where(encoded_dir, {"lang": {"in": ["zz"]}}) == 0
    assert decode_dir_where(encoded_dir, {"lang": {"in": ["zz"]}}) \
        .count() == 0


def test_in_predicate_prunes_after_clustering(ray_session, tmp_path):
    """After clustering on a low-cardinality column, membership pruning
    gets page-exact: most pages are constant so they are answered from
    metadata (contained) or skipped (disjoint); the pruning plan keeps a
    strict subset of pages and results stay exact."""
    from raystack import pipeline as pl
    from raystack.zones import count_where, zone_prune_plan
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks(
        [os.path.join(SF, "documents.parquet")], out, url_col="source",
        num_partitions=2, add_filename=False)
    pl.recluster(out, "lang", page_rows=32)
    full = pl.decode_dir(out).to_pandas()
    one = sorted(full["lang"].dropna().unique())[:1]
    plan = zone_prune_plan(out, {"lang": {"in": one}})
    import pyarrow.dataset as pads
    total = kept = 0
    for d in sorted(os.listdir(os.path.join(out, "pages"))):
        if not d.startswith("part_key="):
            continue
        t = pads.dataset(os.path.join(out, "pages", d)).to_table(
            columns=["column"])
        n = sum(1 for c in t["column"].to_pylist() if c == "lang")
        total += n
        p = plan.get(d)
        kept += n if (d in plan and p is None) else \
            (len(p) if d in plan else 0)
    assert kept < total
    assert count_where(out, {"lang": {"in": one}}) == \
        int(full["lang"].isin(one).sum())


def test_pred_spec_validation(ray_session):
    from raystack.zones import _pred
    assert _pred((1, 5)) == ("range", 1, 5)
    assert _pred([None, 5]) == ("range", None, 5)
    assert _pred({"in": [3, 1, 3]}) == ("in", [3, 1])  # dedup, order kept
    assert _pred({2, 1}) == ("in", [1, 2])
    with pytest.raises(ValueError, match="predicate dict"):
        _pred({"between": (1, 2)})
    with pytest.raises(ValueError, match="predicate must be"):
        _pred(7)


def test_in_predicate_bloom_pruning_high_cardinality(ray_session,
                                                     tmp_path):
    """Membership on an UNSORTED high-cardinality column: min/max spans
    cover everything, but per-page blooms (bloom_columns=) prove absence
    — the pruning plan keeps a strict subset of pages, and the filtered
    decode / count stay exact. Bloomless sidecars keep working (just
    without the extra pruning)."""
    import ray.data

    from raystack import pipeline as pl
    from raystack.zones import (build_zone_maps, count_where,
                                decode_dir_where, zone_prune_plan)
    out = str(tmp_path / "enc")
    ds = ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"),
        columns=["doc_id", "text", "source", "n_chars"])
    pl.encode_partitioned(ds, out, url_col="source", num_partitions=4,
                          page_rows=64)
    build_zone_maps(out, ["text"], bloom_columns=["text"])
    full = pl.decode_dir(out).to_pandas()
    vals = [full["text"].iloc[3], full["text"].iloc[-7]]

    plan = zone_prune_plan(out, {"text": {"in": vals}})
    import pyarrow.dataset as pads
    total = kept = 0
    for d in sorted(os.listdir(os.path.join(out, "pages"))):
        if not d.startswith("part_key="):
            continue
        t = pads.dataset(os.path.join(out, "pages", d)).to_table(
            columns=["column"])
        n = sum(1 for c in t["column"].to_pylist() if c == "text")
        total += n
        p = plan.get(d)
        kept += n if (d in plan and p is None) else \
            (len(p) if d in plan else 0)
    assert kept < total  # blooms pruned pages min/max never could

    got = decode_dir_where(out, {"text": {"in": vals}}).to_pandas()
    exp = full[full["text"].isin(vals)]
    assert sorted(got["doc_id"]) == sorted(exp["doc_id"])
    assert count_where(out, {"text": {"in": vals}}) == len(exp)
    # absent value: bloom prunes every page, exact empty result
    assert count_where(out, {"text": {"in": ["no such document"]}}) == 0


def test_plan_parallel_path_identical(ray_session, tmp_path,
                                      monkeypatch):
    """The Ray-fan-out planning path (layouts above
    PLAN_DRIVER_PARTITIONS) returns the exact same plan as the driver
    loop — forced by dropping the threshold to 0."""
    from raystack import pipeline as pl
    from raystack import zones as zmod
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks(
        [os.path.join(SF, "documents.parquet")], out, url_col="source",
        num_partitions=4, add_filename=False, page_rows=64,
        sort_by="n_chars", zone_columns=["n_chars"])
    preds = [{"n_chars": (100, 300)},
             {"n_chars": {"in": [150, 151, 152]}},
             {"n_chars": (10**9, None)}]
    for pred in preds:
        driver_plan = zmod.zone_prune_plan(out, pred)
        monkeypatch.setattr(zmod, "PLAN_DRIVER_PARTITIONS", 0)
        task_plan = zmod.zone_prune_plan(out, pred)
        monkeypatch.undo()
        assert task_plan == driver_plan, pred


def test_count_where_float_nan_pages_exact(ray_session, tmp_path):
    """NaN-bearing float pages: Arrow min/max stats skip NaN, so a page
    can look fully inside the range while its NaN rows match nothing —
    count_where/agg_where must decode such pages as boundary, never
    trust containment. Regression for the hypothesis-found over-count."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raystack import pipeline as pl
    from raystack.zones import agg_where, count_where
    rng = np.random.default_rng(11)
    vals = rng.uniform(0, 100, 400)
    vals[::7] = np.nan  # NaN sprinkled through every page
    t = pa.table({
        "doc_id": pa.array(np.arange(400, dtype=np.int64)),
        "grp": pa.array((np.arange(400) % 4).astype(np.int64)),
        "x": pa.array(vals, type=pa.float64()),
    })
    src = str(tmp_path / "d.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([src], out, url_col="grp",
                                num_partitions=2, add_filename=False,
                                page_rows=32, zone_columns=["x"])
    df = t.to_pandas()
    exp = int(((df["x"] >= 10) & (df["x"] <= 60)).sum())
    assert count_where(out, {"x": (10, 60)}) == exp
    a = agg_where(out, "x", {"x": (10, 60)})
    sub = df[(df["x"] >= 10) & (df["x"] <= 60)]["x"]
    assert a["count"] == len(sub)
    assert abs(a["sum"] - sub.sum()) < 1e-9


def test_poisoned_sidecar_stats_never_prune(ray_session, tmp_path):
    """Defense against pre-fix sidecars: a page whose stored stats are
    impossible (min > max — the Arrow NaN min_max poisoning shape) must
    be treated as unknown, never pruned or counted from metadata."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raystack import pipeline as pl
    from raystack.zones import count_where, decode_dir_where
    t = pa.table({"doc_id": pa.array(np.arange(100, dtype=np.int64)),
                  "grp": pa.array((np.arange(100) % 2).astype(np.int64)),
                  "x": pa.array(np.arange(100, dtype=np.float64))})
    src = str(tmp_path / "d.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([src], out, url_col="grp",
                                num_partitions=2, add_filename=False,
                                page_rows=16, zone_columns=["x"])
    # poison one partition's x sidecar the way the old bug did
    zf = os.path.join(out, "zones", "part_key=0", "x.parquet")
    z = pq.read_table(zf).to_pydict()
    z["zmin"] = [float("inf")] * len(z["zmin"])
    z["zmax"] = [float("-inf")] * len(z["zmax"])
    pq.write_table(pa.table(z), zf)
    df = t.to_pandas()
    exp = int(((df["x"] >= 10) & (df["x"] <= 30)).sum())
    assert count_where(out, {"x": (10, 30)}) == exp
    got = decode_dir_where(out, {"x": (10, 30)}).to_pandas()
    assert len(got) == exp
