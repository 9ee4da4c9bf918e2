"""In-place re-clustering (:func:`raystack.pipeline.recluster`) and the
standard-Parquet interop export (:func:`raystack.pipeline.export_parquet`).

recluster rewrites every partition with rows reordered by a sort key (or
Z-order list) through the crash-safe commit protocol — same row SET per
partition, zone sidecars rebuilt narrow so range predicates prune, the
pre-cluster state readable via time travel. export_parquet decodes a
layout back into hive-partitioned plain Parquet any engine reads, with
atomic per-partition installs so a crashed export resumes by skipping
finished partitions.
"""

import os

import pandas as pd
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from raystack import manifest as mf
from raystack import pipeline as pl
from raystack import snapshots as sn
from raystack import zones as zn

SRC = "/root/testdata/sf0.001/documents.parquet"


def _decoded(out: str, snapshot=None, columns=None) -> pd.DataFrame:
    df = pl.decode_dir(out, snapshot=snapshot, columns=columns).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True) \
        .reindex(sorted(df.columns), axis=1)


@pytest.fixture()
def layout(ray_session, tmp_path):
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([SRC], out, url_col="source",
                                num_partitions=4, add_filename=False)
    return out


def test_recluster_preserves_content(layout):
    before = _decoded(layout)
    summary = pl.recluster(layout, "n_chars", page_rows=32)
    assert summary["reclustered"] == 4
    assert summary["reclustered_rows"] == len(before)
    pd.testing.assert_frame_equal(_decoded(layout), before)


def test_recluster_narrows_zone_pruning(layout):
    # default encode order is row-arrival (n_chars shuffled across pages):
    # a narrow n_chars range overlaps nearly every page. After clustering
    # by n_chars the same range must prune to a strict subset of pages.
    pl.recluster(layout, "n_chars", page_rows=32)
    lo = int(_decoded(layout)["n_chars"].quantile(0.4))
    hi = int(_decoded(layout)["n_chars"].quantile(0.6))
    plan = zn.zone_prune_plan(layout, {"n_chars": (lo, hi)})
    pages_root = os.path.join(layout, "pages")
    total = kept = 0
    for d in sorted(os.listdir(pages_root)):
        if not d.startswith("part_key="):
            continue
        t = pads.dataset(os.path.join(pages_root, d)).to_table(
            columns=["column", "page_idx"])
        n = len([1 for c in t["column"].to_pylist() if c == "n_chars"])
        total += n
        pruned = plan.get(d)
        kept += n if (d in plan and pruned is None) else \
            (len(pruned) if d in plan else 0)
    assert kept < total  # clustering made the sidecars selective
    # and the pruned filtered decode is exact
    got = zn.decode_dir_where(layout, {"n_chars": (lo, hi)}).to_pandas()
    exp = _decoded(layout)
    exp = exp[(exp["n_chars"] >= lo) & (exp["n_chars"] <= hi)]
    got = got.sort_values("doc_id").reset_index(drop=True) \
        .reindex(sorted(got.columns), axis=1)
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True))


def test_recluster_zorder_list_and_config(layout):
    before = _decoded(layout)
    pl.recluster(layout, ["n_chars", "doc_id"], page_rows=32)
    pd.testing.assert_frame_equal(_decoded(layout), before)
    cfg = mf.load_config(layout)
    assert cfg["sort_by"] == ["n_chars", "doc_id"]


def test_recluster_snapshot_and_time_travel(layout):
    before = _decoded(layout)
    pl.recluster(layout, "n_chars")
    snaps = sn.list_snapshots(layout)
    assert [s["op"] for s in snaps] == ["encode", "recluster"]
    # pre-cluster snapshot still decodes bit-identically
    pd.testing.assert_frame_equal(_decoded(layout, snapshot=1), before)


def test_recluster_unknown_column_raises(layout):
    with pytest.raises(ValueError, match="not in layout"):
        pl.recluster(layout, "nope")


def test_export_roundtrip_and_columns(layout, tmp_path):
    dest = str(tmp_path / "plain")
    summary = pl.export_parquet(layout, dest)
    exp = _decoded(layout)
    assert summary["partitions"] == 4 and summary["skipped"] == 0
    assert summary["rows"] == len(exp)
    got = pads.dataset(dest, partitioning="hive").to_table() \
        .to_pandas().drop(columns=["part_key"])
    got = got.sort_values("doc_id").reset_index(drop=True) \
        .reindex(sorted(got.columns), axis=1)
    pd.testing.assert_frame_equal(got, exp)
    # projected export carries only the asked columns
    dest2 = str(tmp_path / "plain2")
    pl.export_parquet(layout, dest2, columns=["doc_id", "lang"])
    one = next(os.path.join(r, f) for r, _, fs in os.walk(dest2)
               for f in fs if f.endswith(".parquet"))
    assert pq.read_schema(one).names == ["doc_id", "lang"]


def test_export_resume_skips_finished(layout, tmp_path):
    dest = str(tmp_path / "plain")
    pl.export_parquet(layout, dest)
    exp = _decoded(layout)
    # simulate a crashed export: one partition's file vanished
    victim = os.path.join(dest, "part_key=2", "data.parquet")
    os.remove(victim)
    summary = pl.export_parquet(layout, dest, resume=True)
    assert summary["partitions"] == 1 and summary["skipped"] == 3
    assert os.path.exists(victim)
    got = pads.dataset(dest, partitioning="hive").to_table() \
        .to_pandas().drop(columns=["part_key"])
    got = got.sort_values("doc_id").reset_index(drop=True) \
        .reindex(sorted(got.columns), axis=1)
    pd.testing.assert_frame_equal(got, exp)


def test_export_snapshot_state(layout, tmp_path):
    before = _decoded(layout)
    med = float(before["n_chars"].median())
    pl.delete_rows(layout,
                   predicate=lambda t: pc.greater(t["n_chars"], med),
                   predicate_columns=["n_chars"])
    dest = str(tmp_path / "hist")
    pl.export_parquet(layout, dest, snapshot=1)
    got = pads.dataset(dest, partitioning="hive").to_table() \
        .to_pandas().drop(columns=["part_key"])
    got = got.sort_values("doc_id").reset_index(drop=True) \
        .reindex(sorted(got.columns), axis=1)
    pd.testing.assert_frame_equal(got, before)


def test_export_where_filtered_subset(layout, tmp_path):
    """where= exports exactly the decode_dir_where subset: zone pruning
    included (a pruned-away partition writes nothing), predicate columns
    decode for the filter but don't leak into a projected export."""
    from raystack.zones import build_zone_maps, decode_dir_where
    build_zone_maps(layout, ["n_chars"])
    full = _decoded(layout)
    lo = int(full["n_chars"].quantile(0.3))
    pred = {"n_chars": (lo, None), "lang": {"in": ["en", "de"]}}
    dest = str(tmp_path / "slice")
    s = pl.export_parquet(layout, dest, where=pred)
    exp = decode_dir_where(layout, pred).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    got = pads.dataset(dest, partitioning="hive").to_table() \
        .to_pandas().drop(columns=["part_key"]) \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.reindex(sorted(got.columns), axis=1).equals(
        exp.reindex(sorted(exp.columns), axis=1))
    assert s["rows"] == len(exp) > 0

    # projection: predicate columns decode but don't export
    dest2 = str(tmp_path / "slice2")
    pl.export_parquet(layout, dest2, columns=["doc_id"], where=pred)
    one = next(os.path.join(r, f) for r, _, fs in os.walk(dest2)
               for f in fs if f.endswith(".parquet"))
    assert pq.read_schema(one).names == ["doc_id"]
    got2 = pads.dataset(dest2, partitioning="hive").to_table().to_pandas()
    assert sorted(got2["doc_id"]) == sorted(exp["doc_id"])

    # where composes with neither snapshot
    with pytest.raises(ValueError, match="live zone sidecars"):
        pl.export_parquet(layout, dest, where=pred, snapshot=1)


def test_export_where_zero_row_partition_schema_consistent(layout,
                                                           tmp_path):
    """A partition whose decode yields ZERO matching rows must still
    export the projected schema — NOT the predicate columns — so dest
    reads as one hive dataset without a schema-merge failure."""
    full = _decoded(layout)
    # predicate satisfiable only in some partitions: pick a single
    # doc_id, so 3 of 4 partitions (and often some non-pruned pages)
    # filter down to zero rows
    target = int(full["doc_id"].iloc[0])
    pred = {"doc_id": (target, target)}
    dest = str(tmp_path / "zslice")
    pl.export_parquet(layout, dest, columns=["lang"], where=pred)
    files = [os.path.join(r, f) for r, _, fs in os.walk(dest)
             for f in fs if f.endswith(".parquet")]
    assert files
    schemas = {tuple(pq.read_schema(f).names) for f in files}
    assert schemas == {("lang",)}, schemas
    # the union still reads as ONE hive dataset with exactly 1 row
    got = pads.dataset(dest, partitioning="hive").to_table()
    assert got.num_rows == 1


def test_mutation_lock_contention_raises_without_deleting(tmp_path):
    """If every acquisition pass finds a LIVE lock appearing anew, the
    lock manager raises instead of proceeding unlocked — and never
    deletes a lock it did not create."""
    import json as _json

    out = str(tmp_path / "lay")
    lock_dir = os.path.join(out, "_manifest")
    os.makedirs(lock_dir)
    path = os.path.join(lock_dir, ".mutation.lock")

    # stale lock (dead pid on this host) self-heals and acquires
    with open(path, "w") as fh:
        _json.dump({"pid": 2 ** 30, "op": "x",
                    "host": __import__("socket").gethostname()}, fh)
    with pl._mutation_lock(out, "test"):
        assert os.path.exists(path)
    assert not os.path.exists(path)

    # live lock (this very process) blocks loudly, file untouched
    with open(path, "w") as fh:
        _json.dump({"pid": os.getpid(), "op": "other",
                    "host": __import__("socket").gethostname()}, fh)
    with pytest.raises(RuntimeError, match="being mutated"):
        with pl._mutation_lock(out, "test"):
            pass
    assert os.path.exists(path)
    os.remove(path)
