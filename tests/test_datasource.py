"""RaystackDatasource: the first-class ``ray.data`` read adapter must be
row-identical to :func:`raystack.pipeline.scan` for every routing mode —
plain, projected, zone-pruned ``where=``, time-travel ``snapshot=`` — and
must actually push the projection/predicate down (pruned partitions never
become read tasks)."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from raystack import pipeline as pl
from raystack.datasource import RaystackDatasource, read_raystack

SRC = "/root/testdata/sf0.001/documents.parquet"


def _df(ds, sort_cols=("doc_id",)):
    df = ds.to_pandas()
    keep = [c for c in sort_cols if c in df.columns]
    if keep and len(df):
        df = df.sort_values(keep).reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def encoded(ray_session, tmp_path_factory):
    import ray.data
    out = str(tmp_path_factory.mktemp("datasource") / "enc")
    ds = ray.data.read_parquet(
        SRC, columns=["doc_id", "text", "lang", "source", "n_chars"])
    pl.encode_partitioned(ds, out, url_col="source", num_partitions=4,
                          page_rows=64)
    from raystack.zones import build_zone_maps
    build_zone_maps(out, ["doc_id", "n_chars"])
    return out


def test_plain_read_equals_scan(encoded):
    got = _df(read_raystack(encoded))
    exp = _df(pl.scan(encoded))
    pd.testing.assert_frame_equal(got, exp[got.columns])


def test_projection_equals_scan(encoded):
    cols = ["doc_id", "lang"]
    got = _df(read_raystack(encoded, columns=cols))
    exp = _df(pl.scan(encoded, columns=cols))
    assert sorted(got.columns) == sorted(cols)
    pd.testing.assert_frame_equal(got, exp[got.columns])


@pytest.mark.parametrize("where", [
    {"doc_id": (10, 20)},
    {"n_chars": (None, 300)},
    {"doc_id": (0, 100), "n_chars": (100, None)},
    {"lang": {"in": ["en"]}},
    {"doc_id": (10**9, None)},           # fully pruned → empty
])
def test_where_equals_scan(encoded, where):
    cols = ["doc_id", "lang", "n_chars"]
    got = _df(read_raystack(encoded, columns=cols, where=where))
    exp = _df(pl.scan(encoded, columns=cols, where=where))
    assert len(got) == len(exp)
    if len(got):
        pd.testing.assert_frame_equal(got, exp[got.columns])


def test_where_prunes_read_tasks(encoded):
    """Predicate pushdown is real: a selective range must plan fewer
    input files / tasks than the full layout, and an impossible range
    must plan a single empty task."""
    full = RaystackDatasource(encoded).get_read_tasks(0)
    pruned = RaystackDatasource(
        encoded, where={"doc_id": (10**9, None)}).get_read_tasks(0)
    assert len(full) == 4          # one task per partition
    assert len(pruned) == 1        # the empty placeholder
    assert pruned[0].metadata.num_rows == 0
    # a selective range keeps all partitions (hash partitioning spreads
    # doc_id) but whitelists pages — size estimate drops accordingly
    sel = RaystackDatasource(encoded, where={"doc_id": (10, 20)})
    sel_bytes = sum(t.metadata.size_bytes or 0
                    for t in sel.get_read_tasks(0))
    full_bytes = sum(t.metadata.size_bytes or 0 for t in full)
    assert 0 < sel_bytes < full_bytes


def test_metadata_rows_match_manifest(encoded):
    tasks = RaystackDatasource(encoded).get_read_tasks(0)
    total = sum(t.metadata.num_rows for t in tasks)
    assert total == pq.read_metadata(SRC).num_rows
    # every task names its partition directory as an input file
    assert all(t.metadata.input_files for t in tasks)


def test_parallelism_coalesces_not_splits(encoded):
    assert len(RaystackDatasource(encoded).get_read_tasks(2)) == 2
    # hints above the partition count are ignored (cannot split)
    assert len(RaystackDatasource(encoded).get_read_tasks(64)) == 4
    got = _df(read_raystack(encoded, parallelism=2))
    exp = _df(pl.scan(encoded))
    pd.testing.assert_frame_equal(got, exp[got.columns])


def test_estimate_inmemory_size(encoded):
    est = RaystackDatasource(encoded).estimate_inmemory_data_size()
    assert est and est > 0
    pruned = RaystackDatasource(
        encoded, where={"doc_id": (10**9, None)}
    ).estimate_inmemory_data_size()
    assert pruned == 0


def test_snapshot_equals_scan(ray_session, tmp_path):
    t = pq.read_table(SRC, columns=["doc_id", "text", "source", "n_chars"])
    day1, day2 = str(tmp_path / "d1.parquet"), str(tmp_path / "d2.parquet")
    pq.write_table(t.slice(0, 300), day1)
    pq.write_table(t.slice(300), day2)
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([day1], out, url_col="source",
                                num_partitions=4, add_filename=False)
    pl.encode_append([day2], out, add_filename=False)
    for sid in (1, 2):
        got = _df(read_raystack(out, snapshot=sid))
        exp = _df(pl.scan(out, snapshot=sid))
        pd.testing.assert_frame_equal(got, exp[got.columns])
    assert len(_df(read_raystack(out, snapshot=1))) == 300


def test_keys_lookup_equals_scan(encoded):
    """keys= routes to hash(|keys|) partitions only and matches
    scan(keys=) row-for-row."""
    some = pl.scan(encoded, columns=["source", "doc_id"]) \
        .limit(40).to_pandas()
    keys = sorted(set(some["source"].tolist()))[:3]
    got = _df(read_raystack(encoded, keys=keys,
                            columns=["doc_id", "source", "lang"]))
    exp = _df(pl.scan(encoded, keys=keys,
                      columns=["doc_id", "source", "lang"]))
    assert len(got) == len(exp) and len(got) > 0
    pd.testing.assert_frame_equal(got, exp[got.columns])
    assert set(got["source"]) <= set(keys)
    # routing is real: fewer read tasks than partitions when the keys
    # hash to a subset
    tasks = RaystackDatasource(encoded, keys=keys[:1]).get_read_tasks(0)
    assert len(tasks) < 4


def test_invalid_combos_raise(encoded):
    with pytest.raises(ValueError):
        RaystackDatasource(encoded, where={"doc_id": (0, 1)}, snapshot=1)
    with pytest.raises(ValueError):
        RaystackDatasource(encoded, keys=["x"], where={"doc_id": (0, 1)})
    with pytest.raises(ValueError):
        RaystackDatasource(encoded, keys=["x"], snapshot=1)
    with pytest.raises(FileNotFoundError):
        RaystackDatasource("/tmp/definitely-not-a-layout-xyz")


def test_composes_downstream(encoded):
    """The adapter is a genuine Dataset source: groupby/aggregate chain
    off it like read_parquet."""
    ds = read_raystack(encoded, columns=["lang", "n_chars"])
    agg = ds.groupby("lang").sum("n_chars").to_pandas()
    exp = pq.read_table(SRC, columns=["lang", "n_chars"]).to_pandas() \
        .groupby("lang", as_index=False)["n_chars"].sum() \
        .rename(columns={"n_chars": "sum(n_chars)"})
    got = agg.sort_values("lang").reset_index(drop=True)
    exp = exp.sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)
