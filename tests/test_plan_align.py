"""Planner + align-stage tests against the reference's drift classes
(FIXTURES.md F2; oracle = pandas concat, as reference
tests/test_combine_csv.py:103-109)."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from raystack.gen import make_sales_files, write_webtext, make_webtext, extract_text
from raystack.plan import build_plan
from raystack.align import read_aligned


@pytest.fixture(scope="module")
def sales(tmp_path_factory):
    base = tmp_path_factory.mktemp("sales")
    out = {}
    for drift in ["none", "extra", "rename", "reorder"]:
        out[drift] = make_sales_files(str(base / drift), drift=drift)
    return out


def _oracle_concat(paths, join="outer"):
    dfs = [pq.read_table(p).to_pandas() for p in sorted(paths)]
    return pd.concat(dfs, join=join, ignore_index=True)


def test_plan_clean(sales):
    plan = build_plan(sales["none"])
    assert plan.is_all_equal
    assert plan.columns_all == ["date", "sales", "cost", "profit"]
    assert plan.columns_common == plan.columns_all
    assert plan.columns_unique == []
    assert len(plan.schema_groups) == 1


def test_plan_extra_column(sales):
    plan = build_plan(sales["extra"])
    assert not plan.is_all_equal
    assert plan.columns_all == ["date", "sales", "cost", "profit", "profit2"]
    assert plan.columns_common == ["date", "sales", "cost", "profit"]
    assert plan.columns_unique == ["profit2"]
    mar = [p for p in sales["extra"] if "mar" in p][0]
    jan = [p for p in sales["extra"] if "jan" in p][0]
    assert plan.presence[mar]["profit2"] and not plan.presence[jan]["profit2"]


def test_plan_reorder_modal_order(sales):
    # mar has (profit, date, sales, cost); jan/feb majority order wins
    plan = build_plan(sales["reorder"])
    assert plan.columns_all == ["date", "sales", "cost", "profit"]
    assert not plan.is_all_equal


def test_plan_rename_conflict_warns(tmp_path):
    paths = make_sales_files(str(tmp_path), drift="none")
    with pytest.warns(UserWarning):
        plan = build_plan(paths, columns_rename={"sales": "cost"})
    assert plan.rename_by_file[sorted(paths)[0]] == {}


def test_plan_duplicate_select_raises(sales):
    with pytest.raises(ValueError):
        build_plan(sales["none"], columns_select=["date", "date"])


def test_align_union_mode(ray_session, sales):
    ds = read_aligned(sales["extra"], add_filename=False)
    got = ds.to_pandas().sort_values(["date"]).reset_index(drop=True)
    exp = _oracle_concat(sales["extra"], "outer").sort_values(["date"]).reset_index(drop=True)
    exp = exp[got.columns]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_align_common_mode(ray_session, sales):
    ds = read_aligned(sales["extra"], columns_select_common=True, add_filename=False)
    got = ds.to_pandas()
    assert list(got.columns) == ["date", "sales", "cost", "profit"]
    assert len(got) == 30


def test_align_rename_merges(ray_session, sales):
    ds = read_aligned(sales["rename"], columns_rename={"revenue": "sales"},
                      add_filename=False)
    got = ds.to_pandas()
    assert list(got.columns) == ["date", "sales", "cost", "profit"]
    assert got["sales"].notna().all() and len(got) == 30


def test_align_provenance(ray_session, sales):
    ds = read_aligned(sales["none"], add_filename=True)
    got = ds.to_pandas()
    assert {"filepath", "filename"} <= set(got.columns)
    assert set(got["filename"]) == {"jan.parquet", "feb.parquet", "mar.parquet"}
    assert all(fp.endswith(fn) for fp, fn in zip(got["filepath"], got["filename"]))


def test_align_select_missing_column_nullfloat(ray_session, sales):
    ds = read_aligned(sales["none"], columns_select=["date", "sales", "ghost"],
                      add_filename=False)
    got = ds.to_pandas()
    assert got["ghost"].isna().all()
    assert got["ghost"].dtype == np.float64


def test_align_apply_after_read_hook(ray_session, sales):
    def hook(df):
        df["margin"] = df["profit"] / df["sales"]
        return df
    ds = read_aligned(sales["none"], add_filename=False, apply_after_read=hook)
    got = ds.to_pandas()
    assert (got["margin"] == 0.2).all()


def test_align_webtext_drift_roundtrip(ray_session, tmp_path):
    paths = write_webtext(str(tmp_path / "web"), n_rows=2000, n_files=5, drift=True)
    ds = read_aligned(paths, columns_rename={"body": "text"}, add_filename=False)
    got = ds.to_pandas()
    # union keeps the drifted 'mime' column, null elsewhere
    assert "mime" in got.columns and got["mime"].notna().sum() > 0
    # every row has url+html; text restored from renamed 'body' file
    assert got["url"].notna().all() and got["text"].notna().all()
    assert len(got) == 2000
    # per-row invariant: extracted text == text column, byte-identical
    sample = got.head(200)
    for h, t in zip(sample["html"], sample["text"]):
        assert extract_text(h) == t


def test_webtext_generator_deterministic():
    a = make_webtext(100, seed=7, file_index=1)
    b = make_webtext(100, seed=7, file_index=1)
    assert a.equals(b)
    c = make_webtext(100, seed=8, file_index=1)
    assert not a.equals(c)


def test_type_promotion_across_files(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({"k": pa.array([1, 2], pa.int32()),
                             "v": pa.array([1.5, 2.5], pa.float32())}),
                   str(tmp_path / "a.parquet"))
    pq.write_table(pa.table({"k": pa.array([3], pa.int64()),
                             "v": pa.array([9.9], pa.float64())}),
                   str(tmp_path / "b.parquet"))
    paths = [str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")]
    plan = build_plan(paths)
    assert plan.unified_schema.field("k").type == pa.int64()
    assert plan.unified_schema.field("v").type == pa.float64()
    got = read_aligned(paths, add_filename=False).to_pandas()
    assert sorted(got["k"]) == [1, 2, 3]


def test_unified_read_matches_grouped(ray_session, tmp_path):
    # the single-read path-routed align (unified_read=True) must produce
    # the same table as the default schema-grouped union layout
    import pyarrow as pa
    import pyarrow.parquet as pq
    from raystack.align import read_aligned
    p1 = str(tmp_path / "a.parquet")
    p2 = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"x": [1, 2], "y": ["u", "v"]}), p1)
    pq.write_table(pa.table({"x": [3, 4], "z": [1.5, 2.5]}), p2)
    kw = dict(add_filename=True)
    a = read_aligned([p1, p2], **kw).to_pandas() \
        .sort_values("x").reset_index(drop=True)
    b = read_aligned([p1, p2], unified_read=True, **kw).to_pandas() \
        .sort_values("x").reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        assert a[c].fillna("∅").tolist() == b[c].fillna("∅").tolist(), c


def test_helpers_extension_validation():
    import pytest
    from raystack.helpers import (check_valid_extensions, check_valid_xls,
                                  columns_all_equal, file_extensions_get)
    assert file_extensions_get(["a.CSV", "b.csv"]) == [".csv", ".csv"]
    assert check_valid_extensions(["a.parquet", "b.parquet"])
    with pytest.raises(IOError, match="equal"):
        check_valid_extensions(["a.csv", "b.xlsx"])
    with pytest.raises(IOError, match="Unsupported"):
        check_valid_extensions(["a.json", "b.json"])
    with pytest.raises(ValueError, match="empty"):
        check_valid_extensions([])
    assert check_valid_xls(["a.xls", "b.xls"])
    with pytest.raises(IOError, match="xls"):
        check_valid_xls(["a.csv", "b.csv"])
    assert columns_all_equal([["a", "b"], ["a", "b"]])
    assert not columns_all_equal([["a", "b"], ["b", "a"]])


def test_stacker_rejects_mixed_extensions(tmp_path):
    import pytest
    from raystack.stacker import Stacker
    with pytest.raises(IOError, match="equal"):
        Stacker([str(tmp_path / "a.csv"), str(tmp_path / "b.parquet")])
