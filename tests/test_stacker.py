"""Stacker facade tests: reference API parity on Parquet and CSV inputs
(SURVEY.md §7 step 8), plus SQL DDL / Excel pure-logic parity."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from raystack.gen import make_sales_files
from raystack.stacker import Stacker


@pytest.fixture(scope="module")
def sales_extra(tmp_path_factory):
    return make_sales_files(str(tmp_path_factory.mktemp("st")), drift="extra")


def test_columns_and_presence(sales_extra):
    st = Stacker(sales_extra)
    cols = st.columns()
    assert cols["columns_all"] == ["date", "sales", "cost", "profit", "profit2"]
    assert cols["columns_unique"] == ["profit2"]
    assert not st.is_all_equal()
    pres = st.is_column_present()
    assert pres.loc["mar.parquet", "profit2"]
    assert not pres.loc["jan.parquet", "profit2"]
    assert list(st.is_column_present_unique().columns) == ["profit2"]


def test_combine_preview_matches_oracle(sales_extra):
    st = Stacker(sales_extra, add_filename=False)
    prev = st.combine_preview(nrows=2)
    assert len(prev) == 6
    assert list(prev.columns) == ["date", "sales", "cost", "profit", "profit2"]
    assert prev["profit2"].notna().sum() == 2


def test_to_pandas_and_parquet_sinks(ray_session, sales_extra, tmp_path):
    st = Stacker(sales_extra, add_filename=False)
    df = st.to_pandas()
    assert len(df) == 30
    out = st.to_parquet_combine(str(tmp_path / "combined"))
    back = pq.read_table(out).to_pandas()
    assert len(back) == 30
    outs = st.to_parquet_align(str(tmp_path / "aligned"))
    assert len(outs) == 3
    for p in outs:
        t = pq.read_table(p)
        assert t.schema.names == ["date", "sales", "cost", "profit", "profit2"]
        assert t.num_rows == 10  # exactly that input file's rows


def test_csv_stacker_end_to_end(ray_session, tmp_path):
    for m, month in enumerate(["jan", "feb"], start=1):
        with open(tmp_path / f"{month}.csv", "w") as f:
            f.write("date,sales,cost\n")
            for d in range(4):
                f.write(f"2011-{m:02d}-{d+1:02d},100,-80\n")
    with open(tmp_path / "mar.csv", "w") as f:
        f.write("date,sales,cost,profit\n2011-03-01,100,-80,20\n")
    st = Stacker([str(tmp_path / f) for f in ["jan.csv", "feb.csv", "mar.csv"]])
    assert st.columns()["columns_unique"] == ["profit"]
    df = st.to_pandas()
    assert len(df) == 9 and df["profit"].notna().sum() == 1
    heads = st.to_csv_head(str(tmp_path / "heads"))
    assert len(heads) == 3 and all(os.path.exists(h) for h in heads)
    aligned = st.to_csv_align(str(tmp_path / "al"))
    a = pd.read_csv(aligned[0])
    assert list(a.columns) == ["date", "sales", "cost", "profit",
                               "filepath", "filename"]


def test_sql_ddl(sales_extra):
    st = Stacker(sales_extra, add_filename=False)
    ddl = st.to_sql_combine(table_name="sales", return_create_sql=True)
    assert ddl.startswith("CREATE TABLE sales")
    assert '"date" TIMESTAMP' in ddl and '"sales" BIGINT' in ddl


def test_excel_pure_logic():
    from raystack.sources.excel import (collapse_multi_header, convert_excel,
                                        output_filename, parse_header_range)
    r = parse_header_range("B2:E2")
    assert r == {"header": 1, "skiprows": 1, "usecols": [1, 4]}
    assert parse_header_range("A1:C1")["usecols"] == [0, 2]
    with pytest.raises(ValueError):
        parse_header_range("A1:B2")
    cols = collapse_multi_header([("Year", "2011"), ("Unnamed: 0", "sales"),
                                  "flat"])
    assert cols == ["Year 2011", "sales", "flat"]
    assert output_filename("/x/y/book.xlsx", "Sheet1") == "book-Sheet1.csv"
    # conversion is now un-gated via the stdlib OOXML reader
    import pandas as pd
    import tempfile
    from raystack.sources.xlsx import write_xlsx
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "book.xlsx")
        write_xlsx(p, {"Sheet1": [["a", "b"], [1, 2], [3, 4]]})
        out = convert_excel(p, sheet_name="Sheet1")
        got = pd.read_csv(out)
        assert got["a"].tolist() == [1, 3]


def test_encoded_sink(ray_session, sales_extra, tmp_path):
    st = Stacker(sales_extra, add_filename=False)
    summary = st.to_encoded(str(tmp_path / "enc"), num_partitions=2)
    assert summary["rows"] == 30
    from raystack import pipeline as pl
    dec = pl.decode_pages(pl.read_encoded(str(tmp_path / "enc"))).to_pandas()
    assert len(dec) == 30


def test_preview_select_rename(sales_extra, tmp_path):
    st = Stacker(sales_extra, columns_select=["date", "profit2"])
    assert st.preview_select() == ["date", "profit2"]
    paths = make_sales_files(str(tmp_path / "r"), drift="rename")
    st2 = Stacker(paths, columns_rename={"revenue": "sales"})
    assert st2.preview_rename() == {"mar.parquet": {"revenue": "sales"}}
    assert st2.preview_select() == ["date", "sales", "cost", "profit"]


def test_to_pandas_ordered(ray_session, sales_extra):
    st = Stacker(sales_extra, add_filename=False)
    got = st.to_pandas(ordered=True)
    exp = pd.concat([pq.read_table(p).to_pandas() for p in sorted(sales_extra)],
                    ignore_index=True).reindex(
        columns=["date", "sales", "cost", "profit", "profit2"])
    assert got["date"].tolist() == exp["date"].tolist()
    assert got["profit2"].fillna(-1).tolist() == exp["profit2"].fillna(-1).tolist()


def test_align_sinks_if_exists_skip(ray_session, sales_extra, tmp_path):
    st = Stacker(sales_extra, add_filename=False)
    outs = st.to_parquet_align(str(tmp_path / "a"))
    mtimes = {p: os.path.getmtime(p) for p in outs}
    outs2 = st.to_parquet_align(str(tmp_path / "a"), if_exists="skip")
    assert outs2 == outs
    assert all(os.path.getmtime(p) == mtimes[p] for p in outs2)  # untouched


def test_dir_sync(tmp_path):
    """S5 sync semantics (reference sync.py:61-164) over filesystem roots."""
    from raystack.sources.sync import DirSync, FTPSync
    remote = tmp_path / "remote"
    (remote / "sub").mkdir(parents=True)
    (remote / "a.csv").write_text("x")
    (remote / "sub" / "b.csv").write_text("yy")
    local = tmp_path / "local"
    local.mkdir()
    (local / "a.csv").write_text("x")  # already present
    s = DirSync(str(remote), str(local))
    missing, total = s.get_files_for_sync()
    assert missing == {os.path.join("sub", "b.csv")}
    assert total == 2
    copied = s.sync()
    assert len(copied) == 1 and os.path.exists(copied[0])
    assert s.sync() == []  # idempotent
    # flat (non-recursive) listing parity
    assert s.get_all_files(subdirs=False, remote=True) == ["a.csv"]
    with pytest.raises(NotImplementedError):
        FTPSync("h", "u", "p", "/d")


def test_encoded_sink_methods_agree(ray_session, sales_extra, tmp_path):
    st = Stacker(sales_extra, add_filename=False)
    s_t = st.to_encoded(str(tmp_path / "enc_t"), num_partitions=2)
    s_g = st.to_encoded(str(tmp_path / "enc_g"), num_partitions=2,
                        method="groupby")
    assert s_t["rows"] == s_g["rows"] == 30
    from raystack import pipeline as pl
    a = pl.decode_dir(str(tmp_path / "enc_t")).to_pandas()
    b = pl.decode_dir(str(tmp_path / "enc_g")).to_pandas()
    key = list(a.columns)
    assert a.sort_values(key).reset_index(drop=True).equals(
        b[a.columns].sort_values(key).reset_index(drop=True))


def test_preview_tolerates_empty_file(ray_session, tmp_path):
    # regression: a zero-row parquet input crashed combine_preview with
    # an uncaught StopIteration
    import pyarrow as pa
    import pyarrow.parquet as pq
    from raystack.stacker import Stacker
    full = str(tmp_path / "a.parquet")
    empty = str(tmp_path / "b.parquet")
    t = pa.table({"x": [1, 2], "y": ["p", "q"]})
    pq.write_table(t, full)
    pq.write_table(t.slice(0, 0), empty)
    st = Stacker([full, empty], add_filename=False)
    prev = st.combine_preview()
    assert prev["x"].tolist() == [1, 2]
    # empty aligned CSV keeps header parity with non-empty outputs
    st2 = Stacker([full, empty])  # add_filename=True
    outs = st2.to_csv_align(str(tmp_path / "out"))
    import pandas as pd
    cols = [list(pd.read_csv(o, nrows=0).columns) for o in sorted(outs)]
    assert cols[0] == cols[1]  # provenance columns present in BOTH


def test_sql_ddl_mysql_backticks():
    import pyarrow as pa
    from raystack.sources.sql import schema_to_ddl
    ddl = schema_to_ddl(pa.schema([("c", pa.int64())]), "t",
                        dialect="mysql")
    assert "`c`" in ddl and '"c"' not in ddl
    ddl_pg = schema_to_ddl(pa.schema([("c", pa.int64())]), "t")
    assert '"c"' in ddl_pg


def test_plan_rejects_conflicting_rename_targets(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest
    from raystack.plan import build_plan
    p = str(tmp_path / "a.parquet")
    pq.write_table(pa.table({"a": [1], "b": [2]}), p)
    with pytest.raises(ValueError, match="same"):
        build_plan([p], columns_rename={"a": "x", "b": "x"})
