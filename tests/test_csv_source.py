"""CSV source tests: dialect sniffing semantics (reference sniffer.py) and
drifting-CSV aligned reads vs pandas oracle."""

import numpy as np
import pandas as pd
import pytest

from raystack.sources.csv import (build_csv_plan, read_aligned_csv,
                                  sniff_dialect, sniff_dialect_all)


def _write(path, text):
    with open(path, "w") as f:
        f.write(text)
    return str(path)


@pytest.fixture()
def clean_csvs(tmp_path):
    paths = []
    for m, month in enumerate(["jan", "feb", "mar"], start=1):
        rows = "\n".join(f"2011-{m:02d}-{d+1:02d},100,-80,20" for d in range(5))
        paths.append(_write(tmp_path / f"{month}.csv",
                            f"date,sales,cost,profit\n{rows}\n"))
    return sorted(paths)


def test_sniff_comma_header(clean_csvs):
    d = sniff_dialect(clean_csvs[0])
    assert d.delim == "," and d.skiprows == 0 and d.has_header


def test_sniff_pipe_delim(tmp_path):
    p = _write(tmp_path / "p.csv", "a|b|c\n1|2|3\n4|5|6\n")
    d = sniff_dialect(p)
    assert d.delim == "|" and d.has_header


def test_sniff_headerless(tmp_path):
    p = _write(tmp_path / "h.csv", "1,2,3\n4,5,6\n7,8,9\n")
    d = sniff_dialect(p)
    assert not d.has_header


def test_sniff_skiprows(tmp_path):
    p = _write(tmp_path / "s.csv",
               "report title\ngenerated 2011\na,b,c\n1,2,3\n4,5,6\n")
    d = sniff_dialect(p)
    assert d.skiprows == 2 and d.delim == "," and d.has_header


def test_sniff_disagreement_raises(tmp_path):
    p1 = _write(tmp_path / "a.csv", "a,b\n1,2\n")
    p2 = _write(tmp_path / "b.csv", "a|b\nx|y\n")
    with pytest.raises(NotImplementedError):
        sniff_dialect_all([p1, p2])


def test_csv_plan_drift(tmp_path, clean_csvs):
    extra = _write(tmp_path / "zz_apr.csv",
                   "date,sales,cost,profit,profit2\n2011-04-01,100,-80,20,40\n")
    plan, dialect = build_csv_plan(clean_csvs + [extra])
    assert plan.columns_all == ["date", "sales", "cost", "profit", "profit2"]
    assert plan.columns_common == ["date", "sales", "cost", "profit"]
    assert not plan.is_all_equal


def test_read_aligned_csv_union(ray_session, tmp_path, clean_csvs):
    extra = _write(tmp_path / "zz_apr.csv",
                   "date,sales,cost,profit,profit2\n2011-04-01,100,-80,20,40\n")
    ds = read_aligned_csv(clean_csvs + [extra], add_filename=True)
    got = ds.to_pandas().sort_values("date").reset_index(drop=True)
    assert len(got) == 16
    assert got["profit2"].notna().sum() == 1
    assert set(got["filename"]) == {"jan.csv", "feb.csv", "mar.csv", "zz_apr.csv"}
    exp = pd.concat([pd.read_csv(p) for p in clean_csvs + [extra]],
                    ignore_index=True).sort_values("date").reset_index(drop=True)
    assert got["sales"].tolist() == exp["sales"].tolist()
    assert got["profit2"].dropna().tolist() == [40]


def test_read_aligned_csv_headerless(ray_session, tmp_path):
    p1 = _write(tmp_path / "a.csv", "1,2,3\n4,5,6\n")
    p2 = _write(tmp_path / "b.csv", "7,8,9\n")
    ds = read_aligned_csv([p1, p2], add_filename=False)
    got = ds.to_pandas()
    assert list(got.columns) == ["col0", "col1", "col2"]
    assert sorted(got["col0"].tolist()) == [1, 4, 7]


def test_read_aligned_csv_rename(ray_session, tmp_path, clean_csvs):
    ren = _write(tmp_path / "zz_may.csv",
                 "date,revenue,cost,profit\n2011-05-01,100,-80,20\n")
    ds = read_aligned_csv(clean_csvs + [ren],
                          columns_rename={"revenue": "sales"},
                          add_filename=False)
    got = ds.to_pandas()
    assert list(got.columns) == ["date", "sales", "cost", "profit"]
    assert got["sales"].notna().all() and len(got) == 16
