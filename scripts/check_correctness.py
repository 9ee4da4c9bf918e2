"""Local emulation of the driver's correctness gate: run every
``queries()`` entry at a given sf, compare against ``oracle_sql()`` via
DuckDB (row count + sorted-column value equality). Usage:

    python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: v.hex()
                              if isinstance(v, (bytes, bytearray)) else str(v))
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_df(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(got)} rows (no oracle)")
            n_pass += 1
            continue
        try:
            exp = canon(con.execute(oracles[name]).df())
        except Exception as e:
            # an oracle that can't run (e.g. a pinned sf0.01 fixture
            # missing at another scale) is that QUERY's failure — it
            # must not abort the whole gate without a summary
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != oracle {len(exp)}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        eq = True
        for c in got.columns:
            a, b = got[c], exp[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np
                same = np.allclose(a.astype(float), b.astype(float),
                                   rtol=0, atol=0, equal_nan=True)
            else:
                same = a.astype(str).equals(b.astype(str))
            if not same:
                diff = (a.astype(str) != b.astype(str))
                print(f"FAIL {name}: column {c} mismatch "
                      f"({int(getattr(diff, 'sum', lambda: 0)())} rows differ)")
                eq = False
                break
        if eq:
            print(f"PASS {name}: {len(got)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
