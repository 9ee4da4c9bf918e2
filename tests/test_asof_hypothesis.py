"""Property sweep: asof_join vs DuckDB's native ASOF LEFT JOIN on
adversarial small inputs — exact-tie timestamps, unmatched keys, keys
with a single right row, empty intersections. The declared contract
matches DuckDB semantics (greatest right ts <= left ts, ties match,
unmatched lefts keep nulls), with (key, ts) unique on the right."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray
from hypothesis import given, settings, strategies as st

_row = st.tuples(st.integers(min_value=0, max_value=2),
                 st.integers(min_value=0, max_value=8))
_left_st = st.lists(_row, min_size=1, max_size=12)
_right_st = st.lists(st.tuples(st.integers(min_value=0, max_value=2),
                               st.integers(min_value=0, max_value=8),
                               st.integers(min_value=-100, max_value=100)),
                     min_size=0, max_size=12)


@settings(max_examples=25, deadline=None)
@given(_left_st, _right_st)
def test_asof_join_matches_duckdb(ray_session, lrows, rrows):
    from raystack.ops.join import asof_join
    seen = set()
    rdedup = []
    for k, ts, v in rrows:  # contract: (key, ts) unique on the right
        if (k, ts) not in seen:
            seen.add((k, ts))
            rdedup.append((k, ts, v))
    left = pa.table({"k": pa.array([r[0] for r in lrows], pa.int64()),
                     "ts": pa.array([r[1] for r in lrows], pa.int64()),
                     "lid": pa.array(range(len(lrows)), pa.int64())})
    right = pa.table({"k": pa.array([r[0] for r in rdedup], pa.int64()),
                      "ts": pa.array([r[1] for r in rdedup], pa.int64()),
                      "v": pa.array([r[2] for r in rdedup], pa.int64())})
    got = asof_join(ray.data.from_arrow(left),
                    ray.data.from_arrow(right), key="k", ts="ts") \
        .to_pandas().sort_values("lid").reset_index(drop=True)
    ldf, rdf = left.to_pandas(), right.to_pandas()  # noqa: F841
    exp = duckdb.sql(
        "SELECT l.k, l.ts, l.lid, r.ts AS ts_r, r.v "
        "FROM ldf l ASOF LEFT JOIN rdf r "
        "ON l.k = r.k AND l.ts >= r.ts ORDER BY l.lid").df()
    assert len(got) == len(exp)
    for col in ("k", "ts", "lid"):
        assert got[col].tolist() == exp[col].tolist()
    for g, e in (("ts_r", "ts_r"), ("v", "v")):
        gv = [None if pd.isna(x) else int(x) for x in got[g]]
        ev = [None if pd.isna(x) else int(x) for x in exp[e]]
        assert gv == ev, (lrows, rdedup)
