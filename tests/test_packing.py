"""Sequence packing plan: exactness vs a DuckDB window-function mirror,
tiling invariants, and bucket-count independence."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data

from raystack.ops.packing import pack_stats, sequence_pack_plan

SF = "/root/testdata/sf0.001"
L = 512


def _docs():
    return pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])


def _tok_counts(t: pa.Table) -> pd.DataFrame:
    n = pc.count_substring_regex(t["text"], r"\S+").cast(pa.int64())
    return pa.table({"doc_id": t["doc_id"], "n_tokens": n}).to_pandas()


def _mirror(toks: pd.DataFrame, seq_len: int, sep: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("toks", toks)
    return con.execute(f"""
        WITH c AS (SELECT doc_id, n_tokens + {sep} AS c FROM toks),
        o AS (SELECT doc_id, c,
                COALESCE(SUM(c) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS o
              FROM c),
        f AS (SELECT * FROM o WHERE c > 0),
        s AS (SELECT doc_id, o, c,
                UNNEST(generate_series(CAST(o // {seq_len} AS BIGINT),
                                       CAST((o + c - 1) // {seq_len}
                                            AS BIGINT)))
                  AS seq_id
              FROM f)
        SELECT doc_id, seq_id,
               GREATEST(o, seq_id*{seq_len}) - seq_id*{seq_len} AS seq_off,
               GREATEST(o, seq_id*{seq_len}) - o AS doc_off,
               LEAST(o+c, (seq_id+1)*{seq_len})
                 - GREATEST(o, seq_id*{seq_len}) AS n_toks
        FROM s ORDER BY doc_id, seq_id""").df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = ["doc_id", "seq_id", "seq_off", "doc_off", "n_toks"]
    return df[cols].astype("int64").sort_values(cols, kind="stable") \
        .reset_index(drop=True)


def test_pack_plan_matches_duckdb_window_mirror(ray_session):
    t = _docs()
    plan = sequence_pack_plan(ray.data.from_arrow(t), L).to_pandas()
    mirror = _mirror(_tok_counts(t), L, sep=1)
    pd.testing.assert_frame_equal(_canon(plan), _canon(mirror))


def test_pack_plan_tiling_invariants(ray_session):
    t = _docs()
    plan = sequence_pack_plan(ray.data.from_arrow(t), L).to_pandas()
    toks = _tok_counts(t)
    assert (plan["n_toks"] > 0).all()
    # per-sequence tiling: spans of one seq_id cover [0, seq_len) exactly,
    # with the final sequence allowed to end short
    per_seq = plan.groupby("seq_id")["n_toks"].sum()
    last = plan["seq_id"].max()
    assert (per_seq.drop(index=last) == L).all()
    assert 0 < per_seq[last] <= L
    for _, g in plan.sort_values(["seq_id", "seq_off"]).groupby("seq_id"):
        ends = (g["seq_off"] + g["n_toks"]).to_numpy()
        assert g["seq_off"].iloc[0] == 0
        assert (g["seq_off"].to_numpy()[1:] == ends[:-1]).all()
    # per-doc tiling: spans of one doc cover [0, n_tokens + 1) exactly
    per_doc = plan.groupby("doc_id")["n_toks"].sum()
    want = (toks.set_index("doc_id")["n_tokens"] + 1).sort_index()
    pd.testing.assert_series_equal(per_doc.sort_index(), want,
                                   check_names=False)
    # total = one global stream, no padding anywhere
    assert plan["n_toks"].sum() == want.sum()
    st = pack_stats(sequence_pack_plan(ray.data.from_arrow(t), L), L)
    assert st["n_sequences"] == last + 1
    assert st["total_tokens"] == want.sum()
    assert st["last_fill"] == per_seq[last]


def test_pack_plan_bucket_count_independent(ray_session):
    t = _docs().slice(0, 700)
    a = sequence_pack_plan(ray.data.from_arrow(t), 128,
                           n_buckets=3).to_pandas()
    b = sequence_pack_plan(ray.data.from_arrow(t), 128,
                           n_buckets=256).to_pandas()
    pd.testing.assert_frame_equal(_canon(a), _canon(b))


def test_pack_plan_precomputed_counts_and_edges(ray_session):
    # sparse, shuffled, non-contiguous ids; zero-token docs with sep=0
    # vanish, with sep=1 they still occupy their separator slot
    df = pd.DataFrame({
        "doc_id": [900, 5, 77, 41, 1000000, 8],
        "n_tokens": [10, 0, 300, 7, 129, 0],
    }).sample(frac=1.0, random_state=3)
    ds = ray.data.from_pandas(df)
    plan = sequence_pack_plan(ds, 128, sep_tokens=0,
                              n_buckets=7).to_pandas()
    assert set(plan["doc_id"]) == {900, 77, 41, 1000000}
    mirror = _mirror(df, 128, sep=0)
    pd.testing.assert_frame_equal(_canon(plan), _canon(mirror))
    plan1 = sequence_pack_plan(ds, 128, sep_tokens=1,
                               n_buckets=7).to_pandas()
    mirror1 = _mirror(df, 128, sep=1)
    pd.testing.assert_frame_equal(_canon(plan1), _canon(mirror1))


def test_pack_plan_duplicate_ids_refused(ray_session):
    df = pd.DataFrame({"doc_id": [1, 1, 2], "n_tokens": [5, 5, 5]})
    with pytest.raises(Exception, match="duplicate"):
        sequence_pack_plan(ray.data.from_pandas(df), 16,
                           n_buckets=1).to_pandas()


def test_pack_plan_extreme_id_range(ray_session):
    # ids spanning nearly the full int64 range: bucket math must stay
    # exact (a naive (id-lo)*n_buckets overflows and scrambles order)
    df = pd.DataFrame({
        "doc_id": [-(2**62) - 7, -99, 0, 3, 2**61, 2**62 + 11],
        "n_tokens": [5, 100, 0, 37, 64, 129],
    }).sample(frac=1.0, random_state=1)
    plan = sequence_pack_plan(ray.data.from_pandas(df), 64,
                              n_buckets=5).to_pandas()
    mirror = _mirror(df, 64, sep=1)
    pd.testing.assert_frame_equal(_canon(plan), _canon(mirror))
