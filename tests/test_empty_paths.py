"""Empty-input/empty-intermediate paths: Ray's to_pandas() drops a 0-row
Dataset's columns, so every driver-side `df[cols]` indexing crashed on
corpora that produce nothing — empty corpus, all-null column, token-less
documents, no duplicates, empty key sets. Sweep-found class; these pin
the fixes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _empty_docs():
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))


def _blank_docs(n=3):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["", "  ", "\t"][:n], pa.string())}))


def test_frequent_items_all_null(ray_session):
    from raystack.ops.colstats import frequent_items
    ds = ray.data.from_arrow(pa.table(
        {"v": pa.array([None, None], pa.string())}))
    got = frequent_items(ds, "v", k=5)
    assert list(got.columns) == ["value", "n"] and len(got) == 0


def test_value_quantiles_all_null(ray_session):
    from raystack.ops.colstats import value_quantiles
    ds = ray.data.from_arrow(pa.table(
        {"v": pa.array([None, None], pa.float64())}))
    got = value_quantiles(ds, "v", quantiles=(0.5, 0.9))
    assert got["value"].isna().all() and len(got) == 2


def test_top_ngrams_blank_corpus(ray_session):
    from raystack.ops.text import top_ngrams
    got = top_ngrams(_blank_docs(), n=2, k=5)
    assert list(got.columns) == ["ngram", "n"] and len(got) == 0


def test_minhash_dedup_empty_corpus(ray_session):
    from raystack.ops.dedup import minhash_lsh_dedup
    got = minhash_lsh_dedup(_empty_docs())
    assert got.count() == 0


def test_train_bpe_blank_corpus(ray_session):
    from raystack.ops.bpe import train_bpe
    tok = train_bpe(_blank_docs(), vocab_size=300)
    assert tok == {"merges": [], "vocab_size": 256, "lowercase": True}


def test_semi_join_bloom_empty_keys(ray_session):
    from raystack.ops.join import semi_join_bloom
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64())}))
    keys = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64())}))
    anti = semi_join_bloom(ds, keys, on="doc_id", anti=True)
    assert sorted(anti.to_pandas()["doc_id"]) == [1, 2, 3]
    semi = semi_join_bloom(ds, keys, on="doc_id", anti=False)
    assert semi.count() == 0


def test_bm25_token_less_corpus(ray_session, tmp_path):
    from raystack.ops.textindex import bm25_topk, build_text_index
    idx = str(tmp_path / "idx")
    meta = build_text_index(_blank_docs(), idx, num_buckets=4)
    assert meta["n_docs"] == 3 and meta["avgdl"] == 0.0
    assert bm25_topk(idx, ["anything"], k=3).count() == 0
