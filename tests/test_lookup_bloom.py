"""Point-lookup bloom pruning: per-page key blooms in the zone sidecars
(raystack/zones.py) + the row-range pruned partition decode behind
``pipeline.lookup_rows``. Invariants: no false negatives ever (build and
probe share the join module's key-hash canonicalization), pruned lookup
≡ unpruned full-decode lookup, a missing/stale sidecar falls back to the
full decode, a proven miss decodes nothing."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raystack import pipeline as pl
from raystack import zones as zn
from raystack.align import read_aligned
from raystack.gen import write_webtext


@pytest.fixture(scope="module")
def web(tmp_path_factory):
    d = tmp_path_factory.mktemp("webbloom")
    return write_webtext(str(d), n_rows=3000, n_files=4, drift=False)


def test_page_bloom_membership():
    vals = pa.array([f"https://site{i}.org/p/{i}" for i in range(500)])
    bloom = zn._page_bloom(vals)
    h_in = zn.bloom_hashes(vals)
    # no false negatives: every stored value probes positive
    for i in range(500):
        assert zn._bloom_maybe_any(bloom, h_in[i:i + 1])
    # absent values overwhelmingly prune (~1% fp at 10 bits/value)
    absent = pa.array([f"https://other{i}.net/x/{i}" for i in range(200)])
    h_out = zn.bloom_hashes(absent)
    hits = sum(bool(zn._bloom_maybe_any(bloom, h_out[i:i + 1]))
               for i in range(200))
    assert hits <= 10


def test_page_bloom_empty_and_null_pages():
    # empty page: minimal all-zero bitmap, every probe misses
    empty = zn._page_bloom(pa.array([], type=pa.string()))
    h = zn.bloom_hashes(pa.array(["anything"]))
    assert not zn._bloom_maybe_any(empty, h)
    # all-null page: only the null sentinel is present
    nulls = zn._page_bloom(pa.array([None, None], type=pa.string()))
    assert not zn._bloom_maybe_any(nulls, h)
    # absent bloom bytes can never prune
    assert zn._bloom_maybe_any(None, h)
    assert zn._bloom_maybe_any(b"", h)


def _targets(web):
    urls = read_aligned(web, add_filename=False).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    return urls, [urls["url"].iloc[i] for i in (0, 999, 2501)]


def _check_lookup(out, web):
    urls, targets = _targets(web)
    got = pl.lookup_rows(out, targets, columns=["text", "lang"]) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    exp = urls[urls["url"].isin(targets)].reset_index(drop=True)
    assert got["url"].tolist() == exp["url"].tolist()
    assert got["text"].tolist() == exp["text"].tolist()
    assert got["lang"].tolist() == exp["lang"].tolist()
    miss = pl.lookup_rows(out, ["https://nowhere.example/xyz"])
    assert miss is None or len(miss.to_pandas()) == 0


def test_lookup_bloom_groupby_path(ray_session, web, tmp_path):
    out = str(tmp_path / "enc")
    pl.encode_partitioned(read_aligned(web, add_filename=False), out,
                          num_partitions=4, page_rows=64)
    # fresh encode wrote a bloom sidecar for the key column, multi-page
    zdirs = sorted(os.listdir(os.path.join(out, "zones")))
    assert zdirs
    t = pq.read_table(os.path.join(out, "zones", zdirs[0], "url.parquet"))
    assert "bloom" in t.schema.names and t.num_rows > 1
    _check_lookup(out, web)
    # pruning engaged: for a single target, some partition keeps only a
    # strict subset of its pages (and most partitions keep none)
    _, targets = _targets(web)
    h = zn.bloom_hashes(pa.array([targets[0]]))
    survived = pruned = 0
    for d in zdirs:
        probe = zn.bloom_prune_key_pages(
            os.path.join(out, "zones", d), "url", h)
        assert probe is not None
        survived += sum(k for *_, k in probe)
        pruned += sum(not k for *_, k in probe)
    assert survived <= 3  # one true page + rare false positives
    assert pruned > 0


def test_lookup_bloom_tasks_path(ray_session, web, tmp_path):
    # the task-exchange flagship path (precoded heavy columns → per-column
    # page numbering): row-range mapping keeps page pruning sound
    out = str(tmp_path / "enct")
    pl.encode_partitioned_tasks(web, out, num_partitions=4, page_rows=64)
    zdirs = sorted(os.listdir(os.path.join(out, "zones")))
    assert zdirs
    t = pq.read_table(os.path.join(out, "zones", zdirs[0], "url.parquet"))
    assert "bloom" in t.schema.names
    _check_lookup(out, web)


def test_lookup_falls_back_without_sidecar(ray_session, web, tmp_path):
    out = str(tmp_path / "encf")
    pl.encode_partitioned(read_aligned(web, add_filename=False), out,
                          num_partitions=4, page_rows=64)
    with_bloom = pl.lookup_rows(out, _targets(web)[1]) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    shutil.rmtree(os.path.join(out, "zones"))
    without = pl.lookup_rows(out, _targets(web)[1]) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    assert with_bloom.equals(without)


def test_lookup_join_dataset_scale(ray_session, web, tmp_path):
    # bulk index fetch: a Dataset of keys joined against the layout —
    # only keys shuffle; touched partitions decode bloom-pruned
    import ray.data
    out = str(tmp_path / "encj")
    pl.encode_partitioned_tasks(web, out, num_partitions=4, page_rows=64)
    urls_df = read_aligned(web, add_filename=False).to_pandas()
    hit = urls_df["url"].iloc[::37].tolist()
    misses = [f"https://nope{i}.example/x" for i in range(20)]
    # duplicates in the key set must not duplicate output rows
    keys = ray.data.from_arrow(pa.table(
        {"url": pa.array(hit + misses + hit[:5])}))
    got = pl.lookup_join(out, keys, columns=["text"]).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    exp = urls_df[urls_df["url"].isin(hit)][["url", "text"]] \
        .sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == exp["url"].tolist()
    assert got["text"].tolist() == exp["text"].tolist()
    # differently-named key column routes the same
    keys2 = ray.data.from_arrow(pa.table({"u": pa.array(hit)}))
    got2 = pl.lookup_join(out, keys2, key_col="u", columns=["text"]) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    assert got2["url"].tolist() == exp["url"].tolist()
    # fallback parity: no sidecars → full-decode path, identical result
    shutil.rmtree(os.path.join(out, "zones"))
    got3 = pl.lookup_join(out, keys, columns=["text"]).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert got3.equals(got)


def test_lookup_after_append_then_rebuild(ray_session, web, tmp_path):
    # append invalidates touched sidecars → lookup falls back (correct,
    # unpruned); build_zone_maps with bloom_columns restores pruning
    out = str(tmp_path / "enca")
    pl.encode_partitioned_tasks(web[:3], out, num_partitions=4,
                                page_rows=64)
    pl.encode_append(web[3:], out)
    _check_lookup(out, web)
    zn.build_zone_maps(out, [], bloom_columns=["url"])
    zdirs = sorted(os.listdir(os.path.join(out, "zones")))
    t = pq.read_table(os.path.join(out, "zones", zdirs[0], "url.parquet"))
    assert "bloom" in t.schema.names
    _check_lookup(out, web)


def test_float_key_negative_zero_canonicalized(ray_session):
    """SQL join equality says -0.0 = 0.0; the key-hash canonicalization
    must agree, or the bloom tier of a join would disagree with its own
    hash-join fallback tier on the same inputs."""
    import numpy as np
    import pyarrow as pa

    from raystack.ops.join import _key_hashes
    h = _key_hashes(pa.array([-0.0, 0.0, 1.5, None]))
    assert h[0] == h[1]
    assert h[2] != h[0] and h[3] != h[0]

    import ray.data

    from raystack.ops.join import semi_join_bloom
    left = ray.data.from_arrow(pa.table(
        {"k": pa.array([-0.0, 1.5, 2.5]), "v": pa.array([1, 2, 3])}))
    right = ray.data.from_arrow(pa.table({"k": pa.array([0.0, 2.5])}))
    got = semi_join_bloom(left, right, on="k").to_pandas()
    assert sorted(got["v"]) == [1, 3]  # -0.0 row joins the 0.0 key
    # the distributed exact tier agrees (forced past the broadcast gate)
    from raystack.ops.join import semi_join_ds
    got2 = semi_join_ds(left, right, "k").to_pandas()
    assert sorted(got2["v"]) == [1, 3]
    assert list(got2.columns) == ["k", "v"]  # temp join column dropped
    got3 = semi_join_ds(left, right, "k", anti=True).to_pandas()
    assert sorted(got3["v"]) == [2]
