"""End-to-end encode/decode pipeline tests (SURVEY.md §7 steps 4-6):
bit-identical url-keyed roundtrip, manifest + resume, skew salt-split,
compression vs Parquet/snappy."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raystack import manifest as mf
from raystack import pipeline as pl
from raystack.align import read_aligned
from raystack.gen import write_webtext


@pytest.fixture(scope="module")
def web(tmp_path_factory):
    d = tmp_path_factory.mktemp("webdata")
    paths = write_webtext(str(d), n_rows=3000, n_files=4, drift=False)
    return paths


def _df_by_url(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("url").reset_index(drop=True)


def test_encode_partitioned_roundtrip(ray_session, web, tmp_path):
    out = str(tmp_path / "enc")
    ds = read_aligned(web, add_filename=True)
    summary = pl.encode_partitioned(ds, out, num_partitions=8)
    assert summary["rows"] == 3000
    assert summary["encoded_bytes"] < summary["raw_bytes"]

    decoded = pl.decode_pages(pl.read_encoded(out))
    got = _df_by_url(decoded.to_pandas())
    exp = _df_by_url(read_aligned(web, add_filename=True).to_pandas())
    assert len(got) == 3000
    for col in ["url", "warc_ts", "html", "text", "lang"]:
        assert got[col].tolist() == exp[col].tolist(), col

    # manifest lineage: every partition knows its input files + codecs
    m = mf.load_manifest(out)
    assert len(m) >= 2
    for row in m.values():
        assert row["input_files"] and row["codecs"]
        assert set(row["codecs"]) >= {"url", "html", "text", "lang", "warc_ts"}


def test_encode_batches_roundtrip(ray_session, web):
    ds = read_aligned(web, add_filename=False)
    pages = pl.encode_batches(ds, batch_size=1024)
    decoded = pl.decode_pages(pages)
    got = _df_by_url(decoded.to_pandas())
    exp = _df_by_url(read_aligned(web, add_filename=False).to_pandas())
    assert got["url"].tolist() == exp["url"].tolist()
    assert got["html"].tolist() == exp["html"].tolist()


def test_resume_skips_completed(ray_session, web, tmp_path):
    out = str(tmp_path / "enc2")
    ds = read_aligned(web, add_filename=False)
    pl.encode_partitioned(ds, out, num_partitions=8)
    m1 = mf.load_manifest(out)
    # resume over the same input: all partitions done → nothing re-encoded
    n_files_before = len(glob.glob(os.path.join(out, "pages", "**", "*.parquet"),
                                   recursive=True))
    summary = pl.encode_partitioned(ds, out, num_partitions=8, resume=True)
    m2 = mf.load_manifest(out)
    assert m1.keys() == m2.keys()
    assert summary["rows"] == 3000  # manifest still reports full lineage


def test_hot_host_salt_split(ray_session):
    import ray.data
    # one host dominating 90% of rows must be fanned out over several keys
    urls = ([f"https://www.hot.com/p/{i}" for i in range(1800)]
            + [f"https://cold{i % 40}.org/p/{i}" for i in range(200)])
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls)}))
    hot = pl.detect_hot_hosts(ds, num_partitions=16)
    assert "www.hot.com" in hot and hot["www.hot.com"] >= 8
    keyed = ds.map_batches(lambda t: t, batch_format="pyarrow")
    keyed = pl.add_partition_key(ds, num_partitions=16, hot_hosts=hot)
    df = keyed.to_pandas()
    hot_keys = df[df["url"].str.contains("hot.com")]["part_key"].nunique()
    assert hot_keys >= 4, f"hot host landed on only {hot_keys} partitions"


def test_compression_beats_snappy(ray_session, web, tmp_path):
    out = str(tmp_path / "enc3")
    ds = read_aligned(web, add_filename=False)
    pl.encode_partitioned(ds, out, num_partitions=4)
    encoded_bytes = sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(out, "pages", "**", "*.parquet"),
                           recursive=True))
    snappy = str(tmp_path / "snappy.parquet")
    full = pa.concat_tables([pq.read_table(p) for p in web])
    pq.write_table(full, snappy, compression="snappy")
    baseline = os.path.getsize(snappy)
    ratio = encoded_bytes / baseline
    assert ratio <= 1.0, f"encoded {encoded_bytes} > snappy baseline {baseline}"


def test_tail_hash_distributes():
    urls = pa.array([f"https://www.hot.com/page/{i}" for i in range(5000)])
    h = pl._tail_hash(urls)
    assert len(np.unique(h % 16)) == 16
    # deterministic
    assert np.array_equal(h, pl._tail_hash(urls))


def test_verify_encoded_detects_corruption(ray_session, web, tmp_path):
    out = str(tmp_path / "enc_v")
    ds = read_aligned(web, add_filename=False)
    pl.encode_partitioned(ds, out, num_partitions=4)
    res = pl.verify_encoded(out)
    assert res["bad"] == [] and res["missing"] == [] and len(res["ok"]) >= 2

    # corrupt one page blob on disk → that partition must be flagged
    victim = glob.glob(os.path.join(out, "pages", "**", "*.parquet"),
                       recursive=True)[0]
    t = pq.read_table(victim)
    data = t["data"].to_pylist()
    data[0] = data[0][:-1] + bytes([data[0][-1] ^ 0xFF])
    t = t.set_column(t.schema.get_field_index("data"), "data",
                     pa.array(data, type=pa.large_binary()))
    pq.write_table(t, victim)
    res2 = pl.verify_encoded(out)
    assert len(res2["bad"]) == 1


def test_decode_column_pruning(ray_session, web, tmp_path):
    out = str(tmp_path / "enc_p")
    pl.encode_partitioned(read_aligned(web, add_filename=False), out,
                          num_partitions=4)
    dec = pl.decode_pages(pl.read_encoded(out), columns=["url", "lang"])
    df = dec.to_pandas()
    assert sorted(df.columns) == ["lang", "url"] and len(df) == 3000


def test_skew_bounded_partitions(ray_session):
    """With salt-split, a host holding 80% of rows must not produce a
    partition larger than ~3x the mean."""
    import ray.data
    urls = ([f"https://mega.com/p/{i}" for i in range(16000)]
            + [f"https://site{i % 50}.org/p/{i}" for i in range(4000)])
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls)}))
    P = 16
    hot = pl.detect_hot_hosts(ds, num_partitions=P)
    keyed = pl.add_partition_key(ds, num_partitions=P, hot_hosts=hot)
    sizes = keyed.to_pandas().groupby("part_key").size()
    mean = len(urls) / P
    assert sizes.max() <= 3 * mean, f"max part {sizes.max()} vs mean {mean}"
    # without salt the hot host collapses onto one partition
    keyed0 = pl.add_partition_key(ds, num_partitions=P, hot_hosts={})
    sizes0 = keyed0.to_pandas().groupby("part_key").size()
    assert sizes0.max() >= 0.8 * 16000


def test_encode_streaming_roundtrip(ray_session, web, tmp_path):
    out = str(tmp_path / "enc_s")
    ds = read_aligned(web, add_filename=True)
    summary = pl.encode_streaming(ds, out, num_partitions=8)
    assert summary["rows"] == 3000
    got = _df_by_url(pl.decode_pages(pl.read_encoded(out)).to_pandas())
    exp = _df_by_url(read_aligned(web, add_filename=True).to_pandas())
    for col in ["url", "warc_ts", "html", "text", "lang"]:
        assert got[col].tolist() == exp[col].tolist(), col


def test_lookup_rows_partition_pruned(ray_session, web, tmp_path):
    out = str(tmp_path / "enc_l")
    pl.encode_partitioned(read_aligned(web, add_filename=False), out,
                          num_partitions=8)
    all_urls = read_aligned(web, add_filename=False).to_pandas()["url"]
    targets = [all_urls.iloc[0], all_urls.iloc[1500], all_urls.iloc[2999]]
    got = pl.lookup_rows(out, targets).to_pandas()
    assert sorted(got["url"]) == sorted(targets)
    # miss: unknown url finds nothing but doesn't error
    miss = pl.lookup_rows(out, ["https://nowhere.example/xyz"])
    assert miss is None or len(miss.to_pandas()) == 0


def test_encode_partitioned_column_subset(ray_session, web, tmp_path):
    out = str(tmp_path / "enc_sub")
    ds = read_aligned(web, add_filename=False)
    pl.encode_partitioned(ds, out, num_partitions=4,
                          columns=["url", "lang"])
    dec = pl.decode_pages(pl.read_encoded(out)).to_pandas()
    assert sorted(dec.columns) == ["lang", "url"]
    assert len(dec) == 3000


def test_split_encoder_empty_batch(ray_session):
    # ADVICE r1: an all-filtered (resume) block produced an empty batch that
    # IndexError'd SplitEncoder; both encoders must return an empty pages table
    from raystack.pipeline import (PAGES_SCHEMA, BatchEncoder, SplitEncoder)
    empty = pa.table({"part_key": pa.array([], pa.int64()),
                      "url": pa.array([], pa.string()),
                      "text": pa.array([], pa.string())})
    enc = SplitEncoder(["url", "text"], [], 1024, False)
    out = enc(empty)
    assert out.num_rows == 0 and out.schema.equals(PAGES_SCHEMA)
    out2 = BatchEncoder(["url", "text"])(empty.drop_columns(["part_key"]))
    assert out2.num_rows == 0 and out2.schema.equals(PAGES_SCHEMA)


def test_batch_encoder_page_identity_no_collision(ray_session):
    # VERDICT r1 #5: two batches sharing first value + row count used to get
    # the same pseudo-part_key and silently merge in decode_pages
    from raystack.pipeline import BatchEncoder
    a = pa.table({"url": ["http://a/1", "http://a/2"], "v": [1, 2]})
    b = pa.table({"url": ["http://a/1", "http://b/9"], "v": [3, 4]})
    enc = BatchEncoder()
    ka = enc(a)["part_key"][0].as_py()
    kb = enc(b)["part_key"][0].as_py()
    assert ka != kb


def test_decode_dir_matches_decode_pages(ray_session, web, tmp_path):
    # VERDICT r1 #4: partition-local decode (no all-to-all) must be
    # bit-identical to the global-groupby decode for BOTH encode paths
    import ray.data
    ds = ray.data.read_parquet(web)
    for mode in ("partitioned", "streaming"):
        out = str(tmp_path / f"dd_{mode}")
        if mode == "partitioned":
            pl.encode_partitioned(ds, out, num_partitions=4)
        else:
            pl.encode_streaming(ds, out, num_partitions=4)
        via_dir = _df_by_url(pl.decode_dir(out).to_pandas())
        via_pages = _df_by_url(pl.decode_pages(pl.read_encoded(out))
                               .to_pandas())
        assert sorted(via_dir.columns) == sorted(via_pages.columns)
        for c in sorted(via_dir.columns):
            assert via_dir[c].equals(via_pages[c]), (mode, c)
        # no Aggregate (all-to-all) operator in the decode_dir plan
        stats = pl.decode_dir(out).materialize().stats()
        assert "Aggregate" not in stats


def test_auto_partitions_sizing(ray_session, web, tmp_path):
    # VERDICT r1 #9: num_partitions derives from input bytes (128-512 MB
    # per partition target) instead of a fixed 32
    import ray.data
    from raystack.pipeline import auto_partitions
    ds = ray.data.read_parquet(web)
    p = auto_partitions(ds)
    assert p == 8  # tiny input clamps to the floor
    # a simulated 100 TB input must partition to ~256 MB chunks, not 3 TB
    big = 100 * (1 << 40)
    est = max(8, int(np.ceil(big * 4 / (256 << 20))))
    assert est > 1_000_000
    out = str(tmp_path / "auto")
    summary = pl.encode_partitioned(ds, out)  # num_partitions omitted
    assert summary["rows"] == 3000
    assert mf.load_config(out)["num_partitions"] == 8


def test_driver_analyze_matches_distributed(ray_session, web):
    """Small parquet inputs ANALYZE on the driver (no Ray job); the
    counts must equal the distributed pass exactly — same dict, so the
    derived host_map (and therefore the routing) is identical."""
    from raystack.io import read_parquet_clean
    assert pl._analyze_small(list(web))
    fast = pl._host_counts_driver(list(web), "url")
    slow = pl.collect_host_counts(
        read_parquet_clean(list(web), columns=["url"]), "url")
    assert fast == slow
    # non-parquet or oversized inputs stay on the distributed path
    assert not pl._analyze_small(["a.csv"])
    old = pl._DRIVER_ANALYZE_MAX_BYTES
    try:
        pl._DRIVER_ANALYZE_MAX_BYTES = 10
        assert not pl._analyze_small(list(web))
    finally:
        pl._DRIVER_ANALYZE_MAX_BYTES = old


def test_fused_keyer_pack_matches_plain_path(ray_session, web, tmp_path):
    # the fused read→align→key→pack pipeline (shuffle compression) must
    # produce the same decoded table and manifest as the unfused path
    import ray.data
    out_a = str(tmp_path / "plain_path")
    out_b = str(tmp_path / "fused_path")
    ds = ray.data.read_parquet(web)
    pl.encode_partitioned(ds, out_a, num_partitions=4, hot_hosts={})
    fused = read_aligned(web, add_filename=False,
                         post_align=pl.make_keyer_pack("url", 4, {}))
    cols = ["url", "warc_ts", "html", "text", "lang"]
    pl.encode_partitioned(fused, out_b, columns=cols, num_partitions=4,
                          hot_hosts={})
    a = _df_by_url(pl.decode_dir(out_a).to_pandas())
    b = _df_by_url(pl.decode_dir(out_b).to_pandas())
    for c in cols:
        assert a[c].equals(b[c]), c
    sa = mf.manifest_summary(out_a)
    sb = mf.manifest_summary(out_b)
    assert sa["rows"] == sb["rows"] == 3000


def test_plan_host_partitions_balances(ray_session):
    # frequency-planned assignment: a 30%-share host fans out over many
    # slots and overall partition loads stay near-uniform (the hash-only
    # mapping measured max/mean ≈ 2.2 on the bench corpus)
    import ray.data
    rng = np.random.default_rng(11)
    hosts = [f"www.h{i:03d}.com" for i in range(120)]
    probs = np.array([1.0 / (i + 1) ** 1.3 for i in range(120)])
    probs /= probs.sum()
    idx = rng.choice(120, size=40000, p=probs)
    urls = [f"https://{hosts[i]}/p/{j}" for j, i in enumerate(idx)]
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls)}))
    counts = pl.collect_host_counts(ds)
    P = 16
    hm = pl.plan_host_partitions(counts, P)
    keys = pl.compute_part_keys(pa.array(urls), P, host_map=hm)
    loads = np.bincount(keys, minlength=P)
    assert loads.max() / loads.mean() < 1.25
    assert loads.min() / loads.mean() > 0.75
    # deterministic: same inputs → same keys (retry safety)
    assert np.array_equal(keys, pl.compute_part_keys(pa.array(urls), P,
                                                     host_map=hm))
    # unknown hosts fall back to hashing, still in range
    other = pl.compute_part_keys(pa.array(["https://unseen.xyz/a"]), P,
                                 host_map=hm)
    assert 0 <= other[0] < P


def test_encode_partitioned_tasks_roundtrip(ray_session, web, tmp_path):
    # the raw-task deterministic exchange must produce the same decoded
    # relation and manifest totals as the Dataset groupby path
    out_t = str(tmp_path / "enc_tasks")
    out_g = str(tmp_path / "enc_gby")
    s_t = pl.encode_partitioned_tasks(list(web), out_t, num_partitions=8)
    s_g = pl.encode_partitioned(read_aligned(web, add_filename=True), out_g,
                                num_partitions=8)
    assert s_t["rows"] == s_g["rows"] == 3000
    got = _df_by_url(pl.decode_dir(out_t).to_pandas())
    exp = _df_by_url(read_aligned(web, add_filename=True).to_pandas())
    for col in ["url", "warc_ts", "html", "text", "lang", "filename"]:
        assert got[col].tolist() == exp[col].tolist(), col
    # same partition assignment (same keying math) → same per-partition rows
    mt, mg = mf.load_manifest(out_t), mf.load_manifest(out_g)
    assert {k: v["rows"] for k, v in mt.items()} == \
        {k: v["rows"] for k, v in mg.items()}
    # lineage present
    for row in mt.values():
        assert row["input_files"] and row["codecs"]


def test_encode_tasks_multi_file_maps(ray_session, web, tmp_path):
    # map_bytes huge -> one map task covering all files (the MSEG
    # length-prefixed multi-blob slot format)
    out = str(tmp_path / "enc_mseg")
    s = pl.encode_partitioned_tasks(list(web), out, num_partitions=4,
                                    map_bytes=1 << 40)
    assert s["rows"] == 3000
    got = _df_by_url(pl.decode_dir(out).to_pandas())
    exp = _df_by_url(read_aligned(web, add_filename=True).to_pandas())
    assert got["url"].tolist() == exp["url"].tolist()
    assert got["html"].tolist() == exp["html"].tolist()


def test_encode_tasks_single_partition(ray_session, web, tmp_path):
    # num_partitions=1 exercises the num_returns=1 (single-ref) edge
    out = str(tmp_path / "enc_p1")
    s = pl.encode_partitioned_tasks(list(web), out, num_partitions=1)
    assert s["rows"] == 3000
    assert pl.decode_dir(out).count() == 3000


def test_encode_tasks_resume(ray_session, web, tmp_path):
    out = str(tmp_path / "enc_tres")
    pl.encode_partitioned_tasks(list(web), out, num_partitions=8)
    m1 = mf.load_manifest(out)
    # wipe two partitions from the manifest; resume must re-encode ONLY them
    import os as _os
    done = sorted(m1, key=int)
    redo = set(done[:2])
    mf_path = _os.path.join(out, "_manifest", "manifest.json")
    mm = json.load(open(mf_path))
    for k in redo:
        del mm[k]
    json.dump(mm, open(mf_path, "w"))
    import time as _time
    mtimes = {d: _os.path.getmtime(_os.path.join(out, "pages", d))
              for d in _os.listdir(_os.path.join(out, "pages"))}
    _time.sleep(0.05)
    s = pl.encode_partitioned_tasks(list(web), out, num_partitions=8,
                                    resume=True)
    m2 = mf.load_manifest(out)
    assert m1.keys() == m2.keys()
    assert s["rows"] == 3000
    for d, old in mtimes.items():
        k = d.split("=", 1)[1]
        changed = _os.path.getmtime(_os.path.join(out, "pages", d)) != old
        assert changed == (k in redo), (d, changed)
    assert pl.decode_dir(out).count() == 3000


def test_encode_tasks_csv_inputs(ray_session, tmp_path):
    # the reference is CSV-first: drifting CSVs go through the same task
    # exchange (sniffed dialect + unified types in the map reader)
    import csv as _csv
    rows0 = [("https://a.com/x%d" % i, 20200101 + i, "t%d" % i, "en")
             for i in range(50)]
    rows1 = [("https://b.org/y%d" % i, 20200201 + i, "u%d" % i, "de")
             for i in range(50)]
    p0, p1 = str(tmp_path / "a.csv"), str(tmp_path / "b.csv")
    with open(p0, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["url", "warc_ts", "text", "lang"])
        w.writerows(rows0)
    with open(p1, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["url", "warc_ts", "body", "lang"])  # drift: body
        w.writerows(rows1)
    out = str(tmp_path / "enc_csv")
    s = pl.encode_partitioned_tasks([p0, p1], out,
                                    columns_rename={"body": "text"},
                                    num_partitions=4)
    assert s["rows"] == 100
    got = _df_by_url(pl.decode_dir(out).to_pandas())
    from raystack.sources.csv import read_aligned_csv
    exp = _df_by_url(read_aligned_csv([p0, p1],
                                      columns_rename={"body": "text"})
                     .to_pandas())
    for col in ["url", "warc_ts", "text", "lang", "filename"]:
        assert got[col].tolist() == exp[col].tolist(), col


def test_encode_tasks_precode_matches_plain(ray_session, web, tmp_path):
    # the precoded heavy-column path (map-side final pages for plain-family
    # codecs) must decode to the identical relation as precode=False
    out_p = str(tmp_path / "enc_pc")
    out_n = str(tmp_path / "enc_npc")
    pl.encode_partitioned_tasks(list(web), out_p, num_partitions=8,
                                precode=True)
    pl.encode_partitioned_tasks(list(web), out_n, num_partitions=8,
                                precode=False)
    a = _df_by_url(pl.decode_dir(out_p).to_pandas())
    b = _df_by_url(pl.decode_dir(out_n).to_pandas())
    for col in ["url", "warc_ts", "html", "text", "lang", "filename"]:
        assert a[col].tolist() == b[col].tolist(), col
    # heavy columns exist as precoded pages: at least one column has more
    # pages than the standard 65536-row pagination would produce
    import pyarrow.dataset as pads
    pages = pads.dataset(out_p + "/pages", partitioning="hive") \
        .to_table(columns=["column", "codec"]).to_pandas()
    assert (pages.groupby("column")["codec"].first()
            .isin(["plain+zs", "plain+z", "plain"]).any())
    # checksum audit stays green on the precoded layout
    res = pl.verify_encoded(out_p)
    assert res["bad"] == [] and res["missing"] == []


def test_prepacked_requires_explicit_routing(ray_session, web, tmp_path):
    # pre_packed=True can't re-derive the keyer's config; silent defaults
    # would persist a wrong routing config for lookup_rows (ADVICE r2)
    fused = read_aligned(web, add_filename=False,
                         post_align=pl.make_keyer_pack("url", 4, {}))
    cols = ["url", "warc_ts", "html", "text", "lang"]
    with pytest.raises(ValueError, match="SAME"):
        pl.encode_partitioned(fused, str(tmp_path / "e0"), columns=cols,
                              pre_packed=True)


def test_prepacked_routing_mismatch_detected(ray_session, web, tmp_path):
    # keyed with P=4 but encoded claiming P=5: the per-group routing audit
    # must fail the job instead of persisting a config lookup_rows would
    # silently miss with
    fused = read_aligned(web, add_filename=False,
                         post_align=pl.make_keyer_pack("url", 4, {}))
    cols = ["url", "warc_ts", "html", "text", "lang"]
    with pytest.raises(Exception, match="do not match"):
        pl.encode_partitioned(fused, str(tmp_path / "e1"), columns=cols,
                              pre_packed=True, num_partitions=5,
                              hot_hosts={})


def test_precode_map_is_driver_decided(web):
    # the column→codec precode map is fixed once on the driver (not
    # per-worker): deterministic across calls, plain-family codecs only
    from raystack.plan import build_plan
    plan = build_plan(list(web), add_filename=False)
    enc_cols = list(plan.target_columns)
    m1 = pl.plan_precode_columns(list(web), plan, enc_cols)
    m2 = pl.plan_precode_columns(list(web), plan, enc_cols)
    assert m1 == m2
    assert set(m1.values()) <= pl._PRECODE_CODECS
    # the html/text payloads of this corpus are plain-family (that is what
    # makes the precode fast path worth having)
    assert "html" in m1


def test_precode_divergence_detected(tmp_path):
    # a column arriving precoded (heavy) from one map task and light from
    # another must fail LOUDLY at reduce time, not silently drop rows
    # (ADVICE r2 high: per-worker codec divergence)
    t = pa.table({"url": pa.array([f"u{i}" for i in range(8)]),
                  "text": pa.array(["x" * 50] * 8),
                  "part_key": pa.array([0] * 8, pa.int64())})
    blob_heavy = pl._pack_dense(t, 1, None, {"text": "plain+zs"})[0]
    blob_light = pl._pack_dense(t, 1, None, None)[0]
    with pytest.raises(ValueError, match="both"):
        pl._encode_part_task(0, str(tmp_path / "enc"), ["url", "text"],
                             [], 65536, False, None, blob_heavy, blob_light)


def test_encode_append_incremental(ray_session, tmp_path):
    # day-1 encode + day-2 append == single encode of the full corpus
    # (url-keyed comparison; appended rows also reachable via lookup_rows)
    import duckdb
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "source", "n_chars"])
    day1 = str(tmp_path / "day1.parquet")
    day2 = str(tmp_path / "day2.parquet")
    pq.write_table(t.slice(0, 300), day1)
    pq.write_table(t.slice(300), day2)
    out = str(tmp_path / "enc")

    pl.encode_partitioned_tasks([day1], out, url_col="source",
                                num_partitions=4, add_filename=False,
                                zone_columns=["doc_id"])
    s1 = pl.encode_append([day2], out, add_filename=False)
    assert s1["rows"] == t.num_rows

    got = pl.decode_dir(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    want = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got[want.columns.tolist()].equals(want)

    # appended rows route through the persisted config
    some = t.slice(300, 3)["source"].to_pylist()
    found = pl.lookup_rows(out, some).to_pandas()
    assert set(some) <= set(found["source"])

    # touched partitions' zone sidecars were invalidated, not left stale
    from raystack.zones import zone_prune_plan
    plan = zone_prune_plan(out, {"doc_id": (0, 10)})
    import os as _os
    import json as _json
    for d, pages in plan.items():
        zmeta = _os.path.join(out, "zones", d, "meta.json")
        if pages is not None:  # still has a sidecar → must not be stale
            meta = _json.load(open(zmeta))
            assert meta["columns"] == ["doc_id"]
            # a surviving sidecar implies the partition got no appends;
            # verify by checking it still has exactly one page file
            pdir = _os.path.join(out, "pages", d)
            assert len([f for f in _os.listdir(pdir)
                        if f.endswith(".parquet")]) == 1


def test_encode_append_schema_mismatch(ray_session, tmp_path):
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "source"])
    day1 = str(tmp_path / "day1.parquet")
    bad = str(tmp_path / "bad.parquet")
    pq.write_table(t.slice(0, 100), day1)
    pq.write_table(t.slice(100).drop_columns(["text"]), bad)
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([day1], out, url_col="source",
                                num_partitions=2, add_filename=False)
    with pytest.raises(ValueError, match="columns"):
        pl.encode_append([bad], out, add_filename=False)
    with pytest.raises(FileNotFoundError):
        pl.encode_append([day1], str(tmp_path / "nowhere"),
                         add_filename=False)


def test_compact_partitions_after_appends(ray_session, tmp_path):
    # three appends → multiple files per partition; compaction restores
    # one file per partition with identical decoded content
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "source", "n_chars"])
    parts = [str(tmp_path / f"d{i}.parquet") for i in range(3)]
    for i, p in enumerate(parts):
        pq.write_table(t.slice(i * 150, 150 if i < 2 else None), p)
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([parts[0]], out, url_col="source",
                                num_partitions=4, add_filename=False)
    pl.encode_append([parts[1]], out, add_filename=False)
    pl.encode_append([parts[2]], out, add_filename=False)

    import os as _os
    n_files_before = sum(
        len([f for f in _os.listdir(_os.path.join(out, "pages", d))
             if f.endswith(".parquet")])
        for d in _os.listdir(_os.path.join(out, "pages")))
    assert n_files_before > 4  # appends really stacked files

    before = pl.decode_dir(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    s = pl.compact_partitions(out, min_files=2, zone_columns=["doc_id"])
    assert s["compacted"] >= 1 and s["rows"] == t.num_rows
    for d in _os.listdir(_os.path.join(out, "pages")):
        files = [f for f in _os.listdir(_os.path.join(out, "pages", d))
                 if f.endswith(".parquet")]
        assert len(files) == 1, d
    after = pl.decode_dir(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert after.equals(before)

    # rebuilt sidecars prune again
    from raystack.zones import zone_prune_plan
    plan = zone_prune_plan(out, {"doc_id": (0, 5)})
    assert plan and all(p is not None for p in plan.values())


def test_encode_append_idempotent_rerun(ray_session, tmp_path):
    # re-running the same append (crash recovery / task retry semantics)
    # must replace its own output, never duplicate rows
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "source"])
    day1 = str(tmp_path / "day1.parquet")
    day2 = str(tmp_path / "day2.parquet")
    pq.write_table(t.slice(0, 300), day1)
    pq.write_table(t.slice(300), day2)
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([day1], out, url_col="source",
                                num_partitions=4, add_filename=False)
    pl.encode_append([day2], out, add_filename=False)
    s2 = pl.encode_append([day2], out, add_filename=False)  # same file set
    assert s2["rows"] == t.num_rows  # not t.num_rows + 200
    got = pl.decode_dir(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    want = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got[want.columns.tolist()].equals(want)


def test_encode_append_union_schema_drift(ray_session, tmp_path):
    # day-2 files DROP a column and ADD a new one; schema="union" must
    # absorb both drifts so the layout decodes exactly like one fresh
    # union encode of all files (d6tstack union-align semantics applied
    # to an encoded layout)
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "source", "n_chars"])
    day1 = str(tmp_path / "day1.parquet")
    day2 = str(tmp_path / "day2.parquet")
    pq.write_table(t.slice(0, 300).drop_columns(["n_chars"]), day1)
    pq.write_table(t.slice(300).drop_columns(["text"]), day2)
    out = str(tmp_path / "enc")
    ref = str(tmp_path / "ref")

    pl.encode_partitioned_tasks([day1], out, url_col="source",
                                num_partitions=4, add_filename=False)
    # strict mode refuses the drift (and points at the union escape hatch)
    with pytest.raises(ValueError, match="columns"):
        pl.encode_append([day2], out, add_filename=False)
    s = pl.encode_append([day2], out, add_filename=False, schema="union")
    assert s["rows"] == t.num_rows

    pl.encode_partitioned_tasks([day1, day2], ref, url_col="source",
                                num_partitions=4, add_filename=False)
    got = pl.decode_dir(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    want = pl.decode_dir(ref).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert sorted(got.columns) == sorted(want.columns)
    assert got[sorted(got.columns)].equals(want[sorted(want.columns)])
    # drift landed as real nulls on both sides of the day boundary
    assert got["n_chars"].isna().sum() == 300
    assert got["text"].isna().sum() == t.num_rows - 300

    # appended rows still route through the persisted keyer config
    some = t.slice(300, 3)["source"].to_pylist()
    found = pl.lookup_rows(out, some).to_pandas()
    assert set(some) <= set(found["source"])


def test_encode_append_union_missing_only(ray_session, tmp_path):
    # union with only a MISSING column (no new ones): no back-fill pages,
    # appended rows null-fill the gap with the layout's stored type
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "source"])
    day1 = str(tmp_path / "day1.parquet")
    day2 = str(tmp_path / "day2.parquet")
    pq.write_table(t.slice(0, 200), day1)
    pq.write_table(t.slice(200).drop_columns(["text"]), day2)
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([day1], out, url_col="source",
                                num_partitions=2, add_filename=False)
    pl.encode_append([day2], out, add_filename=False, schema="union")
    got = pl.decode_dir(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert got["text"].notna().sum() == 200
    assert str(got["text"].dtype) == "object"  # stored string type, not f64
    want = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].equals(want["doc_id"])
    day1_ids = set(t.slice(0, 200)["doc_id"].to_pylist())
    assert set(got.loc[got["text"].notna(), "doc_id"]) == day1_ids
    w1 = t.slice(0, 200).to_pandas().sort_values("doc_id")
    assert got.loc[got["text"].notna()].sort_values("doc_id")["text"] \
        .tolist() == w1["text"].tolist()


def test_encode_append_union_rerun_and_compact(ray_session, tmp_path):
    # re-running the same drifted append replaces its output (no dup
    # rows, no dup back-fill pages); compaction then folds the null
    # pages away with identical decoded content
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "source", "n_chars"])
    day1 = str(tmp_path / "day1.parquet")
    day2 = str(tmp_path / "day2.parquet")
    pq.write_table(t.slice(0, 300).drop_columns(["n_chars"]), day1)
    pq.write_table(t.slice(300), day2)
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([day1], out, url_col="source",
                                num_partitions=4, add_filename=False)
    pl.encode_append([day2], out, add_filename=False, schema="union")
    s2 = pl.encode_append([day2], out, add_filename=False, schema="union")
    assert s2["rows"] == t.num_rows
    before = pl.decode_dir(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert before["n_chars"].isna().sum() == 300
    pl.compact_partitions(out, min_files=2)
    after = pl.decode_dir(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert after[sorted(after.columns)].equals(before[sorted(before.columns)])
    # compaction re-encoded the null ranges: no "nulls" pages remain
    import pyarrow.dataset as pads
    codecs = pads.dataset(os.path.join(out, "pages"), partitioning="hive") \
        .to_table(columns=["codec"])
    assert "nulls" not in set(codecs["codec"].to_pylist())


def test_encode_append_precode_heavy(ray_session, web, tmp_path):
    # appends precode heavy (html) columns map-side like the first
    # encode: day1 + precoded append ≡ full encode, and the appended
    # html pages actually arrive precoded (plain-family codec at a page
    # index past the first encode's)
    out = str(tmp_path / "enc")
    ref = str(tmp_path / "ref")
    day1, day2 = list(web)[:2], list(web)[2:]
    pl.encode_partitioned_tasks(day1, out, num_partitions=4)
    s = pl.encode_append(day2, out)
    pl.encode_partitioned_tasks(list(web), ref, num_partitions=4)
    assert s["rows"] == 3000
    got = _df_by_url(pl.decode_dir(out).to_pandas())
    exp = _df_by_url(pl.decode_dir(ref).to_pandas())
    for col in ["url", "warc_ts", "html", "text", "lang", "filename"]:
        assert got[col].tolist() == exp[col].tolist(), col
    # the appended html pages are map-side precoded (plain-family),
    # not re-encoded at the reduce
    import pyarrow.dataset as pads
    meta = pads.dataset(os.path.join(out, "pages"), partitioning="hive") \
        .to_table(columns=["column", "page_idx", "codec"])
    html = meta.filter(pa.compute.equal(meta["column"], "html")).to_pandas()
    appended = html[html["page_idx"] > html["page_idx"].min()]
    assert len(appended) and all(
        c.startswith("plain") for c in appended["codec"])
    # precode=False still decodes identically (codec choice is metadata)
    out2 = str(tmp_path / "enc2")
    pl.encode_partitioned_tasks(day1, out2, num_partitions=4)
    pl.encode_append(day2, out2, precode=False)
    got2 = _df_by_url(pl.decode_dir(out2).to_pandas())
    assert got2["html"].tolist() == exp["html"].tolist()


def test_layout_stats(ray_session, web, tmp_path):
    out = str(tmp_path / "enc")
    day1, day2 = list(web)[:2], list(web)[2:]
    pl.encode_partitioned_tasks(day1, out, num_partitions=4,
                                zone_columns=["warc_ts"])
    s1 = pl.layout_stats(out)
    assert s1["partitions"] == 4 and s1["rows"] == 1500
    assert s1["max_files_per_partition"] == 1
    assert s1["multi_file_partitions"] == 0
    assert s1["zone_sidecars"] == 4
    assert 0 < s1["compression"] < 1
    assert "html" in s1["codec_mix"] and s1["config"]["num_partitions"] == 4
    pl.encode_append(day2, out)
    s2 = pl.layout_stats(out)
    assert s2["rows"] == 3000
    assert s2["multi_file_partitions"] >= 1  # append accumulation visible
    assert s2["zone_sidecars"] < 4  # touched sidecars invalidated


def test_alter_layout_drop_rename(ray_session, web, tmp_path):
    # metadata-only column maintenance: drop + rename without re-encoding
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks(list(web), out, num_partitions=4,
                                zone_columns=["warc_ts", "lang"])
    s = pl.alter_layout(out, drop=["lang"], rename={"warc_ts": "fetched"})
    assert s["rows"] == 3000
    got = _df_by_url(pl.decode_dir(out).to_pandas())
    exp = _df_by_url(read_aligned(web, add_filename=True).to_pandas())
    assert "lang" not in got.columns and "warc_ts" not in got.columns
    assert got["fetched"].tolist() == exp["warc_ts"].tolist()
    assert got["html"].tolist() == exp["html"].tolist()
    # zone sidecar followed the rename, dropped column's is gone
    import glob as _glob
    zfiles = {os.path.basename(p) for p in _glob.glob(
        os.path.join(out, "zones", "*", "*.parquet"))}
    # fetched = renamed warc_ts zone map; url = the key's bloom sidecar
    # every fresh encode writes for point-lookup page pruning
    assert zfiles == {"fetched.parquet", "url.parquet"}
    # pruned decode still works on the renamed column
    from raystack.zones import count_where
    import datetime as _dt
    n = count_where(out, {"fetched": (_dt.datetime(2024, 3, 1),
                                      _dt.datetime(2024, 3, 2))})
    assert 0 < n <= 3000
    # lookup routing survives (url untouched here)
    some = exp["url"].iloc[:2].tolist()
    assert set(pl.lookup_rows(out, some).to_pandas()["url"]) == set(some)
    # guards
    with pytest.raises(ValueError, match="routing key"):
        pl.alter_layout(out, drop=["url"])
    with pytest.raises(ValueError, match="not in layout"):
        pl.alter_layout(out, drop=["nope"])
    with pytest.raises(ValueError, match="already exist"):
        pl.alter_layout(out, rename={"text": "html"})
    # renaming the routing key updates the persisted config
    pl.alter_layout(out, rename={"url": "uri"})
    assert mf.load_config(out)["url_col"] == "uri"
    assert set(pl.lookup_rows(out, some).to_pandas()["uri"]) == set(some)


def test_encode_append_union_csv_inputs(ray_session, tmp_path):
    # union drift absorption must work through the CSV plan branch too
    import csv
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "source", "n_chars"])
    df = t.to_pandas()

    def wcsv(path, frame, cols):
        frame[cols].to_csv(path, index=False, quoting=csv.QUOTE_MINIMAL)
    day1, day2 = str(tmp_path / "d1.csv"), str(tmp_path / "d2.csv")
    wcsv(day1, df.iloc[:200], ["doc_id", "text", "source"])
    wcsv(day2, df.iloc[200:], ["doc_id", "source", "n_chars"])
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([day1], out, url_col="source",
                                num_partitions=2, add_filename=False)
    s = pl.encode_append([day2], out, add_filename=False, schema="union")
    assert s["rows"] == len(df)
    got = pl.decode_dir(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert got["text"].isna().sum() == len(df) - 200
    assert got["n_chars"].isna().sum() == 200
    assert got["doc_id"].tolist() == sorted(df["doc_id"])


def test_encode_append_onto_groupby_layout(ray_session, web, tmp_path):
    # appends must also work on layouts created by the Dataset-groupby
    # encode path (same persisted config contract as the tasks path)
    out = str(tmp_path / "enc")
    day1, day2 = list(web)[:2], list(web)[2:]
    pl.encode_partitioned(read_aligned(day1, add_filename=False), out,
                          num_partitions=4)
    s = pl.encode_append(day2, out, add_filename=False)
    assert s["rows"] == 3000
    got = _df_by_url(pl.decode_dir(out).to_pandas())
    exp = _df_by_url(read_aligned(web, add_filename=False).to_pandas())
    for col in ["url", "warc_ts", "html", "text", "lang"]:
        assert got[col].tolist() == exp[col].tolist(), col


def test_alter_layout_swap_rename_sidecars(ray_session, web, tmp_path):
    # regression: swap renames are applied simultaneously to the page
    # labels but used to clobber zone sidecar files sequentially,
    # leaving stale min/max under the wrong name (silent wrong pruning)
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks(list(web), out, num_partitions=2,
                                zone_columns=["warc_ts", "lang"])
    import pyarrow.parquet as _pq
    import glob as _glob
    def zstats(col):
        vals = []
        for p in sorted(_glob.glob(os.path.join(out, "zones", "*",
                                                f"{col}.parquet"))):
            z = _pq.read_table(p)
            vals.append((z["zmin"][0].as_py(), z["zmax"][0].as_py()))
        return vals
    before_ts, before_lang = zstats("warc_ts"), zstats("lang")
    pl.alter_layout(out, rename={"warc_ts": "lang", "lang": "warc_ts"})
    # sidecars swapped with the data, not clobbered
    assert zstats("lang") == before_ts
    assert zstats("warc_ts") == before_lang
    got = _df_by_url(pl.decode_dir(out).to_pandas())
    exp = _df_by_url(read_aligned(web, add_filename=True).to_pandas())
    assert got["lang"].tolist() == exp["warc_ts"].tolist()
    assert got["warc_ts"].tolist() == exp["lang"].tolist()


def test_encode_append_union_type_drift(ray_session, tmp_path):
    # a column present on both sides but with a DIFFERENT type in the
    # new files aligns to the layout's stored type (widening works; an
    # incompatible drift fails loudly BEFORE anything is committed)
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "source", "n_chars"])
    day1 = str(tmp_path / "day1.parquet")
    day2 = str(tmp_path / "day2.parquet")
    day_bad = str(tmp_path / "bad.parquet")
    pq.write_table(t.slice(0, 300), day1)
    d2 = t.slice(300)
    d2 = d2.set_column(d2.schema.get_field_index("n_chars"), "n_chars",
                       d2["n_chars"].cast(pa.int32()))  # narrower type
    pq.write_table(d2, day2)
    bad = t.slice(300).set_column(
        t.schema.get_field_index("text"), "text",
        pa.array([[1]] * (t.num_rows - 300), pa.list_(pa.int64())))
    pq.write_table(bad, day_bad)
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([day1], out, url_col="source",
                                num_partitions=2, add_filename=False)
    pl.encode_append([day2], out, add_filename=False, schema="union")
    got = pl.decode_dir(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    want = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["n_chars"].tolist() == want["n_chars"].tolist()  # int64
    # incompatible drift (string column arriving as list<int64>) fails
    # loudly and commits nothing
    out2 = str(tmp_path / "enc2")
    pl.encode_partitioned_tasks([day1], out2, url_col="source",
                                num_partitions=2, add_filename=False)
    before = pl.decode_dir(out2).to_pandas()
    with pytest.raises(Exception):
        pl.encode_append([day_bad], out2, add_filename=False,
                         schema="union")
    after = pl.decode_dir(out2).to_pandas()
    assert len(after) == len(before) == 300


def test_encode_append_tag_uses_full_paths(ray_session, tmp_path):
    # regression: the idempotency tag hashed BASENAMES, so two different
    # days' increments named alike (data/<date>/batch.parquet) collided
    # and day 2 silently REPLACED day 1's rows
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "source"])
    d0 = tmp_path / "day0"; d1 = tmp_path / "d1"; d2 = tmp_path / "d2"
    for d in (d0, d1, d2):
        d.mkdir()
    pq.write_table(t.slice(0, 200), str(d0 / "base.parquet"))
    pq.write_table(t.slice(200, 150), str(d1 / "batch.parquet"))
    pq.write_table(t.slice(350), str(d2 / "batch.parquet"))  # same name!
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([str(d0 / "base.parquet")], out,
                                url_col="source", num_partitions=2,
                                add_filename=False)
    pl.encode_append([str(d1 / "batch.parquet")], out, add_filename=False)
    s = pl.encode_append([str(d2 / "batch.parquet")], out,
                         add_filename=False)
    assert s["rows"] == t.num_rows  # day 1's append must survive
    got = pl.decode_dir(out).to_pandas()
    assert sorted(got["doc_id"]) == sorted(t["doc_id"].to_pylist())
    # re-running day 2 is still idempotent (same full path → same tag)
    s2 = pl.encode_append([str(d2 / "batch.parquet")], out,
                          add_filename=False)
    assert s2["rows"] == t.num_rows


def test_derive_column_attaches_without_reencode(ray_session, tmp_path):
    """The backfill verb: a computed column lands as one new page file
    per partition, every pre-existing byte untouched; decode/lookup see
    it, time travel shows the layout without it, compaction folds it in."""
    import pyarrow.compute as pc_mod

    from raystack import snapshots as sn
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "source"])
    day1 = str(tmp_path / "day1.parquet")
    pq.write_table(t, day1)
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([day1], out, url_col="source",
                                num_partitions=4, add_filename=False)
    pages_root = os.path.join(out, "pages")
    before = {
        os.path.join(d, f): os.path.getsize(
            os.path.join(pages_root, d, f))
        for d in os.listdir(pages_root)
        for f in os.listdir(os.path.join(pages_root, d))
        if f.endswith(".parquet")}

    pl.derive_column(out, lambda tb: pc_mod.utf8_length(tb["text"]),
                     "text_chars", input_columns=["text"])

    # every pre-existing file is byte-for-byte untouched; exactly one
    # new file per partition
    after = {
        os.path.join(d, f): os.path.getsize(
            os.path.join(pages_root, d, f))
        for d in os.listdir(pages_root)
        for f in os.listdir(os.path.join(pages_root, d))
        if f.endswith(".parquet")}
    assert all(after[k] == v for k, v in before.items())
    new_files = sorted(set(after) - set(before))
    assert len(new_files) == 4 and all("text_chars" in f
                                       for f in new_files)

    got = pl.decode_dir(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    want = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["text_chars"].tolist() == \
        [len(s) for s in want["text"]]
    assert got["text"].tolist() == want["text"].tolist()

    # point lookups return the derived column too
    some = want["source"].iloc[:2].tolist()
    found = pl.lookup_rows(out, some, columns=["source", "text_chars"])
    assert "text_chars" in found.to_pandas().columns

    # snapshot: the derive is a recorded, reversible step
    snaps = sn.list_snapshots(out)
    assert snaps[-1]["op"] == "derive:text_chars"
    pre = pl.decode_dir(out, snapshot=snaps[-2]["id"]).to_pandas()
    assert "text_chars" not in pre.columns

    # guards
    with pytest.raises(ValueError, match="already exists"):
        pl.derive_column(out, lambda tb: tb["text"], "text_chars",
                         input_columns=["text"])
    with pytest.raises(ValueError, match="not in layout"):
        pl.derive_column(out, lambda tb: tb["nope"], "x",
                         input_columns=["nope"])
    with pytest.raises(Exception, match="rows"):
        pl.derive_column(
            out, lambda tb: pc_mod.utf8_length(tb["text"]).slice(1),
            "bad", input_columns=["text"])

    # compaction folds the derived column into the single base file
    pl.compact_partitions(out, min_files=2)
    got2 = pl.decode_dir(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert got2["text_chars"].tolist() == got["text_chars"].tolist()
    stats = pl.layout_stats(out)
    assert stats["max_files_per_partition"] == 1


def test_delete_rows_keys_predicate_and_wipe(ray_session, tmp_path):
    """The retention verb: key deletes touch only routed partitions
    (others byte-identical), predicate deletes only decode their input
    columns on non-matching partitions, time travel still reads the
    pre-delete rows, and a full wipe leaves a readable empty layout."""
    import pyarrow.compute as pc_mod

    from raystack import snapshots as sn
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "source"])
    day1 = str(tmp_path / "day1.parquet")
    pq.write_table(t, day1)
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([day1], out, url_col="source",
                                num_partitions=4, add_filename=False)
    pages_root = os.path.join(out, "pages")

    def sizes():
        return {
            os.path.join(d, f): os.path.getsize(
                os.path.join(pages_root, d, f))
            for d in os.listdir(pages_root)
            for f in os.listdir(os.path.join(pages_root, d))
            if f.endswith(".parquet")}

    victim = sorted(set(t["source"].to_pylist()))[0]
    n_victim = pc_mod.sum(
        pc_mod.equal(t["source"], victim)).as_py()
    before = sizes()
    s = pl.delete_rows(out, keys=[victim])
    assert s["deleted_rows"] == n_victim > 0
    assert s["rewritten_partitions"] == 1
    after = sizes()
    untouched = [k for k in before if k in after
                 and after[k] == before[k]]
    # 3 of 4 partitions never rewrote (one key routes to one partition)
    assert len({k.split("/")[0] for k in untouched}) == 3

    got = pl.decode_dir(out).to_pandas()
    assert victim not in set(got["source"])
    assert len(got) == t.num_rows - n_victim
    # the surviving rows are bit-exact
    want = t.filter(pc_mod.not_equal(t["source"], victim)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert got["text"].tolist() == want["text"].tolist()

    # snapshot log: pre-delete state still reads the victim's rows
    snaps = sn.list_snapshots(out)
    assert snaps[-1]["op"] == "delete"
    pre = pl.decode_dir(out, snapshot=snaps[-2]["id"]).to_pandas()
    assert (pre["source"] == victim).sum() == n_victim

    # point lookup of a deleted key finds nothing
    found = pl.lookup_rows(out, [victim])
    assert found is None or found.count() == 0

    # predicate mode: drop short docs everywhere
    n_short = pc_mod.sum(pc_mod.less(
        pc_mod.utf8_length(t["text"]), 120)).as_py()
    s2 = pl.delete_rows(
        out, predicate=lambda tb: pc_mod.less(
            pc_mod.utf8_length(tb["text"]), 120),
        predicate_columns=["text"])
    got2 = pl.decode_dir(out).to_pandas()
    assert (got2["text"].str.len() >= 120).all()
    assert s2["deleted_rows"] + len(got2) == len(got)
    assert s2["deleted_rows"] <= n_short  # victim rows already gone

    # guards
    with pytest.raises(ValueError, match="exactly one"):
        pl.delete_rows(out)
    with pytest.raises(ValueError, match="exactly one"):
        pl.delete_rows(out, keys=["x"],
                       predicate=lambda tb: [], predicate_columns=["text"])
    with pytest.raises(ValueError, match="predicate_columns"):
        pl.delete_rows(out, predicate=lambda tb: [])
    with pytest.raises(Exception, match="rows"):
        pl.delete_rows(out, predicate=lambda tb: pa.array([True]),
                       predicate_columns=["text"])

    # full wipe: every partition becomes a readable zero-row layout
    s3 = pl.delete_rows(
        out, predicate=lambda tb: pa.array([True] * tb.num_rows),
        predicate_columns=["doc_id"])
    assert s3["deleted_rows"] == len(got2)
    wiped = pl.decode_dir(out).to_pandas()
    assert len(wiped) == 0
    assert pl.layout_stats(out)["rows"] == 0


def test_delete_rows_ds_parity_and_upsert(ray_session, tmp_path):
    """keys_ds= (Dataset-scale takedown) produces the exact layout the
    driver-list path does; upsert_rows ≡ fresh encode of (old rows whose
    key is absent from the increment) ∪ increment."""
    import pyarrow.compute as pc_mod
    import ray.data

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "source"])
    day1 = str(tmp_path / "day1.parquet")
    pq.write_table(t, day1)
    victims = sorted(set(t["source"].to_pylist()))[:2]

    outs = {}
    for mode in ("list", "ds"):
        out = str(tmp_path / f"enc_{mode}")
        pl.encode_partitioned_tasks([day1], out, url_col="source",
                                    num_partitions=4, add_filename=False)
        if mode == "list":
            pl.delete_rows(out, keys=victims)
        else:
            pl.delete_rows(out, keys_ds=ray.data.from_arrow(
                pa.table({"source": pa.array(victims)})))
        outs[mode] = pl.decode_dir(out).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
    assert outs["list"].equals(outs["ds"])
    assert not set(victims) & set(outs["ds"]["source"])

    # upsert: day2 re-crawls one surviving source (text changes) and
    # adds a brand-new source
    out = str(tmp_path / "enc_ds")
    recrawl_src = sorted(set(outs["ds"]["source"]))[0]
    old = pa.table(outs["ds"])
    re_mask = pc_mod.equal(old["source"], recrawl_src)
    day2_t = pa.table({
        "doc_id": pa.array(
            [90000 + i for i in range(
                pc_mod.sum(re_mask).as_py() + 3)]),
        "text": pa.array(
            ["recrawled " + s for s in
             old.filter(re_mask)["text"].to_pylist()] +
            ["brand new doc %d" % i for i in range(3)]),
        "source": pa.array(
            [recrawl_src] * pc_mod.sum(re_mask).as_py() +
            ["https://new.example/x"] * 3),
    }).select(old.column_names).cast(old.schema)
    day2 = str(tmp_path / "day2.parquet")
    pq.write_table(day2_t, day2)

    s = pl.upsert_rows([day2], out, add_filename=False)
    assert s["replaced_rows"] == pc_mod.sum(re_mask).as_py()
    got = pl.decode_dir(out).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = pa.concat_tables([
        old.filter(pc_mod.invert(re_mask)), day2_t]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
    assert got["source"].tolist() == want["source"].tolist()
    # the recrawled source's rows are all the NEW snapshot
    assert all(s.startswith("recrawled ") or s.startswith("brand new")
               for s in got[got["source"] == recrawl_src]["text"]
               .tolist())

    # upsert of the SAME increment again replaces its own rows (stable)
    s2 = pl.upsert_rows([day2], out, add_filename=False)
    assert s2["replaced_rows"] == day2_t.num_rows
    got2 = pl.decode_dir(out).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got2["text"].tolist() == got["text"].tolist()


def test_compact_preserves_lineage_and_replays_crash(ray_session, web,
                                                     tmp_path):
    import json
    out = str(tmp_path / "enc")
    day1, day2 = list(web)[:2], list(web)[2:]
    pl.encode_partitioned_tasks(day1, out, num_partitions=2)
    pl.encode_append(day2, out)
    # lineage before: both days' files across the partition's page files
    pre = set()
    for row in mf.load_manifest(out).values():
        pre.update(row["input_files"])
    pl.compact_partitions(out, min_files=2)
    post = set()
    for row in mf.load_manifest(out).values():
        post.update(row["input_files"])
    # compaction must not erase provenance — it unions EVERY page file's
    # lineage, so the post set covers all four input files (the
    # pre-compact manifest surfaced only the first page's day-1 files)
    assert pre <= post
    assert post == {os.path.basename(p) for p in web}
    before = pl.decode_dir(out).to_pandas().sort_values("url") \
        .reset_index(drop=True)

    # simulate a crash AFTER install but BEFORE cleanup: duplicate the
    # base file under an append-style name and leave a matching journal
    # (legacy format — "remove" + no "base"/"gen" keys — exercising the
    # pre-snapshot-log compatibility path; compact writes part-c<gen>
    # bases now, so point the legacy journal's implied part-0 base at it)
    import hashlib
    import shutil as _sh
    pdir = os.path.join(out, "pages", "part_key=0")
    base_name = next(f for f in os.listdir(pdir) if f.startswith("part-c"))
    base = os.path.join(pdir, base_name)
    _sh.copy(base, os.path.join(pdir, "part-deadbeef.parquet"))
    _sh.copy(base, os.path.join(pdir, "part-0.parquet"))
    with open(os.path.join(pdir, ".compact-journal.json"), "w") as f:
        json.dump({"digest": hashlib.sha1(open(base, "rb").read())
                   .hexdigest(),
                   "remove": ["part-deadbeef.parquet", base_name]}, f)
    # the journal replay retires the leftover even below min_files
    pl.compact_partitions(out, min_files=99)
    assert not os.path.exists(os.path.join(pdir, "part-deadbeef.parquet"))
    assert not os.path.exists(os.path.join(pdir, ".compact-journal.json"))
    after = pl.decode_dir(out).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert after.equals(before)


# ---------------------------------------------------------------------------
# encode_sharded: the auto-shard orchestrator (bounded driver refs)
# ---------------------------------------------------------------------------

def _decoded_sorted(out: str) -> pd.DataFrame:
    df = pl.decode_dir(out).to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True) \
        [sorted(df.columns)]


def test_encode_sharded_equals_single_job(ray_session, tmp_path):
    # 8 files, tiny map_bytes → one map group per file; max_refs sized so
    # each shard holds 2 map tasks → 4 shards. Routing is decided over the
    # full list, so per-partition content must match the single job's.
    paths = write_webtext(str(tmp_path / "w"), n_rows=1600, n_files=8,
                          drift=False)
    single = str(tmp_path / "single")
    sharded = str(tmp_path / "sharded")
    pl.encode_partitioned_tasks(paths, single, num_partitions=4,
                                add_filename=False)
    s = pl.encode_sharded(paths, sharded, num_partitions=4,
                          add_filename=False, map_bytes=1,
                          max_refs=8)  # 8 refs / 4 parts = 2 maps per shard
    assert s["shards"] == 4
    assert s["rows"] == 1600
    assert _decoded_sorted(sharded).equals(_decoded_sorted(single))
    # manifest coherent: identical routing → identical per-partition rows
    m_single = {k: v["rows"] for k, v in mf.load_manifest(single).items()}
    m_sharded = {k: v["rows"] for k, v in mf.load_manifest(sharded).items()}
    assert m_single == m_sharded
    # ledger records every shard exactly once
    ledger = pl._load_shard_ledger(sharded)
    assert [e["idx"] for e in ledger] == [0, 1, 2, 3]


def test_encode_sharded_single_shard_delegates(ray_session, tmp_path):
    # default max_refs → one shard; output identical to the tasks path
    paths = write_webtext(str(tmp_path / "w"), n_rows=600, n_files=3,
                          drift=False)
    single = str(tmp_path / "single")
    sharded = str(tmp_path / "sharded")
    pl.encode_partitioned_tasks(paths, single, num_partitions=4,
                                add_filename=False)
    s = pl.encode_sharded(paths, sharded, num_partitions=4,
                          add_filename=False)
    assert s["shards"] == 1
    assert _decoded_sorted(sharded).equals(_decoded_sorted(single))


def test_encode_sharded_drift_union(ray_session, tmp_path):
    # drifted files (extra column, rename) across shard boundaries decode
    # exactly like a single-job union encode of the same files
    paths = write_webtext(str(tmp_path / "w"), n_rows=1200, n_files=6,
                          drift=True)
    single = str(tmp_path / "single")
    sharded = str(tmp_path / "sharded")
    pl.encode_partitioned_tasks(paths, single, num_partitions=4,
                                add_filename=False)
    s = pl.encode_sharded(paths, sharded, num_partitions=4,
                          add_filename=False, map_bytes=1, max_refs=8)
    assert s["shards"] == 3
    assert _decoded_sorted(sharded).equals(_decoded_sorted(single))


def test_encode_sharded_resume_skips_done(ray_session, tmp_path):
    paths = write_webtext(str(tmp_path / "w"), n_rows=800, n_files=4,
                          drift=False)
    out = str(tmp_path / "enc")
    s1 = pl.encode_sharded(paths, out, num_partitions=2,
                           add_filename=False, map_bytes=1, max_refs=2)
    assert s1["shards"] == 4
    # idempotent re-run: every shard in the ledger → nothing re-encoded,
    # summary re-read from the manifest
    s2 = pl.encode_sharded(paths, out, num_partitions=2,
                           add_filename=False, map_bytes=1, max_refs=2,
                           resume=True)
    assert s2["rows"] == s1["rows"] == 800
    assert sorted(_decoded_sorted(out)["url"]) == sorted(
        pd.concat([pq.read_table(p).to_pandas() for p in paths])["url"])


def test_encode_sharded_resume_after_crash(ray_session, tmp_path,
                                           monkeypatch):
    paths = write_webtext(str(tmp_path / "w"), n_rows=800, n_files=4,
                          drift=False)
    single = str(tmp_path / "single")
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks(paths, single, num_partitions=2,
                                add_filename=False)

    calls = {"n": 0}
    real_append = pl.encode_append

    def flaky_append(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # crash in the middle of shard 2's append
            raise RuntimeError("simulated crash")
        return real_append(*a, **kw)

    monkeypatch.setattr(pl, "encode_append", flaky_append)
    with pytest.raises(RuntimeError, match="simulated crash"):
        pl.encode_sharded(paths, out, num_partitions=2,
                          add_filename=False, map_bytes=1, max_refs=2)
    monkeypatch.setattr(pl, "encode_append", real_append)
    # shards 0-1 are in the ledger; 2-3 re-run (append tags idempotent)
    ledger = pl._load_shard_ledger(out)
    assert [e["idx"] for e in ledger] == [0, 1]
    s = pl.encode_sharded(paths, out, num_partitions=2,
                          add_filename=False, map_bytes=1, max_refs=2,
                          resume=True)
    assert s["rows"] == 800
    assert _decoded_sorted(out).equals(_decoded_sorted(single))


def test_encode_sharded_resume_rejects_changed_inputs(ray_session,
                                                      tmp_path):
    paths = write_webtext(str(tmp_path / "w"), n_rows=400, n_files=4,
                          drift=False)
    out = str(tmp_path / "enc")
    pl.encode_sharded(paths, out, num_partitions=2, add_filename=False,
                      map_bytes=1, max_refs=2)
    other = write_webtext(str(tmp_path / "w2"), n_rows=400, n_files=4,
                          drift=False, seed=7)
    with pytest.raises(ValueError, match="file list"):
        pl.encode_sharded(other, out, num_partitions=2,
                          add_filename=False, map_bytes=1, max_refs=2,
                          resume=True)


def test_encode_sharded_zone_maps_rebuilt(ray_session, tmp_path):
    # appends invalidate touched sidecars; the orchestrator rebuilds them
    # over the final layout so pruning works end-to-end
    paths = write_webtext(str(tmp_path / "w"), n_rows=800, n_files=4,
                          drift=False)
    out = str(tmp_path / "enc")
    s = pl.encode_sharded(paths, out, num_partitions=2, add_filename=False,
                          map_bytes=1, max_refs=2,
                          zone_columns=["warc_ts"])
    assert s["shards"] == 4
    import datetime as _dt
    from raystack.zones import zone_prune_plan
    # out-of-range query: a missing/invalidated sidecar would surface as
    # a `None` entry (decode-all); a fully rebuilt layout prunes every
    # partition → empty plan
    plan = zone_prune_plan(out, {"warc_ts": (_dt.datetime(1990, 1, 1),
                                             _dt.datetime(1990, 1, 2))})
    assert plan == {}
    # unbounded query: every partition survives WITH a page list (proof
    # the sidecars exist and are page-granular, not stale-None)
    plan_all = zone_prune_plan(out, {"warc_ts": (None, None)})
    assert plan_all and all(p is not None for p in plan_all.values())


def test_append_lifecycle_matches_fresh_union(ray_session, tmp_path):
    """Durability lifecycle: day-by-day drifted appends, then compaction,
    then layout DDL, then another append — decode must equal a fresh
    union encode of the same inputs at EVERY step (the guarantee a
    long-lived 100 TB layout depends on)."""
    import pandas.testing as pdt

    paths = write_webtext(str(tmp_path / "w"), n_rows=1000, n_files=5,
                          drift=True)
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([paths[0]], out, num_partitions=2,
                                add_filename=False)

    def fresh(upto: int) -> pd.DataFrame:
        d = str(tmp_path / f"fresh{upto}")
        pl.encode_partitioned_tasks(paths[:upto + 1], d, num_partitions=2,
                                    add_filename=False)
        return _decoded_sorted(d)

    # drifted daily appends: extra column (f2), renamed text→body (f3),
    # reordered (f4) — each step equals the fresh union encode
    for k in range(1, 5):
        pl.encode_append([paths[k]], out, add_filename=False,
                         schema="union")
        pdt.assert_frame_equal(_decoded_sorted(out), fresh(k))

    before = _decoded_sorted(out)

    # compaction: content unchanged, one file per partition
    pl.compact_partitions(out, min_files=2)
    pdt.assert_frame_equal(_decoded_sorted(out), before)
    for d in os.listdir(os.path.join(out, "pages")):
        files = [f for f in os.listdir(os.path.join(out, "pages", d))
                 if f.endswith(".parquet")]
        assert len(files) == 1, d

    # layout DDL: drop the drift-only column, rename lang → language
    pl.alter_layout(out, drop=["mime"], rename={"lang": "language"})

    def _canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    want = _canon(before.drop(columns=["mime"])
                  .rename(columns={"lang": "language"}))
    pdt.assert_frame_equal(_canon(pl.decode_dir(out).to_pandas()), want)

    # post-DDL append still routes and aligns (rename applied at ingest)
    extra = write_webtext(str(tmp_path / "w6"), n_rows=200, n_files=1,
                          drift=False, seed=99)
    pl.encode_append(extra, out, add_filename=False, schema="union",
                     columns_rename={"lang": "language"})
    final = pl.decode_dir(out).to_pandas()
    assert len(final) == 1200
    assert "language" in final.columns and "lang" not in final.columns
    # the appended rows are reachable through the persisted routing
    some = pq.read_table(extra[0])["url"].to_pylist()[:3]
    found = pl.lookup_rows(out, some).to_pandas()
    assert set(some) <= set(found["url"])


def test_encode_sharded_rename_select_route_into_appends(ray_session,
                                                         tmp_path):
    # columns_rename/columns_select must reach the APPEND shards too —
    # drifted file 3 carries `body` (renamed text); with 8 files and
    # 2-map shards, the rename lands in a later shard, not just shard 0
    paths = write_webtext(str(tmp_path / "w"), n_rows=1600, n_files=8,
                          drift=True)
    single = str(tmp_path / "single")
    sharded = str(tmp_path / "sharded")
    kw = dict(columns_rename={"body": "text"},
              columns_select=["url", "warc_ts", "text", "lang"],
              num_partitions=4, add_filename=False)
    pl.encode_partitioned_tasks(paths, single, **kw)
    s = pl.encode_sharded(paths, sharded, map_bytes=1, max_refs=8, **kw)
    assert s["shards"] == 4
    a, b = _decoded_sorted(sharded), _decoded_sorted(single)
    assert sorted(a.columns) == ["lang", "text", "url", "warc_ts"]
    assert a.equals(b)


def test_encode_sharded_resume_rejects_shrunk_inputs(ray_session,
                                                     tmp_path):
    # a SHRUNK file list under resume must fail loudly: the layout still
    # holds the removed shards' rows
    paths = write_webtext(str(tmp_path / "w"), n_rows=800, n_files=8,
                          drift=False)
    out = str(tmp_path / "enc")
    pl.encode_sharded(paths, out, num_partitions=2, add_filename=False,
                      map_bytes=1, max_refs=2)
    with pytest.raises(ValueError, match="file list"):
        pl.encode_sharded(paths[:4], out, num_partitions=2,
                          add_filename=False, map_bytes=1, max_refs=2,
                          resume=True)


def test_append_clusters_with_persisted_sort_by(ray_session, tmp_path):
    """A layout encoded with sort_by keeps its clustering through
    encode_append: the persisted config makes each append's new pages
    sort the same way, so zone pruning stays tight as increments land.
    Control: the identical layout with the persisted sort_by removed
    appends unsorted pages and prunes strictly worse. Sort columns
    absent from a drifted append skip clustering instead of failing."""
    from raystack import manifest as mf
    from raystack.zones import build_zone_maps, zone_prune_plan
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "source", "n_chars"])
    day1 = str(tmp_path / "day1.parquet")
    day2 = str(tmp_path / "day2.parquet")
    pq.write_table(t.slice(0, 300), day1)
    pq.write_table(t.slice(300), day2)
    want = t.to_pandas().sort_values("doc_id").reset_index(drop=True)

    def build(out, keep_sort):
        pl.encode_partitioned_tasks([day1], out, url_col="source",
                                    num_partitions=2, add_filename=False,
                                    page_rows=64, sort_by="n_chars")
        cfg = mf.load_config(out)
        assert cfg["sort_by"] == "n_chars"  # persisted by the encode
        if not keep_sort:
            del cfg["sort_by"]
            mf.save_config(out, cfg)
        # precode=False on both sides: the sorted append disables it
        # anyway (clustering re-orders the reduce), and a precoded
        # control would page the heavy column on its own boundaries —
        # non-uniform layout, partition-level pruning only — which would
        # hide the comparison this test makes
        pl.encode_append([day2], out, add_filename=False, page_rows=64,
                         precode=False)
        build_zone_maps(out, ["n_chars"])
        return out

    sorted_out = build(str(tmp_path / "sorted"), keep_sort=True)
    control = build(str(tmp_path / "control"), keep_sort=False)

    # identical content either way (clustering is a layout property)
    for out in (sorted_out, control):
        got = pl.decode_dir(out).to_pandas().sort_values("doc_id") \
            .reset_index(drop=True)
        assert got[want.columns.tolist()].equals(want)

    lo = int(want["n_chars"].quantile(0.45))
    hi = int(want["n_chars"].quantile(0.55))

    def kept(out):
        plan = zone_prune_plan(out, {"n_chars": (lo, hi)})
        assert all(p is not None for p in plan.values())
        return sum(len(p) for p in plan.values())

    assert kept(sorted_out) < kept(control)

    # drifted append missing the sort column: clusters nothing, fails
    # nothing — rows land and decode with nulls for the sort column
    day3 = str(tmp_path / "day3.parquet")
    pq.write_table(t.slice(0, 50).drop_columns(["n_chars"]), day3)
    pl.encode_append([day3], sorted_out, add_filename=False,
                     page_rows=64, schema="union")
    got = pl.decode_dir(sorted_out).to_pandas()
    assert len(got) == len(want) + 50
    assert got["n_chars"].isna().sum() == 50


def test_delete_rows_where_zone_pruned(ray_session, tmp_path):
    """Declarative where= deletes: exact result (pandas mirror), zone
    sidecars prune the scan — a predicate provably matching nothing
    opens zero partitions and leaves every page file byte-identical."""
    import hashlib

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "lang", "source",
                               "n_chars"])
    src = str(tmp_path / "d.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([src], out, url_col="source",
                                num_partitions=4, add_filename=False,
                                page_rows=64, sort_by="n_chars",
                                zone_columns=["n_chars"])
    df = t.to_pandas()

    def digests():
        h = {}
        root = os.path.join(out, "pages")
        for r, _, fs in os.walk(root):
            for f in fs:
                if f.endswith(".parquet"):
                    p = os.path.join(r, f)
                    h[p] = hashlib.sha1(open(p, "rb").read()).hexdigest()
        return h

    # zero-match predicate: zones prove it — nothing scanned or touched
    before = digests()
    s0 = pl.delete_rows(out, where={"n_chars": (10**9, None)})
    assert s0["deleted_rows"] == 0
    assert s0["scanned_partitions"] == 0  # zone-pruned, never opened
    assert digests() == before

    # real delete: range + membership, exact vs the pandas mirror
    hi = int(df["n_chars"].quantile(0.8))
    kill = (df["n_chars"] >= hi) & df["lang"].isin(["en", "de"])
    s1 = pl.delete_rows(out, where={"n_chars": (hi, None),
                                    "lang": {"in": ["en", "de"]}})
    assert s1["deleted_rows"] == int(kill.sum()) > 0
    got = pl.decode_dir(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    exp = df[~kill].sort_values("doc_id").reset_index(drop=True)
    assert got[exp.columns.tolist()].equals(exp)

    with pytest.raises(ValueError, match="exactly one of"):
        pl.delete_rows(out, keys=["a"], where={"n_chars": (0, 1)})


def test_mutation_lock_serializes_and_self_heals(ray_session, tmp_path):
    """Concurrent layout mutations fail LOUDLY (a live lock holder
    blocks a second mutator), a stale lock from a dead pid self-heals,
    and a failing verb always releases its lock."""
    import json

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "source", "n_chars"])
    day1 = str(tmp_path / "day1.parquet")
    pq.write_table(t.slice(0, 300), day1)
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([day1], out, url_col="source",
                                num_partitions=2, add_filename=False)
    lock = os.path.join(out, "_manifest", ".mutation.lock")

    # a LIVE holder (this very pid) blocks the next mutator loudly
    with open(lock, "w") as fh:
        json.dump({"pid": os.getpid(), "op": "test-holder",
                   "host": __import__("socket").gethostname()}, fh)
    with pytest.raises(RuntimeError, match="being mutated"):
        pl.compact_partitions(out, min_files=1)
    os.remove(lock)

    # a stale lock (dead pid, same host) self-heals and the verb runs
    with open(lock, "w") as fh:
        json.dump({"pid": 2**22 + 12345, "op": "crashed",
                   "host": __import__("socket").gethostname()}, fh)
    assert pl.compact_partitions(out, min_files=1)["compacted"] == 2
    assert not os.path.exists(lock)  # released after the verb

    # a verb that raises still releases the lock
    with pytest.raises(ValueError):
        pl.recluster(out, "no_such_column")
    assert not os.path.exists(lock)
    # ...and the layout still mutates normally afterwards
    assert pl.recluster(out, "n_chars")["reclustered"] == 2


def test_decode_dir_streams_page_sized_blocks(ray_session, tmp_path):
    """decode_dir yields page-group-sized blocks on uniform layouts (the
    streaming-executor shape: block size bounded by page_rows, not
    partition size), with rows identical to the whole-partition path;
    non-uniform layouts (union back-fill pages) fall back and stay
    exact."""
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "source", "n_chars"])
    src = str(tmp_path / "d.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([src], out, url_col="source",
                                num_partitions=2, add_filename=False,
                                page_rows=64, precode=False)
    # the per-partition generator yields one bounded table per page
    # group (Ray then coalesces them into target-sized blocks — at toy
    # scale that's one block, at 512 MB partitions it's backpressure)
    part0 = os.path.join(out, "pages", "part_key=0")
    pieces = list(pl._decode_partition_stream(part0))
    assert len(pieces) > 1
    assert all(p.num_rows <= 64 for p in pieces)
    ds = pl.decode_dir(out).materialize()
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got[want.columns.tolist()].equals(want)

    # drifted append creates page_idx=-1 back-fill pages → that
    # partition is non-uniform → fallback path, still exact
    day2 = str(tmp_path / "day2.parquet")
    pq.write_table(t.slice(0, 40).drop_columns(["n_chars"]), day2)
    pl.encode_append([day2], out, add_filename=False, schema="union",
                     page_rows=64)
    got2 = pl.decode_dir(out).to_pandas()
    assert len(got2) == t.num_rows + 40
    assert got2["n_chars"].isna().sum() == 40
