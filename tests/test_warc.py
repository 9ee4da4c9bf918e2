"""WARC ingest: writer→reader round trip (plain + gzip), record-type
filtering, HTTP payload splitting, truncation tolerance, and the full
crawl→columnar path (read_warc → extract text → encode → decode)."""

import datetime as dt
import gzip

import numpy as np
import pyarrow as pa
import pytest

from raystack.sources import warc as w


def _docs(n=20):
    return [{
        "url": f"https://site{i % 5}.example.com/page/{i}",
        "warc_ts": dt.datetime(2024, 3, 1, 12, 0, i % 60),
        "html": (f"<html><head><t>d{i}</t></head>"
                 f"<body>doc {i} body é中</body></html>"
                 ).encode("utf-8"),
        "http_status": 200 if i % 7 else 404,
        "content_type": "text/html; charset=utf-8",
    } for i in range(n)]


def _read_rows(path):
    with open(path, "rb") as f:
        import io
        raw = gzip.GzipFile(fileobj=f) if path.endswith(".gz") else f
        return list(w.iter_warc_records(io.BufferedReader(raw)))


@pytest.mark.parametrize("suffix", ["warc", "warc.gz"])
def test_write_read_roundtrip(tmp_path, suffix):
    docs = _docs()
    p = str(tmp_path / f"a.{suffix}")
    assert w.write_warc(p, docs) == len(docs)
    rows = _read_rows(p)
    assert len(rows) == len(docs)
    for got, exp in zip(rows, docs):
        assert got["url"] == exp["url"]
        assert got["warc_ts"] == exp["warc_ts"]
        assert got["html"] == exp["html"]  # byte-identical body
        assert got["http_status"] == exp["http_status"]
        assert got["content_type"].startswith("text/html")


def test_non_content_records_skipped(tmp_path):
    docs = _docs(4)
    recs = [dict(docs[0]),
            {"warc_type": "warcinfo", "html": b"software: x\r\n"},
            {"warc_type": "request", "url": docs[1]["url"],
             "html": b"GET / HTTP/1.1\r\n"},
            dict(docs[1]),
            {"warc_type": "metadata", "url": docs[1]["url"],
             "html": b"via: seed"},
            dict(docs[2], warc_type="resource",
                 content_type="application/pdf")]
    p = str(tmp_path / "mixed.warc")
    w.write_warc(p, recs)
    rows = _read_rows(p)
    assert [r["url"] for r in rows] == [docs[0]["url"], docs[1]["url"],
                                        docs[2]["url"]]
    # resource record: payload travels whole, no HTTP head
    assert rows[2]["html"] == docs[2]["html"]
    assert rows[2]["http_status"] is None
    assert rows[2]["content_type"] == "application/pdf"


def test_truncated_archive_drops_partial_record(tmp_path):
    docs = _docs(3)
    p = str(tmp_path / "t.warc")
    w.write_warc(p, docs)
    blob = open(p, "rb").read()
    open(p, "wb").write(blob[: int(len(blob) * 0.8)])  # cut mid-record-3
    rows = _read_rows(p)
    assert len(rows) == 2
    assert rows[1]["html"] == docs[1]["html"]


def test_empty_body_and_missing_uri(tmp_path):
    p = str(tmp_path / "e.warc")
    w.write_warc(p, [{"url": "", "warc_ts": None, "html": b""}])
    rows = _read_rows(p)
    assert len(rows) == 1
    assert rows[0]["url"] is None
    assert rows[0]["html"] == b""


def test_read_warc_ray_dataset(ray_session, tmp_path):
    docs = _docs(50)
    w.write_warc(str(tmp_path / "p1.warc"), docs[:30])
    w.write_warc(str(tmp_path / "p2.warc.gz"), docs[30:])
    ds = w.read_warc([str(tmp_path / "p1.warc"),
                      str(tmp_path / "p2.warc.gz")])
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    df = t.to_pandas().sort_values("url").reset_index(drop=True)
    exp = sorted(docs, key=lambda d: d["url"])
    assert len(df) == 50
    assert df["url"].tolist() == [d["url"] for d in exp]
    assert [bytes(b) for b in df["html"]] == [d["html"] for d in exp]
    assert df["warc_ts"].tolist() == [pa.scalar(d["warc_ts"],
                                                type=pa.timestamp("us")
                                                ).as_py() for d in exp]


def test_warc_to_columnar_end_to_end(ray_session, tmp_path):
    """The crawl->columnar north-star path: WARC in, encoded layout out,
    decode bit-identical, extracted text byte-identical."""
    from raystack import pipeline as pl
    from raystack.ops.text import add_extracted_text

    docs = _docs(40)
    p = str(tmp_path / "crawl.warc.gz")
    w.write_warc(p, docs)
    ds = w.read_warc([p])
    ds = add_extracted_text(ds, html_col="html", out_col="text",
                            open_tag=b"<body>", close_tag=b"</body>")
    out = str(tmp_path / "enc")
    summary = pl.encode_partitioned(ds, out, num_partitions=4)
    assert summary["rows"] == 40
    got = pl.decode_pages(pl.read_encoded(out)).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    exp = sorted(docs, key=lambda d: d["url"])
    assert [bytes(b) for b in got["html"]] == [d["html"] for d in exp]
    # extracted text == the <body> span bytes
    for txt, d in zip(got["text"], exp):
        body = d["html"].split(b"<body>")[1].split(b"</body>")[0]
        assert txt.encode("utf-8") == body


def test_warc_tasks_exchange_matches_dataset_path(ray_session, tmp_path):
    """WARC straight into the raw-task exchange (the headline path):
    decode-identical to the Dataset groupby path on the same archives,
    including map-side text extraction (byte-identical kernel)."""
    from raystack import pipeline as pl
    from raystack.ops.text import add_extracted_text

    docs = _docs(120)
    p1, p2 = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc")
    w.write_warc(p1, docs[:70])
    w.write_warc(p2, docs[70:])

    out_t = str(tmp_path / "enc_tasks")
    s_t = pl.encode_partitioned_tasks(
        [p1, p2], out_t, num_partitions=4,
        warc_extract_text=(b"<body>", b"</body>"))
    assert s_t["rows"] == len(docs)

    out_d = str(tmp_path / "enc_ds")
    ds = add_extracted_text(w.read_warc([p1, p2]), html_col="html",
                            out_col="text", open_tag=b"<body>",
                            close_tag=b"</body>")
    pl.encode_partitioned(ds, out_d, num_partitions=4)

    got_t = pl.decode_dir(out_t).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    got_d = pl.decode_pages(pl.read_encoded(out_d)).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    for col in ["url", "warc_ts", "html", "text", "http_status",
                "content_type"]:
        assert got_t[col].tolist() == got_d[col].tolist(), col
    # provenance rides the tasks path (add_filename default)
    assert set(got_t["filename"]) == {"a.warc.gz", "b.warc"}
    # point lookups route over the warc layout like any other
    target = docs[13]["url"]
    hit = pl.lookup_rows(out_t, [target], columns=["text"]).to_pandas()
    assert len(hit) == 1
    assert hit["text"][0].encode() == docs[13]["html"].split(
        b"<body>")[1].split(b"</body>")[0]


def test_warc_append_and_sharded(ray_session, tmp_path):
    """Incremental CC ingest: day-2 WARC append reuses the layout's
    persisted routing AND extraction config; encode_sharded over many
    archives (forced multi-shard) decodes identically to one single-job
    encode."""
    from raystack import pipeline as pl

    docs = _docs(160)
    archives = []
    for i in range(8):
        p = str(tmp_path / f"c{i}.warc.gz")
        w.write_warc(p, docs[i * 20:(i + 1) * 20])
        archives.append(p)

    # day 1 + append == fresh encode of everything
    day1 = str(tmp_path / "day1")
    pl.encode_partitioned_tasks(archives[:6], day1, num_partitions=4,
                                warc_extract_text=(b"<body>", b"</body>"))
    s2 = pl.encode_append(archives[6:], day1)
    assert s2["rows"] == len(docs)
    fresh = str(tmp_path / "fresh")
    pl.encode_partitioned_tasks(archives, fresh, num_partitions=4,
                                warc_extract_text=(b"<body>", b"</body>"))
    a = pl.decode_dir(day1).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    b = pl.decode_dir(fresh).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    for col in ["url", "html", "text", "warc_ts"]:
        assert a[col].tolist() == b[col].tolist(), col

    # sharded (forced >=2 shards) == the single job
    shard_out = str(tmp_path / "sharded")
    s3 = pl.encode_sharded(archives, shard_out, num_partitions=4,
                           max_refs=8,  # 4 partitions -> 2 map tasks/shard
                           map_bytes=1,  # one group per archive
                           warc_extract_text=(b"<body>", b"</body>"))
    assert s3["shards"] >= 2 and s3["rows"] == len(docs)
    c = pl.decode_dir(shard_out).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    for col in ["url", "html", "text", "warc_ts"]:
        assert c[col].tolist() == b[col].tolist(), col
