"""The whole story in one test: a Common-Crawl-shaped WARC archive runs
the full curation + tokenization + columnar-encode chain, with an
invariant checked at every stage. Each operator has its own oracle tests
elsewhere; this pins that the stages actually COMPOSE — schemas line up,
Datasets stream stage to stage, and the final encoded layout decodes
bit-identically."""

import datetime as dt

import numpy as np
import pyarrow as pa
import pytest
import ray

from raystack.sources.warc import write_warc


def _corpus(n=240):
    """Synthetic crawl: English-ish + noise docs, exact dups, a
    benchmark-contaminated doc, and a blocklisted one."""
    rng = np.random.default_rng(11)
    words = ("the data stream query engine reads and writes many tables "
             "with schema drift across partitions while workers keep "
             "running the pipeline over documents").split()
    docs = []
    for i in range(n):
        k = 30 + int(rng.integers(0, 40))
        body = " ".join(rng.choice(words, k))
        if i % 17 == 0 and i > 0:
            body = docs[i - 1]["text"]  # exact duplicate of previous
        if i == 50:
            body += " the quick brown fox jumps over the lazy dog today"
        if i == 60:
            body += " casino jackpot"
        docs.append({
            "url": f"https://site{i % 7}.example.com/doc/{i}"
                   f"?utm_source=feed",
            "warc_ts": dt.datetime(2024, 3, 1, 12, i % 60),
            "text": body,
        })
    return docs


def test_crawl_to_training_data(ray_session, tmp_path):
    from raystack import pipeline as pl
    from raystack.ops.bpe import add_bpe_ids, train_bpe
    from raystack.ops.dedup import exact_dedup
    from raystack.ops.packing import sequence_pack_plan
    from raystack.ops.text import (add_extracted_text, add_quality_score,
                                   add_token_count, canonicalize_url,
                                   flag_blocklist, flag_contamination)
    from raystack.sources.warc import read_warc

    docs = _corpus()
    recs = [{"url": d["url"], "warc_ts": d["warc_ts"],
             "html": f"<html><body>{d['text']}</body></html>".encode()}
            for d in docs]
    p1 = str(tmp_path / "crawl1.warc.gz")
    p2 = str(tmp_path / "crawl2.warc")
    write_warc(p1, recs[:150])
    write_warc(p2, recs[150:])

    # 1. ingest: WARC -> webtext table, extracted text byte-identical
    ds = read_warc([p1, p2])
    ds = add_extracted_text(ds, html_col="html", out_col="text",
                            open_tag=b"<body>", close_tag=b"</body>")
    assert ds.count() == len(docs)

    # 2. url canonicalization strips the tracking params
    ds = canonicalize_url(ds)
    one = ds.take(1)[0]
    assert "utm_" not in one["url_canon"] and "?" not in one["url_canon"]

    # 3. quality + blocklist + contamination flags (all map-only)
    ds = add_token_count(ds)
    ds = add_quality_score(ds)
    ds = flag_blocklist(ds, ["casino", "jackpot"], out_col="blocked")
    bench = pa.table({"text": ["the quick brown fox jumps over the lazy "
                               "dog today is a benchmark prompt"]})
    ds = flag_contamination(ds, bench, n=8)
    df = ds.to_pandas()
    assert df["blocked"].sum() == 1
    assert df["contaminated"].sum() >= 1
    keep = df[~df.blocked & ~df.contaminated]

    # 4. doc ids + exact dedup (the planted dups collapse)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(keep), dtype=np.int64)),
        "text": pa.array(keep["text"].tolist(), pa.string()),
        "url": pa.array(keep["url_canon"].tolist(), pa.string()),
        "warc_ts": pa.array(keep["warc_ts"].tolist(),
                            pa.timestamp("us")),
    })
    deduped = exact_dedup(ray.data.from_arrow(tbl), "text", "doc_id") \
        .to_pandas()
    n_dups = len(keep) - keep["text"].nunique()
    assert n_dups > 0 and len(deduped) == len(keep) - n_dups

    kept_ids = set(deduped["doc_id"])
    clean = tbl.filter(pa.compute.is_in(
        tbl["doc_id"], value_set=pa.array(sorted(kept_ids))))
    clean_ds = ray.data.from_arrow(clean)

    # 5. BPE train + tokenize + pack plan over the curated corpus
    tok = train_bpe(clean_ds, vocab_size=256 + 48)
    tds = add_bpe_ids(ray.data.from_arrow(clean), tok)
    plan = sequence_pack_plan(tds, seq_len=128, id_col="doc_id",
                              tokens_col="bpe_ids_n").to_pandas()
    stream = (tds.to_pandas()["bpe_ids_n"] + 1).sum()  # +1 sep per doc
    assert plan["seq_id"].nunique() == int(np.ceil(stream / 128))

    # 6. columnar encode of the tokenized corpus + bit-identical decode
    out = str(tmp_path / "layout")
    summary = pl.encode_partitioned(tds, out, url_col="url",
                                    num_partitions=4)
    assert summary["rows"] == clean.num_rows
    got = pl.decode_pages(pl.read_encoded(out)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = tds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["text"].tolist() == exp["text"].tolist()
    assert [list(x) for x in got["bpe_ids"]] == \
        [list(x) for x in exp["bpe_ids"]]
    # detokenized bytes equal the concatenated word bytes (north-star-
    # style byte identity at the end of the whole chain)
    vocab = [bytes([i]) for i in range(256)]
    for a, b in tok["merges"]:
        vocab.append(vocab[a] + vocab[b])
    import re
    row = got.iloc[len(got) // 2]
    words = [w for w in re.split(r"\W+", row["text"].lower()) if w]
    assert b"".join(vocab[t] for t in row["bpe_ids"]) == \
        "".join(words).encode()

    # 7. training-batch reader closes the loop: seeded-epoch windows over
    # the tokenized corpus — every sequence is seq_len tokens, the
    # concatenated windows reproduce the shuffled token stream exactly,
    # and detokenizing around each doc_start boundary recovers the
    # documents' own bytes (end-to-end: crawl → batches a trainer eats)
    from raystack.ops.hashing import splitmix64 as _smx
    from raystack.ops.loader import epoch_pack_plan, fetch_sequences
    SEED, SEP_ID = 99, 0
    eplan = epoch_pack_plan(tds, 128, SEED, count_col="bpe_ids_n")
    fetched = fetch_sequences(tds, eplan, 0, 10_000, seq_len=128,
                              tokens_col="bpe_ids", sep_id=SEP_ID)
    toks_df = tds.to_pandas().set_index("doc_id")
    ids = np.array(sorted(toks_df.index), np.int64)
    order = ids[np.argsort(_smx(ids.astype(np.uint64) ^ np.uint64(SEED)))]
    ref_stream = []
    for d in order:
        ref_stream.extend(int(x) for x in toks_df.loc[d, "bpe_ids"])
        ref_stream.append(SEP_ID)
    flat = [x for seq in fetched["tokens"].to_pylist() for x in seq]
    assert flat == ref_stream
    assert all(len(s) == 128 for s in fetched["tokens"].to_pylist()[:-1])
    # doc_starts count across the epoch == number of documents
    n_starts = sum(len(s) for s in fetched["doc_starts"].to_pylist())
    assert n_starts == len(ids)

    # 8. layout lifecycle: the maintenance verbs compose with the
    # training pipeline's layout — recluster by crawl time (content
    # identical), declarative retention delete of the oldest half
    # (zone-pruned), then export the survivors as plain Parquet any
    # engine reads
    pl.recluster(out, "warc_ts", page_rows=64)
    re_ids = sorted(pl.decode_dir(out, columns=["doc_id"])
                    .to_pandas()["doc_id"])
    assert re_ids == sorted(exp["doc_id"])
    ts = exp["warc_ts"].sort_values()
    cut = ts.iloc[len(ts) // 2].to_pydatetime()
    s_del = pl.delete_rows(out, where={"warc_ts": (None, cut)})
    keep_mask = exp["warc_ts"] > cut
    assert s_del["deleted_rows"] == int((~keep_mask).sum()) > 0
    dest = str(tmp_path / "survivors")
    s_exp = pl.export_parquet(out, dest, columns=["doc_id", "text"])
    assert s_exp["rows"] == int(keep_mask.sum())
    import pyarrow.dataset as pads
    surv = pads.dataset(dest, partitioning="hive").to_table() \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    ref = exp[keep_mask][["doc_id", "text"]] \
        .sort_values("doc_id").reset_index(drop=True)
    assert surv[["doc_id", "text"]].equals(ref)


def test_continuous_crawl_with_dedup_index(ray_session, tmp_path):
    """The day-N ingest loop: each increment dedups within itself AND
    against the persisted index of everything already ingested (the
    stored corpus text is never rescanned), then the survivors append to
    the encoded layout. Day 2 replays day-1 content (exact and
    near-copies) plus fresh docs — only the fresh docs may land."""
    import os

    import pyarrow.parquet as pq

    from raystack import pipeline as pl
    from raystack.ops.dedupindex import ingest_dedup

    rng = np.random.default_rng(23)
    mk = lambda i: " ".join(
        f"w{i}t{j}v{(i * 211 + j * 13) % 9973}" for j in range(60))
    idx = str(tmp_path / "didx")
    out = str(tmp_path / "layout")

    def table(ids, texts):
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array([f"https://site{i % 5}.com/d{i}" for i in ids],
                            pa.string()),
            "text": pa.array(texts, pa.string())})

    # day 1: 40 docs, one internal exact dup (id 39 copies id 0)
    d1_ids = list(range(40))
    d1_texts = [mk(i) for i in range(39)] + [mk(0)]
    surv1 = ingest_dedup(ray.data.from_arrow(table(d1_ids, d1_texts)),
                         idx, num_buckets=8).materialize()
    n1 = surv1.count()
    assert n1 == 39
    day1_pq = str(tmp_path / "day1.parquet")
    pq.write_table(pa.concat_tables(ray.get(surv1.to_arrow_refs())),
                   day1_pq)
    pl.encode_partitioned_tasks([day1_pq], out, url_col="url",
                                num_partitions=2, add_filename=False)

    # day 2: 3 exact replays of day-1 content, 2 near replays, 5 fresh
    d2_ids = list(range(100, 110))
    d2_texts = ([mk(3), mk(7), mk(0)]          # exact (incl. the keeper
                + [mk(5) + " zz", mk(9) + " q"]  # of day-1's dup), near
                + [mk(500 + i) for i in range(5)])
    surv2 = ingest_dedup(ray.data.from_arrow(table(d2_ids, d2_texts)),
                         idx).materialize()
    kept2 = sorted(surv2.to_pandas()["doc_id"].astype(int))
    assert kept2 == [105, 106, 107, 108, 109]  # only the fresh docs
    day2_pq = str(tmp_path / "day2.parquet")
    pq.write_table(pa.concat_tables(ray.get(surv2.to_arrow_refs())),
                   day2_pq)
    pl.encode_append([day2_pq], out, add_filename=False)

    # the layout holds exactly day-1 survivors + day-2 fresh docs,
    # decoded text byte-identical to what the loop admitted
    got = pl.decode_dir(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    want = pa.concat_tables([
        pa.concat_tables(ray.get(surv1.to_arrow_refs())),
        pa.concat_tables(ray.get(surv2.to_arrow_refs()))]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["text"].tolist() == want["text"].tolist()

    # the index grew by exactly the admitted docs
    import json
    with open(os.path.join(idx, "dedup_index_meta.json")) as f:
        assert json.load(f)["n_docs"] == n1 + len(kept2)
