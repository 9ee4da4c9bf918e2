"""Persisted dedup index: probe ≡ in-memory brute force over the same
rules; forced-distributed parity; the ingest maintenance loop."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import raystack.ops.dedupindex as dx
from raystack.ops.dedup import band_key_matrix, sig_matrix
from raystack.ops.hashing import flatten_column
from raystack.ops.text import fingerprint_kernel


def _sigs_local(texts):
    data, starts, lengths = flatten_column(pa.array(texts, pa.string()))
    fp = fingerprint_kernel(data, starts, lengths).view(np.int64)
    sig = sig_matrix(data, starts, lengths).astype(np.uint64) \
        .view(np.int64)
    return fp, sig


def _brute_matches(new_ids, new_texts, old_ids, old_texts, bands, thr):
    """All-pairs reference implementing the index's declared rules: fp
    equality OR (shared band key AND signature agreement >= thr)."""
    nfp, nsig = _sigs_local(new_texts)
    ofp, osig = _sigs_local(old_texts)
    nk, ok = band_key_matrix(nsig, bands), band_key_matrix(osig, bands)
    out = {}
    for i, nid in enumerate(new_ids):
        cands = [oid for j, oid in enumerate(old_ids)
                 if nfp[i] == ofp[j]
                 or (set(nk[i]) & set(ok[j])
                     and (nsig[i] == osig[j]).mean() >= thr)]
        if cands:
            out[int(nid)] = int(min(cands))
    return out


def _corpus():
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    return t["doc_id"].to_pylist(), t["text"].to_pylist()


def _increment(old_ids, old_texts):
    """exact copies, near copies (tail append), and fresh docs."""
    new_ids, new_texts = [], []
    for i, j in enumerate([3, 17, 101]):          # exact dups
        new_ids.append(10000 + i)
        new_texts.append(old_texts[j])
    for i, j in enumerate([5, 42, 250]):          # near dups
        new_ids.append(10100 + i)
        new_texts.append(old_texts[j] + " zz")
    for i in range(6):                            # fresh
        new_ids.append(10200 + i)
        new_texts.append(
            f"entirely fresh document {i} about topic-{i * 7913} "
            * 20 + f"closing line {i}")
    return new_ids, new_texts


def _probe(tmp_path, monkeypatch=None):
    import ray.data
    old_ids, old_texts = _corpus()
    new_ids, new_texts = _increment(old_ids, old_texts)
    idx = str(tmp_path / "idx")
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(old_ids), "text": pa.array(old_texts)}))
    dx.build_dedup_index(ds, idx, num_buckets=16, bands=8)
    if monkeypatch is not None:  # force the distributed join tiers
        monkeypatch.setattr(dx, "_BROADCAST_LIMIT", 0)
    got = dx.dedup_increment(
        ray.data.from_arrow(pa.table({"doc_id": pa.array(new_ids),
                                      "text": pa.array(new_texts)})),
        idx, sim_threshold=0.7).to_pandas()
    got_map = dict(zip(got["doc_id"].astype(int),
                       got["dup_of"].astype(int)))
    want = _brute_matches(new_ids, new_texts, old_ids, old_texts,
                          bands=8, thr=0.7)
    return got_map, want, new_ids


def test_dedup_increment_matches_brute_force(ray_session, tmp_path):
    got, want, new_ids = _probe(tmp_path)
    assert got == want
    # sanity on the plant: every exact copy flagged with its source id,
    # no fresh doc flagged
    assert {10000, 10001, 10002} <= set(got)
    assert got[10000] == 3 and got[10001] == 17 and got[10002] == 101
    assert not ({10200 + i for i in range(6)} & set(got))
    # the tail-append near copies agree on most minhash components
    assert {10100, 10101, 10102} <= set(got)


def test_dedup_increment_forced_distributed_parity(ray_session, tmp_path,
                                                   monkeypatch):
    got, want, _ = _probe(tmp_path, monkeypatch)
    assert got == want


def test_dedup_increment_empty_and_missing_buckets(ray_session, tmp_path):
    import ray.data
    old_ids, old_texts = _corpus()
    idx = str(tmp_path / "idx")
    dx.build_dedup_index(ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(old_ids[:50]),
         "text": pa.array(old_texts[:50])})), idx,
        num_buckets=16, bands=8)
    fresh = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([1, 2]),
         "text": pa.array(["totally novel alpha " * 30,
                           "totally novel beta " * 30])}))
    assert dx.dedup_increment(fresh, idx).count() == 0


def test_ingest_dedup_maintenance_loop(ray_session, tmp_path):
    import json
    import os

    import ray.data
    idx = str(tmp_path / "idx")
    # per-doc vocabulary: docs for different i share almost no shingles
    # (a shared template with only numbers varying IS a near-dup by the
    # index's own rules — verified: template docs agree on 0.6-0.8 of
    # minhash components)
    mk = lambda i: " ".join(
        f"tok{i}w{j}x{(i * 127 + j * 31) % 997}" for j in range(80))

    # A: ids 0..9, with 8==dup of 0 (exact) planted within
    a_ids = list(range(10))
    a_texts = [mk(i) for i in range(8)] + [mk(0)] + [mk(9)]
    surv_a = dx.ingest_dedup(
        ray.data.from_arrow(pa.table({"doc_id": pa.array(a_ids),
                                      "text": pa.array(a_texts)})),
        idx, num_buckets=8, bands=8).to_pandas()
    kept_a = sorted(surv_a["doc_id"].astype(int))
    assert 8 not in kept_a and 0 in kept_a          # within-dup dropped
    assert len(kept_a) == 9

    # B: a copy of an A-survivor, a copy of A's DROPPED doc's content
    # (still indexed via its keeper), near copy, and fresh docs
    b_ids = [100, 101, 102, 103, 104]
    b_texts = [mk(3),                     # exact dup of survivor 3
               mk(0),                     # same content as dropped id 8
               mk(5) + " x",              # near dup of survivor 5
               mk(77), mk(78)]            # fresh
    surv_b = dx.ingest_dedup(
        ray.data.from_arrow(pa.table({"doc_id": pa.array(b_ids),
                                      "text": pa.array(b_texts)})),
        idx).to_pandas()
    kept_b = sorted(surv_b["doc_id"].astype(int))
    assert kept_b == [103, 104]
    with open(os.path.join(idx, "dedup_index_meta.json")) as f:
        assert json.load(f)["n_docs"] == len(kept_a) + len(kept_b)

    # C: a copy of a B-survivor is now flagged against it
    flagged = dx.dedup_increment(ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([200]), "text": pa.array([mk(77)])})),
        idx).to_pandas()
    assert dict(zip(flagged["doc_id"], flagged["dup_of"])) == {200: 103}


def test_probe_row_group_pruning(ray_session, tmp_path, monkeypatch):
    """Broadcast probes read ~one row group per probe key, not whole
    buckets: build with tiny row groups, then prove (a) the scan kernel
    skips almost every row group for a small probe and (b) the pruned
    dedup_increment result is still exact."""
    import glob
    import os

    import ray.data
    monkeypatch.setattr(dx, "_RG_ROWS", 8)
    old_ids, old_texts = _corpus()
    idx = str(tmp_path / "idx")
    dx.build_dedup_index(ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(old_ids), "text": pa.array(old_texts)})),
        idx, num_buckets=4, bands=8)   # few buckets -> big buckets

    new_ids, new_texts = _increment(old_ids, old_texts)
    got = dx.dedup_increment(
        ray.data.from_arrow(pa.table({"doc_id": pa.array(new_ids),
                                      "text": pa.array(new_texts)})),
        idx, sim_threshold=0.7).to_pandas()
    want = _brute_matches(new_ids, new_texts, old_ids, old_texts,
                          bands=8, thr=0.7)
    assert dict(zip(got["doc_id"].astype(int),
                    got["dup_of"].astype(int))) == want

    # kernel-level proof over the real index files: probing the 3 exact
    # plants touches a small fraction of the index's row groups
    fp, _sig = _sigs_local([new_texts[0], new_texts[1], new_texts[2]])
    keys = np.sort(fp)
    files = sorted(glob.glob(os.path.join(idx, "exact", "bucket=*",
                                          "*.parquet")))
    read = total = rows = 0
    for f in files:
        t, r, n = dx._scan_file_pruned(f, "fp", ["fp", "doc_id"], keys)
        read += r
        total += n
        rows += t.num_rows
    assert rows == 3                    # exactly the planted matches
    # a row group's key range is ~1/16 of its bucket's hash range at 8
    # rows/group over this corpus; 3 probe keys should skip the vast
    # majority of groups even when every file is probed
    assert total >= 40 and read <= total // 3, (read, total)


def test_append_tags_exactly_once(ray_session, tmp_path):
    """A tagged append is exactly-once (n_docs stable on retry), and
    ingest_dedup refuses a tag it has already ingested instead of
    silently deduping the increment against its own first run."""
    import json
    import os

    import ray.data
    old_ids, old_texts = _corpus()
    idx = str(tmp_path / "idx")
    base = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(old_ids[:30]),
         "text": pa.array(old_texts[:30])}))
    dx.ingest_dedup(base, idx, num_buckets=8, tag="day1")

    inc = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([900]),
         "text": pa.array(["wholly new content " * 20])}))
    dx.append_dedup_index(inc, idx, tag="day2")
    with open(os.path.join(idx, "dedup_index_meta.json")) as f:
        n = json.load(f)["n_docs"]
    dx.append_dedup_index(inc, idx, tag="day2")      # retry: no-op
    with open(os.path.join(idx, "dedup_index_meta.json")) as f:
        meta = json.load(f)
    assert meta["n_docs"] == n
    assert meta["applied"] == ["day1", "day2"]

    with pytest.raises(ValueError, match="already ingested"):
        dx.ingest_dedup(base, idx, tag="day1")


def test_dedup_increment_forced_multiwave_parity(ray_session, tmp_path,
                                                 monkeypatch):
    """Bucket-wave probe joins (the OOM guard for large increments ×
    large indexes): a 1-byte wave budget forces one wave PER BUCKET —
    the sequential per-wave joins must union to exactly the single-join
    result, which equals brute force."""
    monkeypatch.setattr(dx, "_JOIN_WAVE_BYTES", 1)
    got, want, _ = _probe(tmp_path, monkeypatch)
    assert got == want
