"""Deterministic resumable training-batch reader
(:mod:`raystack.ops.loader`).

The oracle is a pure-Python reference: sort docs by the seeded shuffle
rank, concatenate token lists with separators, cut into seq_len
windows. Every fetch — full epoch, mid-stream resume, persisted-and-
pruned — must reproduce the reference bytes exactly.
"""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from raystack.ops.hashing import splitmix64, unsplitmix64
from raystack.ops.loader import (epoch_pack_plan, fetch_sequences,
                                 iter_epoch, persist_epoch_tokens,
                                 persist_plan)

SEED = 1234
SEQ_LEN = 16
SEP = -1


def _corpus(n_docs=60, seed=7):
    rng = np.random.default_rng(seed)
    docs = {}
    for i in range(n_docs):
        docs[i * 11 + 3] = rng.integers(0, 1000,
                                        rng.integers(0, 40)).astype(np.int32)
    return docs


def _reference_stream(docs, seed=SEED, sep_tokens=1):
    """Shuffled concat stream, the loader's ground truth."""
    ids = np.array(sorted(docs), np.int64)
    ranks = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
    order = ids[np.argsort(ranks)]
    stream = []
    for d in order:
        stream.extend(int(x) for x in docs[d])
        stream.extend([SEP] * sep_tokens)
    return stream


def _reference_seqs(docs, seq_len=SEQ_LEN, **kw):
    s = _reference_stream(docs, **kw)
    return [s[i:i + seq_len] for i in range(0, len(s), seq_len)]


def _tokens_ds(docs):
    ids = sorted(docs)
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "bpe_ids": pa.array([docs[i].tolist() for i in ids],
                            pa.list_(pa.int32())),
        "n_tokens": pa.array([len(docs[i]) for i in ids], pa.int64()),
    }))


def test_unsplitmix64_is_exact_inverse():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**64, 50000, dtype=np.uint64)
    assert (unsplitmix64(splitmix64(x)) == x).all()
    assert (splitmix64(unsplitmix64(x)) == x).all()


def _reference_doc_starts(docs, seq_len=SEQ_LEN, seed=SEED, sep_tokens=1):
    """Per-sequence in-sequence offsets where a NEW doc begins."""
    ids = np.array(sorted(docs), np.int64)
    ranks = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
    order = ids[np.argsort(ranks)]
    starts, pos = [], 0
    for d in order:
        starts.append(pos)
        pos += len(docs[d]) + sep_tokens
    n_seq = -(-pos // seq_len)
    out = [[] for _ in range(n_seq)]
    for p in starts:
        out[p // seq_len].append(p % seq_len)
    return out


def test_full_epoch_matches_reference(ray_session):
    docs = _corpus()
    ds = _tokens_ds(docs)
    plan = epoch_pack_plan(ds, SEQ_LEN, SEED)
    want = _reference_seqs(docs)
    got = fetch_sequences(ds, plan, 0, len(want) + 5, seq_len=SEQ_LEN,
                          sep_id=SEP)
    assert got.num_rows == len(want)
    assert got["seq_id"].to_pylist() == list(range(len(want)))
    assert got["tokens"].to_pylist() == want
    # attention-reset positions: exactly where new docs begin, never a
    # continuation from the previous sequence
    assert got["doc_starts"].to_pylist() == _reference_doc_starts(docs)


def test_resume_mid_stream_is_identical(ray_session):
    """A freshly-built loader fetching [k, m) returns byte-identical
    sequences to the same range of a full-epoch read — the exact-resume
    contract (no loader state beyond the step counter)."""
    docs = _corpus()
    want = _reference_seqs(docs)
    k, m = 7, 19
    ds = _tokens_ds(docs)
    plan = epoch_pack_plan(ds, SEQ_LEN, SEED)  # a NEW plan, as on restart
    got = fetch_sequences(ds, plan, k, m, seq_len=SEQ_LEN, sep_id=SEP)
    assert got["seq_id"].to_pylist() == list(range(k, m))
    assert got["tokens"].to_pylist() == want[k:m]


def test_partitioning_invariance(ray_session):
    """Same epoch bytes regardless of bucket count, block layout, or
    input order — the cluster-size-independence claim."""
    docs = _corpus()
    want = _reference_seqs(docs)[3:9]
    for n_buckets, blocks in [(4, 1), (64, 7)]:
        ds = _tokens_ds(docs).repartition(blocks)
        plan = epoch_pack_plan(ds, SEQ_LEN, SEED, n_buckets=n_buckets)
        got = fetch_sequences(ds, plan, 3, 9, seq_len=SEQ_LEN, sep_id=SEP)
        assert got["tokens"].to_pylist() == want, n_buckets


def test_different_seed_different_epoch(ray_session):
    docs = _corpus()
    ds = _tokens_ds(docs)
    a = fetch_sequences(ds, epoch_pack_plan(ds, SEQ_LEN, SEED), 0, 5,
                        seq_len=SEQ_LEN, sep_id=SEP)
    b = fetch_sequences(ds, epoch_pack_plan(ds, SEQ_LEN, SEED + 1), 0, 5,
                        seq_len=SEQ_LEN, sep_id=SEP)
    assert a["tokens"].to_pylist() != b["tokens"].to_pylist()
    # ... but each epoch is its own reference stream
    assert b["tokens"].to_pylist() == \
        _reference_seqs(docs, seed=SEED + 1)[:5]


def test_persisted_fetch_prunes_buckets(ray_session, tmp_path):
    """Persisted plan + tokens: a window fetch reads ONLY overlapping
    bucket dirs — proven by corrupting every non-overlapping bucket
    file and fetching successfully anyway."""
    docs = _corpus(n_docs=120)
    ds = _tokens_ds(docs)
    plan = epoch_pack_plan(ds, SEQ_LEN, SEED)
    pdir, tdir = str(tmp_path / "plan"), str(tmp_path / "toks")
    persist_plan(plan, pdir, SEQ_LEN, seqs_per_bucket=8)
    persist_epoch_tokens(ds, tdir, SEED, n_buckets=8)
    want = _reference_seqs(docs)
    got = fetch_sequences(tdir, pdir, 8, 16, sep_id=SEP)
    assert got["tokens"].to_pylist() == want[8:16]

    # which buckets does [8, 16) need?
    plan_bucket = {"bucket=1"}  # seqs 8..15 with seqs_per_bucket=8
    import pyarrow.dataset as pads
    window_plan = pads.dataset(
        os.path.join(pdir, "bucket=1")).to_table()
    u = splitmix64(np.asarray(window_plan["doc_id"]).astype(np.uint64)
                   ^ np.uint64(SEED))
    tok_buckets = {f"bucket={b}" for b in np.unique(u >> np.uint64(61))}
    for root, needed in [(pdir, plan_bucket), (tdir, tok_buckets)]:
        for d in os.listdir(root):
            if d.startswith("bucket=") and d not in needed:
                for f in os.listdir(os.path.join(root, d)):
                    with open(os.path.join(root, d, f), "wb") as fh:
                        fh.write(b"corrupt")  # unreadable if opened
    again = fetch_sequences(tdir, pdir, 8, 16, sep_id=SEP)
    assert again["tokens"].to_pylist() == want[8:16]


def test_iter_epoch_resumes_and_terminates(ray_session):
    docs = _corpus(n_docs=40)
    ds = _tokens_ds(docs)
    plan = epoch_pack_plan(ds, SEQ_LEN, SEED)
    want = _reference_seqs(docs)
    seen = []
    for lo, t in iter_epoch(ds, plan, window=5, seq_len=SEQ_LEN,
                            sep_id=SEP):
        assert lo == len(seen)
        seen.extend(t["tokens"].to_pylist())
    assert seen == want
    # resume from a mid-epoch step counter
    resumed = []
    for lo, t in iter_epoch(ds, plan, window=5, start_seq=10,
                            seq_len=SEQ_LEN, sep_id=SEP):
        resumed.extend(t["tokens"].to_pylist())
    assert resumed == want[10:]


def test_missing_document_is_loud(ray_session):
    """A doc that is in the plan but absent from the token source leaves
    a hole in its sequences — the assembler's tiling check must fail
    loudly, never emit a silently-shifted sequence."""
    docs = _corpus(n_docs=20)
    ds = _tokens_ds(docs)
    plan = epoch_pack_plan(ds, SEQ_LEN, SEED)
    victim = sorted(docs)[3]
    holey = ds.filter(lambda r: r["doc_id"] != victim)
    with pytest.raises(Exception, match="tile"):
        fetch_sequences(holey, plan, 0, 200, seq_len=SEQ_LEN, sep_id=SEP)


def test_prefetch_iteration_identical(ray_session):
    docs = _corpus(n_docs=30)
    ds = _tokens_ds(docs)
    plan = epoch_pack_plan(ds, SEQ_LEN, SEED)
    plain = [(lo, t["tokens"].to_pylist())
             for lo, t in iter_epoch(ds, plan, window=4, seq_len=SEQ_LEN,
                                     sep_id=SEP)]
    pre = [(lo, t["tokens"].to_pylist())
           for lo, t in iter_epoch(ds, plan, window=4, seq_len=SEQ_LEN,
                                   sep_id=SEP, prefetch=True)]
    assert pre == plain and len(plain) > 2


def test_materialize_epoch_shards_and_resumes(ray_session, tmp_path):
    import pyarrow.parquet as pq_mod

    from raystack.ops.loader import materialize_epoch
    docs = _corpus(n_docs=50)
    ds = _tokens_ds(docs)
    plan = epoch_pack_plan(ds, SEQ_LEN, SEED)
    want = _reference_seqs(docs)
    out = str(tmp_path / "shards")
    r1 = materialize_epoch(ds, plan, out, shard_sequences=6,
                           seq_len=SEQ_LEN, sep_id=SEP)
    assert r1["sequences"] == len(want) and r1["skipped"] == 0
    shards = sorted(os.listdir(out))
    got = [row for f in shards
           for row in pq_mod.read_table(os.path.join(out, f))
           ["tokens"].to_pylist()]
    assert got == want
    # crash-resume: delete one mid-epoch shard; the re-run rewrites ONLY
    # it (every other shard skips on a footer read) and the epoch is
    # whole again
    victim = shards[1]
    os.remove(os.path.join(out, victim))
    r2 = materialize_epoch(ds, plan, out, shard_sequences=6,
                           seq_len=SEQ_LEN, sep_id=SEP)
    assert r2["skipped"] == len(shards) - 1 and r2["shards"] == len(shards)
    got2 = [row for f in sorted(os.listdir(out))
            for row in pq_mod.read_table(os.path.join(out, f))
            ["tokens"].to_pylist()]
    assert got2 == want


def test_count_column_mismatch_is_loud(ray_session):
    docs = _corpus(n_docs=10)
    ds = _tokens_ds(docs)
    bad = ds.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("n_tokens"), "n_tokens",
            pa.array(np.asarray(t["n_tokens"]) + 3)),
        batch_format="pyarrow")
    plan = epoch_pack_plan(bad, SEQ_LEN, SEED)
    with pytest.raises(Exception, match="disagrees"):
        fetch_sequences(ds, plan, 0, 50, seq_len=SEQ_LEN, sep_id=SEP)


def test_empty_docs_contribute_separators(ray_session):
    docs = {1: np.array([], np.int32), 2: np.array([5, 6, 7], np.int32),
            3: np.array([], np.int32)}
    ds = _tokens_ds(docs)
    plan = epoch_pack_plan(ds, 4, SEED)
    got = fetch_sequences(ds, plan, 0, 5, seq_len=4, sep_id=SEP)
    flat = [x for row in got["tokens"].to_pylist() for x in row]
    assert flat == _reference_stream(docs)
