"""Property sweep: fetch_sequences vs the pure shuffled-concat oracle
over RANDOM corpus shapes — empty docs, docs longer than seq_len,
multi-token separators, tiny seq_len, arbitrary seeds — extending
test_loader.py's fixed-corpus checks. tokens and doc_starts must both
match the reference for every shape."""

import numpy as np
import pyarrow as pa
import ray.data
from hypothesis import given, settings, strategies as st

from raystack.ops.hashing import splitmix64
from raystack.ops.loader import epoch_pack_plan, fetch_sequences

SEP = -1


def _reference(docs: dict, seq_len: int, seed: int, sep_tokens: int):
    """(sequences, per-sequence doc_starts) of the shuffled concat
    stream — the loader's declared ground truth."""
    ids = np.array(sorted(docs), np.int64)
    ranks = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
    order = ids[np.argsort(ranks)]
    stream, starts, pos = [], [], 0
    for d in order:
        starts.append(pos)
        stream.extend(int(x) for x in docs[d])
        stream.extend([SEP] * sep_tokens)
        pos += len(docs[d]) + sep_tokens
    seqs = [stream[i:i + seq_len] for i in range(0, len(stream), seq_len)]
    ds_ = [[] for _ in seqs]
    for p in starts:
        ds_[p // seq_len].append(p % seq_len)
    return seqs, ds_


def _tokens_ds(docs):
    ids = sorted(docs)
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "bpe_ids": pa.array([docs[i] for i in ids], pa.list_(pa.int32())),
        "n_tokens": pa.array([len(docs[i]) for i in ids], pa.int64()),
    }))


_corpora = st.dictionaries(
    st.integers(min_value=0, max_value=10**6),            # doc ids
    st.lists(st.integers(min_value=0, max_value=999),     # token lists
             min_size=0, max_size=25),                    # incl. EMPTY docs
    min_size=1, max_size=12)


@settings(max_examples=10, deadline=None)
@given(_corpora,
       st.integers(min_value=2, max_value=9),     # seq_len incl. < doc len
       st.integers(min_value=0, max_value=2**31),
       st.integers(min_value=1, max_value=3))     # sep_tokens
def test_fetch_matches_reference(ray_session, docs, seq_len, seed,
                                 sep_tokens):
    want, want_starts = _reference(docs, seq_len, seed, sep_tokens)
    ds = _tokens_ds(docs)
    plan = epoch_pack_plan(ds, seq_len, seed, sep_tokens=sep_tokens)
    got = fetch_sequences(ds, plan, 0, len(want) + 3, seq_len=seq_len,
                          sep_id=SEP, sep_tokens=sep_tokens)
    assert got.num_rows == len(want), (docs, seq_len, seed, sep_tokens)
    assert got["seq_id"].to_pylist() == list(range(len(want)))
    assert got["tokens"].to_pylist() == want
    assert got["doc_starts"].to_pylist() == want_starts


@settings(max_examples=6, deadline=None)
@given(_corpora, st.integers(min_value=0, max_value=2**31))
def test_window_fetch_equals_full_fetch_slice(ray_session, docs, seed):
    seq_len = 5
    want, _ = _reference(docs, seq_len, seed, 1)
    if len(want) < 3:
        return
    ds = _tokens_ds(docs)
    plan = epoch_pack_plan(ds, seq_len, seed)
    lo, hi = 1, min(3, len(want))
    got = fetch_sequences(ds, plan, lo, hi, seq_len=seq_len, sep_id=SEP)
    assert got["tokens"].to_pylist() == want[lo:hi]
