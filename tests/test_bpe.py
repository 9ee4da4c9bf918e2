"""BPE training vs an independent naive full-recount reference, merge
application round-trips (ids expand back to the exact word bytes), and the
corpus-level actor-pool stage on real testdata."""

import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from raystack.ops.bpe import (BpeEncoder, _encode_word, add_bpe_ids,
                              train_bpe, word_frequencies)

SF = "/root/testdata/sf0.001"


def _ref_word_freqs(texts):
    freqs = {}
    for s in texts:
        if s is None:
            continue
        for w in re.split(r"\W+", s.lower(), flags=re.ASCII):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    return freqs


def _ref_train(freqs, n_merges):
    """Naive reference: full pair recount every step, ties -> smallest
    (a, b) pair — same contract, independent implementation."""
    reprs = {w: list(w.encode("utf-8")) for w in freqs}
    merges = []
    for step in range(n_merges):
        counts = {}
        for w, f in freqs.items():
            r = reprs[w]
            for p in zip(r, r[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        m = max(counts.values())
        pair = min(p for p, c in counts.items() if c == m)
        merges.append(pair)
        new_id = 256 + step
        for w, r in reprs.items():
            out, i = [], 0
            while i < len(r):
                if i + 1 < len(r) and (r[i], r[i + 1]) == pair:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(r[i])
                    i += 1
            reprs[w] = out
    return merges


def _expansion(merges):
    exp = {i: bytes([i]) for i in range(256)}
    for t, (a, b) in enumerate(merges):
        exp[256 + t] = exp[a] + exp[b]
    return exp


CORPUS = [
    "the cat sat on the mat and the cat ran",
    "the dog sat on the log and the dog ran fast",
    "cats and dogs running on mats and logs",
    "thé déjà-vu café cat",  # multibyte words share byte pairs
    None,
    "",
]


def _ds(texts=CORPUS):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(3)


def test_word_frequencies_exact(ray_session):
    wf = word_frequencies(_ds(), max_word_types=1000).to_pandas()
    want = _ref_word_freqs(CORPUS)
    got = dict(zip(wf["word"], wf["n"]))
    assert got == want
    # ordering: (n desc, word asc)
    key = [(-n, w) for w, n in zip(wf["word"], wf["n"])]
    assert key == sorted(key)


def test_train_matches_naive_reference(ray_session):
    tok = train_bpe(_ds(), vocab_size=256 + 40)
    want = _ref_train(_ref_word_freqs(CORPUS), 40)
    assert tok["merges"] == want


def test_encode_round_trips_word_bytes(ray_session):
    tok = train_bpe(_ds(), vocab_size=256 + 30)
    ranks = {tuple(p): i for i, p in enumerate(tok["merges"])}
    exp = _expansion(tok["merges"])
    for w in ["the", "cats", "running", "déjà", "zzzunseenzzz"]:
        ids = _encode_word(w.encode("utf-8"), ranks)
        assert b"".join(exp[i] for i in ids) == w.encode("utf-8")
        assert all(0 <= i < tok["vocab_size"] for i in ids)


def test_corpus_stage_reconstructs_rows(ray_session):
    tok = train_bpe(_ds(), vocab_size=256 + 30)
    out = add_bpe_ids(_ds(), tok).to_pandas().sort_values("doc_id")
    exp = _expansion(tok["merges"])
    for _, row in out.iterrows():
        txt = CORPUS[int(row.doc_id)]
        words = ([w for w in re.split(r"\W+", txt.lower(), flags=re.ASCII) if w]
                 if txt else [])
        got = b"".join(exp[int(i)] for i in row.bpe_ids)
        assert got == "".join(words).encode("utf-8")
        assert row.bpe_ids_n == len(row.bpe_ids)


def test_real_corpus_train_and_tokenize(ray_session):
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    tok = train_bpe(ds, vocab_size=256 + 64, max_word_types=50_000)
    assert len(tok["merges"]) == 64
    out = add_bpe_ids(ds, tok).to_pandas()
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    assert len(out) == t.num_rows
    # BPE must compress: fewer tokens than raw bytes, more than words
    raw = sum(len(s) for s in t["text"].to_pylist())
    assert 0 < out.bpe_ids_n.sum() < raw
    # spot-check exact reconstruction on 20 docs
    exp = _expansion(tok["merges"])
    src = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    for _, row in out.head(20).iterrows():
        words = [w for w in re.split(r"\W+", src[row.doc_id].lower(), flags=re.ASCII) if w]
        assert b"".join(exp[int(i)] for i in row.bpe_ids) == \
            "".join(words).encode("utf-8")


def test_tokenizer_save_load_decode_roundtrip(ray_session, tmp_path):
    """A persisted tokenizer reproduces identical ids, and decode_ids
    reverses tokenization to the exact word bytes."""
    import ray.data

    from raystack.ops.bpe import (add_bpe_ids, decode_ids, load_tokenizer,
                                  save_tokenizer, train_bpe, vocab_bytes)
    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"])
    tok = train_bpe(docs, vocab_size=256 + 32)
    p = str(tmp_path / "tok.json")
    save_tokenizer(tok, p)
    tok2 = load_tokenizer(p)
    assert tok2 == tok

    a = add_bpe_ids(docs, tok).to_pandas().sort_values("doc_id")
    b = add_bpe_ids(docs, tok2).to_pandas().sort_values("doc_id")
    assert [list(x) for x in a["bpe_ids"]] == \
        [list(x) for x in b["bpe_ids"]]

    # detokenization: ids -> the document's own word bytes
    import re
    row = a.iloc[len(a) // 3]
    text = docs.to_pandas().set_index("doc_id") \
        .loc[row["doc_id"], "text"]
    words = [w for w in re.split(r"\W+", text.lower()) if w]
    assert decode_ids(tok, row["bpe_ids"]) == "".join(words).encode()

    # every merge concatenates its parts (vocab table self-consistent)
    v = vocab_bytes(tok)
    for i, (x, y) in enumerate(tok["merges"]):
        assert v[256 + i] == v[x] + v[y]

    import pytest as _pytest
    (tmp_path / "bad.json").write_text('{"format": "other"}')
    with _pytest.raises(ValueError, match="not a raystack-bpe"):
        load_tokenizer(str(tmp_path / "bad.json"))
