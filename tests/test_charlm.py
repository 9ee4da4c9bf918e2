"""Character n-gram LM quality-scoring tests: training determinism,
boundary handling, score separation on the real testdata corpus, and
the filter composition."""

import numpy as np
import pyarrow as pa
import pytest

from raystack.ops.charlm import (_A, _trigram_counts_batch,
                                 counts_to_logprob, perplexity_filter,
                                 score_char_lm, train_char_lm)

SF = "/root/testdata/sf0.001"


def test_trigram_counts_respect_doc_boundaries():
    # "abc" + "def" must NOT produce the cross-doc trigrams bcd/cde
    t1 = pa.table({"text": pa.array(["abcdef"])})
    t2 = pa.table({"text": pa.array(["abc", "def"])})
    c1 = _trigram_counts_batch(t1, "text")
    c2 = _trigram_counts_batch(t2, "text")
    assert c1.sum() == 4  # abc bcd cde def
    assert c2.sum() == 2  # abc def

    def tri(s):
        ids = [ord(ch) - ord("a") + 1 for ch in s]
        return (ids[0] * _A + ids[1]) * _A + ids[2]
    assert c2[tri("abc")] == 1 and c2[tri("def")] == 1
    assert c2[tri("bcd")] == 0 and c2[tri("cde")] == 0


def test_counts_to_logprob_normalizes():
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 50, _A * _A * _A).astype(np.int64)
    lp = counts_to_logprob(counts)
    p = np.exp(lp.astype(np.float64)).reshape(_A * _A, _A)
    assert np.allclose(p.sum(axis=1), 1.0, atol=1e-4)


def test_char_lm_scores_separate_corpus_from_noise(ray_session):
    import ray

    from raystack.io import read_parquet_clean
    docs = read_parquet_clean(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"])
    lm = train_char_lm(docs, sample_rows=2000)
    assert lm.shape == (_A ** 3,)
    # train twice → identical table (deterministic)
    assert np.array_equal(lm, train_char_lm(docs, sample_rows=2000))

    rng = np.random.default_rng(3)
    corpusish = [r["text"] for r in docs.take(5)]
    gib = ["".join(chr(rng.integers(33, 126)) for _ in range(200))
           for _ in range(5)]
    b64 = ["QmFzZTY0IGJsb2Jz" * 12 for _ in range(5)]
    t = pa.table({"doc_id": pa.array(range(15), pa.int64()),
                  "text": pa.array(corpusish + gib + b64)})
    out = score_char_lm(ray.data.from_arrow(t), lm).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    m_c = out.logprob_per_char[:5].mean()
    m_g = out.logprob_per_char[5:10].mean()
    m_b = out.logprob_per_char[10:].mean()
    assert m_c > m_g + 1.0 and m_c > m_b + 1.0

    kept = perplexity_filter(
        ray.data.from_arrow(t), lm,
        min_logprob=(m_c + max(m_g, m_b)) / 2).to_pandas()
    assert sorted(kept.doc_id) == [0, 1, 2, 3, 4]


def test_char_lm_degenerate_docs(ray_session):
    import ray

    from raystack.io import read_parquet_clean
    docs = read_parquet_clean(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"])
    lm = train_char_lm(docs, sample_rows=500)
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["", "ab", "the merge join"])})
    out = score_char_lm(ray.data.from_arrow(t), lm).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.logprob_per_char[0] == 0.0
    assert out.logprob_per_char[1] == 0.0
    assert out.logprob_per_char[2] < 0.0
    with pytest.raises(ValueError, match="shape"):
        score_char_lm(ray.data.from_arrow(t), np.zeros(10, np.float32))
