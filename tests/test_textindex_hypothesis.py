"""Property sweep: the persisted inverted index + BM25 vs DuckDB on
RANDOM corpora — tiny vocabularies force heavy tf/df collisions and
score ties, empty docs, queries with absent/duplicated words, varied
k1/b. The fixed-corpus mirror lives in test_ops.py; this sweep
randomizes the shapes that stress tie-breaking and the posting math."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data
from hypothesis import given, settings, strategies as st

from raystack.ops.textindex import (bm25_topk, build_text_index,
                                    query_text_index)

_VOCAB = ["alpha", "beta", "gamma", "delta", "eps"]

_docs = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=8),
    min_size=1, max_size=10)
_query = st.lists(st.sampled_from(_VOCAB + ["zzabsent"]),
                  min_size=1, max_size=3)


def _corpus_table(docs):
    return pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array([" ".join(d) for d in docs], pa.string()),
    })


def _bm25_oracle(docs, words, k, k1, b):
    con = duckdb.connect()
    con.register("docs", _corpus_table(docs).to_pandas())
    wlist = ", ".join(f"'{w}'" for w in dict.fromkeys(words))
    return con.execute(f"""
        WITH toks AS (
          SELECT doc_id, tok.x AS token
          FROM docs, UNNEST(list_filter(string_split_regex(lower(text),
               '\\W+'), x -> x <> '')) AS tok(x)),
        tf AS (SELECT doc_id, token, count(*)::DOUBLE AS tf
               FROM toks GROUP BY 1, 2),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY 1),
        stats AS (SELECT (SELECT count(*) FROM docs)::DOUBLE AS n,
                         (SELECT sum(dl) FROM dl)
                         / (SELECT count(*) FROM docs)::DOUBLE AS avgdl),
        df AS (SELECT token, count(*)::DOUBLE AS df FROM tf
               WHERE token IN ({wlist}) GROUP BY 1)
        SELECT tf.doc_id,
               sum(ln(1 + ((SELECT n FROM stats) - df.df + 0.5)
                          / (df.df + 0.5))
                   * tf.tf * ({k1} + 1)
                   / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl
                                      / (SELECT avgdl FROM stats))))
                   AS score
        FROM tf JOIN dl USING (doc_id) JOIN df USING (token)
        WHERE tf.token IN ({wlist})
        GROUP BY 1 ORDER BY score DESC, doc_id LIMIT {k}
    """).df()


@settings(max_examples=6, deadline=None)
@given(_docs, _query, st.sampled_from([(1.2, 0.75), (0.9, 0.4)]),
       st.integers(min_value=1, max_value=5))
def test_bm25_matches_duckdb_on_random_corpora(ray_session, tmp_path_factory,
                                               docs, words, params, k):
    k1, b = params
    idx = str(tmp_path_factory.mktemp("bmx") / "idx")
    build_text_index(ray.data.from_arrow(_corpus_table(docs)), idx,
                     num_buckets=4)
    got_ds = bm25_topk(idx, words, k=k, k1=k1, b=b)
    oracle = _bm25_oracle(docs, words, k, k1, b)
    if not len(oracle):
        # Ray's to_pandas drops a 0-row Dataset's columns — compare by
        # count (the Dataset-level schema keeps (doc_id, score))
        assert got_ds.count() == 0, (docs, words)
        return
    got = got_ds.to_pandas()
    assert got["doc_id"].tolist() == oracle["doc_id"].tolist(), (docs,
                                                                 words)
    assert np.allclose(got["score"], oracle["score"], rtol=1e-9)


@settings(max_examples=6, deadline=None)
@given(_docs, _query, st.sampled_from(["and", "or"]))
def test_keyword_query_matches_set_oracle(ray_session, tmp_path_factory,
                                          docs, words, mode):
    idx = str(tmp_path_factory.mktemp("kwx") / "idx")
    build_text_index(ray.data.from_arrow(_corpus_table(docs)), idx,
                     num_buckets=4)
    got = sorted(r["doc_id"] for r in
                 query_text_index(idx, words, mode=mode).take_all())
    wset = set(words)
    if mode == "and":
        exp = [i for i, d in enumerate(docs) if wset <= set(d)]
    else:
        exp = [i for i, d in enumerate(docs) if wset & set(d)]
    assert got == exp, (docs, words, mode)
