"""Property sweep: distributed BPE training vs the naive full-recount
reference over RANDOM corpora. A two-letter-plus-multibyte alphabet
maximizes pair-count ties, hammering the documented tie contract
(highest count, then smallest (a, b) pair) and the bounded word-type
reduction, across partitionings."""

import pyarrow as pa
import ray.data
from hypothesis import given, settings, strategies as st

from raystack.ops.bpe import train_bpe

from test_bpe import _ref_train, _ref_word_freqs

_word = st.text(alphabet=["a", "b", "é"], min_size=1, max_size=6)
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(st.one_of(st.none(), _doc), min_size=1, max_size=12)


@settings(max_examples=8, deadline=None)
@given(_corpus, st.integers(min_value=1, max_value=20),
       st.sampled_from([1, 3, 5]))
def test_train_bpe_matches_reference_on_random_corpora(
        ray_session, texts, n_merges, parts):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(parts)
    tok = train_bpe(ds, vocab_size=256 + n_merges)
    want = _ref_train(_ref_word_freqs(texts), n_merges)
    assert tok["merges"] == want, (texts, n_merges)
