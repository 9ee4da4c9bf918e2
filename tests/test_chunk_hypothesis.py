"""Property sweep: chunk_documents invariants under adversarial
unicode — multibyte characters straddling every candidate boundary,
whitespace-free runs, whitespace-only documents, empty strings.

Declared guarantees (for ANY whitespace layout): every chunk is valid
UTF-8 and at most target_chars bytes; every NON-WHITESPACE byte of the
original lands in at least one chunk; chunk_start is the true byte
offset of the chunk in the document; chunks come out in order."""

import pyarrow as pa
import ray
from hypothesis import given, settings, strategies as st

_doc = st.text(
    alphabet=st.one_of(st.sampled_from("ab \t\n€漢🎉é"),
                       st.characters(min_codepoint=32, max_codepoint=900)),
    max_size=300)
_docs = st.lists(_doc, min_size=1, max_size=6)


@settings(max_examples=20, deadline=None)
@given(_docs, st.integers(min_value=17, max_value=64),
       st.integers(min_value=8, max_value=8))
def test_chunk_documents_invariants(ray_session, docs, target, overlap):
    from raystack.ops.text import chunk_documents
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()),
         "text": pa.array(docs, pa.string())}))
    out = chunk_documents(ds, target_chars=target,
                          overlap_chars=overlap).to_pandas()
    by_doc = {}
    for _, row in out.iterrows():
        by_doc.setdefault(int(row["doc_id"]), []).append(row)
    for did, doc in enumerate(docs):
        raw = doc.encode("utf-8")
        rows = sorted(by_doc.get(did, []), key=lambda r: r["chunk_idx"])
        covered = bytearray(len(raw))
        for r in rows:
            piece = r["chunk_text"].encode("utf-8")  # valid UTF-8 or
            # the string column could not have been built at all
            assert len(piece) <= target, (doc, target)
            start = int(r["chunk_start"])
            # chunk_start is the TRUE offset: the bytes there match
            assert raw[start:start + len(piece)] == piece, \
                (doc, start, r["chunk_text"])
            for i in range(start, start + len(piece)):
                covered[i] = 1
        # every non-whitespace byte is covered by some chunk
        ws = set(b" \t\n\r\x0b\x0c")
        missed = [i for i, b in enumerate(raw)
                  if b not in ws and not covered[i]]
        assert not missed, (doc, missed[:5])
