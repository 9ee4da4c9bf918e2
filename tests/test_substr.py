"""ExactSubstr duplicate-span dedup vs a pure-Python brute-force reference
(token-tuple keyed — catches any hashing bug short of a real 2^-64
collision), plus broadcast/distributed parity and identity invariants."""

import numpy as np
import pyarrow as pa
import ray

from raystack.ops.substr import (dedup_substrings, duplicate_span_plan,
                                 strip_duplicate_spans)


def _isword(b: int) -> bool:
    return b >= 0x80 or b == 0x5F or chr(b).isalnum()


def _ref_tokens(s: bytes):
    spans, i, n = [], 0, len(s)
    while i < n:
        if _isword(s[i]):
            j = i
            while j < n and _isword(s[j]):
                j += 1
            spans.append((i, j))
            i = j
        else:
            i += 1
    return spans


def _ref_dedup(docs, L):
    """docs: list[(doc_id, text|None)] -> {doc_id: deduped text|None}."""
    toks, occ = {}, []
    for did, txt in docs:
        if txt is None:
            continue
        b = txt.encode("utf-8")
        sp = _ref_tokens(b)
        toks[did] = (b, sp)
        for i in range(len(sp) - L + 1):
            key = tuple(b[s:e] for s, e in sp[i:i + L])
            occ.append((key, did, sp[i][0], sp[i + L - 1][1]))
    from collections import Counter
    cnt = Counter(k for k, *_ in occ)
    seen, strip = set(), {}
    for key, did, p0, p1 in sorted(occ, key=lambda o: (o[1], o[2])):
        if cnt[key] < 2:
            continue
        if key not in seen:
            seen.add(key)
            continue
        strip.setdefault(did, []).append((p0, p1))
    out = {did: txt for did, txt in docs}
    for did, (b, sp) in toks.items():
        mask = np.ones(len(b), bool)
        for p0, p1 in strip.get(did, []):
            mask[p0:p1] = False
        out[did] = bytes(np.frombuffer(b, np.uint8)[mask]).decode("utf-8")
    return out


BOILER = ("subscribe to our newsletter for the latest updates and offers "
          "every single week without fail thanks")
SHARED = "the quick brown fox jumps over the lazy dog again and again"
UNI = "héllo wörld — naïve café crème brûlée déjà vu encore une fois"


def _corpus():
    return [
        (0, f"intro text one. {BOILER}. unique tail zero."),
        (1, f"different head here. {BOILER}. and another ending one."),
        (2, f"{SHARED} plus some trailing words two."),
        (3, f"prefix three {SHARED} suffix three."),
        # self-duplicate within one doc
        (4, f"alpha {SHARED} middle part {SHARED} omega."),
        # unicode duplicate pair
        (5, f"avant {UNI} après cinq."),
        (6, f"{UNI} et du texte supplémentaire six."),
        (7, "totally unique short document seven nothing repeats here."),
        (8, ""),
        (9, None),
        (10, "tiny"),
    ]


def _run(docs, L, **kw):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    })).repartition(4)
    out = dedup_substrings(ds, min_tokens=L, **kw).to_pandas()
    return {int(r.doc_id): (None if r.text is None else r.text)
            for r in out.itertuples()}


SF = "/root/testdata/sf0.001"


def test_matches_bruteforce_reference(ray_session):
    docs = _corpus()
    L = 5
    got = _run(docs, L)
    want = _ref_dedup(docs, L)
    assert set(got) == set(want)
    for did in want:
        assert got[did] == want[did], (did, got[did], want[did])


def test_distributed_parity(ray_session):
    docs = _corpus()
    L = 5
    want = _ref_dedup(docs, L)
    got = _run(docs, L, broadcast_limit=0)  # force every scale path
    for did in want:
        assert got[did] == want[did], (did, got[did], want[did])


def test_no_duplicates_is_identity(ray_session):
    docs = [(i, " ".join(f"w{i}_{j}" for j in range(12))) for i in range(6)]
    got = _run(docs, 4)
    for did, txt in docs:
        assert got[did] == txt


def test_first_occurrence_intact_and_bytes_subsequence(ray_session):
    docs = _corpus()
    got = _run(docs, 5)
    # doc 0 holds the first occurrence of BOILER -> byte-identical
    assert got[0] == docs[0][1]
    # doc 2 holds the first occurrence of SHARED
    assert got[2] == docs[2][1]
    # every output is a subsequence of its input's bytes
    for did, txt in docs:
        if txt is None:
            assert got[did] is None
            continue
        it = iter(txt.encode())
        assert all(any(b == c for c in it) for b in got[did].encode())


def test_strip_spans_unions_overlaps(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["abcdefghij"], pa.string())}))
    spans = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([7, 7, 7], pa.int64()),
        "b0": pa.array([1, 3, 8], pa.int64()),
        "b1": pa.array([4, 6, 99], pa.int64())}))
    out = strip_duplicate_spans(ds, spans).to_pandas()
    assert out.text[0] == "agh"
    out2 = strip_duplicate_spans(ds, spans, broadcast_limit=0).to_pandas()
    assert out2.text[0] == "agh"


def test_plan_rows_are_nonfirst_occurrences(ray_session):
    docs = _corpus()
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string())}))
    plan = duplicate_span_plan(ds, min_tokens=5).to_pandas()
    # doc 0 and doc 2 are winners (first corpus occurrence) — never stripped
    assert not ((plan.doc_id == 0).any() or (plan.doc_id == 2).any())
    # doc 1 loses the boilerplate; doc 4's second SHARED loses to its first
    assert (plan.doc_id == 1).any() and (plan.doc_id == 4).any()


def test_real_corpus_smoke(ray_session):
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    n_in = ds.count()
    out = dedup_substrings(ds, min_tokens=24)
    df = out.to_pandas()
    assert len(df) == n_in
    # only byte-subtractive edits: total bytes never grow
    src = ds.to_pandas().set_index("doc_id").text
    for did, txt in df.set_index("doc_id").text.items():
        assert len(txt.encode()) <= len(src[did].encode())
