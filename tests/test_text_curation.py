"""Webtext-curation text ops: whitespace normalization, PII redaction,
Gopher-style repetition signals. Each is oracled in-test against DuckDB
(same RE2 regex engine) or a pure-Python reference."""

import re
from collections import Counter

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray

from raystack.ops.text import (REDACT_RULES, add_normalized_text,
                               add_redacted, add_repetition_stats)

DOCS = "/root/testdata/sf0.001/documents.parquet"

SYNTH = [
    "line one\nline two\nline one\nline one",
    "a b a b a b a b c",
    "To be continued...\nmore...\nplain line",
    "",
    "   leading and trailing   \t mixed\n\nwhitespace  ",
    "email me at jo.doe+x@example.co.uk or 10.0.0.1 ok",
    "call +1 (555) 123-4567 now",
    "single",
    "dup\ndup",
]


def _synth_ds():
    return ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(SYNTH))), "text": SYNTH}))


def test_normalized_text_oracle():
    ds = add_normalized_text(ray.data.read_parquet(DOCS,
                                                   columns=["doc_id", "text"]))
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(
        f"SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) "
        f"AS text_norm FROM '{DOCS}' ORDER BY doc_id").df()
    assert got["text_norm"].tolist() == want["text_norm"].tolist()


def test_redacted_oracle_synthetic():
    got = add_redacted(_synth_ds()).to_pandas() \
        .sort_values("doc_id")["text_redacted"].tolist()
    con = duckdb.connect()
    expr = "text"
    for pat, repl in REDACT_RULES:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    import pandas as pd
    t = pd.DataFrame({"doc_id": range(len(SYNTH)), "text": SYNTH})
    con.register("t", t)
    want = con.execute(f"SELECT {expr} AS r FROM t ORDER BY doc_id") \
        .df()["r"].tolist()
    assert got == want
    joined = "\n".join(got)
    assert "<EMAIL>" in joined and "<IP>" in joined and "<PHONE>" in joined
    assert "example.co.uk" not in joined and "555" not in joined


def test_repetition_stats_line_oracle():
    # dup-line + ellipsis-line fractions vs a DuckDB list-kernel mirror,
    # over the real corpus plus the synthetic edge cases
    import pandas as pd
    real = duckdb.sql(
        f"SELECT doc_id, text FROM '{DOCS}' LIMIT 200").df()
    synth = pd.DataFrame({"doc_id": [10_000 + i for i in range(len(SYNTH))],
                          "text": SYNTH})
    df = pd.concat([real, synth], ignore_index=True)
    ds = add_repetition_stats(ray.data.from_pandas(df))
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT doc_id,
          1.0 - len(list_distinct(string_split(text, chr(10)))) * 1.0
              / greatest(len(string_split(text, chr(10))), 1)
            AS dup_line_frac,
          len(list_filter(string_split(text, chr(10)),
                          l -> l LIKE '%...')) * 1.0
              / greatest(len(string_split(text, chr(10))), 1)
            AS ellipsis_line_frac
        FROM t ORDER BY doc_id""").df()
    np.testing.assert_allclose(got["dup_line_frac"], want["dup_line_frac"])
    np.testing.assert_allclose(got["ellipsis_line_frac"],
                               want["ellipsis_line_frac"])


def _top_2gram_ref(text: str) -> float:
    toks = [t for t in re.split(r"\s+", text) if t]
    if len(toks) < 2:
        return 0.0
    c = Counter(zip(toks, toks[1:]))
    return max(c.values()) * 2.0 / len(toks)


def test_repetition_stats_top2gram_reference():
    got = add_repetition_stats(_synth_ds()).to_pandas() \
        .sort_values("doc_id")
    want = [_top_2gram_ref(s) for s in SYNTH]
    np.testing.assert_allclose(got["top_2gram_frac"].tolist(), want)
    # "a b a b a b a b c": top 2-gram (a,b) occurs 4x over 9 tokens
    assert got["top_2gram_frac"].tolist()[1] == pytest.approx(8 / 9)


def test_repetition_stats_real_corpus_sane():
    ds = add_repetition_stats(
        ray.data.read_parquet(DOCS, columns=["doc_id", "text"]))
    df = ds.to_pandas()
    for c in ("dup_line_frac", "ellipsis_line_frac", "top_2gram_frac"):
        assert ((df[c] >= 0) & (df[c] <= 1)).all()
    # spot-check one real doc against the pure-Python reference
    row = df.iloc[0]
    text = duckdb.sql(
        f"SELECT text FROM '{DOCS}' WHERE doc_id = {row['doc_id']}"
    ).fetchone()[0]
    assert row["top_2gram_frac"] == pytest.approx(_top_2gram_ref(text))


def test_top_ngrams_oracle():
    import duckdb
    import pandas as pd
    from raystack.ops.text import top_ngrams
    df = duckdb.sql(f"SELECT doc_id, text FROM '{DOCS}'").df()
    got = top_ngrams(ray.data.from_pandas(df), n=2, k=15,
                     per_batch_cut=1 << 20)  # no cut → exact
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(r"""
        WITH toks AS (
          SELECT list_filter(string_split_regex(text, '\s+'),
                             x -> x <> '') AS p FROM t),
        grams AS (
          SELECT struct_extract(z, 1) || ' ' || struct_extract(z, 2) AS g
          FROM (SELECT unnest(list_zip(p[1:len(p)-1], p[2:])) AS z
                FROM toks WHERE len(p) >= 2))
        SELECT g AS ngram, count(*) AS n FROM grams
        GROUP BY g ORDER BY n DESC, g LIMIT 15""").df()
    assert got["ngram"].tolist() == want["ngram"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_top_ngrams_trigram_and_boundaries(ray_session):
    import pyarrow as pa
    import ray.data
    from raystack.ops.text import top_ngrams
    t = pa.table({"doc_id": [0, 1, 2],
                  "text": ["a b c a b c", "c a b", ""]})
    got = top_ngrams(ray.data.from_arrow(t), n=3, k=3,
                     per_batch_cut=1 << 20)
    # "a b c" x2 (doc0) — no n-gram may span documents (doc1's "c a b"
    # would otherwise create a third "a b c" with doc2)
    assert got.iloc[0]["ngram"] == "a b c" and got.iloc[0]["n"] == 2


def test_flag_contamination_vs_duckdb(ray_session):
    # semantic mirror: a doc is contaminated iff it shares a word
    # 3-gram (lowercased, \W+ tokenized) with the benchmark set —
    # DuckDB computes the overlap on the STRINGS, the op on 64-bit
    # hashes (a disagreement needs a 2^-64 collision)
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data
    from raystack.ops.text import flag_contamination

    t = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                      columns=["doc_id", "text"])
    # benchmark: eval-style snippets — some lifted from the corpus
    # (planted contamination), some novel
    lifted = [" ".join(s.split()[2:9]) for s in
              t["text"].to_pylist()[:5] if len(s.split()) >= 9]
    bench = pa.table({"text": lifted + [
        "the quick brown fox jumps over benchmarks",
        "zzz entirely novel held out sequence qqq"]})

    got = flag_contamination(ray.data.from_arrow(t), bench, n=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("docs", t.to_pandas())
    con.register("bench", bench.to_pandas())
    want = con.execute(r"""
        WITH dt AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(text), '\W+'), x -> x <> '') p
          FROM docs),
        dg AS (
          SELECT doc_id, struct_extract(z,1) || ' ' || struct_extract(z,2)
                 || ' ' || struct_extract(z,3) AS g
          FROM (SELECT doc_id, unnest(list_zip(p[1:len(p)-2], p[2:len(p)-1],
                       p[3:])) z FROM dt WHERE len(p) >= 3)),
        bt AS (
          SELECT list_filter(
            string_split_regex(lower(text), '\W+'), x -> x <> '') p
          FROM bench),
        bg AS (
          SELECT DISTINCT struct_extract(z,1) || ' ' || struct_extract(z,2)
                 || ' ' || struct_extract(z,3) AS g
          FROM (SELECT unnest(list_zip(p[1:len(p)-2], p[2:len(p)-1],
                       p[3:])) z FROM bt WHERE len(p) >= 3))
        SELECT d.doc_id,
               count(*) FILTER (WHERE bg.g IS NOT NULL) > 0 AS contaminated,
               count(bg.g) AS contam_ngrams
        FROM dg d LEFT JOIN bg ON d.g = bg.g
        GROUP BY d.doc_id ORDER BY d.doc_id""").df()
    # docs with no 3-grams at all never appear in `want` — they are
    # trivially clean
    merged = got.merge(want, on="doc_id", how="left",
                       suffixes=("", "_sql"))
    merged["contaminated_sql"] = merged["contaminated_sql"].fillna(False)
    merged["contam_ngrams_sql"] = \
        merged["contam_ngrams_sql"].fillna(0).astype(int)
    assert merged["contaminated"].equals(
        merged["contaminated_sql"].astype(bool))
    assert merged["contam_ngrams"].tolist() == \
        merged["contam_ngrams_sql"].tolist()
    # the plant worked: some contamination found, not everything flagged
    assert 0 < merged["contaminated"].sum() < len(merged)


def test_flag_contamination_edges(ray_session):
    import pyarrow as pa
    import ray.data
    from raystack.ops.text import flag_contamination
    t = pa.table({"doc_id": [0, 1, 2, 3],
                  "text": ["alpha beta gamma delta", "alpha beta", "",
                           None]})
    bench = pa.table({"text": ["ALPHA beta?? gamma", "nope"]})
    got = flag_contamination(ray.data.from_arrow(t), bench, n=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # lowercasing + \W+ tokenizing make "ALPHA beta?? gamma" hit doc 0;
    # doc 1 is shorter than n; empty/null docs never flag
    assert got["contaminated"].tolist() == [True, False, False, False]
    assert got["contam_ngrams"].tolist() == [1, 0, 0, 0]


def test_chunk_documents_invariants(ray_session):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data
    from raystack.ops.text import chunk_documents

    t = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                      columns=["doc_id", "text"])
    target, overlap = 200, 40
    got = chunk_documents(ray.data.from_arrow(t), target_chars=target,
                          overlap_chars=overlap).to_pandas() \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    orig = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    assert set(got["doc_id"]) == set(orig)  # every doc represented
    for doc_id, g in got.groupby("doc_id"):
        s = orig[doc_id].encode()
        covered = np.zeros(len(s), dtype=bool)
        for _, r in g.iterrows():
            cb = r["chunk_text"].encode()
            assert len(cb) <= target
            # substring at the recorded offset
            assert s[r["chunk_start"]:r["chunk_start"] + len(cb)] == cb
            covered[r["chunk_start"]:r["chunk_start"] + len(cb)] = True
        # every non-whitespace byte is in at least one chunk
        ws = np.frombuffer(s, np.uint8)
        is_ws = (ws == 32) | (ws == 10) | (ws == 9) | (ws == 13)
        assert covered[~is_ws].all()
        # consecutive chunks overlap (context carry-over)
        st = g["chunk_start"].to_numpy()
        en = st + g["chunk_text"].str.encode("utf-8").str.len().to_numpy()
        if len(st) > 1:
            assert (st[1:] < en[:-1]).all()

    # short docs pass through as themselves
    small = pa.table({"doc_id": [1], "text": ["tiny doc"]})
    one = chunk_documents(ray.data.from_arrow(small), target_chars=100,
                          overlap_chars=10).to_pandas()
    assert one["chunk_text"].tolist() == ["tiny doc"] \
        and one["chunk_idx"].tolist() == [0]

    # multibyte text with NO whitespace: hard cuts must stay UTF-8-valid
    uni = pa.table({"doc_id": [7], "text": ["é" * 501]})
    u = chunk_documents(ray.data.from_arrow(uni), target_chars=100,
                        overlap_chars=20).to_pandas()
    assert all(isinstance(x, str) for x in u["chunk_text"])
    recon = set("".join(u["chunk_text"]))
    assert recon == {"é"}
    # deterministic
    u2 = chunk_documents(ray.data.from_arrow(uni), target_chars=100,
                         overlap_chars=20).to_pandas()
    assert u["chunk_text"].tolist() == u2["chunk_text"].tolist()


def test_chunk_documents_degenerate(ray_session):
    import pyarrow as pa
    import ray.data
    from raystack.ops.text import chunk_documents
    t = pa.table({"doc_id": [1, 2, 3], "text": ["", "   \n\t  ", None]})
    got = chunk_documents(ray.data.from_arrow(t), target_chars=64,
                          overlap_chars=8).to_pandas()
    # degenerate docs each yield exactly one (empty-ish) chunk row
    assert sorted(got["doc_id"]) == [1, 2, 3]
    assert (got["chunk_idx"] == 0).all()
    import pytest
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(ray.data.from_arrow(t), target_chars=10,
                        overlap_chars=8)


def test_chunk_documents_property(ray_session):
    # property check of the chunking geometry over adversarial text:
    # whitespace runs, multibyte codepoints, boundary-aligned spaces
    import numpy as np
    import pyarrow as pa
    import ray.data
    from hypothesis import given, settings, strategies as st
    from raystack.ops.text import chunk_documents

    alphabet = st.sampled_from(list("ab \n\twordé中🙂  "))
    texts = st.lists(st.text(alphabet, min_size=0, max_size=600),
                     min_size=1, max_size=6)
    params = st.sampled_from([(64, 8), (100, 20), (48, 16), (257, 31)])

    @settings(max_examples=25, deadline=None)
    @given(texts=texts, tp=params)
    def run(texts, tp):
        target, overlap = tp
        t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        got = chunk_documents(ray.data.from_arrow(t), target_chars=target,
                              overlap_chars=overlap).to_pandas()
        assert set(got["doc_id"]) == set(range(len(texts)))
        for doc_id, g in got.groupby("doc_id"):
            s = texts[doc_id].encode()
            covered = np.zeros(len(s), dtype=bool)
            for _, r in g.iterrows():
                cb = r["chunk_text"].encode()
                assert len(cb) <= target  # hard cap
                assert s[r["chunk_start"]:r["chunk_start"] + len(cb)] == cb
                covered[r["chunk_start"]:r["chunk_start"] + len(cb)] = True
            b = np.frombuffer(s, np.uint8)
            is_ws = (b == 32) | (b == 10) | (b == 9) | (b == 13)
            assert covered[~is_ws].all()  # full non-ws coverage

    run()


def test_add_extracted_text_invariant_and_oracle(ray_session, tmp_path):
    """The north-star per-row invariant: text extracted from html is
    byte-identical to the stored text column per url — plus a DuckDB
    mirror of the extractor (hex/unhex/position arithmetic over the
    BLOB) and the degenerate rows (missing tags, null payload,
    undecodable bytes)."""
    import duckdb
    import ray.data

    from raystack.gen import make_webtext
    from raystack.ops.text import add_extracted_text

    t = make_webtext(800, seed=5)
    got = add_extracted_text(ray.data.from_arrow(t)) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    want = t.to_pandas().sort_values("url").reset_index(drop=True)
    # byte-identical per url (includes the 5% of rows whose html carries
    # non-UTF-8 bytes OUTSIDE <main> — extraction must still be exact)
    assert got["text_extracted"].tolist() == want["text"].tolist()

    # DuckDB mirror: locate the tags in hex space, unhex the span
    con = duckdb.connect()
    con.register("pages", t.select(["url", "html"]).to_pandas())
    mirror = con.execute("""
        SELECT url,
          CASE WHEN position('3C6D61696E3E' IN hex(html)) > 0
                AND position('3C2F6D61696E3E' IN hex(html))
                    >= position('3C6D61696E3E' IN hex(html)) + 12
          THEN decode(unhex(substring(hex(html),
                 position('3C6D61696E3E' IN hex(html)) + 12,
                 position('3C2F6D61696E3E' IN hex(html))
                   - position('3C6D61696E3E' IN hex(html)) - 12)))
          ELSE NULL END AS text_extracted
        FROM pages ORDER BY url""").df()
    assert got["text_extracted"].tolist() == \
        mirror["text_extracted"].tolist()

    # degenerate rows: no tags → null, null html → null, close before
    # open → null, invalid UTF-8 INSIDE main → only that row null
    import pyarrow as pa
    edge = pa.table({
        "url": pa.array(["a", "b", "c", "d", "e", "f"]),
        "html": pa.array([b"plain bytes", None,
                          b"</main>zz<main>", b"<main>ok</main>",
                          b"<main>\xff\xfe</main>",
                          # stray close BEFORE the open: the contract is
                          # the first close AFTER the open (index(close, i))
                          b"</main><main>X</main>"], pa.binary()),
    })
    out = add_extracted_text(ray.data.from_arrow(edge)) \
        .to_pandas().sort_values("url")
    assert out["text_extracted"].tolist() == \
        [None, None, None, "ok", None, "X"]


def test_flag_blocklist_both_tiers_vs_duckdb(ray_session):
    import duckdb
    import pyarrow.parquet as pq
    import ray.data
    from raystack.ops.text import flag_blocklist

    t = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                      columns=["doc_id", "text"])
    ds = ray.data.from_arrow(t)
    words = ["stream", "query", "zzzyxx"]
    con = duckdb.connect()
    con.register("docs", t.to_pandas())
    exp = con.execute(
        "SELECT doc_id, list_has_any(list_filter(string_split_regex("
        "lower(text), '\\W+'), x -> x <> ''), "
        "['stream', 'query', 'zzzyxx']) AS blocked "
        "FROM docs ORDER BY doc_id").df()

    # regex-alternation tier
    got = flag_blocklist(ds, words).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["blocked"].tolist() == exp["blocked"].tolist()
    # token-set tier (force it with a tiny regex_limit)
    got2 = flag_blocklist(ds, words, regex_limit=1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got2["blocked"].tolist() == exp["blocked"].tolist()
    # substring semantics only exist in the regex tier
    import pytest as _pytest
    with _pytest.raises(ValueError, match="substring"):
        flag_blocklist(ds, words, regex_limit=1, word_match=False)
    with _pytest.raises(ValueError, match="pattern"):
        flag_blocklist(ds, [])


def test_canonicalize_url_cases(ray_session):
    import ray.data
    from raystack.ops.text import canonicalize_url

    cases = {
        "HTTPS://Example.COM/Path?utm_source=x&q=1#frag":
            "https://example.com/Path?q=1",
        "https://example.com:443/a?utm_a=1&utm_b=2&x=3":
            "https://example.com/a?x=3",
        "http://Host.com:80/p?x=1&fbclid=abc":
            "http://host.com/p?x=1",
        "https://a.com/p?utm_only=1": "https://a.com/p",
        "https://a.com/p?gclid=1&ref=z": "https://a.com/p",
        "https://a.com:8443/p": "https://a.com:8443/p",  # non-default port
        "not a url": "not a url",
        "https://a.com/p?x=1&utm_m=2&y=3&utm_n=4":
            "https://a.com/p?x=1&y=3",
    }
    t = pa.table({"url": list(cases)})
    got = canonicalize_url(ray.data.from_arrow(t)).to_pandas()
    for raw, want in cases.items():
        assert got.loc[got.url == raw, "url_canon"].iloc[0] == want, raw


def test_canonicalize_url_vs_duckdb(ray_session):
    # the same RE2 chain in DuckDB regexp_replace over real-ish urls
    import duckdb
    import ray.data
    from raystack.ops.text import TRACKING_PARAMS, canonicalize_url

    rng = np.random.default_rng(6)
    urls = []
    for i in range(500):
        host = f"Site{i % 13}.Example.com"
        extra = ["", "?utm_source=a", "?x=1&utm_medium=b&y=2",
                 "#sec", "?fbclid=zz&q=3", "?a=1&a=2",
                 "?utm_a=1&utm_b=2"][i % 7]
        urls.append(f"https://{host}/p/{rng.integers(100)}{extra}")
    t = pa.table({"url": urls})
    got = canonicalize_url(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    con = duckdb.connect()
    con.register("u", t.to_pandas())
    tp = TRACKING_PARAMS + "=[^&#]*"
    exp = con.execute(f"""
        SELECT url,
          regexp_replace(regexp_replace(regexp_replace(
            lower(regexp_extract(url,
                  '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
            || regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1),
            '#.*$', ''),
            '([?&]){tp}(&{tp})*&?', '\\1', 'g'),
            '[?&]$', '') AS url_canon
        FROM u ORDER BY url""").df()
    # (the default-port strip is pinned by the case table above; these
    # generated urls keep the host port-free so the mirror stays one
    # regex chain)
    for i in range(len(got)):
        g, e = got["url_canon"][i], exp["url_canon"][i]
        assert g == e, (got['url'][i], g, e)


def test_corpus_report_vs_duckdb(ray_session):
    import duckdb
    import pyarrow.parquet as pq
    import ray.data
    from raystack.curate import corpus_report

    t = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                      columns=["doc_id", "text", "lang"])
    rep = corpus_report(ray.data.from_arrow(t), lang_col="lang")

    con = duckdb.connect()
    con.register("docs", t.to_pandas())
    exp = con.execute("""
        SELECT count(*) AS n,
               count(*) - count(text) AS nulls,
               sum(CASE WHEN text = '' THEN 1 ELSE 0 END) AS empties,
               sum(strlen(text)) AS bytes,
               count(DISTINCT text) AS distinct_texts
        FROM docs""").df().iloc[0]
    assert rep["n_docs"] == exp["n"]
    assert rep["null_texts"] == exp["nulls"]
    assert rep["empty_texts"] == (exp["empties"] or 0)
    assert rep["total_bytes"] == exp["bytes"]
    assert rep["n_distinct_texts"] == exp["distinct_texts"]
    assert 0 <= rep["exact_dup_rate"] < 1
    lang_exp = dict(con.execute(
        "SELECT lang, count(*) FROM docs GROUP BY lang").fetchall())
    assert rep["languages"] == {str(k): v for k, v in lang_exp.items()}
    tok_exp = con.execute(
        "SELECT sum(len(list_filter(string_split_regex(text, '\\s+'), "
        "x -> x <> ''))) FROM docs WHERE text IS NOT NULL").fetchone()[0]
    assert rep["total_tokens"] == tok_exp
    assert set(rep["token_quantiles"]) == {"p10", "p50", "p90", "p99"}


def test_unicode_normalization_vs_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import unicodedata
    import ray.data
    from raystack.ops.text import add_unicode_normalized

    comp = unicodedata.normalize("NFC", "caf\u00e9")
    decomp = unicodedata.normalize("NFD", "caf\u00e9")
    texts = [comp, decomp, "\ufb01ne \u2460\u0032\u0033",
             "\u00c5 vs A\u030a", None, "", "plain ascii"]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = add_unicode_normalized(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute("SELECT nfc_normalize(text) AS n FROM t "
                       "ORDER BY doc_id").df()["n"]
    assert got["text_nfc"].where(pd.notna(got["text_nfc"]), None).tolist() \
        == want.where(pd.notna(want), None).tolist()
    # composed == decomposed after NFC (bytes, not just display)
    assert got["text_nfc"][0] == got["text_nfc"][1] == comp
    nfkc = add_unicode_normalized(ray.data.from_arrow(t), form="NFKC") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert nfkc["text_nfc"][2] == "fine 123"
    # decomposing form runs the Arrow kernel; match unicodedata exactly
    nfd = add_unicode_normalized(ray.data.from_arrow(t), form="NFD") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    for g, src in zip(nfd["text_nfc"], texts):
        assert g == (None if src is None else
                     unicodedata.normalize("NFD", src))
    with pytest.raises(ValueError, match="form"):
        add_unicode_normalized(ray.data.from_arrow(t), form="XYZ")
