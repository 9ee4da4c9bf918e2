"""Property sweep: top_ngrams and add_url_parts vs pure-Python oracles
on randomized inputs — whitespace runs, empty docs, repeated tokens,
tie-heavy count distributions for the n-gram cut; odd-but-valid and
non-URL strings for the regex decomposition."""

import numpy as np
import pyarrow as pa
import ray.data
from hypothesis import given, settings, strategies as st

from raystack.ops.text import add_url_parts, top_ngrams

# ---- top_ngrams -----------------------------------------------------

_doc = st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
                min_size=0, max_size=10)
_corpus = st.lists(_doc, min_size=1, max_size=8)


def _oracle_ngrams(docs, n, k):
    from collections import Counter
    c = Counter()
    for d in docs:
        for i in range(len(d) - n + 1):
            c[" ".join(d[i:i + n])] += 1
    # count desc, ngram asc — the documented tie-break
    items = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return items


@settings(max_examples=10, deadline=None)
@given(_corpus, st.integers(min_value=1, max_value=3),
       st.integers(min_value=1, max_value=6))
def test_top_ngrams_matches_oracle(ray_session, docs, n, k):
    # messy separators: runs of whitespace must not create empty tokens
    texts = ["  ".join(d) if i % 2 else " ".join(d)
             for i, d in enumerate(docs)]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)}))
    got = top_ngrams(ds, n=n, k=k, per_batch_cut=4096)
    want = _oracle_ngrams(docs, n, k)
    assert list(zip(got["ngram"], got["n"])) == want, (docs, n, k)


def test_top_ngrams_cut_keeps_global_top(ray_session):
    # the heavy hitter appears in every block; a tail of distinct
    # n-grams per block is cut but can never displace it
    blocks = [["hot pair"] * 5 + [f"tail{i}_{j}" for j in range(30)]
              for i in range(4)]
    texts = [" ".join(b).replace("hot pair", "hot pair") for b in blocks]
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(texts)})).repartition(4)
    got = top_ngrams(ds, n=2, k=1, per_batch_cut=8)
    assert got["ngram"].iloc[0] == "hot pair"


# ---- add_url_parts --------------------------------------------------

_host = st.from_regex(r"[a-z]{1,8}(\.[a-z]{2,3}){1,2}", fullmatch=True)
_path = st.from_regex(r"(/[a-z0-9._~-]{0,6}){0,3}", fullmatch=True)
_scheme = st.sampled_from(["http", "https", "ftp", "s3+x.y-z"])
_url = st.builds(lambda s, h, p, q: f"{s}://{h}{p}{q}",
                 _scheme, _host, _path,
                 st.sampled_from(["", "?a=1&b=2", "#frag", "?q#f"]))
_non_url = st.sampled_from(["", "not a url", "http//missing.colon",
                            "://nohost", "mailto:x@y.z",
                            "HTTP://UPPER.CASE/path"])


def _oracle_parts(u):
    import re
    m = re.match(r"^([a-z][a-z0-9+.-]*)://([^/?#]*)([^?#]*)", u)
    if not m:
        return (None, None, None)
    return m.group(1), m.group(2), m.group(3)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.one_of(_url, _non_url), min_size=1, max_size=12))
def test_url_parts_match_re_oracle(ray_session, urls):
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    got = add_url_parts(ds).to_pandas()
    assert got["url"].tolist() == urls
    for i, u in enumerate(urls):
        want = _oracle_parts(u)
        row = (got["scheme"][i] if got["scheme"][i] == got["scheme"][i]
               else None,
               got["host"][i] if got["host"][i] == got["host"][i]
               else None,
               got["path"][i] if got["path"][i] == got["path"][i]
               else None)
        assert row == want, (u, row, want)
