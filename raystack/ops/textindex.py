"""Persisted inverted keyword index over a document corpus.

The text-side sibling of the persisted IVF index
(:func:`raystack.ops.similarity.build_ivf_index`): build once, query many
times, and let the filesystem layout do the pruning. Postings are
``(token, doc_id)`` presence pairs (deduped per document), hive-partitioned
by ``bucket = siphash(token) % num_buckets`` — a keyword query reads ONLY
its tokens' bucket directories; every other bucket's bytes never leave
storage. At 100 TB the build is one tokenize pass + one partitioned write,
and a query touches ``len(words)`` buckets regardless of corpus size.

Tokenization matches :func:`raystack.ops.text.flag_contamination`:
lowercase + ``\\W+`` split — mirrored 1:1 by DuckDB's
``string_split_regex(lower(text), '\\W+')`` for the oracle tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_META = "text_index_meta.json"


def _doc_tokens(texts, lowercase: bool):
    """(unique-per-doc token strings, doc ordinal per token) — vectorized:
    factorize tokens, dedup (doc, token) pairs via one packed-key
    ``np.unique``."""
    import pandas as pd

    from .hashing import tokenize_words
    vals, doc = tokenize_words(texts, lowercase)
    if not len(vals):
        return np.empty(0, object), np.empty(0, np.int64)
    codes, uniq = pd.factorize(vals)
    pair = doc.astype(np.uint64) * np.uint64(len(uniq) + 1) \
        + codes.astype(np.uint64)
    upair = np.unique(pair)
    return (np.asarray(uniq, object)[(upair % np.uint64(len(uniq) + 1))
                                     .astype(np.int64)],
            (upair // np.uint64(len(uniq) + 1)).astype(np.int64))


def build_text_index(ds, out_dir: str, text_col: str = "text",
                     id_col: str = "doc_id", num_buckets: int = 64,
                     lowercase: bool = True) -> dict:
    """One streaming pass: tokenize each batch, dedup tokens per doc,
    bucket by token hash, write postings hive-partitioned by ``bucket``.
    No shuffle — ``write_parquet(partition_cols=...)`` splits each output
    block by partition value, so a bucket directory simply collects one
    file per contributing block."""
    import json
    import os

    import pandas as pd

    def postings(t: pa.Table) -> pa.Table:
        tok, dpos = _doc_tokens(t[text_col], lowercase)
        ids = t[id_col].combine_chunks() if isinstance(
            t[id_col], pa.ChunkedArray) else t[id_col]
        if not len(tok):
            return pa.table({"token": pa.array([], pa.string()),
                             id_col: ids.slice(0, 0),
                             "bucket": pa.array([], pa.int64())})
        bucket = (pd.util.hash_array(tok, categorize=False)
                  % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"token": pa.array(tok, pa.string()),
                         id_col: ids.take(pa.array(dpos)),
                         "bucket": pa.array(bucket)})

    # bounded batches: the factorize/pack arrays scale with the batch's
    # token count (see chunk_documents' first-touch rationale)
    ds.map_batches(postings, batch_format="pyarrow", batch_size=4096) \
        .write_parquet(out_dir, partition_cols=["bucket"])
    meta = {"num_buckets": int(num_buckets), "text_col": text_col,
            "id_col": id_col, "lowercase": bool(lowercase)}
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f)
    return meta


def query_text_index(index_dir: str, words: list[str], mode: str = "and"):
    """Keyword query over a persisted index: read ONLY the query words'
    ``bucket=`` directories (pushing a ``token isin words`` filter into
    the scan), count distinct matched words per document, keep documents
    matching ALL words (``mode="and"``) or ANY (``"or"``). Distributed —
    a hot token's postings stay in Ray blocks, never on the driver.
    Returns a Dataset of ``(id_col, n_matched)``."""
    import json
    import os

    import pandas as pd
    import ray.data

    import re

    with open(os.path.join(index_dir, _META)) as f:
        meta = json.load(f)
    # normalize query words EXACTLY like the build tokenizes documents
    # (lowercase + \W+ split) — a verbatim "state-of-the-art" probe
    # would otherwise hash a token the index can never contain and
    # silently match nothing; here it expands to its four tokens
    norm = []
    for w in words:
        w = w.lower() if meta["lowercase"] else w
        norm.extend(tok for tok in re.split(r"\W+", w or "") if tok)
    words = sorted(set(norm))
    if not words:
        raise ValueError("query_text_index needs at least one word")
    if mode not in ("and", "or"):
        raise ValueError("mode must be 'and' or 'or'")
    id_col = meta["id_col"]
    buckets = sorted({
        int(pd.util.hash_array(np.asarray([w], object),
                               categorize=False)[0]
            % np.uint64(meta["num_buckets"])) for w in words})
    import glob as _glob
    files = [f for b in buckets for f in sorted(_glob.glob(
        os.path.join(index_dir, f"bucket={b}", "*.parquet")))]
    if not files:  # no bucket on disk → no word can match
        return ray.data.from_arrow(pa.table(
            {id_col: pa.array([], pa.int64()),
             "n_matched": pa.array([], pa.int64())}))
    post = ray.data.read_parquet(
        files, columns=["token", id_col],
        filter=pc.field("token").isin(words))
    counts = post.groupby(id_col).count().rename_columns(
        {"count()": "n_matched"})
    if mode == "or":
        return counts
    need = len(words)
    return counts.map_batches(
        lambda t: t.filter(pc.equal(t["n_matched"], need)),
        batch_format="pyarrow")
