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
    """(unique-per-doc token strings, doc ordinal, term frequency, doc
    length) per posting — vectorized: factorize tokens, dedup + count
    (doc, token) pairs via one packed-key ``np.unique``, doc lengths via
    ``bincount``."""
    import pandas as pd

    from .hashing import tokenize_words
    vals, doc = tokenize_words(texts, lowercase)
    if not len(vals):
        z = np.empty(0, np.int64)
        return np.empty(0, object), z, z, z
    codes, uniq = pd.factorize(vals)
    pair = doc.astype(np.uint64) * np.uint64(len(uniq) + 1) \
        + codes.astype(np.uint64)
    upair, tf = np.unique(pair, return_counts=True)
    dpos = (upair // np.uint64(len(uniq) + 1)).astype(np.int64)
    dl = np.bincount(doc)  # tokens per doc ordinal
    return (np.asarray(uniq, object)[(upair % np.uint64(len(uniq) + 1))
                                     .astype(np.int64)],
            dpos, tf.astype(np.int64), dl[dpos])


def _postings_fn(text_col: str, id_col: str, num_buckets: int,
                 lowercase: bool):
    """Batch → postings table (token, id, tf, dl, bucket). tf/dl are
    denormalized into the postings: BM25 scoring at query time needs no
    join against a corpus-wide doc-length table."""
    import pandas as pd

    def postings(t: pa.Table) -> pa.Table:
        tok, dpos, tf, dl = _doc_tokens(t[text_col], lowercase)
        ids = t[id_col].combine_chunks() if isinstance(
            t[id_col], pa.ChunkedArray) else t[id_col]
        if not len(tok):
            z = pa.array([], pa.int64())
            return pa.table({"token": pa.array([], pa.string()),
                             id_col: ids.slice(0, 0),
                             "tf": z, "dl": z, "bucket": z})
        bucket = (pd.util.hash_array(tok, categorize=False)
                  % np.uint64(num_buckets)).astype(np.int64)
        # sorted by (bucket, token): each written file's row groups then
        # hold narrow token ranges, so the query-side OR-of-equality
        # filter prunes row groups via footer stats — a hot bucket's
        # postings mostly never leave storage
        return pa.table({"token": pa.array(tok, pa.string()),
                         id_col: ids.take(pa.array(dpos)),
                         "tf": pa.array(tf), "dl": pa.array(dl),
                         "bucket": pa.array(bucket)}) \
            .sort_by([("bucket", "ascending"), ("token", "ascending")])

    return postings


#: parquet row-group size for postings files — small so row-group stats
#: over the sorted token column give fine pruning granularity
_RG_ROWS = 8192


def _words_filter(words: list[str]):
    """OR-of-equality expression for the query words. This pyarrow build
    does NOT prune row groups on ``isin`` (verified: isin keeps every
    group, the equivalent ==-chain keeps only matching ones), so the
    filter is built as a chain; query word lists are tiny."""
    import functools
    import operator
    return functools.reduce(operator.or_,
                            [pc.field("token") == w for w in words])


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

    # bounded batches: the factorize/pack arrays scale with the batch's
    # token count (see chunk_documents' first-touch rationale)
    ds.map_batches(_postings_fn(text_col, id_col, num_buckets, lowercase),
                   batch_format="pyarrow", batch_size=4096) \
        .write_parquet(out_dir, partition_cols=["bucket"],
                       row_group_size=_RG_ROWS)
    # corpus stats for BM25: n_docs is a metadata count on the input;
    # total token count is a column-pruned sum over the index itself
    # (sum of tf across postings == total tokens, exactly)
    import glob as _glob

    import ray.data
    n_docs = int(ds.count())
    files = sorted(_glob.glob(os.path.join(out_dir, "bucket=*", "*.parquet")))
    total = ray.data.read_parquet(files, columns=["tf"]).sum("tf") \
        if files else 0
    # a corpus whose every document tokenizes to nothing writes zero
    # postings — write_parquet then never created out_dir (sweep-found)
    os.makedirs(out_dir, exist_ok=True)
    meta = {"num_buckets": int(num_buckets), "text_col": text_col,
            "id_col": id_col, "lowercase": bool(lowercase),
            "n_docs": n_docs,
            "avgdl": (float(total) / n_docs) if n_docs else 0.0}
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f)
    return meta


def append_text_index(ds, index_dir: str, tag: str | None = None) -> dict:
    """Incremental ingest into an existing index (the text sibling of
    ``pipeline.encode_append``): tokenize the NEW documents with the
    index's stored config, write their postings into the same ``bucket=``
    directories (``write_parquet`` appends uniquely-named files; queries
    glob the directory, so old and new postings serve together), and
    refresh the BM25 corpus stats exactly — ``n_docs`` adds the new
    count, total tokens re-sums the ``tf`` column over the whole index
    (column-pruned, distributed). build(A) then append(B) answers every
    query identically to build(A ∪ B); the caller must not re-append ids
    already indexed (postings are per-doc, duplicates would double-count
    matches).

    ``tag`` makes the append exactly-once per increment (same contract
    as the dedup index's tags): a tag already in the meta's ``applied``
    list is a no-op, so a retried day-N ingest cannot double-count its
    postings in boolean match counts or BM25 tf."""
    import glob as _glob
    import json
    import os

    import ray.data

    with open(os.path.join(index_dir, _META)) as f:
        meta = json.load(f)
    if tag is not None and tag in meta.get("applied", []):
        return meta

    n_new = int(ds.count())
    ds.map_batches(_postings_fn(meta["text_col"], meta["id_col"],
                                meta["num_buckets"], meta["lowercase"]),
                   batch_format="pyarrow", batch_size=4096) \
        .write_parquet(index_dir, partition_cols=["bucket"],
                       row_group_size=_RG_ROWS)
    files = sorted(_glob.glob(os.path.join(index_dir, "bucket=*",
                                           "*.parquet")))
    total = ray.data.read_parquet(files, columns=["tf"]).sum("tf") \
        if files else 0
    meta["n_docs"] = int(meta.get("n_docs", 0)) + n_new
    meta["avgdl"] = (float(total) / meta["n_docs"]) if meta["n_docs"] \
        else 0.0
    if tag is not None:
        meta["applied"] = meta.get("applied", []) + [tag]
    with open(os.path.join(index_dir, _META), "w") as f:
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

    import ray.data

    with open(os.path.join(index_dir, _META)) as f:
        meta = json.load(f)
    words = _normalize_query(words, meta)
    if not words:
        raise ValueError("query_text_index needs at least one word")
    if mode not in ("and", "or"):
        raise ValueError("mode must be 'and' or 'or'")
    id_col = meta["id_col"]
    files = _bucket_files(index_dir, words, meta)
    if not files:  # no bucket on disk → no word can match
        return ray.data.from_arrow(pa.table(
            {id_col: pa.array([], pa.int64()),
             "n_matched": pa.array([], pa.int64())}))
    post = ray.data.read_parquet(
        files, columns=["token", id_col],
        filter=_words_filter(words))
    counts = post.groupby(id_col).count().rename_columns(
        {"count()": "n_matched"})
    if mode == "or":
        return counts
    need = len(words)
    return counts.map_batches(
        lambda t: t.filter(pc.equal(t["n_matched"], need)),
        batch_format="pyarrow")


def _normalize_query(words: list[str], meta: dict) -> list[str]:
    """Normalize query words EXACTLY like the build tokenizes documents
    (lowercase + \\W+ split) — a verbatim "state-of-the-art" probe would
    otherwise hash a token the index can never contain and silently match
    nothing; here it expands to its four tokens."""
    import re
    norm = []
    for w in words:
        w = w.lower() if meta["lowercase"] else w
        norm.extend(tok for tok in re.split(r"\W+", w or "") if tok)
    return sorted(set(norm))


def _bucket_files(index_dir: str, words: list[str], meta: dict) -> list[str]:
    import glob as _glob
    import os

    import pandas as pd
    buckets = sorted({
        int(pd.util.hash_array(np.asarray([w], object),
                               categorize=False)[0]
            % np.uint64(meta["num_buckets"])) for w in words})
    return [f for b in buckets for f in sorted(_glob.glob(
        os.path.join(index_dir, f"bucket={b}", "*.parquet")))]


def bm25_topk(index_dir: str, words: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75):
    """BM25-ranked retrieval over a persisted index (Robertson/Spärck
    Jones; the Lucene-style formulation): read ONLY the query words'
    buckets, compute exact per-token document frequencies from those
    postings, score every matching posting map-only
    (``idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``), sum per document, and
    return the top-k as a Dataset of ``(id_col, score)`` sorted
    descending. Distributed end to end — the driver sees the per-token
    df map (≤ len(words) rows) and the final k rows, nothing else."""
    import json
    import math
    import os

    import ray.data

    with open(os.path.join(index_dir, _META)) as f:
        meta = json.load(f)
    if "avgdl" not in meta:
        raise ValueError("index was built before BM25 support; rebuild "
                         "with build_text_index to store tf/dl stats")
    words = _normalize_query(words, meta)
    if not words:
        raise ValueError("bm25_topk needs at least one word")
    id_col = meta["id_col"]
    n_docs, avgdl = meta["n_docs"], max(meta["avgdl"], 1e-9)
    files = _bucket_files(index_dir, words, meta)
    # empty results keep (id_col, score) in Dataset.schema(); note that
    # Ray's to_pandas() drops ALL columns of a 0-row Dataset however the
    # empty block is built — callers branching on emptiness should use
    # .count() or .schema(), not the materialized frame's columns
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})
    if not files:
        return ray.data.from_arrow(empty)
    post = ray.data.read_parquet(
        files, columns=["token", id_col, "tf", "dl"],
        filter=_words_filter(words))
    # exact df per query token: a groupby over <= len(words) groups
    df_rows = post.groupby("token").count().take_all()
    if not df_rows:
        return ray.data.from_arrow(empty)
    idf = {r["token"]: math.log(1.0 + (n_docs - r["count()"] + 0.5)
                                / (r["count()"] + 0.5))
           for r in df_rows}

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: t[id_col], "score": pa.array(
                [], pa.float64())})
        tf = np.asarray(t["tf"], dtype=np.float64)
        dl = np.asarray(t["dl"], dtype=np.float64)
        # idf lookup through the dictionary indices: the python dict is
        # touched once per UNIQUE token (<= len(words)), not per row
        denc = pc.dictionary_encode(t["token"].combine_chunks()
                                    if isinstance(t["token"],
                                                  pa.ChunkedArray)
                                    else t["token"])
        uw = np.array([idf[x] for x in denc.dictionary.to_pylist()])
        w = uw[np.asarray(denc.indices)]
        s = w * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        return pa.table({id_col: t[id_col], "score": pa.array(s)})

    scores = post.map_batches(score, batch_format="pyarrow") \
        .groupby(id_col).sum("score") \
        .rename_columns({"sum(score)": "score"})
    # deterministic tie-break on the id keeps results stable across runs
    return scores.sort(["score", id_col], descending=[True, False]).limit(k)
