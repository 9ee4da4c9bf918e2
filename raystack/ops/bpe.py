"""Byte-level BPE tokenizer TRAINING and application (GPT-2-style, within
words), Ray-Data-first.

The key reduction: BPE training depends on the corpus only through the
word-frequency table — so the distributed part is one exact word count
(per-batch pre-aggregated partials → one ``groupby(word).sum`` → a
distributed ``sort + limit`` top-``max_word_types`` cut, the
``frequent_items`` shape: the driver sees at most ``max_word_types``
rows at ANY corpus size), and the merge loop itself runs driver-side over
that bounded table with the standard incremental pair-count algorithm.
Words below the cut contribute nothing (the universal practice for
web-scale tokenizer training); the cut is EXACT top-m by ``(count desc,
word asc)``, so the result is deterministic for a given corpus and m.

Application is a stateful actor-pool stage: merge ranks load once per
actor in ``__init__``; each batch factorizes its words and encodes only
the DISTINCT ones (cached across batches per actor), then gathers ids
back through the codes — the per-word merge loop runs once per new word
type per actor, never per row.

Base vocabulary is all 256 byte values, so every word is encodable and
there is no unknown token. Token ids: 0..255 = bytes, 256+t = the symbol
created by merge t.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["train_bpe", "BpeEncoder", "add_bpe_ids", "word_frequencies"]


def word_frequencies(ds, text_col: str = "text", lowercase: bool = True,
                     max_word_types: int = 1_000_000):
    """Exact top-``max_word_types`` word-frequency table ``(word, n)`` as
    a Dataset, ordered by ``(n desc, word asc)``. One slim shuffle of
    per-batch distinct words; the limit cut is distributed — no driver
    hop grows with corpus cardinality."""
    from .hashing import tokenize_words

    def partial(t: pa.Table) -> pa.Table:
        vals, _ = tokenize_words(t[text_col], lowercase)
        u, c = np.unique(vals, return_counts=True)
        return pa.table({"word": pa.array(u, pa.string()),
                         "n": pa.array(c.astype(np.int64))})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=4096).groupby("word").sum("n")
    return agg.map_batches(
        lambda t: t.rename_columns(["word", "n"]),
        batch_format="pyarrow").sort(
        ["n", "word"], descending=[True, False]).limit(max_word_types)


def _merge_loop(words: list[bytes], freqs: list[int], n_merges: int):
    """Classic incremental BPE merge loop over a word-frequency table:
    at each step merge the most frequent adjacent symbol pair (ties →
    smallest ``(a, b)`` id pair), creating symbol ``256 + step``. Only
    words containing the merged pair are rescanned. Returns the merge
    list ``[(a, b), ...]``."""
    reprs = [list(w) for w in words]
    pair_n: dict[tuple, int] = {}
    pair_words: dict[tuple, set] = {}
    for wi, (r, f) in enumerate(zip(reprs, freqs)):
        for a, b in zip(r, r[1:]):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + f
            pair_words.setdefault((a, b), set()).add(wi)
    merges: list[tuple] = []
    for step in range(n_merges):
        best = None
        for p, n in pair_n.items():
            if n <= 0:
                continue
            if best is None or n > best[0] or (n == best[0] and p < best[1]):
                best = (n, p)
        if best is None:
            break
        pair = best[1]
        new_id = 256 + step
        merges.append(pair)
        for wi in list(pair_words.get(pair, ())):
            r, f = reprs[wi], freqs[wi]
            # remove this word's old pair contributions, rewrite, re-add
            for a, b in zip(r, r[1:]):
                pair_n[(a, b)] -= f
                s = pair_words.get((a, b))
                if s is not None:
                    s.discard(wi)
            out, i = [], 0
            while i < len(r):
                if i + 1 < len(r) and (r[i], r[i + 1]) == pair:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(r[i])
                    i += 1
            reprs[wi] = out
            for a, b in zip(out, out[1:]):
                pair_n[(a, b)] = pair_n.get((a, b), 0) + f
                pair_words.setdefault((a, b), set()).add(wi)
    return merges


def train_bpe(ds, vocab_size: int, text_col: str = "text",
              lowercase: bool = True, max_word_types: int = 1_000_000):
    """Train a byte-level BPE tokenizer on the corpus: ``vocab_size - 256``
    merges learned from the exact top-``max_word_types`` word-frequency
    table (see module docstring for why that's the whole corpus
    dependency). Returns ``{"merges": [(a, b), ...], "vocab_size": ...,
    "lowercase": ...}`` — pass it to :class:`BpeEncoder` /
    :func:`add_bpe_ids`."""
    if vocab_size <= 256:
        raise ValueError("vocab_size must exceed the 256 byte symbols")
    wf = word_frequencies(ds, text_col, lowercase, max_word_types) \
        .to_pandas()
    if not len(wf):  # token-less corpus: the 0-row frame has no columns
        return {"merges": [], "vocab_size": 256, "lowercase": lowercase}
    words = [w.encode("utf-8") for w in wf["word"]]
    freqs = [int(n) for n in wf["n"]]
    merges = _merge_loop(words, freqs, vocab_size - 256)
    return {"merges": merges, "vocab_size": 256 + len(merges),
            "lowercase": lowercase}


def _encode_word(b: bytes, ranks: dict[tuple, int]) -> list[int]:
    """GPT-2 merge application: repeatedly merge the lowest-ranked pair
    present (all its occurrences at once) until none applies."""
    sym = list(b)
    while len(sym) > 1:
        best_rank, best_pair = None, None
        for p in zip(sym, sym[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        a, bsym = best_pair
        out, i = [], 0
        new_id = 256 + best_rank
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == bsym:
                out.append(new_id)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


class BpeEncoder:
    """Actor-pool ``map_batches`` stage: merge ranks load once per actor;
    each batch encodes only its DISTINCT words (cached across batches),
    then gathers ids back through the factorize codes. Appends
    ``out_col`` (``list<int32>`` token ids over the row's words in order)
    and ``out_col + "_n"`` (token count)."""

    def __init__(self, tokenizer: dict, text_col: str = "text",
                 out_col: str = "bpe_ids"):
        self.ranks = {tuple(p): i for i, p in
                      enumerate(tokenizer["merges"])}
        self.lowercase = bool(tokenizer.get("lowercase", True))
        self.text_col, self.out_col = text_col, out_col
        self.cache: dict[str, list[int]] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        import pandas as pd

        from .hashing import tokenize_words
        vals, doc = tokenize_words(t[self.text_col], self.lowercase)
        codes, uniq = pd.factorize(vals)
        enc = []
        for w in uniq:
            ids = self.cache.get(w)
            if ids is None:
                ids = _encode_word(w.encode("utf-8"), self.ranks)
                self.cache[w] = ids
            enc.append(ids)
        lens = np.array([len(e) for e in enc], np.int64)
        n_rows = t.num_rows
        # per-row concatenation: word ids in word order within each row
        per_word = lens[codes] if len(codes) else np.zeros(0, np.int64)
        row_tok = np.zeros(n_rows, np.int64)
        if len(doc):
            np.add.at(row_tok, doc, per_word)
        flat = np.concatenate([enc[c] for c in codes]) if len(codes) \
            else np.zeros(0, np.int64)
        offsets = np.concatenate([[0], np.cumsum(row_tok)]).astype(np.int32)
        lst = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(flat.astype(np.int32), pa.int32()))
        # bare metadata: a pandas-written input carries a schema metadata
        # blob that defeats Ray's schema-dedup fast path downstream
        return t.append_column(self.out_col, lst).append_column(
            self.out_col + "_n", pa.array(row_tok)) \
            .replace_schema_metadata(None)


def add_bpe_ids(ds, tokenizer: dict, text_col: str = "text",
                out_col: str = "bpe_ids", concurrency=(1, 4),
                batch_size: int = 1024):
    """Tokenize the corpus with a trained BPE: one actor-pool stage, no
    shuffle. Word→ids encodings cache per actor across batches, so the
    Python merge loop runs once per word TYPE per actor — Zipf makes the
    cache hit rate climb with corpus size."""
    return ds.map_batches(BpeEncoder, fn_constructor_args=(tokenizer,
                                                           text_col,
                                                           out_col),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def vocab_bytes(tokenizer: dict) -> list[bytes]:
    """id → exact byte string for every vocab entry: ids 0–255 are the
    raw bytes, each merge appends the concatenation of its two parts.
    ``b"".join(vocab[i] for i in ids)`` reverses tokenization exactly
    (byte-level BPE has no unknown token and loses nothing)."""
    vocab = [bytes([i]) for i in range(256)]
    for a, b in tokenizer["merges"]:
        vocab.append(vocab[a] + vocab[b])
    return vocab


def decode_ids(tokenizer: dict, ids) -> bytes:
    """Exact detokenization: token ids back to the word bytes they
    encode (the inverse of :func:`_encode_word`, whitespace excluded —
    the tokenizer is word-level)."""
    vocab = vocab_bytes(tokenizer)
    return b"".join(vocab[int(i)] for i in ids)


def save_tokenizer(tokenizer: dict, path: str) -> None:
    """Persist a trained tokenizer as JSON (atomic tmp + rename): the
    merges ARE the tokenizer — a loaded copy reproduces identical ids
    on any machine. Pair with :func:`load_tokenizer`."""
    import json
    import os
    payload = {"format": "raystack-bpe-v1",
               "merges": [[int(a), int(b)] for a, b in
                          tokenizer["merges"]],
               "vocab_size": int(tokenizer["vocab_size"]),
               "lowercase": bool(tokenizer["lowercase"])}
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, path)


def load_tokenizer(path: str) -> dict:
    """Load a tokenizer :func:`save_tokenizer` wrote; fails loudly on
    an unknown format instead of mis-tokenizing silently."""
    import json
    with open(path) as fh:
        payload = json.load(fh)
    if payload.get("format") != "raystack-bpe-v1":
        raise ValueError(f"{path}: not a raystack-bpe-v1 tokenizer "
                         f"(format={payload.get('format')!r})")
    return {"merges": [(int(a), int(b)) for a, b in payload["merges"]],
            "vocab_size": int(payload["vocab_size"]),
            "lowercase": bool(payload["lowercase"])}
