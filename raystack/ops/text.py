"""Text analysis operators: token counting, char stats, language ID,
quality scoring, document fingerprinting. All vectorized ``map_batches``
stages over Arrow batches (pyarrow.compute string kernels + numpy); the
language-ID stage is an actor pool so its per-language pattern tables are
compiled once per actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import (flatten_column, splitmix64, tail_hash8, window_hashes,
                      row_valid_mask)

_U64 = np.uint64


# ---------------------------------------------------------------------------
# stateless vectorized stages
# ---------------------------------------------------------------------------

def add_token_count(ds, text_col: str = "text", out_col: str = "n_tokens"):
    """Whitespace-token count per row (regex ``\\S+``, one Arrow kernel)."""
    def fn(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t[text_col], r"\S+")
        return t.append_column(out_col, n.cast(pa.int64()))
    return ds.map_batches(fn, batch_format="pyarrow")


def add_char_stats(ds, text_col: str = "text"):
    """n_chars_actual (codepoints), n_spaces, n_digits, n_punct per row."""
    def fn(t: pa.Table) -> pa.Table:
        col = t[text_col]
        t = t.append_column("n_chars_actual",
                            pc.utf8_length(col).cast(pa.int64()))
        t = t.append_column("n_spaces",
                            pc.count_substring(col, " ").cast(pa.int64()))
        t = t.append_column("n_digits",
                            pc.count_substring_regex(col, r"\d").cast(pa.int64()))
        t = t.append_column("n_punct",
                            pc.count_substring_regex(col, r"[.,;:!?]").cast(pa.int64()))
        return t
    return ds.map_batches(fn, batch_format="pyarrow")


def add_quality_score(ds, text_col: str = "text"):
    """Heuristic quality in [0,1]: length band + word-length sanity + low
    digit/punct density (the usual webtext quality signals; cf. C4/Gopher
    rules, public)."""
    def fn(t: pa.Table) -> pa.Table:
        n_chars = pc.utf8_length(t[text_col]).cast(pa.float64())
        n_tok = pc.count_substring_regex(t[text_col], r"\S+").cast(pa.float64())
        n_digit = pc.count_substring_regex(t[text_col], r"\d").cast(pa.float64())
        n_punct = pc.count_substring_regex(t[text_col], r"[.,;:!?]").cast(pa.float64())
        c = np.asarray(n_chars)
        tk = np.maximum(np.asarray(n_tok), 1.0)
        mean_wl = c / tk
        len_score = np.clip(c / 200.0, 0, 1) * (c < 20000)
        wl_score = ((mean_wl > 2.0) & (mean_wl < 12.0)).astype(float)
        digit_pen = np.clip(1.0 - np.asarray(n_digit) / np.maximum(c, 1) * 5, 0, 1)
        punct_pen = np.clip(1.0 - np.asarray(n_punct) / np.maximum(c, 1) * 10, 0, 1)
        q = 0.4 * len_score + 0.2 * wl_score + 0.2 * digit_pen + 0.2 * punct_pen
        return t.append_column("quality", pa.array(q, type=pa.float64()))
    return ds.map_batches(fn, batch_format="pyarrow")


def fingerprint_kernel(data, starts, lengths, h=None) -> np.ndarray:
    """Per-row 64-bit content fingerprint over a flattened string column
    (uint64). Shared by :func:`add_fingerprint` and the persisted dedup
    index (:mod:`raystack.ops.dedupindex`) — the two MUST stay in sync, so
    the math lives here once. Pass precomputed ``window_hashes(data)`` as
    ``h`` to share the rolling-hash pass with a signature computation."""
    if h is None:
        h = window_hashes(data)
    valid = row_valid_mask(starts, lengths, len(data), 8)
    hv = np.where(valid, h, _U64(0))
    # rows too short for an 8-byte window get their content folded in
    # via the tail hash — otherwise every short doc's fingerprint would
    # depend only on its length ('cat' vs 'dog' collide)
    no_window = np.maximum(lengths - 7, 0) == 0
    if len(hv):
        x = np.bitwise_xor.reduceat(hv, np.minimum(starts, len(hv) - 1))
        x = x.astype(np.uint64)
    else:
        x = np.zeros(len(starts), dtype=np.uint64)
    if no_window.any():
        tail = tail_hash8(data, starts, lengths)
        x[no_window] = tail[no_window]
    return splitmix64(x ^ splitmix64(lengths.astype(np.uint64)))


def add_fingerprint(ds, text_col: str = "text", out_col: str = "fingerprint"):
    """64-bit content fingerprint: XOR of all rolling 8-byte window hashes of
    the row (order-insensitive core) mixed with a head-weighted sum and the
    length — fully vectorized over the flat buffer, no per-row Python."""
    def fn(t: pa.Table) -> pa.Table:
        data, starts, lengths = flatten_column(t[text_col])
        fp = fingerprint_kernel(data, starts, lengths)
        return t.append_column(out_col, pa.array(fp.view(np.int64)))
    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# language ID — stateful actor pool (pattern tables built once per actor)
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " die ", " und ", " das ", " ist "],
    "fr": [" le ", " la ", " les ", " et ", " est "],
    "es": [" el ", " los ", " las ", " es ", " y "],
    "pt": [" o ", " os ", " das ", " é ", " e "],
    "it": [" il ", " gli ", " e ", " è ", " di "],
    "nl": [" de ", " het ", " en ", " is ", " van "],
}


class LanguageId:
    """n-gram/stopword-marker heuristic language ID. Actor pool stage: the
    per-language marker patterns are prepared once in ``__init__``; each
    batch does |langs| vectorized substring-count kernels."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.langs = list(_LANG_MARKERS)
        self.patterns = ["|".join(__import__("re").escape(m)
                                  for m in _LANG_MARKERS[l])
                         for l in self.langs]

    def __call__(self, t: pa.Table) -> pa.Table:
        padded = pc.binary_join_element_wise(
            pa.array([" "] * t.num_rows),
            pc.cast(pc.fill_null(t[self.text_col], ""), pa.string()),
            pa.array([" "] * t.num_rows), "")
        scores = np.stack([
            np.asarray(pc.count_substring_regex(padded, p).cast(pa.int64()))
            for p in self.patterns])
        lens = np.maximum(np.asarray(pc.utf8_length(padded)), 1)
        best = np.argmax(scores, axis=0)
        hit = scores.max(axis=0) > 0
        langs = np.array(self.langs, dtype=object)
        pred = np.where(hit, langs[best], "und")
        return t.append_column(self.out_col, pa.array(pred, type=pa.string()))


def add_language_id(ds, text_col: str = "text", concurrency=(1, 4)):
    return ds.map_batches(LanguageId, batch_format="pyarrow",
                          concurrency=concurrency,
                          fn_constructor_kwargs={"text_col": text_col})


def hash_split(ds, id_col: str = "doc_id", fraction: float = 0.1,
               salt: int = 0, out_col: str = "holdout"):
    """Deterministic train/holdout split: a row is held out iff
    ``splitmix64(id ^ salt) % 10000 < fraction * 10000``. Pure per-batch
    math — no shuffle, no RNG state, stable under retries/re-runs and
    across cluster sizes (the property a 100 TB ingest needs: the split
    of a document never depends on which task saw it)."""
    from .hashing import splitmix64
    thresh = np.uint64(int(round(fraction * 10000)))
    s = np.uint64(salt)

    def fn(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col]).astype(np.uint64)
        h = splitmix64(ids ^ s) % np.uint64(10000)
        return t.append_column(out_col, pa.array(h < thresh))

    return ds.map_batches(fn, batch_format="pyarrow")


def seeded_shuffle(ds, seed: int, id_col: str = "doc_id"):
    """Deterministic global shuffle for training epochs: rows reorder by
    ``splitmix64(id ^ seed)``. splitmix64 is a BIJECTION on uint64, so
    unique ids give collision-free keys and the permutation is total and
    identical on any cluster size, partitioning, or input order — and a
    different seed gives an independent permutation (epoch = seed). The
    one all-to-all is Ray's range-partitioned distributed sort; there is
    no RNG state to coordinate or checkpoint — a resumed run reproduces
    the exact epoch order from the seed alone. Keys sort as int64 via an
    order-preserving offset (uint64 ^ 2^63), and the key column is
    dropped from the output."""
    from .hashing import splitmix64
    s = np.uint64(seed)
    flip = np.uint64(1 << 63)

    def add_key(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col]).astype(np.uint64)
        k = (splitmix64(ids ^ s) ^ flip).view(np.int64)
        # bare metadata so the sort's schema unify stays hashable
        return t.append_column("__epoch_key", pa.array(k)) \
            .replace_schema_metadata(None)

    shuffled = ds.map_batches(add_key, batch_format="pyarrow") \
        .sort("__epoch_key")
    return shuffled.map_batches(lambda t: t.drop_columns(["__epoch_key"]),
                                batch_format="pyarrow")


def add_url_parts(ds, url_col: str = "url"):
    """Vectorized URL decomposition (webtext staple): scheme, host, path
    — one ``extract_regex`` kernel per batch; non-URLs get nulls."""
    def fn(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(
            pc.cast(t[url_col], pa.string()),
            r"^(?P<scheme>[a-z][a-z0-9+.-]*)://(?P<host>[^/?#]*)"
            r"(?P<path>[^?#]*)")
        for part in ("scheme", "host", "path"):
            t = t.append_column(part, pc.struct_field(ex, part))
        return t
    return ds.map_batches(fn, batch_format="pyarrow")


def add_extracted_text(ds, html_col: str = "html",
                       out_col: str = "text_extracted",
                       open_tag: bytes = b"<main>",
                       close_tag: bytes = b"</main>"):
    """Vectorized html→text extraction over the binary ``html`` column:
    the bytes between the FIRST ``open_tag`` and the FIRST following
    ``close_tag``, UTF-8 decoded — the fixed-extractor invariant the
    north star pins per url (extracted text byte-identical to the stored
    ``text`` column; see ``raystack.gen.extract_text`` for the fixture
    twin and ``tests/test_text_curation.py`` for the DuckDB
    hex/unhex/position mirror).

    Per batch: two ``find_substring`` kernels locate the tags, then one
    variable-length numpy gather over the flat binary buffer builds the
    output string column — no per-row Python. Rows with a null payload
    or missing/ill-ordered tags are null. UTF-8 is validated by the
    binary→string cast; a batch with an invalid extract falls back to a
    per-row decode where only the offending rows go null (web crawls
    mix encodings — wrong bytes must never surface as silently-mangled
    text)."""
    def fn(t: pa.Table) -> pa.Table:
        return extract_text_batch(t, html_col=html_col, out_col=out_col,
                                  open_tag=open_tag, close_tag=close_tag)

    return ds.map_batches(fn, batch_format="pyarrow")


def extract_text_batch(t: pa.Table, html_col: str = "html",
                       out_col: str = "text_extracted",
                       open_tag: bytes = b"<main>",
                       close_tag: bytes = b"</main>") -> pa.Table:
    """The batch kernel behind :func:`add_extracted_text` — exposed so
    non-Dataset callers (the WARC map tasks in the raw-task exchange)
    run the byte-identical extraction."""
    from .hashing import flatten_column
    off = len(open_tag)
    col = t[html_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    a = np.asarray(pc.fill_null(pc.find_substring(col, open_tag), -1),
                   dtype=np.int64)
    b = np.asarray(pc.fill_null(pc.find_substring(col, close_tag), -1),
                   dtype=np.int64)
    data, starts, lengths = flatten_column(col)
    # find_substring gives the FIRST close anywhere; the contract is
    # the first close AFTER the open (gen.extract_text's
    # html.index(close, i)). Rows where a stray close precedes the
    # open rescan just their tail — rare, so the hot path stays
    # one kernel per tag
    rescan = np.flatnonzero((a >= 0) & (b >= 0) & (b < a + off))
    for i in rescan:
        lo = starts[i] + a[i] + off
        tail = data[lo: starts[i] + lengths[i]].tobytes()
        j = tail.find(close_tag)
        b[i] = a[i] + off + j if j >= 0 else -1
    valid = (a >= 0) & (b >= a + off)
    s = starts + a + off
    out_lens = np.where(valid, starts + b - s, 0).astype(np.int64)
    total = int(out_lens.sum())
    row_rep = np.repeat(np.arange(n), out_lens)
    first = np.concatenate([[0], np.cumsum(out_lens)[:-1]]) \
        if n else np.zeros(0, np.int64)
    pos = np.arange(total) - first[row_rep] if total else \
        np.zeros(0, np.int64)
    buf = data[s[row_rep] + pos] if total else np.zeros(0, np.uint8)
    offsets = np.concatenate([[0], np.cumsum(out_lens)]).astype(np.int64)
    validity = pa.array(valid).buffers()[1] if not valid.all() else None
    bin_arr = pa.Array.from_buffers(
        pa.large_binary(), n,
        [validity, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(buf.tobytes())],
        null_count=int((~valid).sum()))
    try:
        out = bin_arr.cast(pa.large_string())
    except pa.ArrowInvalid:
        # rare mixed-encoding page: null ONLY the undecodable rows
        vals = [None if v is None else _try_utf8(v)
                for v in bin_arr.to_pylist()]
        out = pa.array(vals, pa.large_string())
    return t.append_column(out_col, out)



def _try_utf8(b: bytes):
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return None


#: GPT-2-style piece pattern (public; contractions, letter runs, number
#: runs, punctuation runs, whitespace) — RE2-compatible, no lookahead
BPE_PIECE_RE = (r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+"
                r"| ?[^\s\p{L}\p{N}]+|\s+")


def add_bpe_token_count(ds, text_col: str = "text",
                        out_col: str = "n_bpe_tokens"):
    """BPE-ish token count: one RE2 kernel over the GPT-2-style piece
    pattern (a fast proxy for tokenizer-budget accounting — counts piece
    boundaries, not merges)."""
    def fn(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t[text_col], BPE_PIECE_RE)
        return t.append_column(out_col, n.cast(pa.int64()))
    return ds.map_batches(fn, batch_format="pyarrow")


def add_normalized_text(ds, text_col: str = "text",
                        out_col: str = "text_norm"):
    """Whitespace normalization (webtext curation staple): collapse every
    whitespace run to a single space and trim the ends — two Arrow
    kernels, zero-copy in, no Python rows. DuckDB mirror:
    ``trim(regexp_replace(text, '\\s+', ' ', 'g'))`` (both are RE2)."""
    def fn(t: pa.Table) -> pa.Table:
        s = pc.cast(pc.fill_null(t[text_col], ""), pa.string())
        s = pc.replace_substring_regex(s, r"\s+", " ")
        return t.append_column(out_col, pc.utf8_trim_whitespace(s))
    return ds.map_batches(fn, batch_format="pyarrow")


#: default redaction rules: (pattern, replacement). RE2-compatible so the
#: same patterns run bit-identically in DuckDB's regexp_replace oracle.
REDACT_RULES = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d ().-]{7,}\d", "<PHONE>"),
)


def add_redacted(ds, text_col: str = "text", rules=REDACT_RULES,
                 out_col: str = "text_redacted"):
    """PII scrubbing: replace emails / IPv4s / phone-ish digit runs with
    placeholder tokens — one ``replace_substring_regex`` kernel per rule
    per batch. Rules are (pattern, replacement) pairs; order matters
    (earlier rules consume their matches first)."""
    def fn(t: pa.Table) -> pa.Table:
        s = pc.cast(pc.fill_null(t[text_col], ""), pa.string())
        for pat, repl in rules:
            s = pc.replace_substring_regex(s, pat, repl)
        return t.append_column(out_col, s)
    return ds.map_batches(fn, batch_format="pyarrow")


def add_repetition_stats(ds, text_col: str = "text"):
    """Gopher-style repetition quality signals (Rae et al. 2021, public)
    per document:

    - ``dup_line_frac`` — 1 − distinct lines / lines;
    - ``ellipsis_line_frac`` — fraction of lines ending in ``...``;
    - ``top_2gram_frac`` — tokens covered by the most frequent word
      2-gram (occurrences × 2 / tokens; 0 when < 2 tokens).

    Fully vectorized: lines/tokens come from Arrow split kernels, line
    and token identity from one ``pd.factorize`` over the flat values,
    per-document distinct/top counts from ``np.unique`` over packed
    (doc, code) keys — no Python loop over rows or lines."""
    import pandas as pd

    def _per_doc_counts(doc_ids, codes, n_docs):
        """(#items, #distinct items) per doc from parallel arrays."""
        n_items = np.bincount(doc_ids, minlength=n_docs)
        if len(codes):
            pair = doc_ids.astype(np.uint64) << np.uint64(32) \
                | codes.astype(np.uint64)
            uniq = np.unique(pair)
            n_dist = np.bincount((uniq >> np.uint64(32)).astype(np.int64),
                                 minlength=n_docs)
        else:
            n_dist = np.zeros(n_docs, dtype=np.int64)
        return n_items, n_dist

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = (col.combine_chunks() if col.num_chunks != 1
                   else col.chunk(0))
        if isinstance(col, pa.ChunkedArray):  # 0-chunk / multi-chunk edge
            col = pa.concat_arrays(col.chunks) if col.num_chunks \
                else pa.array([], type=pa.string())
        s = pc.cast(pc.fill_null(col, ""), pa.string())

        # --- lines ---------------------------------------------------
        lines = pc.split_pattern(s, "\n")
        offs = np.asarray(lines.offsets)
        counts = np.diff(offs)
        line_doc = np.repeat(np.arange(n), counts)
        flat = lines.flatten()
        line_codes = pd.factorize(flat.to_numpy(zero_copy_only=False))[0]
        n_lines, n_dist = _per_doc_counts(line_doc, line_codes, n)
        denom = np.maximum(n_lines, 1).astype(np.float64)
        dup_line = 1.0 - n_dist / denom

        ell = np.asarray(pc.count_substring_regex(
            s, r"(?m)\.\.\.$").cast(pa.int64()))
        ellipsis_frac = ell / denom

        # --- word 2-grams ---------------------------------------------
        toks = pc.split_pattern_regex(s, r"\s+")
        toffs = np.asarray(toks.offsets)
        tcounts = np.diff(toffs)
        tflat = toks.flatten()
        tvals = tflat.to_numpy(zero_copy_only=False)
        # split_pattern_regex yields empty edge tokens; mask them out
        keep = np.asarray(pc.utf8_length(tflat)) > 0
        tdoc = np.repeat(np.arange(n), tcounts)[keep]
        tcodes = pd.factorize(tvals[keep])[0]
        # packed-key capacity: doc<<44 | code<<22 | code needs docs<2^20
        # and distinct tokens<2^22 — beyond that the bits collide and
        # counts silently merge across docs. Rows are independent, so an
        # oversized batch recursively halves instead
        if n >= (1 << 20) or (len(tcodes) and
                              int(tcodes.max()) >= (1 << 22) - 1):
            if n <= 1:
                raise ValueError(
                    "add_repetition_stats: a single document exceeds the "
                    "2^22 distinct-token packing capacity")
            return pa.concat_tables(
                [fn(t.slice(0, n // 2)), fn(t.slice(n // 2))],
                promote_options="default")
        n_tok = np.bincount(tdoc, minlength=n)
        top_frac = np.zeros(n, dtype=np.float64)
        if len(tcodes) > 1:
            same_doc = tdoc[1:] == tdoc[:-1]
            g_doc = tdoc[1:][same_doc]
            g_key = (g_doc.astype(np.uint64) << np.uint64(44)
                     | tcodes[:-1][same_doc].astype(np.uint64)
                     << np.uint64(22)
                     | tcodes[1:][same_doc].astype(np.uint64))
            if len(g_key):
                uniq, cnt = np.unique(g_key, return_counts=True)
                udoc = (uniq >> np.uint64(44)).astype(np.int64)
                top = np.zeros(n, dtype=np.int64)
                np.maximum.at(top, udoc, cnt)
                top_frac = np.where(n_tok >= 2,
                                    top * 2.0 / np.maximum(n_tok, 1), 0.0)

        t = t.append_column("dup_line_frac",
                            pa.array(dup_line, type=pa.float64()))
        t = t.append_column("ellipsis_line_frac",
                            pa.array(ellipsis_frac, type=pa.float64()))
        t = t.append_column("top_2gram_frac",
                            pa.array(top_frac, type=pa.float64()))
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample(ds, group_col: str, id_col: str = "doc_id",
                      k: int = 10):
    """Deterministic stratified sample: the ``k`` rows with the smallest
    ``splitmix64(id)`` per group (a seedable, retry-stable uniform draw —
    the sample of a group never depends on task placement). Pre-reduced:
    each batch keeps at most ``k`` candidates per group BEFORE the
    groupby, so the shuffle moves O(groups x k x blocks) rows, never the
    corpus."""
    from .hashing import splitmix64

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        ids = np.asarray(t[id_col]).astype(np.uint64)
        h = splitmix64(ids).view(np.int64)
        df = pd.DataFrame({group_col: np.asarray(t[group_col]),
                           id_col: np.asarray(t[id_col]), "__h": h})
        df = df.sort_values("__h").groupby(group_col, sort=False).head(k)
        # drop the pandas metadata blob: it makes the schema unhashable,
        # knocking the groupby shuffle off Ray's schema-dedup fast path
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    def final(g: pa.Table) -> pa.Table:
        import pandas as pd
        df = g.to_pandas().sort_values("__h").head(k)
        return pa.Table.from_pandas(df[[group_col, id_col]],
                                    preserve_index=False) \
            .replace_schema_metadata(None)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).map_groups(final, batch_format="pyarrow")


def top_ngrams(ds, n: int = 2, k: int = 20, text_col: str = "text",
               per_batch_cut: int = 4096):
    """Corpus-wide top-k word n-grams (vocab / boilerplate /
    benchmark-contamination analysis). Per batch: Arrow token split →
    numpy factorize → packed-key ``np.unique`` counts, cut to the top
    ``per_batch_cut`` n-grams BEFORE the shuffle (a true heavy hitter
    appears in most batches, so a generous per-batch cut preserves the
    global top-k while the groupby moves O(cut x blocks) rows, never the
    corpus' n-gram multiset). Final: one small groupby + top-k, ties
    broken by the n-gram string. Returns a pandas DataFrame
    (ngram, n_occurrences)."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        col = t[text_col]
        col = col.chunk(0) if getattr(col, "num_chunks", 0) else col
        s = pc.cast(pc.fill_null(col, ""), pa.string())
        toks = pc.split_pattern_regex(s, r"\s+")
        offs = np.asarray(toks.offsets)
        counts = np.diff(offs)
        flat = toks.flatten()
        keep = np.asarray(pc.utf8_length(flat)) > 0
        doc = np.repeat(np.arange(t.num_rows), counts)[keep]
        vals = flat.to_numpy(zero_copy_only=False)[keep]
        codes, uniq = pd.factorize(vals)
        if len(codes) < n:
            return pa.table({"ngram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        # positional base-B packing overflows uint64 when B^n >= 2^64
        # (e.g. n=3 with >~2.6M distinct tokens) and numpy wraps
        # SILENTLY, merging unrelated n-grams. Halve the batch instead —
        # partials are per-batch pre-cuts, so splitting is semantically
        # free
        if float(len(uniq) + 1) ** n >= 2.0 ** 64:
            rows = t.num_rows
            if rows <= 1:
                raise ValueError(
                    "top_ngrams: a single document exceeds the uint64 "
                    f"n-gram packing capacity for n={n}")
            return pa.concat_tables(
                [partial(t.slice(0, rows // 2)),
                 partial(t.slice(rows // 2))],
                promote_options="default")
        # packed key over a sliding window of n token codes within a doc
        same = np.ones(len(codes) - (n - 1), dtype=bool)
        key = codes[: len(codes) - (n - 1)].astype(np.uint64)
        for j in range(1, n):
            sl = slice(j, len(codes) - (n - 1) + j)
            same &= doc[sl] == doc[: len(codes) - (n - 1)]
            key = key * np.uint64(len(uniq) + 1) + codes[sl].astype(np.uint64)
        key = key[same]
        if not len(key):
            return pa.table({"ngram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uk, cnt = np.unique(key, return_counts=True)
        if len(uk) > per_batch_cut:
            top = np.argpartition(-cnt, per_batch_cut - 1)[:per_batch_cut]
            uk, cnt = uk[top], cnt[top]
        # unpack the key back to the n-gram string
        parts = []
        rem = uk.copy()
        for _ in range(n):
            parts.append(rem % np.uint64(len(uniq) + 1))
            rem //= np.uint64(len(uniq) + 1)
        parts.reverse()
        grams = uniq[parts[0].astype(np.int64)].astype(object)
        for pcol in parts[1:]:
            grams = grams + " " + uniq[pcol.astype(np.int64)]
        return pa.table({"ngram": pa.array(grams, pa.string()),
                         "n": pa.array(cnt.astype(np.int64))})

    # distributed top-k between the groupby and the driver: the per-batch
    # cut bounds each partial, but the surviving distinct-ngram set is up
    # to per_batch_cut × n_batches rows at corpus scale — the sort+limit
    # leaves only k of them to collect
    totals = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("ngram").sum("n") \
        .rename_columns({"sum(n)": "n"}) \
        .sort(["n", "ngram"], descending=[True, False]) \
        .limit(k).to_pandas()
    if not len(totals):
        # Ray's to_pandas drops a 0-row Dataset's columns (all-empty
        # corpus, or every doc shorter than n tokens) — keep the
        # documented (ngram, n) frame shape regardless (sweep-found)
        return pd.DataFrame({"ngram": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64)})
    return totals[["ngram", "n"]].reset_index(drop=True)


def _ngram_hashes(texts, n: int, lowercase: bool = True):
    """Deterministic 64-bit hashes of word n-grams, one flat array plus
    the doc id of each window. ``texts`` is an Arrow string array (or
    chunked). Token hashes come from pandas' fixed-key siphash
    (``pd.util.hash_array`` — identical on every worker, unlike Python's
    salted ``hash``); windows combine them order-sensitively with a
    polynomial roll + splitmix64 finalizer. Vectorized end to end."""
    import pandas as pd

    from .hashing import tokenize_words
    vals, doc = tokenize_words(texts, lowercase)
    if len(vals) < n:
        return (np.empty(0, np.uint64), np.empty(0, np.int64))
    # hash the UNIQUES only (small), then map through the codes
    codes, uniq = pd.factorize(vals)
    th = pd.util.hash_array(np.asarray(uniq, dtype=object),
                            categorize=False)[codes]
    m = len(th) - (n - 1)
    same = np.ones(m, dtype=bool)
    key = th[:m].copy()
    with np.errstate(over="ignore"):
        for j in range(1, n):
            sl = slice(j, m + j)
            same &= doc[sl] == doc[:m]
            key = key * np.uint64(0x100000001B3) + th[sl]
    return splitmix64(key[same]), doc[:m][same]


def flag_contamination(ds, benchmark, text_col: str = "text", n: int = 8,
                       bench_col: str = "text", lowercase: bool = True):
    """Benchmark decontamination (the GPT-3/PaLM-style n-gram overlap
    check): flag every training document that shares at least one word
    ``n``-gram with a held-out evaluation set. The benchmark (small: an
    eval set, not a corpus) is reduced driver-side to a SORTED array of
    n-gram hashes — ~8 bytes per distinct benchmark n-gram — and
    broadcast once via ``ray.put``; each batch then probes it with one
    ``np.searchsorted`` pass. Adds ``contam_ngrams`` (number of windows
    hitting the benchmark set) and ``contaminated`` (bool). Matching is
    by 64-bit hash: a false flag needs a 2^-64 collision.

    At 100 TB this is one streaming ``map_batches`` — no shuffle; the
    only cross-task state is the read-only benchmark hash array in the
    object store."""
    import ray

    import pandas as pd
    if isinstance(benchmark, pd.DataFrame):
        benchmark = pa.Table.from_pandas(benchmark)
    if isinstance(benchmark, pa.Table):
        bench_texts = benchmark[bench_col]
    else:
        bench_texts = benchmark
    bh, _ = _ngram_hashes(bench_texts, n, lowercase)
    bench_ref = ray.put(np.unique(bh))

    def fn(t: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        h, doc = _ngram_hashes(t[text_col], n, lowercase)
        hits = np.zeros(t.num_rows, dtype=np.int64)
        if len(h) and len(bench):
            pos = np.searchsorted(bench, h)
            ok = (pos < len(bench)) & (bench[np.minimum(pos, len(bench) - 1)]
                                       == h)
            if ok.any():
                np.add.at(hits, doc[ok], 1)
        return t.append_column(
            "contam_ngrams", pa.array(hits, pa.int64())).append_column(
            "contaminated", pa.array(hits > 0, pa.bool_()))

    # bounded batches: token-hash arrays scale with the batch's text —
    # see chunk_documents for the first-touch page-fault rationale
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                    target_chars: int = 4096, overlap_chars: int = 256):
    """Training-prep chunking: split long documents into overlapping
    chunks of at most ``target_chars`` BYTES, boundaries snapped to
    whitespace (falling back to a UTF-8-safe backoff when a window has
    none). Deterministic and per-chunk independent — chunk *k* of a doc
    derives from fixed stride positions, so the whole op is one
    vectorized ``map_batches`` pass over the flat string buffer (no
    per-row Python, no shuffle). Every non-whitespace byte of the
    original lands in at least one chunk, and consecutive chunks overlap
    by ~``overlap_chars`` (context carry-over for training windows).

    Output: one row per chunk — ``(id_col, chunk_idx, chunk_start,
    chunk_text)`` with ``chunk_start`` the byte offset into the original
    document.

    Geometry (all guarantees hold for ANY whitespace layout): start
    boundaries anchor at ``k * (target - 2*overlap)`` and may snap BACK
    by at most ``overlap - 4`` bytes to land after a whitespace; ends
    cap at ``start + target`` and may snap back by the same margin.
    With both snaps at their extremes consecutive chunks still overlap,
    and the chunk count is sized so the final chunk always reaches the
    document end — so every chunk is ≤ ``target_chars`` bytes AND every
    non-whitespace byte is covered."""
    if overlap_chars < 8 or target_chars <= 2 * overlap_chars:
        raise ValueError("need overlap_chars >= 8 and "
                         "target_chars > 2*overlap_chars")
    stride = target_chars - 2 * overlap_chars

    from .hashing import flatten_column

    def fn(t: pa.Table) -> pa.Table:
        col = t[text_col]
        data, starts, lengths = flatten_column(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray)
            else col)
        n_docs = len(lengths)
        if n_docs == 0:
            return pa.table({id_col: t[id_col],
                             "chunk_idx": pa.array([], pa.int64()),
                             "chunk_start": pa.array([], pa.int64()),
                             "chunk_text": pa.array([], pa.large_string())})
        # LUT gather beats chained uint8 comparisons ~8x on whole-block
        # batches (one pass instead of four + three ORs)
        lut = np.zeros(256, bool)
        lut[[9, 10, 13, 32]] = True
        # leading -1 sentinel: whitespace-free buffers still index safely
        # (the ok1/ok2 position guards reject it)
        ws_pos = np.concatenate([[-1], np.flatnonzero(lut[data])])
        L = lengths
        # sized so the LAST anchor + target reaches the doc end even if
        # its start snapped back the full overlap margin
        n_chunks = np.where(
            L <= target_chars, 1,
            ((L - target_chars + overlap_chars + stride - 1) // stride)
            + 1).astype(np.int64)
        total = int(n_chunks.sum())
        doc = np.repeat(np.arange(n_docs), n_chunks)
        first = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        k = np.arange(total) - first[doc]
        doc_abs = starts[doc]
        abs_s = doc_abs + k * stride
        doc_end = doc_abs + L[doc]

        def utf8_backoff(p, lo):
            # move back over UTF-8 continuation bytes (≤3 steps) so a
            # hard cut never splits a codepoint
            for _ in range(3):
                # a cut at p splits a codepoint iff the byte AT p is a
                # continuation byte; p == len(data) is a valid end cut
                inside = (p > lo) & (p < len(data))
                cont = np.zeros(len(p), dtype=bool)
                cont[inside] = (data[p[inside]] & 0xC0) == 0x80
                p = np.where(cont, p - 1, p)
            return p

        # snap starts (k>0) back ≤ overlap-4 bytes to just after a
        # whitespace (the -4 reserves room for the ≤3-byte UTF-8 backoff
        # to stay inside the window); snap ends the same way. The margin
        # arithmetic keeps every chunk ≤ target AND consecutive chunks
        # overlapping — see the docstring.
        win = overlap_chars - 4
        i1 = np.searchsorted(ws_pos, abs_s, side="right") - 1
        c1 = np.maximum(i1, 0)
        ok1 = (i1 >= 0) & (ws_pos[c1] > abs_s - win) \
            & (ws_pos[c1] >= doc_abs)
        S = np.where(k == 0, doc_abs,
                     np.where(ok1, ws_pos[c1] + 1,
                              utf8_backoff(abs_s, doc_abs)))
        raw_e = np.minimum(S + target_chars, doc_end)
        at_end = raw_e >= doc_end
        i2 = np.searchsorted(ws_pos, raw_e, side="right") - 1
        c2 = np.maximum(i2, 0)
        ok2 = (i2 >= 0) & (ws_pos[c2] > raw_e - win) & (ws_pos[c2] > S)
        E = np.where(at_end, doc_end,
                     np.where(ok2, ws_pos[c2], utf8_backoff(raw_e, S)))
        E = np.maximum(E, S)

        # one gather for every chunk's bytes → LargeString from buffers.
        # Index construction via the cumsum-jump trick (ones everywhere,
        # boundary slots hold the jump to the next chunk's start) — the
        # naive double-np.repeat build is ~30x slower on whole-block
        # batches
        out_len = E - S
        nz = out_len > 0
        s_nz, len_nz = S[nz], out_len[nz]
        n_out = int(len_nz.sum())
        if n_out:
            jump = np.ones(n_out, np.int64)
            bs = np.concatenate([[0], np.cumsum(len_nz)[:-1]])
            jump[0] = s_nz[0]
            if len(s_nz) > 1:
                jump[bs[1:]] = s_nz[1:] - (s_nz[:-1] + len_nz[:-1] - 1)
            buf = data[np.cumsum(jump)].tobytes()
        else:
            buf = b""
        offs = np.concatenate([[0], np.cumsum(out_len)]).astype(np.int64)
        text_arr = pa.Array.from_buffers(
            pa.large_utf8(), total,
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(buf)])
        ids = t[id_col].combine_chunks() if isinstance(t[id_col],
                                                       pa.ChunkedArray) \
            else t[id_col]
        return pa.table({id_col: ids.take(pa.array(doc, pa.int64())),
                         "chunk_idx": pa.array(k, pa.int64()),
                         "chunk_start": pa.array(S - doc_abs, pa.int64()),
                         "chunk_text": text_arr})

    # bounded batches: the kernel allocates index arrays ~the batch's
    # text bytes; whole-block batches would make every worker's first
    # call fault in hundreds of MB of fresh pages (measured ~6 s/worker
    # on first touch), while modest batches reuse the same arena
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def flag_blocklist(ds, patterns, text_col: str = "text",
                   out_col: str = "blocked", word_match: bool = True,
                   regex_limit: int = 64):
    """Blocklist matching (C4/Gopher-style word filters): flag documents
    containing any blocklisted term. Two tiers, both map-only:

    - ``len(patterns) <= regex_limit``: ONE compiled RE2 alternation per
      batch (``match_substring_regex``, case-insensitive), word-bounded
      when ``word_match``.
    - larger lists: tokenize each batch (the shared ``tokenize_words``
      kernel) and membership-test tokens against the broadcast pattern
      set (``ray.put`` once — a word blocklist is MBs at worst, the
      legitimate broadcast-small-side case). ``word_match`` only;
      substring semantics need the regex tier.

    DuckDB mirrors: ``regexp_matches(lower(text), '\\b(?:a|b)\\b')`` /
    ``list_has_any(string_split_regex(lower(text), '\\W+'), [...])``.
    """
    import re as _re

    import ray

    pats = [p.lower() for p in patterns if p]
    if not pats:
        raise ValueError("flag_blocklist needs at least one pattern")
    if len(pats) <= regex_limit:
        alt = "|".join(_re.escape(p) for p in pats)
        rx = rf"\b(?:{alt})\b" if word_match else rf"(?:{alt})"

        def fn(t: pa.Table) -> pa.Table:
            s = pc.utf8_lower(pc.cast(pc.fill_null(t[text_col], ""),
                                      pa.string()))
            return t.append_column(out_col,
                                   pc.match_substring_regex(s, rx))
        return ds.map_batches(fn, batch_format="pyarrow")

    if not word_match:
        raise ValueError("substring matching beyond regex_limit patterns "
                         "is not supported; raise regex_limit or use "
                         "word_match=True")
    blocked_ref = ray.put(frozenset(pats))

    def fn_set(t: pa.Table) -> pa.Table:
        import pandas as pd

        from .hashing import tokenize_words
        blocked = ray.get(blocked_ref)
        vals, doc = tokenize_words(t[text_col], lowercase=True)
        hit = np.zeros(t.num_rows, dtype=bool)
        if len(vals):
            # membership on unique tokens only (Zipf: uniques << tokens),
            # then broadcast through the factorize codes
            codes, uniq = pd.factorize(vals)
            umask = np.fromiter((u in blocked for u in uniq), bool,
                                count=len(uniq))
            mask = umask[codes]
            np.logical_or.at(hit, doc[mask], True)
        return t.append_column(out_col, pa.array(hit))

    return ds.map_batches(fn_set, batch_format="pyarrow")


#: tracking query parameters stripped by canonicalize_url
TRACKING_PARAMS = r"(?:utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|igshid|ref)"


def canonicalize_url(ds, url_col: str = "url", out_col: str = "url_canon"):
    """URL canonicalization for url-level dedup: lowercase scheme+host,
    drop the fragment, strip tracking query parameters
    (:data:`TRACKING_PARAMS`), drop default ports (:80 http / :443
    https), and trim a dangling ``?``/``&``. All RE2 kernels over the
    whole column — no Python rows; non-URL values pass through
    unchanged. The same regex chain runs in DuckDB ``regexp_replace``
    for the oracle test."""
    def fn(t: pa.Table) -> pa.Table:
        s = pc.cast(pc.fill_null(t[url_col], ""), pa.string())
        ex = pc.extract_regex(
            s, r"^(?P<sh>[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(?P<rest>.*)$")
        sh = pc.struct_field(ex, "sh")
        rest = pc.struct_field(ex, "rest")
        is_url = pc.is_valid(sh)
        sh = pc.utf8_lower(pc.fill_null(sh, ""))
        sh = pc.replace_substring_regex(sh, r"^(http://[^/?#:]*):80$",
                                        r"\1")
        sh = pc.replace_substring_regex(sh, r"^(https://[^/?#:]*):443$",
                                        r"\1")
        rest = pc.fill_null(rest, "")
        rest = pc.replace_substring_regex(rest, r"#.*$", "")
        # a RUN of adjacent tracking params matches in one pass (adjacent
        # matches share their [?&] boundary char, so a single-param
        # pattern would skip every other one)
        tp = TRACKING_PARAMS + r"=[^&#]*"
        rest = pc.replace_substring_regex(
            rest, r"([?&])" + tp + r"(?:&" + tp + r")*&?", r"\1")
        rest = pc.replace_substring_regex(rest, r"[?&]$", "")
        canon = pc.binary_join_element_wise(sh, rest, "")
        out = pc.if_else(is_url, canon, t[url_col])
        return t.append_column(out_col, out)
    return ds.map_batches(fn, batch_format="pyarrow")


def add_unicode_normalized(ds, text_col: str = "text",
                           out_col: str = "text_nfc", form: str = "NFC"):
    """Unicode normalization (curation staple before dedup/tokenizing —
    'café' composed vs decomposed must fingerprint identically).
    Decomposing forms (NFD/NFKD) run the Arrow ``utf8_normalize`` kernel;
    the COMPOSING forms route through stdlib ``unicodedata`` because this
    pyarrow build's kernel never recomposes — ``utf8_normalize(...,
    form="NFC")`` returns NFD bytes (verified against unicodedata and
    DuckDB ``nfc_normalize``; the per-row loop's work is one C call per
    document). DuckDB mirror for NFC: ``nfc_normalize(text)``."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    if form in ("NFD", "NFKD"):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                out_col, pc.utf8_normalize(t[text_col], form=form))
    else:
        import unicodedata

        def fn(t: pa.Table) -> pa.Table:
            norm = unicodedata.normalize
            vals = [None if v is None else norm(form, v)
                    for v in t[text_col].to_pylist()]
            return t.append_column(out_col, pa.array(vals, pa.string()))
    return ds.map_batches(fn, batch_format="pyarrow")
