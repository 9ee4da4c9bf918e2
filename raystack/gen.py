"""Deterministic synthetic webtext + drift-fixture generators (SURVEY.md §7
step 0, FIXTURES.md F1/F2). No external data; everything seeded.

- :func:`make_webtext` — one Arrow table of Common-Crawl-style pages:
  Zipf-distributed url hosts (heavy-hitter skew for the salt-split path),
  near-monotone ``warc_ts`` (narrow deltas → FOR+bitpack), templated ``html``
  wrapping ``text`` (repetitive markup → dict→FSST; occasional non-UTF8
  bytes), skewed categorical ``lang``.
- :func:`extract_text` — the fixed extractor establishing the per-row
  invariant "byte-identical extracted text per url" (BASELINE.json).
- :func:`write_webtext` — drifting Parquet partition files mirroring the
  reference's drift classes (extra / renamed / reordered columns;
  reference tests/test_combine_csv.py:139-206).
- :func:`make_sales_files` — the reference's numeric jan/feb/mar fixture
  (reference tests/test_combine_csv.py:61-91) as Parquet, for align parity
  tests.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import WEBTEXT_SCHEMA

_VOCAB = (
    "the data web page crawl index query table column row batch stream shard "
    "partition engine vector hash key value store cache disk memory network "
    "fast slow large small open close read write scan filter join group sort "
    "merge split encode decode pack light heavy deep wide narrow long short "
    "news article science sport market price trade model train test sample "
    "public record archive history search rank score link site host path"
).split()

_LANGS = ["en", "de", "fr", "es", "zh", "ru", "pt", "ja", "it", "nl"]
_LANG_W = np.array([0.60, 0.07, 0.06, 0.06, 0.05, 0.04, 0.04, 0.03, 0.03, 0.02])

_N_HOSTS = 500
_BASE_TS = np.datetime64("2024-03-01T00:00:00", "us").astype(np.int64)

_MAIN_OPEN = b"<main>"
_MAIN_CLOSE = b"</main>"


def _hosts() -> list[str]:
    tlds = ["com", "org", "net", "io", "info"]
    return [f"www.site{i:03d}.{tlds[i % len(tlds)]}" for i in range(_N_HOSTS)]


def _zipf_probs(n: int, a: float = 1.3) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** a
    return p / p.sum()


def extract_text(html: bytes) -> str:
    """The fixed extractor: contents of <main>…</main>, UTF-8 decoded."""
    i = html.index(_MAIN_OPEN) + len(_MAIN_OPEN)
    j = html.index(_MAIN_CLOSE, i)
    return html[i:j].decode("utf-8")


def make_webtext(n_rows: int, seed: int = 42, file_index: int = 0) -> pa.Table:
    rng = np.random.default_rng((seed, file_index))
    hosts = np.array(_hosts())
    host_idx = rng.choice(_N_HOSTS, size=n_rows, p=_zipf_probs(_N_HOSTS))
    seg = rng.choice(_VOCAB, size=(n_rows, 2))
    row_ids = np.arange(n_rows) + file_index * 10_000_000
    urls = [f"https://{h}/{s0}/{s1}-{r}"
            for h, s0, s1, r in zip(hosts[host_idx], seg[:, 0], seg[:, 1], row_ids)]

    gaps = rng.exponential(50_000, n_rows).astype(np.int64)  # ~0.05 s mean gap
    ts = _BASE_TS + np.int64(file_index) * 3_600_000_000 + np.cumsum(gaps)

    n_words = rng.integers(20, 80, n_rows)
    words = rng.choice(_VOCAB, size=(n_rows, 80))
    texts = [" ".join(w[:k]) for w, k in zip(words, n_words)]
    empty = rng.random(n_rows) < 0.005
    texts = ["" if e else t for t, e in zip(texts, empty)]

    titles = seg[:, 0]
    non_utf8 = rng.random(n_rows) < 0.05
    htmls = []
    for i in range(n_rows):
        h = (f'<html><head><title>{titles[i]}</title><meta charset="utf-8">'
             f'</head><body><nav><a href="/">home</a><a href="/about">about</a>'
             f'</nav><main>{texts[i]}</main><footer>© 2024 {hosts[host_idx[i]]}'
             f'</footer></body></html>').encode()
        if non_utf8[i]:
            h = h.replace(b"</body>", b"<!--\xff\xfe\x80--></body>")
        htmls.append(h)

    langs = rng.choice(_LANGS, size=n_rows, p=_LANG_W).astype(object)
    lang_null = rng.random(n_rows) < 0.01
    langs = [None if m else l for l, m in zip(langs, lang_null)]

    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array(htmls, type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
    }, schema=WEBTEXT_SCHEMA)


def _apply_drift(t: pa.Table, file_index: int, drift: bool) -> pa.Table:
    """Reference drift classes: extra column / rename / reorder
    (reference tests/test_combine_csv.py:139-206)."""
    if not drift or file_index < 2:
        return t
    mode = file_index % 4
    if mode == 2:  # extra column
        mime = pa.array(["text/html"] * t.num_rows)
        return t.append_column("mime", mime)
    if mode == 3:  # renamed column text -> body
        names = ["body" if n == "text" else n for n in t.schema.names]
        return t.rename_columns(names)
    # mode == 0/1 for file_index >= 4: reorder
    order = ["lang", "url", "html", "warc_ts", "text"]
    return t.select(order)


def write_webtext(out_dir: str, n_rows: int, n_files: int = 4, seed: int = 42,
                  drift: bool = True) -> list[str]:
    os.makedirs(out_dir, exist_ok=True)
    per = n_rows // n_files
    paths = []
    for i in range(n_files):
        rows = per if i < n_files - 1 else n_rows - per * (n_files - 1)
        t = _apply_drift(make_webtext(rows, seed, i), i, drift)
        p = os.path.join(out_dir, f"part-{i:04d}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths


def make_sales_files(out_dir: str, drift: str = "none") -> list[str]:
    """The reference's jan/feb/mar fixture as Parquet. ``drift`` in
    {none, extra, rename, reorder} (reference tests/test_combine_csv.py:61-206)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for m, month in enumerate(["jan", "feb", "mar"], start=1):
        n = 10
        cols = {
            "date": pa.array(np.arange(n).astype(np.int64) * 86_400_000_000
                             + np.datetime64(f"2011-{m:02d}-01", "us").astype(np.int64)
                             ).cast(pa.timestamp("us")),
            "sales": pa.array([100] * n, type=pa.int64()),
            "cost": pa.array([-80] * n, type=pa.int64()),
            "profit": pa.array([20] * n, type=pa.int64()),
        }
        t = pa.table(cols)
        if month == "mar":
            if drift == "extra":
                t = t.append_column("profit2", pa.array([40] * n, type=pa.int64()))
            elif drift == "rename":
                t = t.rename_columns(["date", "revenue", "cost", "profit"])
            elif drift == "reorder":
                t = t.select(["profit", "date", "sales", "cost"])
        p = os.path.join(out_dir, f"{month}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths
