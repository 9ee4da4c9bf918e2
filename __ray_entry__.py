"""Driver contract for the raystack engine.

``entry()`` — flagship pipeline on sf0.001: split ``documents`` into
drifting Parquet partitions, schema-align (union + rename merge), encode
every column with auto-selected codecs through the partitioned groupby
pipeline, decode, return the decoded Dataset.

``queries()`` / ``oracle_sql()`` — one entry per operator family from
SURVEY.md §2 (+ the training-data ops), DuckDB-checkable where
SQL-expressible. Ray is initialised by the driver; nothing here calls
``ray.init``.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

from raystack.io import read_parquet_clean as _read_pq
import pyarrow.parquet as pq

_SCRATCH = "/tmp/raystack_entry"
#: snapshot dir the oracle SQL reads — the driver runs oracles at sf0.01
#: (scale 6000); the scale-keyed dirs keep other scales from clobbering it
_ORACLE_SNAP = os.path.join(_SCRATCH, "webtext_6000_snap")
#: oracle-pinned centroid snapshot (driver oracles run at sf0.01 only)
_CENT_SNAP = os.path.join(_SCRATCH, "centroids_snap_sf0.01")


# ---------------------------------------------------------------------------
# deterministic drifted split of the documents table (the align fixtures)
# ---------------------------------------------------------------------------

def _drifted_documents(sf_dir: str) -> list[str]:
    """documents → 3 Parquet partition files with reference drift classes:
    part-0 full schema, part-1 drops ``source``, part-2 renames
    ``text``→``body``. Split rule: doc_id % 3 (mirrors the oracle SQL)."""
    tag = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(_SCRATCH, tag)
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    doc_mod = pa.array(np.asarray(t["doc_id"].combine_chunks()) % 3)
    import pyarrow.compute as pc
    paths = []
    for i in range(3):
        part = t.filter(pc.equal(doc_mod, i))
        if i == 1:
            part = part.drop_columns(["source"])
        elif i == 2:
            part = part.rename_columns(
                ["body" if c == "text" else c for c in part.schema.names])
        p = os.path.join(out, f"part-{i}.parquet")
        pq.write_table(part, p)
        paths.append(p)
    return paths


def _aligned(sf_dir: str, **kw):
    from raystack.align import read_aligned
    return read_aligned(_drifted_documents(sf_dir),
                        columns_rename={"body": "text"}, **kw)


# ---------------------------------------------------------------------------
# webtext fixtures (scale-keyed, built once per scale, read-only after)
# ---------------------------------------------------------------------------

def _webtext_scale(sf_dir: str) -> int:
    return 2000 if "0.001" in sf_dir else 6000


def _webtext_dirs(sf_dir: str) -> tuple[int, str, str, str]:
    """(scale, gen_base, snapshot_dir, encode_dir) — all keyed by scale so
    interleaved scales never clobber each other's fixtures (round-2 finding:
    a shared snap dir forced every dependent query to re-encode)."""
    scale = _webtext_scale(sf_dir)
    base = os.path.join(_SCRATCH, f"webtext_{scale}")
    return scale, base, base + "_snap", base + "_enc"


def _ensure_webtext(sf_dir: str) -> tuple[list[str], str, str]:
    """Generate the drifting webtext partitions and the aligned parquet
    snapshot (the DuckDB oracle's input) once per scale; deterministic, so
    an existing snapshot is always valid. Returns (paths, snap, enc)."""
    from raystack.align import read_aligned
    from raystack.gen import write_webtext
    scale, base, snap, enc = _webtext_dirs(sf_dir)
    done = os.path.join(base, ".complete")
    if os.path.exists(done):
        # deterministic generator + marker: don't regenerate and rewrite
        # identical partition files on every dependent query
        import glob as _glob
        paths = sorted(_glob.glob(os.path.join(base, "part-*.parquet")))
    else:
        paths = write_webtext(base, n_rows=scale, n_files=4, drift=True)
        with open(done, "w") as f:
            f.write("ok")
    if not os.path.isdir(snap):
        tmp = snap + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        read_aligned(paths, columns_rename={"body": "text"},
                     add_filename=True) \
            .select_columns(["url", "warc_ts", "html", "text", "lang"]) \
            .write_parquet(tmp)
        os.replace(tmp, snap)
    return paths, snap, enc


def _ensure_webtext_enc(sf_dir: str) -> str:
    """Encoded layout for the dependent (read-only) queries: encode only
    when no finalized manifest exists — one encode per scale per run."""
    from raystack import manifest as mf
    from raystack import pipeline as pl
    paths, snap, enc = _ensure_webtext(sf_dir)
    if not mf.load_manifest(enc):
        shutil.rmtree(enc, ignore_errors=True)
        pl.encode_partitioned_tasks(paths, enc,
                                    columns_rename={"body": "text"},
                                    num_partitions=8)
    return enc


def _digest_html(ds):
    """Replace the raw ``html`` binary column with its md5-over-hex digest:
    DuckDB's client returns BLOBs as ``bytearray`` which crashes the
    driver's canonical sort (round-2 finding), so both sides compare
    ``md5(hex(html))`` instead — bit-identity of the decode is preserved
    by the digest."""
    import hashlib

    def fn(t: pa.Table) -> pa.Table:
        out = {}
        for name in t.schema.names:
            if name == "html":
                out["html_md5"] = pa.array(
                    [hashlib.md5(b.as_py().hex().upper().encode())
                     .hexdigest() if b.is_valid else None
                     for b in t["html"].combine_chunks()], pa.string())
            else:
                out[name] = t[name]
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship: drift-align → partitioned codec encode → decode (sf0.001)."""
    from raystack import pipeline as pl
    sf_dir = "/root/testdata/sf0.001"
    out = os.path.join(_SCRATCH, "flagship")
    shutil.rmtree(out, ignore_errors=True)
    ds = _aligned(sf_dir, add_filename=True)
    pl.encode_partitioned(ds, out, url_col="source", num_partitions=4)
    decoded = pl.decode_dir(out, columns=["doc_id", "text", "lang", "source",
                                          "n_chars"])
    return decoded


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _roundtrip(sf_dir: str, table: str, columns: list[str], key_col: str):
    """encode → decode identity over one testdata table (exercises every
    codec family on real ints/floats/timestamps/strings)."""
    import ray.data
    from raystack import pipeline as pl
    ds = _read_pq(os.path.join(sf_dir, f"{table}.parquet"),
                               columns=columns)
    pages = pl.encode_batches(ds, batch_size=8192, concurrency=2)
    return pl.decode_pages(pages, columns=columns)


def queries() -> dict[str, Callable[[str], Any]]:
    import ray.data

    def combine_union(sf):
        return _aligned(sf, add_filename=False)

    def epoch_order(sf):
        """seeded_shuffle's permutation proven at the gate: the 200
        EARLIEST docs of epoch seed=42 — i.e. the smallest bijective
        sort keys splitmix64(doc_id ^ 42) — via the real distributed
        sort + streaming limit. The SQL mirror recomputes the key with
        the HUGEINT splitmix CTEs and takes the same prefix, so a wrong
        hash, sort order or limit boundary flips the row set. (Took
        combine_common's slot: the intersect-align path it exercised is
        pytest-covered in test_plan_align.py and combine_union walks the
        same align stage at the gate.)"""
        import ray.data
        from raystack.ops.text import seeded_shuffle
        ds = ray.data.read_parquet(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "lang"])
        return seeded_shuffle(ds, seed=42).limit(200)

    def combine_provenance(sf):
        """columns_select (M6) + provenance (M4) proven in ONE query:
        the aligned read selects a column subset AND tags each row's
        source file (was two queries; merged to free a slot for
        zone_count_where)."""
        ds = _aligned(sf, columns_select=["doc_id", "lang", "n_chars"],
                      add_filename=True)
        return ds.select_columns(["doc_id", "lang", "n_chars", "filename"])

    def combine_preview(sf):
        from raystack.stacker import Stacker
        st = Stacker(_drifted_documents(sf), columns_rename={"body": "text"},
                     add_filename=False)
        df = st.combine_preview(nrows=2)
        return df[["doc_id", "lang", "n_chars"]]

    def roundtrip_events(sf):
        return _roundtrip(sf, "events",
                          ["event_id", "ts", "user_id", "event_type", "value",
                           "props"], "event_id")

    def roundtrip_lineitem(sf):
        return _roundtrip(sf, "lineitem",
                          ["l_orderkey", "l_partkey", "l_quantity",
                           "l_returnflag", "l_linestatus", "l_shipdate"],
                          "l_orderkey")

    def roundtrip_partitioned(sf):
        from raystack import pipeline as pl
        out = os.path.join(_SCRATCH, "rt_part_" + sf.strip("/").replace("/", "_"))
        shutil.rmtree(out, ignore_errors=True)
        ds = _read_pq(os.path.join(sf, "documents.parquet"))
        pl.encode_partitioned(ds, out, url_col="source", num_partitions=4)
        return pl.decode_dir(out, columns=["doc_id", "text", "lang",
                                           "source", "n_chars"])

    def repetition_stats(sf):
        """Gopher-style repetition quality signals; the SQL-expressible
        two (dup-line + ellipsis-line fractions) are oracle-checked,
        top_2gram_frac is pytest-covered (tests/test_text_curation.py)."""
        from raystack.ops.text import add_repetition_stats
        ds = _read_pq(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        return add_repetition_stats(ds).select_columns(
            ["doc_id", "dup_line_frac", "ellipsis_line_frac"])

    def events_stats(sf):
        from ray.data.aggregate import Count, Max, Min
        ds = _read_pq(os.path.join(sf, "events.parquet"),
                                   columns=["event_type", "ts", "user_id"])
        return ds.groupby("event_type").aggregate(
            Count(alias_name="n_events"),
            Min("ts", alias_name="min_ts"),
            Max("ts", alias_name="max_ts"),
            Min("user_id", alias_name="min_user"))

    def token_counts(sf):
        from raystack.ops.text import add_token_count
        ds = _read_pq(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        return add_token_count(ds).select_columns(["doc_id", "n_tokens"])

    def sequence_pack(sf):
        """GPT-style cross-document sequence packing: the corpus token
        stream (whitespace tokens + 1 separator per doc, doc_id order)
        cut into exact 512-token training sequences — one row per
        (doc, sequence) span, every offset hash-compared against a
        DuckDB window-function mirror (prefix sum + generate_series)."""
        from raystack.ops.packing import sequence_pack_plan
        ds = _read_pq(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        return sequence_pack_plan(ds, 512)

    def bpe_token_counts(sf):
        """BPE-ish token counting (GPT-2-style piece regex, one RE2
        kernel per batch; DuckDB runs the same RE2 pattern)."""
        from raystack.ops.text import add_bpe_token_count
        ds = _read_pq(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        return add_bpe_token_count(ds).select_columns(
            ["doc_id", "n_bpe_tokens"])

    def stratified_sample(sf):
        """Deterministic stratified sample: the 5 smallest-splitmix64(id)
        docs per lang (retry/cluster-size stable; pre-reduced so the
        shuffle moves O(groups x k) rows)."""
        from raystack.ops.text import stratified_sample as strat
        ds = _read_pq(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "lang"])
        return strat(ds, "lang", k=5)

    def dedup_paragraphs(sf):
        """Corpus-wide exact paragraph dedup (C4/CCNet curation stage):
        keep-first winner per paragraph, documents reassembled in order
        — oracled vs a DuckDB window-function mirror."""
        from raystack.ops.dedup import dedup_paragraphs as dp
        ds = _read_pq(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        return dp(ds)

    def exact_dedup(sf):
        from raystack.ops.dedup import exact_dedup as dd
        ds = _read_pq(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        return dd(ds, "text", "doc_id")

    def bm25_docs(sf):
        """BM25 ranked retrieval over the persisted inverted keyword index
        (raystack/ops/textindex.py): build once into scratch (postings
        hive-partitioned by token-hash bucket, tf/dl denormalized), score
        every document matching any query word reading ONLY those words'
        buckets, and return (doc_id, score_uq) with the score fixed-point
        rounded (floor(x*1e6+0.5)) so the float sum's last-ulp ordering
        freedom can't flip the value hash. The oracle recomputes the
        identical Lucene-style formula from the raw strings. (The former
        exact_dedup_hash slot merged into exact_dedup — same doc set,
        value-checked there; the hash tier stays pytest-covered.)"""
        import shutil as _sh

        from raystack.ops.textindex import bm25_topk, build_text_index
        idx = os.path.join(_SCRATCH,
                           "bm25_idx_" + os.path.basename(sf.rstrip("/")))
        if not os.path.isfile(os.path.join(idx, "text_index_meta.json")):
            _sh.rmtree(idx, ignore_errors=True)
            ds = _read_pq(os.path.join(sf, "documents.parquet"),
                          columns=["doc_id", "text"])
            build_text_index(ds, idx, num_buckets=16)
        res = bm25_topk(idx, ["stream", "query", "data"], k=10**9)

        def fix(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            uq = pc.cast(pc.floor(pc.add(pc.multiply(t["score"], 1e6), 0.5)),
                         pa.int64())
            return pa.table({"doc_id": t["doc_id"], "score_uq": uq})

        return res.map_batches(fix, batch_format="pyarrow")

    def ann_topk(sf):
        from raystack.ops.similarity import ann_topk as ann
        emb = _read_pq(os.path.join(sf, "embeddings.parquet"))
        head = pq.read_table(os.path.join(sf, "embeddings.parquet")).slice(0, 4)
        qm = np.stack(head["embedding"].to_pandas().to_numpy()).astype(np.float64)
        qids = head["vec_id"].to_numpy()
        return ann(emb, qm, qids, k=10)

    def snapshot_read(sf):
        """Time travel at the gate: day-1 encode (even doc_ids) → day-2
        append (odd) → compact — which RETIRES every pre-compact page
        file into ``_history/`` — then ``decode_dir(snapshot=1)``. The
        decode must resolve snapshot 1's files through the history area
        (they are no longer live), and the result is the day-1 table
        exactly; the oracle recomputes day-1 membership from the source
        parquet. (Replaced ``events_windowed`` in the 50-slot list:
        tumbling windows stay DuckDB-oracled in pytest and
        ``events_hopping`` keeps the window family at the gate —
        hopping ≡ tumbling at hop=window is equivalence-tested.)"""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from raystack import pipeline as pl
        base = os.path.join(_SCRATCH, f"snapread_{os.path.basename(sf)}")
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base)
        t = pq.read_table(os.path.join(sf, "documents.parquet"),
                          columns=["doc_id", "text", "source", "n_chars"])
        even = pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0)
        day1 = os.path.join(base, "day1.parquet")
        day2 = os.path.join(base, "day2.parquet")
        pq.write_table(t.filter(even), day1)
        pq.write_table(t.filter(pc.invert(even)), day2)
        enc = os.path.join(base, "enc")
        pl.encode_partitioned_tasks([day1], enc, url_col="source",
                                    num_partitions=4, add_filename=False)
        pl.encode_append([day2], enc, add_filename=False)
        pl.compact_partitions(enc)
        return pl.decode_dir(enc, snapshot=1)

    def events_hopping(sf):
        """Hopping (sliding) windows: 600 s windows every 200 s — each
        event pre-aggregated into its 3 windows inside map_batches, then
        one small groupby (the shuffle moves one row per (key, window)
        per block, not per event)."""
        from raystack.ops.window import hopping_window_agg
        ds = _read_pq(os.path.join(sf, "events.parquet"),
                                   columns=["event_type", "ts"])
        return hopping_window_agg(ds, "ts", "event_type", window_sec=600,
                                  hop_sec=200)

    def orders_by_segment(sf):
        from raystack.ops.join import broadcast_join
        orders = _read_pq(os.path.join(sf, "orders.parquet"),
                                       columns=["o_orderkey", "o_custkey"])
        cust = pq.read_table(os.path.join(sf, "customer.parquet"),
                             columns=["c_custkey", "c_mktsegment"]
                             ).to_pandas().rename(columns={"c_custkey":
                                                           "o_custkey"})
        return broadcast_join(orders, cust, on="o_custkey", how="inner")

    def top_orders(sf):
        ds = _read_pq(os.path.join(sf, "orders.parquet"),
                                   columns=["o_orderkey", "o_totalprice"])
        return (ds.sort(["o_totalprice", "o_orderkey"],
                        descending=[True, False]).limit(10))

    def contamination(sf):
        """Benchmark decontamination (the GPT-3/PaLM-style training-data
        check): flag every document sharing a word 5-gram with a
        "benchmark" of every 97th document — whole lifted documents, so
        contamination is planted by construction. The op matches on
        fixed-key siphash n-gram hashes; the oracle overlaps the STRINGS
        — a disagreement needs a 2^-64 hash collision.
        (raystack.ops.text.flag_contamination; semi_join stays covered
        by events_anti_join — same broadcast-filter code path.)"""
        from raystack.ops.text import flag_contamination
        t = pq.read_table(os.path.join(sf, "documents.parquet"),
                          columns=["doc_id", "text"])
        bench = t.filter(pa.array(t["doc_id"].to_numpy() % 97 == 0))
        ds = _read_pq(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        return flag_contamination(ds, bench, n=5).select_columns(
            ["doc_id", "contam_ngrams", "contaminated"])

    def events_anti_join(sf):
        # threshold 5 keeps the anti side non-empty at every sf (sf0.001
        # only has user_ids 0-14; an empty Dataset would lose its schema)
        from raystack.ops.join import anti_join
        keys = pq.read_table(os.path.join(sf, "customer.parquet"),
                             columns=["c_custkey"])["c_custkey"].to_pylist()
        keys = [k for k in keys if k < 5]
        ds = _read_pq(os.path.join(sf, "events.parquet"),
                                   columns=["event_id", "user_id"])
        return anti_join(ds, keys, on="user_id")

    def value_quantiles(sf):
        """Exact distributed quantiles of events.value via a value
        histogram (2-decimal floats → bounded distinct count); SQL
        quantile_disc is the oracle."""
        from raystack.ops.colstats import value_quantiles as vq
        ds = _read_pq(os.path.join(sf, "events.parquet"),
                                   columns=["value"])
        return vq(ds, "value", quantiles=(0.5, 0.9, 0.99))

    def frequent_sources(sf):
        """Exact heavy hitters over documents.source (pre-aggregated
        partials, one small groupby, deterministic tie-break)."""
        from raystack.ops.colstats import frequent_items
        ds = _read_pq(os.path.join(sf, "documents.parquet"),
                                   columns=["source"])
        return frequent_items(ds, "source", k=10)

    def extract_text(sf):
        """The north-star per-row invariant IN the driver gate: text
        extracted from the binary ``html`` column (bytes between the
        first ``<main>`` and the first following ``</main>``, UTF-8
        decoded) — the oracle mirrors the extractor with hex/position
        arithmetic over the BLOB, so every byte of every extracted span
        is hash-compared. Merged with the former ``url_parts`` host
        decomposition (same RE2 pattern both sides) so the slot proves
        both string kernels."""
        from raystack.ops.text import add_extracted_text, add_url_parts
        _, snap, _ = _ensure_webtext(sf)
        ds = _read_pq(snap, columns=["url", "html"])
        ds = add_extracted_text(ds)
        return add_url_parts(ds).select_columns(
            ["url", "host", "text_extracted"])

    def curate_corpus(sf):
        """FLAGSHIP composition: langid -> quality -> quality filter ->
        exact dedup (fingerprint drop set) -> MinHash near-dedup ->
        deterministic holdout split, end to end over documents. Every
        stage is individually oracled; this query proves the COMPOSITION
        against one composed DuckDB mirror. (On this corpus the quality
        threshold keeps all docs — min quality 0.69 — so the dedup
        population equals the proven closure population.)"""
        from raystack.curate import curate_corpus as cc
        ds = _read_pq(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        return cc(ds, quality_threshold=0.5, holdout_fraction=0.1)

    def props_extract(sf):
        """Vectorized JSON-ish field extraction from the events props
        column (one regex kernel per batch)."""
        import pyarrow.compute as pc
        ds = _read_pq(os.path.join(sf, "events.parquet"),
                                   columns=["event_id", "props"])

        def fn(t: pa.Table) -> pa.Table:
            ex = pc.extract_regex(t["props"], r'"k": (?P<v>\d+)')
            v = pc.cast(pc.struct_field(ex, "v"), pa.int64())
            return pa.table({"event_id": t["event_id"], "k_value": v})

        return ds.map_batches(fn, batch_format="pyarrow")

    def column_stats(sf):
        from raystack.ops.colstats import column_stats as cs
        ds = _read_pq(os.path.join(sf, "documents.parquet"))
        return cs(ds, with_distinct=False)

    def column_stats_sketch(sf):
        """KMV distinct sketch with k=1024: exact below k (all columns at
        the driver's correctness scale), estimate beyond — so the DuckDB
        count(DISTINCT) oracle is a true equality check of the merge path."""
        from raystack.ops.colstats import column_stats as cs
        ds = _read_pq(os.path.join(sf, "documents.parquet"))
        return cs(ds, with_distinct=True, k=1024)

    def sessionized_events(sf):
        from raystack.ops.window import sessionize
        ds = _read_pq(os.path.join(sf, "events.parquet"),
                                   columns=["event_id", "user_id", "ts"])
        return sessionize(ds, "ts", "user_id", "event_id", gap_sec=1800)

    def roundtrip_embeddings(sf):
        return _roundtrip(sf, "embeddings",
                          ["vec_id", "embedding", "label"], "vec_id")

    def csv_ingest(sf):
        """Drifting CSV partitions (written from documents) → sniff dialect
        → aligned union (the reference's flagship CombinerCSV path)."""
        from raystack.sources.csv import read_aligned_csv
        tag = sf.strip("/").replace("/", "_")
        out = os.path.join(_SCRATCH, "csv_" + tag)
        os.makedirs(out, exist_ok=True)
        t = pq.read_table(os.path.join(sf, "documents.parquet"),
                          columns=["doc_id", "text", "lang", "n_chars"])
        doc_mod = np.asarray(t["doc_id"].combine_chunks()) % 3
        import pyarrow.compute as pc
        paths = []
        for i in range(3):
            part = t.filter(pc.equal(pa.array(doc_mod), i))
            if i == 2:  # drift: renamed column
                part = part.rename_columns(
                    ["doc_id", "body", "lang", "n_chars"])
            p = os.path.join(out, f"part-{i}.csv")
            part.to_pandas().to_csv(p, index=False)
            paths.append(p)
        return read_aligned_csv(paths, columns_rename={"body": "text"},
                                add_filename=False)

    # --- rows-only (non-SQL-expressible) ---------------------------------
    def langid(sf):
        from raystack.ops.text import add_language_id
        ds = _read_pq(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        return add_language_id(ds, concurrency=2).select_columns(
            ["doc_id", "lang_pred"])

    def quality(sf):
        from raystack.ops.text import add_quality_score
        ds = _read_pq(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        return add_quality_score(ds).select_columns(["doc_id", "quality"])

    def fingerprints(sf):
        from raystack.ops.text import add_fingerprint
        ds = _read_pq(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        return add_fingerprint(ds).select_columns(["doc_id", "fingerprint"])

    def fingerprint_dups(sf):
        """Plant exact copies (doc_id+1000000 for doc_id<20), then report
        (doc_id, dup_of=min id) per fingerprint group with ≥2 members. The
        oracle is the planted pair list — matching it proves the 64-bit
        fingerprint is equal on equal texts AND collision-free on the
        corpus's distinct texts."""
        import pyarrow.compute as pc
        from raystack.ops.text import add_fingerprint
        ds = _read_pq(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])

        def plant(t: pa.Table) -> pa.Table:
            keep = t.filter(pc.less(t["doc_id"], 20))
            copies = pa.table({
                "doc_id": pc.add(keep["doc_id"], 1000000),
                "text": keep["text"]})
            return pa.concat_tables([t, copies])

        planted = ds.map_batches(plant, batch_format="pyarrow")
        fp = add_fingerprint(planted)

        def pairs(g):
            import pandas as pd
            if len(g) < 2:
                return pd.DataFrame({"doc_id": [], "dup_of": []})
            g = g.sort_values("doc_id")
            keep = int(g["doc_id"].iloc[0])
            rest = g["doc_id"].iloc[1:].astype("int64")
            return pd.DataFrame({"doc_id": rest,
                                 "dup_of": np.full(len(rest), keep)})

        return fp.groupby("fingerprint").map_groups(pairs,
                                                    batch_format="pandas")

    def minhash_dedup(sf):
        from raystack.ops.dedup import minhash_lsh_dedup
        ds = _read_pq(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        return minhash_lsh_dedup(ds)

    def jaccard_pairs(sf):
        """Exact n-gram Jaccard (window=8) over the near-duplicate pairs:
        the LSH candidates get their true set similarity. The window
        hash is a bijection on the 8-byte window (uint64 view →
        splitmix64), so distinct-hash counts equal distinct-substring
        counts exactly and the SQL mirror (distinct substr 8-grams,
        double division) reproduces the float bit-for-bit on this ASCII
        corpus."""
        import pandas as pd
        from raystack.ops.dedup import minhash_lsh_dedup, verify_pairs_jaccard
        ds = _read_pq(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        pairs = minhash_lsh_dedup(ds).to_pandas()
        out = verify_pairs_jaccard(ds, pairs, threshold=0.0)
        return out[["doc_id", "dup_of", "jaccard"]]

    def events_asof(sf):
        """As-of join: each event picks the latest prior (ts <=) purchase
        of the same user — one groupby shuffle + vectorized searchsorted
        merge per group (ops/join.py::asof_join). Oracle: DuckDB's native
        ASOF LEFT JOIN."""
        from raystack.ops.join import asof_join
        ev = _read_pq(os.path.join(sf, "events.parquet"),
                                   columns=["event_id", "ts", "user_id",
                                            "event_type", "value"])
        pur = ev.filter(lambda r: r["event_type"] == "purchase") \
            .map_batches(lambda t: t.select(["user_id", "ts", "value"]),
                         batch_format="pyarrow")
        return asof_join(ev, pur, key="user_id", ts="ts",
                         right_cols=["value"])

    def events_range_join(sf):
        """Range join: each event's value lands in its band (broadcast
        non-overlapping intervals, one searchsorted per batch, no
        shuffle). Oracle: BETWEEN-style interval join over inline bands."""
        import pandas as pd
        from raystack.ops.join import range_join
        ev = _read_pq(os.path.join(sf, "events.parquet"),
                                   columns=["event_id", "value"])
        bands = pd.DataFrame({"lo": [0.0, 5.0, 20.0, 60.0],
                              "hi": [5.0, 20.0, 60.0, 1e9],
                              "band": ["low", "mid", "high", "extreme"]})
        return range_join(ev, bands, value_col="value")

    def embedding_clusters(sf):
        """Embedding k-means assignment (curation primitive): spherical
        k-means trained on a 256-vector sample (deterministic seed),
        centroids snapshotted to parquet, every vector assigned to its
        max-cosine centroid in one streaming matmul map (no shuffle). The
        oracle recomputes the argmax from the snapshot; min top-2 margin
        on this corpus is ~1e-4, far above float noise."""
        from raystack.ops.similarity import assign_clusters, train_centroids
        emb = _read_pq(os.path.join(sf, "embeddings.parquet"))
        head = pq.read_table(os.path.join(sf, "embeddings.parquet"))
        sample = np.stack(head.slice(0, 256)["embedding"]
                          .to_pandas().to_numpy()).astype(np.float64)
        cent = train_centroids(sample, n_centroids=16)
        # scale-keyed (embeddings DIFFER per scale): interleaved scale
        # runs must not clobber the snapshot the sf0.01-pinned oracle
        # reads — the same round-2 failure mode the webtext dirs fixed
        snap = os.path.join(
            _SCRATCH, f"centroids_snap_{os.path.basename(sf.rstrip('/'))}")
        shutil.rmtree(snap, ignore_errors=True)
        os.makedirs(snap)
        pq.write_table(pa.table({
            "cluster": pa.array(range(len(cent)), pa.int64()),
            "centroid": pa.array([list(map(float, c)) for c in cent],
                                 pa.list_(pa.float64()))}),
            os.path.join(snap, "centroids.parquet"))
        return assign_clusters(emb, cent)

    def holdout_split(sf):
        """Deterministic train/holdout split: splitmix64(doc_id) % 10000 <
        1000 — no shuffle, no RNG state, identical verdict per document
        regardless of task placement or cluster size. Oracle: the same
        splitmix64 in SQL."""
        from raystack.ops.text import hash_split
        ds = _read_pq(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id"])
        return hash_split(ds, fraction=0.1)

    def simhash_sigs(sf):
        from raystack.ops.dedup import simhash
        ds = _read_pq(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        return simhash(ds)

    def embedding_dups(sf):
        """Near-dup detection with planted exact copies (vec_id+1000000 for
        vec_id<20): the corpus has no intrinsic pairs ≥0.95 (max cosine
        ≈0.51), so the oracle is exactly the planted pair list — matching
        it proves the hyperplane-bucket + per-bucket matmul path has full
        recall on true duplicates and no false positives."""
        import pyarrow.compute as pc
        from raystack.ops.dedup import embedding_near_dup
        emb = _read_pq(os.path.join(sf, "embeddings.parquet"))

        def plant(t: pa.Table) -> pa.Table:
            keep = t.filter(pc.less(t["vec_id"], 20))
            copies = keep.set_column(
                t.schema.get_field_index("vec_id"), "vec_id",
                pc.add(keep["vec_id"], 1000000))
            return pa.concat_tables([t, copies])

        planted = emb.map_batches(plant, batch_format="pyarrow")
        return embedding_near_dup(planted, threshold=0.95)

    def ivf_topk(sf):
        """IVF with sample-trained centroids and full probe: scanning every
        bucket makes the result exactly the brute-force top-k, so the same
        cosine oracle applies; recall of the partial-probe path is asserted
        in pytest (recall@10 vs brute force)."""
        from raystack.ops.similarity import ivf_topk as ivf, train_centroids
        emb = _read_pq(os.path.join(sf, "embeddings.parquet"))
        head = pq.read_table(os.path.join(sf, "embeddings.parquet"))
        sample = np.stack(head.slice(0, 256)["embedding"]
                          .to_pandas().to_numpy()).astype(np.float64)
        cent = train_centroids(sample, n_centroids=16)
        head = head.slice(0, 4)
        qm = np.stack(head["embedding"].to_pandas().to_numpy()).astype(np.float64)
        return ivf(emb, qm, head["vec_id"].to_numpy(), k=10,
                   centroids=cent, n_probe=len(cent))

    def webtext_encode(sf):
        """Full webtext flagship on generated data (schema from
        BASELINE.json input_hint): gen → drift-align → encode → decode.
        The decoded ``html`` binary is compared as ``md5(hex(html))`` on
        both sides (DuckDB BLOBs come back as unhashable bytearray, which
        the driver's canonicalizer can't sort); byte-level decode identity
        is what the digest proves."""
        from raystack import pipeline as pl
        from raystack.align import read_aligned
        paths, snap, out = _ensure_webtext(sf)
        shutil.rmtree(out, ignore_errors=True)
        ds = read_aligned(paths, columns_rename={"body": "text"},
                          add_filename=True)
        pl.encode_partitioned(ds, out, num_partitions=8)
        return _digest_html(pl.decode_dir(
            out, columns=["url", "warc_ts", "html", "text", "lang"]))

    def webtext_encode_tasks(sf):
        """Same flagship relation through the raw-task deterministic
        exchange (`pipeline.encode_partitioned_tasks`) — the driver's
        oracle proves the two exchange implementations agree."""
        from raystack import pipeline as pl
        paths, snap, enc = _ensure_webtext(sf)
        out = os.path.join(_SCRATCH,
                           f"webtext_{_webtext_scale(sf)}") + "_enct"
        shutil.rmtree(out, ignore_errors=True)
        pl.encode_partitioned_tasks(paths, out,
                                    columns_rename={"body": "text"},
                                    num_partitions=8)
        return _digest_html(pl.decode_dir(
            out, columns=["url", "warc_ts", "html", "text", "lang"]))

    def webtext_lookup(sf):
        """Random access over the encoded layout: route 3 urls through the
        persisted partition config, read ONLY the touched part_key dirs,
        decode ONLY the url/text/lang pages (column-pruned decode — html
        bytes never leave disk), filter. The oracle reads the same rows
        from the aligned snapshot. Proves routing + pruned partition-local
        decode in one query."""
        from raystack import pipeline as pl
        enc = _ensure_webtext_enc(sf)
        snap = _webtext_dirs(sf)[2]
        import duckdb
        targets = [r[0] for r in duckdb.sql(
            f"SELECT url FROM read_parquet('{snap}/*.parquet') "
            "ORDER BY url LIMIT 3").fetchall()]
        got = pl.lookup_rows(enc, targets, columns=["text", "lang"])
        return got.select_columns(["url", "text", "lang"])

    def zone_count_where(sf):
        """Zone-map-accelerated exact COUNT over the encoded layout:
        sidecars are built once (idempotent, additive), then
        ``count_where`` answers a warc_ts range from page metadata —
        contained pages count for free, disjoint pages cost nothing,
        only boundary pages decode their predicate column. The bound is
        a fixed timestamp inside the generated range (generation is
        deterministic), so the oracle recomputes the identical
        predicate."""
        import datetime as _dt

        import pandas as pd

        from raystack.zones import build_zone_maps, count_where
        enc = _ensure_webtext_enc(sf)
        # gate on the warc_ts sidecar FILES, not the zones/ dir — fresh
        # encodes already create zones/ for the url key blooms, which
        # would otherwise silently skip the min/max build and run the
        # count fully un-accelerated
        import glob as _glob
        if not _glob.glob(os.path.join(enc, "zones", "part_key=*",
                                       "warc_ts.parquet")):
            build_zone_maps(enc, ["warc_ts"])
        hi = _dt.datetime(2024, 3, 1, 1, 0, 30)
        n = count_where(enc, {"warc_ts": (None, hi)})
        return pd.DataFrame({"n": [int(n)]})

    def multimodal_dims(sf):
        """Oracle-checkable slice of the multimodal stage: the deterministic
        fake-decode dimensions are pure int64 arithmetic on the payload byte
        length, which DuckDB recomputes from strlen(text)."""
        from raystack.ops.multimodal import extract_image_features
        ds = _read_pq(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        def to_media(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.table({
                "media_id": t["doc_id"],
                "payload": pc.cast(pc.cast(t["text"], pa.binary()),
                                   pa.large_binary()),
                "mime": pa.array(["text/plain"] * t.num_rows),
                "meta": pa.array(["{}"] * t.num_rows)})
        media = ds.map_batches(to_media, batch_format="pyarrow")
        feats = extract_image_features(media, concurrency=2)
        return feats.select_columns(["media_id", "width", "height",
                                     "channels"])

    # EXACTLY 50 entries (the driver checks the first 50 — round-2 finding:
    # anything past the cap is silently never tested). Flagships first.
    return {
        "webtext_encode": webtext_encode,
        "webtext_encode_tasks": webtext_encode_tasks,
        "webtext_lookup": webtext_lookup,
        "roundtrip_partitioned": roundtrip_partitioned,
        "curate_corpus": curate_corpus,
        "combine_union": combine_union,
        "epoch_order": epoch_order,
        "combine_provenance": combine_provenance,
        "zone_count_where": zone_count_where,
        "combine_preview": combine_preview,
        "roundtrip_events": roundtrip_events,
        "roundtrip_lineitem": roundtrip_lineitem,
        "roundtrip_embeddings": roundtrip_embeddings,
        "csv_ingest": csv_ingest,
        "extract_text": extract_text,
        "minhash_dedup": minhash_dedup,
        "jaccard_pairs": jaccard_pairs,
        "exact_dedup": exact_dedup,
        "bm25_docs": bm25_docs,
        "fingerprint_dups": fingerprint_dups,
        "simhash_sigs": simhash_sigs,
        "embedding_dups": embedding_dups,
        "ann_topk": ann_topk,
        "ivf_topk": ivf_topk,
        "embedding_clusters": embedding_clusters,
        "langid": langid,
        "quality": quality,
        "fingerprints": fingerprints,
        # token_counts folded into sequence_pack (r4): the pack plan's
        # every offset is a function of the exact per-doc token count,
        # so the window mirror subsumes the count oracle
        "sequence_pack": sequence_pack,
        "bpe_token_counts": bpe_token_counts,
        "dedup_paragraphs": dedup_paragraphs,
        "holdout_split": holdout_split,
        "stratified_sample": stratified_sample,
        "multimodal_dims": multimodal_dims,
        "repetition_stats": repetition_stats,
        "events_stats": events_stats,
        "snapshot_read": snapshot_read,
        "events_hopping": events_hopping,
        "sessionized_events": sessionized_events,
        "events_asof": events_asof,
        "events_range_join": events_range_join,
        "contamination": contamination,
        "events_anti_join": events_anti_join,
        "orders_by_segment": orders_by_segment,
        "top_orders": top_orders,
        "value_quantiles": value_quantiles,
        "frequent_sources": frequent_sources,
        "props_extract": props_extract,
        "column_stats": column_stats,
        "column_stats_sketch": column_stats_sketch,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB, same parquet views)
# ---------------------------------------------------------------------------

def _langid_oracle() -> str:
    """DuckDB mirror of raystack.ops.text.LanguageId — the marker patterns
    are built from the SAME table the engine uses (both sides run RE2, so
    non-overlapping match counts agree), and the CASE chain reproduces
    np.argmax's first-max-wins tie-break."""
    import re as _re
    from raystack.ops.text import _LANG_MARKERS
    langs = list(_LANG_MARKERS)
    pats = {l: "|".join(_re.escape(m) for m in _LANG_MARKERS[l])
            for l in langs}
    counts = ", ".join(
        f"len(regexp_extract_all(p, '{pats[l]}')) AS c_{l}" for l in langs)
    all_c = ", ".join(f"c_{l}" for l in langs)
    cases = []
    for i, l in enumerate(langs[:-1]):
        conds = " AND ".join(f"c_{l} >= c_{m}" for m in langs[i + 1:])
        cases.append(f"WHEN {conds} THEN '{l}'")
    return (
        "WITH s AS (SELECT doc_id, ' ' || text || ' ' AS p FROM documents), "
        f"c AS (SELECT doc_id, {counts} FROM s) "
        f"SELECT doc_id, CASE WHEN greatest({all_c}) = 0 THEN 'und' "
        + " ".join(cases) + f" ELSE '{langs[-1]}' END AS lang_pred FROM c")


# --- bit-exact SQL mirrors of the hashing kernels ------------------------
# splitmix64's wrapping uint64 multiply is expressed with HUGEINT modular
# arithmetic (split 32-bit halves so intermediates stay under 2^127); XOR
# and shifts go through UBIGINT. These let DuckDB reproduce the engine's
# window-hash-derived values bit-for-bit on the ASCII corpus.

_M64 = "18446744073709551616"   # 2**64
_SM_C1 = "13787848793156543929"  # 0xBF58476D1CE4E5B9
_SM_C2 = "10723151780598845931"  # 0x94D049BB133111EB


def _sql_xor64(a, b):
    return (f"CAST(xor(CAST({a} AS UBIGINT), CAST({b} AS UBIGINT)) "
            "AS HUGEINT)")


def _sql_shr(x, n):
    return f"CAST(CAST({x} AS UBIGINT) >> {n} AS HUGEINT)"


def _sql_mulmod(x, c):
    return (f"((({x}) % 4294967296) * {c} "
            f"+ (((({x}) // 4294967296) * {c}) % 4294967296) "
            f"* 4294967296) % {_M64}")


def _sql_splitmix_stages(p, src):
    """CTE chain applying splitmix64 to column ``x`` of ``src`` (keyed by
    doc_id); result in ``{p}e``."""
    return f"""
        {p}a AS (SELECT doc_id, {_sql_xor64('x', _sql_shr('x', 30))} AS x
                 FROM {src}),
        {p}b AS (SELECT doc_id, {_sql_mulmod('x', _SM_C1)} AS x FROM {p}a),
        {p}c AS (SELECT doc_id, {_sql_xor64('x', _sql_shr('x', 27))} AS x
                 FROM {p}b),
        {p}d AS (SELECT doc_id, {_sql_mulmod('x', _SM_C2)} AS x FROM {p}c),
        {p}e AS (SELECT doc_id, {_sql_xor64('x', _sql_shr('x', 31))} AS x
                 FROM {p}d)"""


def _sql_window_hashes() -> str:
    """CTEs producing ``we(doc_id, x)``: the splitmix64 hash of every valid
    8-byte window (little-endian uint64 of the substring bytes), mirroring
    ``ops.hashing.window_hashes``."""
    le64 = " + ".join(
        f"CAST(ascii(substr(g, {j}, 1)) AS HUGEINT) * {256 ** (j - 1)}"
        for j in range(1, 9))
    return f"""
        grams AS (
          SELECT doc_id, substr(text, i, 8) AS g
          FROM (SELECT doc_id, text,
                       unnest(generate_series(
                           1, greatest(length(text) - 7, 0))) AS i
                FROM documents)),
        wvals AS (SELECT doc_id, CAST({le64} AS HUGEINT) AS x FROM grams),
        {_sql_splitmix_stages('w', 'wvals')}"""


def _sql_int64_view(expr: str) -> str:
    """uint64 HUGEINT → the engine's int64 reinterpretation."""
    return (f"CAST({expr} - CASE WHEN {expr} >= 9223372036854775808 "
            f"THEN CAST({_M64} AS HUGEINT) ELSE 0 END AS BIGINT)")


def _fingerprint_sql() -> str:
    """SQL mirror of ``ops.text.add_fingerprint``: per-doc XOR of window
    hashes, mixed with splitmix64(length), then splitmix64."""
    return f"""
        WITH {_sql_window_hashes()},
        xr AS (SELECT doc_id,
                      CAST(bit_xor(CAST(x AS UBIGINT)) AS HUGEINT) AS x
               FROM we GROUP BY doc_id),
        lvals AS (SELECT doc_id, CAST(length(text) AS HUGEINT) AS x
                  FROM documents),
        {_sql_splitmix_stages('l', 'lvals')},
        mixed AS (
          SELECT x1.doc_id, {_sql_xor64('x1.x', 'x2.x')} AS x
          FROM xr x1 JOIN le x2 ON x1.doc_id = x2.doc_id),
        {_sql_splitmix_stages('f', 'mixed')}
        SELECT doc_id, {_sql_int64_view('x')} AS fingerprint FROM fe"""


def _simhash_sql() -> str:
    """SQL mirror of ``ops.dedup.simhash``: per-bit ±1 sums over window
    hashes, sign → bit. The engine's unpackbits is MSB-first per
    little-endian byte, so output bit j reads source bit
    (j//8)*8 + 7 - j%8."""
    terms = []
    for j in range(64):
        s = (j // 8) * 8 + 7 - (j % 8)
        terms.append(
            f"CASE WHEN SUM(CASE WHEN (CAST(x AS UBIGINT) >> {s}) & 1 = 1 "
            f"THEN 1 ELSE -1 END) > 0 THEN CAST({2 ** j} AS HUGEINT) "
            "ELSE 0 END")
    total = " + ".join(terms)
    return f"""
        WITH {_sql_window_hashes()},
        sums AS (SELECT doc_id, {total} AS x FROM we GROUP BY doc_id)
        SELECT doc_id, {_sql_int64_view('x')} AS simhash FROM sums"""



def _holdout_sql(fraction: float = 0.1) -> str:
    """SQL mirror of ``ops.text.hash_split``: splitmix64(doc_id) % 10000
    compared to the fraction threshold."""
    thresh = int(round(fraction * 10000))
    return f"""
        WITH ids AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS x
                     FROM documents),
        {_sql_splitmix_stages('h', 'ids')}
        SELECT doc_id, (CAST(x AS UBIGINT) % 10000) < {thresh} AS holdout
        FROM he"""




def _stratified_sql(k: int = 5) -> str:
    """SQL mirror of ``ops.text.stratified_sample``: rank by the signed
    (int64-view) splitmix64 of doc_id per lang."""
    return f"""
        WITH ids AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS x
                     FROM documents),
        {_sql_splitmix_stages('s', 'ids')},
        ranked AS (
          SELECT d.lang, s.doc_id,
                 row_number() OVER (
                   PARTITION BY d.lang
                   ORDER BY {_sql_int64_view('s.x')}, s.doc_id) AS rn
          FROM se s JOIN documents d ON d.doc_id = s.doc_id)
        SELECT lang, doc_id FROM ranked WHERE rn <= {k}"""


def _curate_oracle() -> str:
    """Composed mirror of ``raystack.curate.curate_corpus``: langid +
    quality (proven stage oracles) over the quality-kept population,
    minus exact-duplicate non-minimal ids, minus the near-dup closure's
    non-minimal ids, plus the splitmix64 holdout flag."""
    import re as _re

    from raystack.ops.text import _LANG_MARKERS
    langs = list(_LANG_MARKERS)
    pats = {l: "|".join(_re.escape(m) for m in _LANG_MARKERS[l])
            for l in langs}
    counts = ", ".join(
        f"len(regexp_extract_all(p, '{pats[l]}')) AS c_{l}" for l in langs)
    all_c = ", ".join(f"c_{l}" for l in langs)
    cases = []
    for i, l in enumerate(langs[:-1]):
        conds = " AND ".join(f"c_{l} >= c_{m}" for m in langs[i + 1:])
        cases.append(f"WHEN {conds} THEN '{l}'")
    lang_case = (f"CASE WHEN greatest({all_c}) = 0 THEN 'und' "
                 + " ".join(cases) + f" ELSE '{langs[-1]}' END")
    return f"""
        WITH RECURSIVE
        ls AS (SELECT doc_id, ' ' || text || ' ' AS p FROM documents),
        lc AS (SELECT doc_id, {counts} FROM ls),
        lang AS (SELECT doc_id, {lang_case} AS lang_pred FROM lc),
        qm AS (SELECT doc_id,
            CAST(length(text) AS DOUBLE) AS c,
            greatest(CAST(len(regexp_extract_all(text, '\\S+'))
                          AS DOUBLE), 1.0) AS tk,
            CAST(len(regexp_extract_all(text, '\\d')) AS DOUBLE) AS nd,
            CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS npx
          FROM documents),
        qual AS (SELECT doc_id,
            0.4 * (least(greatest(c / 200.0, 0.0), 1.0)
                   * (CASE WHEN c < 20000 THEN 1.0 ELSE 0.0 END))
            + 0.2 * (CASE WHEN c / tk > 2.0 AND c / tk < 12.0
                     THEN 1.0 ELSE 0.0 END)
            + 0.2 * least(greatest(1.0 - nd / greatest(c, 1.0) * 5, 0.0), 1.0)
            + 0.2 * least(greatest(1.0 - npx / greatest(c, 1.0) * 10,
                                   0.0), 1.0) AS quality
          FROM qm),
        kept0 AS (
          SELECT d.doc_id, d.text FROM documents d
          JOIN qual ON qual.doc_id = d.doc_id WHERE qual.quality >= 0.5),
        exdrop AS (
          SELECT doc_id FROM (
            SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS mn
            FROM kept0) WHERE doc_id <> mn),
        kept1 AS (SELECT * FROM kept0
                  WHERE doc_id NOT IN (SELECT doc_id FROM exdrop)),
        edges AS (
          SELECT a.doc_id AS u, b.doc_id AS v
          FROM kept1 a JOIN kept1 b
            ON b.text = a.text || ' dup' OR a.text = b.text || ' dup'),
        reach AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e
            ON r.v = e.u WHERE e.v <> r.u),
        nddrop AS (
          SELECT u AS doc_id FROM reach GROUP BY u HAVING min(v) < u),
        surv AS (SELECT doc_id FROM kept1
                 WHERE doc_id NOT IN (SELECT doc_id FROM nddrop)),
        hin AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS x FROM surv),
        {_sql_splitmix_stages('h', 'hin')}
        SELECT s.doc_id, lang.lang_pred, qual.quality,
               (CAST(he.x AS UBIGINT) % 10000) < 1000 AS holdout
        FROM surv s
        JOIN lang ON lang.doc_id = s.doc_id
        JOIN qual ON qual.doc_id = s.doc_id
        JOIN he ON he.doc_id = s.doc_id"""


def oracle_sql() -> dict[str, str]:
    docs_all = "doc_id, text, lang, source, n_chars"
    ann_sql = """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe
                       FROM embeddings WHERE vec_id < 4),
            scored AS (
              SELECT q.qid, e.vec_id,
                     list_cosine_similarity(q.qe, e.embedding) AS sim
              FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid),
            ranked AS (
              SELECT qid, vec_id,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY sim DESC, vec_id) AS rank
              FROM scored)
            SELECT qid AS query_id, vec_id AS neighbor_id, rank
            FROM ranked WHERE rank <= 10"""
    return {
        "combine_union": (
            "SELECT doc_id, text, lang, "
            "CASE WHEN doc_id % 3 = 1 THEN NULL ELSE source END AS source, "
            "n_chars FROM documents"),
        "epoch_order": f"""
        WITH ids AS (SELECT doc_id,
                            {_sql_xor64('CAST(doc_id AS HUGEINT)', '42')}
                            AS x FROM documents),
        {_sql_splitmix_stages('s', 'ids')}
        SELECT d.doc_id, d.lang FROM se JOIN documents d USING (doc_id)
        ORDER BY CAST(se.x AS UBIGINT) LIMIT 200""",
        "combine_provenance": (
            "SELECT doc_id, lang, n_chars, "
            "'part-' || (doc_id % 3) || '.parquet' AS filename "
            "FROM documents"),
        "zone_count_where": (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM "
            f"read_parquet('{_ORACLE_SNAP}/*.parquet') "
            "WHERE warc_ts <= TIMESTAMP '2024-03-01 01:00:30'"),
        "combine_preview": (
            "SELECT doc_id, lang, n_chars FROM ("
            "  SELECT *, row_number() OVER (PARTITION BY doc_id % 3 "
            "         ORDER BY doc_id) AS rn FROM documents) WHERE rn <= 2"),
        "roundtrip_events": ("SELECT event_id, ts, user_id, event_type, value,"
                             " props FROM events"),
        "roundtrip_lineitem": ("SELECT l_orderkey, l_partkey, l_quantity, "
                               "l_returnflag, l_linestatus, l_shipdate "
                               "FROM lineitem"),
        "roundtrip_partitioned": f"SELECT {docs_all} FROM documents",
        "repetition_stats": (
            "SELECT doc_id, "
            "1.0 - len(list_distinct(string_split(text, chr(10)))) * 1.0 "
            "  / greatest(len(string_split(text, chr(10))), 1) "
            "  AS dup_line_frac, "
            "len(list_filter(string_split(text, chr(10)), "
            "    l -> l LIKE '%...')) * 1.0 "
            "  / greatest(len(string_split(text, chr(10))), 1) "
            "  AS ellipsis_line_frac "
            "FROM documents"),
        "events_stats": ("SELECT event_type, count(*) AS n_events, "
                         "min(ts) AS min_ts, max(ts) AS max_ts, "
                         "min(user_id) AS min_user FROM events "
                         "GROUP BY event_type"),
        "sequence_pack": ("""
            WITH toks AS (SELECT doc_id,
                    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
                      AS n_tokens FROM documents),
            c AS (SELECT doc_id, n_tokens + 1 AS c FROM toks),
            o AS (SELECT doc_id, c,
                    CAST(COALESCE(SUM(c) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS o
                  FROM c),
            s AS (SELECT doc_id, o, c,
                    UNNEST(generate_series(CAST(o // 512 AS BIGINT),
                      CAST((o + c - 1) // 512 AS BIGINT))) AS seq_id
                  FROM o WHERE c > 0)
            SELECT doc_id, seq_id,
                   GREATEST(o, seq_id*512) - seq_id*512 AS seq_off,
                   GREATEST(o, seq_id*512) - o AS doc_off,
                   LEAST(o+c, (seq_id+1)*512)
                     - GREATEST(o, seq_id*512) AS n_toks
            FROM s"""),
        "dedup_paragraphs": ("""
            WITH ps AS (
              SELECT doc_id,
                     struct_extract(z, 1) AS para,
                     struct_extract(z, 2) AS idx
              FROM (SELECT doc_id,
                           unnest(list_zip(parts, range(1, len(parts)+1)))
                             AS z
                    FROM (SELECT doc_id,
                                 string_split(text, chr(10)||chr(10))
                                   AS parts
                          FROM documents))),
            ranked AS (
              SELECT doc_id, para, idx,
                     row_number() OVER (PARTITION BY para
                                        ORDER BY doc_id, idx) AS rn
              FROM ps),
            agg AS (
              SELECT doc_id,
                     string_agg(para, chr(10)||chr(10) ORDER BY idx) AS text
              FROM ranked WHERE rn = 1 GROUP BY doc_id)
            SELECT d.doc_id, coalesce(agg.text, '') AS text
            FROM documents d LEFT JOIN agg USING (doc_id)"""),
        "exact_dedup": ("SELECT text, min(doc_id) AS doc_id FROM documents "
                        "GROUP BY text"),
        "bm25_docs": ("""
            WITH toks AS (
              SELECT doc_id, tok.x AS token
              FROM documents,
                   UNNEST(list_filter(string_split_regex(lower(text),
                          '\\W+'), x -> x <> '')) AS tok(x)),
            tf AS (SELECT doc_id, token, count(*)::DOUBLE AS tf
                   FROM toks GROUP BY 1, 2),
            dl AS (SELECT doc_id, count(*)::DOUBLE AS dl
                   FROM toks GROUP BY 1),
            stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                             (SELECT sum(dl) FROM dl)
                             / (SELECT count(*) FROM documents)::DOUBLE
                               AS avgdl),
            df AS (SELECT token, count(*)::DOUBLE AS df FROM tf
                   WHERE token IN ('data', 'query', 'stream') GROUP BY 1)
            SELECT tf.doc_id AS doc_id,
                   CAST(floor(sum(
                     ln(1 + ((SELECT n FROM stats) - df.df + 0.5)
                            / (df.df + 0.5))
                     * tf.tf * (1.2 + 1.0)
                     / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl
                                       / (SELECT avgdl FROM stats)))
                   ) * 1e6 + 0.5) AS BIGINT) AS score_uq
            FROM tf JOIN dl USING (doc_id) JOIN df USING (token)
            WHERE tf.token IN ('data', 'query', 'stream')
            GROUP BY tf.doc_id"""),
        "snapshot_read": (
            "SELECT doc_id, text, source, n_chars FROM documents "
            "WHERE doc_id % 2 = 0"),
        "events_hopping": ("""
            SELECT event_type,
                   make_timestamp((epoch_us(ts) // 200000000 - i)
                                  * 200000000) AS window_start,
                   count(*) AS n_events, min(ts) AS min_ts,
                   max(ts) AS max_ts
            FROM (SELECT event_type, ts,
                         unnest(generate_series(0, 2)) AS i FROM events)
            GROUP BY 1, 2"""),
        "orders_by_segment": (
            "SELECT o_orderkey, o_custkey, c_mktsegment FROM orders "
            "JOIN customer ON o_custkey = c_custkey"),
        "top_orders": ("SELECT o_orderkey, o_totalprice FROM orders "
                       "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),
        "contamination": (r"""
            WITH dt AS (
              SELECT doc_id, list_filter(
                string_split_regex(lower(text), '\W+'), x -> x <> '') p
              FROM documents),
            dg AS (
              SELECT doc_id,
                     struct_extract(z,1) || ' ' || struct_extract(z,2) ||
                     ' ' || struct_extract(z,3) || ' ' ||
                     struct_extract(z,4) || ' ' || struct_extract(z,5) AS g
              FROM (SELECT doc_id,
                           unnest(list_zip(p[1:len(p)-4], p[2:len(p)-3],
                                           p[3:len(p)-2], p[4:len(p)-1],
                                           p[5:])) z
                    FROM dt WHERE len(p) >= 5)),
            bg AS (SELECT DISTINCT g FROM dg WHERE doc_id % 97 = 0),
            hits AS (SELECT d.doc_id, count(*) AS c
                     FROM dg d JOIN bg USING (g) GROUP BY d.doc_id)
            SELECT t.doc_id, coalesce(h.c, 0) AS contam_ngrams,
                   coalesce(h.c, 0) > 0 AS contaminated
            FROM documents t LEFT JOIN hits h USING (doc_id)"""),
        "value_quantiles": ("""
            SELECT 0.5 AS quantile, quantile_disc(value, 0.5) AS value
            FROM events
            UNION ALL SELECT 0.9, quantile_disc(value, 0.9) FROM events
            UNION ALL SELECT 0.99, quantile_disc(value, 0.99) FROM events"""),
        "frequent_sources": ("""
            SELECT source AS value, count(*) AS n FROM documents
            GROUP BY source ORDER BY n DESC, value LIMIT 10"""),
        "extract_text": (f"""
            SELECT url,
                   regexp_extract(url,
                     '^([a-z][a-z0-9+.-]*)://([^/?#]*)([^?#]*)', 2)
                     AS host,
                   CASE WHEN position('3C6D61696E3E' IN hex(html)) > 0
                         AND position('3C2F6D61696E3E' IN hex(html))
                             >= position('3C6D61696E3E' IN hex(html)) + 12
                   THEN decode(unhex(substring(hex(html),
                          position('3C6D61696E3E' IN hex(html)) + 12,
                          position('3C2F6D61696E3E' IN hex(html))
                            - position('3C6D61696E3E' IN hex(html)) - 12)))
                   ELSE NULL END AS text_extracted
            FROM read_parquet('{_ORACLE_SNAP}/*.parquet')"""),
        "bpe_token_counts": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, "
            "'''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+')) AS BIGINT) AS n_bpe_tokens "
            "FROM documents"),
        "events_anti_join": (
            "SELECT event_id, user_id FROM events WHERE user_id NOT IN "
            "(SELECT c_custkey FROM customer WHERE c_custkey < 5)"),
        "csv_ingest": "SELECT doc_id, text, lang, n_chars FROM documents",
        "props_extract": ("SELECT event_id, CAST(regexp_extract(props, "
                          "'\"k\": (\\d+)', 1) AS BIGINT) AS k_value "
                          "FROM events"),
        "column_stats": (" UNION ALL ".join(
            f"SELECT '{c}' AS \"column\", count(*) AS n_rows, "
            f"count({c}) AS n_valid, CAST(min({c}) AS VARCHAR) AS min_v, "
            f"CAST(max({c}) AS VARCHAR) AS max_v FROM documents"
            for c in ["doc_id", "text", "lang", "source", "n_chars"])),
        "sessionized_events": ("""
            SELECT event_id, user_id,
                   CAST(sum(CASE WHEN prev_ts IS NULL
                            OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                            THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM (SELECT event_id, user_id, ts,
                         lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_ts
                  FROM events)"""),
        "roundtrip_embeddings": "SELECT vec_id, embedding, label FROM embeddings",
        "langid": _langid_oracle(),
        "quality": ("""
            WITH m AS (SELECT doc_id,
                CAST(length(text) AS DOUBLE) AS c,
                greatest(CAST(len(regexp_extract_all(text, '\\S+'))
                              AS DOUBLE), 1.0) AS tk,
                CAST(len(regexp_extract_all(text, '\\d')) AS DOUBLE) AS nd,
                CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS npx
              FROM documents)
            SELECT doc_id,
              0.4 * (least(greatest(c / 200.0, 0.0), 1.0)
                     * (CASE WHEN c < 20000 THEN 1.0 ELSE 0.0 END))
              + 0.2 * (CASE WHEN c / tk > 2.0 AND c / tk < 12.0
                       THEN 1.0 ELSE 0.0 END)
              + 0.2 * least(greatest(1.0 - nd / greatest(c, 1.0) * 5, 0.0), 1.0)
              + 0.2 * least(greatest(1.0 - npx / greatest(c, 1.0) * 10, 0.0), 1.0)
              AS quality
            FROM m"""),
        "fingerprint_dups": ("SELECT doc_id + 1000000 AS doc_id, "
                             "doc_id AS dup_of FROM documents "
                             "WHERE doc_id < 20"),
        "jaccard_pairs": ("""
            WITH RECURSIVE edges AS (
              SELECT a.doc_id AS u, b.doc_id AS v
              FROM documents a JOIN documents b
                ON b.text = a.text || ' dup' OR a.text = b.text || ' dup'),
            reach AS (
              SELECT u, v FROM edges
              UNION
              SELECT r.u, e.v FROM reach r JOIN edges e
                ON r.v = e.u WHERE e.v <> r.u),
            prs AS (
              SELECT u AS doc_id, min(v) AS dup_of FROM reach
              GROUP BY u HAVING min(v) < u),
            docs AS (
              SELECT DISTINCT d.doc_id, d.text FROM documents d
              WHERE d.doc_id IN (SELECT doc_id FROM prs
                                 UNION SELECT dup_of FROM prs)),
            grams AS (
              SELECT DISTINCT doc_id, substr(text, i, 8) AS g
              FROM (SELECT doc_id, text,
                           unnest(generate_series(
                               1, greatest(length(text) - 7, 0))) AS i
                    FROM docs)),
            sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
            inter AS (
              SELECT p.doc_id, p.dup_of, count(*) AS i
              FROM prs p
              JOIN grams a ON a.doc_id = p.doc_id
              JOIN grams b ON b.doc_id = p.dup_of AND b.g = a.g
              GROUP BY p.doc_id, p.dup_of)
            SELECT p.doc_id, p.dup_of,
                   CAST(COALESCE(i.i, 0) AS DOUBLE)
                   / (sa.n + sb.n - COALESCE(i.i, 0)) AS jaccard
            FROM prs p
            JOIN sizes sa ON sa.doc_id = p.doc_id
            JOIN sizes sb ON sb.doc_id = p.dup_of
            LEFT JOIN inter i ON i.doc_id = p.doc_id
                             AND i.dup_of = p.dup_of"""),
        "events_asof": ("""
            SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value,
                   p.ts AS ts_r, p.value AS value_r
            FROM events e
            ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                            WHERE event_type = 'purchase') p
              ON e.user_id = p.user_id AND e.ts >= p.ts"""),
        "events_range_join": ("""
            WITH bands(lo, hi, band) AS (VALUES
              (0.0, 5.0, 'low'), (5.0, 20.0, 'mid'),
              (20.0, 60.0, 'high'), (60.0, 1e9, 'extreme'))
            SELECT e.event_id, e.value, b.lo, b.hi, b.band
            FROM events e JOIN bands b
              ON e.value >= b.lo AND e.value < b.hi"""),
        "embedding_clusters": (f"""
            WITH scored AS (
              SELECT e.vec_id, c.cluster,
                     list_cosine_similarity(e.embedding, c.centroid) AS sim
              FROM embeddings e CROSS JOIN
                   read_parquet('{_CENT_SNAP}/*.parquet') c),
            ranked AS (
              SELECT vec_id, cluster,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY sim DESC, cluster) AS rnk
              FROM scored)
            SELECT vec_id, cluster FROM ranked WHERE rnk = 1"""),
        "fingerprints": _fingerprint_sql(),
        "holdout_split": _holdout_sql(),
        "stratified_sample": _stratified_sql(),
        "curate_corpus": _curate_oracle(),
        "simhash_sigs": _simhash_sql(),
        "minhash_dedup": ("""
            WITH RECURSIVE edges AS (
              SELECT a.doc_id AS u, b.doc_id AS v
              FROM documents a JOIN documents b
                ON b.text = a.text || ' dup' OR a.text = b.text || ' dup'),
            reach AS (
              SELECT u, v FROM edges
              UNION
              SELECT r.u, e.v FROM reach r JOIN edges e
                ON r.v = e.u WHERE e.v <> r.u)
            SELECT u AS doc_id, min(v) AS dup_of FROM reach
            GROUP BY u HAVING min(v) < u"""),
        "embedding_dups": ("SELECT vec_id + 1000000 AS vec_id, "
                           "vec_id AS dup_of FROM embeddings "
                           "WHERE vec_id < 20"),
        "column_stats_sketch": (" UNION ALL ".join(
            f"SELECT '{c}' AS \"column\", count(*) AS n_rows, "
            f"count({c}) AS n_valid, CAST(min({c}) AS VARCHAR) AS min_v, "
            f"CAST(max({c}) AS VARCHAR) AS max_v, "
            f"count(DISTINCT {c}) AS distinct_est FROM documents"
            for c in ["doc_id", "text", "lang", "source", "n_chars"])),
        "multimodal_dims": (
            "SELECT doc_id AS media_id, "
            "((strlen(text) * 40503) % 65536) % 1920 + 16 AS width, "
            "((strlen(text) * 9973) % 65536) % 1080 + 16 AS height, "
            "CAST(3 AS BIGINT) AS channels FROM documents"),
        # html compared as md5(hex(html)): the raw BLOB comes back from
        # DuckDB's client as bytearray, which the driver's canonical sort
        # can't hash (round-2 root cause); hex() is uppercase on both sides
        "webtext_encode": (
            "SELECT url, warc_ts, md5(hex(html)) AS html_md5, text, lang "
            f"FROM read_parquet('{_ORACLE_SNAP}/*.parquet')"),
        "webtext_encode_tasks": (
            "SELECT url, warc_ts, md5(hex(html)) AS html_md5, text, lang "
            f"FROM read_parquet('{_ORACLE_SNAP}/*.parquet')"),
        "webtext_lookup": (
            "SELECT url, text, lang FROM "
            f"read_parquet('{_ORACLE_SNAP}/*.parquet') "
            "WHERE url IN (SELECT url FROM "
            f"read_parquet('{_ORACLE_SNAP}/*.parquet') "
            "ORDER BY url LIMIT 3)"),
        "ann_topk": ann_sql,
        "ivf_topk": ann_sql,  # full probe ⇒ IVF result is exactly brute force
    }
