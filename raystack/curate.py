"""End-to-end training-data curation pipeline — the composition a real
pretraining-data user runs over a raw document corpus:

    language-ID → quality score → quality filter → exact dedup
    (fingerprint scale path) → MinHash-LSH near-dedup → deterministic
    holdout split

Every stage is an existing oracled operator, so the WHOLE pipeline has a
DuckDB mirror (the ``curate_corpus`` driver query composes the stages'
SQL). Ray-Data shape: the filter/split stages are pure ``map_batches``
(no shuffle); exact dedup shuffles 8-byte fingerprints; the near-dedup
candidate filter is distributed (see ops/dedup.py); and both drop lists
are count-gated — broadcast only when provably ≤ _BROADCAST_LIMIT, else
a bloom-accelerated distributed anti-join (a duplicate-heavy crawl has O(corpus)
drop rows, which must never be collected to the driver).
"""

from __future__ import annotations

import pyarrow.compute as pc


def curate_corpus(ds, text_col: str = "text", id_col: str = "doc_id",
                  quality_threshold: float = 0.5,
                  holdout_fraction: float = 0.1,
                  sim_threshold: float = 0.7):
    """Corpus → curated Dataset of (id, lang_pred, quality, holdout) for
    the surviving documents (quality-passing, exact- and near-deduped)."""
    from .ops.dedup import minhash_lsh_dedup
    from .ops.text import add_language_id, add_quality_score, hash_split

    scored = add_language_id(add_quality_score(ds), text_col=text_col)
    kept = scored.map_batches(
        lambda t: t.filter(pc.greater_equal(t["quality"],
                                            quality_threshold)),
        batch_format="pyarrow")

    # exact dedup: drop the NON-minimal member of each fingerprint group
    # (the shuffle moves 8-byte fingerprints, never documents). The drop
    # list is COUNT-GATED like the dedup candidate filters: broadcast only
    # when provably small, else a distributed hash anti-join — on a
    # duplicate-heavy crawl the drop list is O(corpus) and must never be
    # collected to the driver.
    from .ops.dedup import _BROADCAST_LIMIT, exact_dup_ids
    from .ops.join import semi_join, semi_join_bloom
    dup_ds = exact_dup_ids(kept, text_col, id_col).materialize()
    n_dups = dup_ds.count()  # count() tolerates schema-less empty groups
    if n_dups:
        if n_dups <= _BROADCAST_LIMIT:
            kept = semi_join(kept, list(dup_ds.to_pandas()[id_col]),
                             on=id_col, anti=True)
        else:
            # scale branch: bloom-accelerated anti-join — the clean
            # majority of the corpus never enters the exact join's
            # shuffle (semi_join_bloom falls back to the plain hash
            # anti-join when the drop list outgrows the bitmap cap).
            # Checkpoints bracket it: before, because the bloom anti
            # path scans its input twice (don't recompute the langid/
            # quality chain); after, because each hash-join operator
            # reserves its whole aggregator pool up front, so two
            # chained joins in ONE executing graph can starve each
            # other on a small cluster
            kept = semi_join_bloom(kept.materialize(), dup_ds,
                                   on=id_col, anti=True,
                                   broadcast_limit=_BROADCAST_LIMIT) \
                .materialize()

    # near-dedup: drop the non-minimal member of each duplicate set —
    # same count gate on the pair list
    pairs_ds = minhash_lsh_dedup(kept, text_col=text_col, id_col=id_col,
                                 sim_threshold=sim_threshold).materialize()
    n_pairs = pairs_ds.count()
    if n_pairs:
        if n_pairs <= _BROADCAST_LIMIT:
            kept = semi_join(kept, list(pairs_ds.to_pandas()[id_col]),
                             on=id_col, anti=True)
        else:
            kept = semi_join_bloom(kept.materialize(),
                                   pairs_ds.select_columns([id_col]),
                                   on=id_col, anti=True,
                                   broadcast_limit=_BROADCAST_LIMIT)

    out = hash_split(kept, id_col=id_col, fraction=holdout_fraction)
    return out.map_batches(
        lambda t: t.select([id_col, "lang_pred", "quality", "holdout"]),
        batch_format="pyarrow")


def mix_corpora(sources: dict, proportions: dict, total_rows: int = None,
                seed: int = 0, id_col: str = "doc_id",
                source_col: str = "source"):
    """Deterministic curriculum mixing: build a training mix hitting the
    target ``proportions`` (by document count) across named source
    corpora, reproducible from ``seed`` alone.

    Each source is hash-sampled at rate ``proportions[k] * total /
    count_k`` — the per-row decision is ``splitmix64(id ^ source_salt) %
    10000 < rate * 10000`` (the :func:`raystack.ops.text.hash_split`
    primitive), so membership never depends on partitioning, cluster
    size, or execution order, and a resumed run reproduces the exact mix.
    Proportions hold in expectation (hash sampling is binomial, not an
    exact take-N — the scale-safe trade: no global coordination). When
    ``total_rows`` is None the mix is as large as the proportions allow
    (the binding source is used in full). The result carries
    ``source_col`` and is globally shuffled by a per-source-salted
    bijective key, so same-id rows from different sources still order
    deterministically.

    Scale shape: per-source row counts come from Dataset metadata (no
    scan); sampling + tagging are map-only; the one all-to-all is the
    final epoch-shuffle sort."""
    import numpy as np
    import pyarrow as pa

    from .ops.hashing import splitmix64

    if set(sources) != set(proportions):
        raise ValueError("sources and proportions must share keys")
    tot_p = sum(proportions.values())
    props = {k: p / tot_p for k, p in proportions.items()}
    counts = {k: ds.count() for k, ds in sources.items()}
    max_total = min(counts[k] / p for k, p in props.items() if p > 0)
    total = max_total if total_rows is None else float(total_rows)
    if total > max_total + 1e-9:
        binding = min((counts[k] / p, k)
                      for k, p in props.items() if p > 0)[1]
        raise ValueError(
            f"total_rows={total_rows} unreachable: source '{binding}' has "
            f"{counts[binding]} rows but needs "
            f"{int(props[binding] * total)}")

    flip = np.uint64(1 << 63)
    parts = []
    for si, name in enumerate(sorted(sources)):
        rate = props[name] * total / counts[name] if counts[name] else 0.0
        thresh = np.uint64(int(round(min(1.0, rate) * 10000)))
        salt = np.uint64(seed) ^ splitmix64(
            np.array([si + 1], np.uint64))[0]

        def tag(t: pa.Table, _thresh=thresh, _salt=salt,
                _name=name) -> pa.Table:
            ids = np.asarray(t[id_col]).astype(np.uint64)
            h = splitmix64(ids ^ _salt)
            kept = t.filter(pa.array(h % np.uint64(10000) < _thresh))
            k_ids = np.asarray(kept[id_col]).astype(np.uint64)
            key = (splitmix64(k_ids ^ _salt) ^ flip).view(np.int64)
            return kept.append_column(
                source_col, pa.array([_name] * kept.num_rows,
                                     pa.string())).append_column(
                "__mix_key", pa.array(key)).replace_schema_metadata(None)

        parts.append(sources[name].map_batches(tag,
                                               batch_format="pyarrow"))
    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)
    return u.sort("__mix_key").map_batches(
        lambda t: t.drop_columns(["__mix_key"]), batch_format="pyarrow")


def corpus_report(ds, text_col: str = "text", id_col: str = "doc_id",
                  lang_col: str | None = None) -> dict:
    """Datasheet for a document corpus ("Datasheets for Datasets", Gebru
    et al. 2018 — the practice, implemented over Ray Data): one dict of
    corpus-level facts, every number computed distributed with a bounded
    driver result.

    - counts: docs, null/empty texts, total bytes and whitespace tokens
      (one pre-aggregated map pass → tiny partials);
    - length distribution: mergeable approximate quantiles (rank error
      ≤2%, k rows to the driver);
    - language mix: n-gram langid actor pool → groupby count (≤ a few
      language rows);
    - exact duplication rate: 8-byte fingerprint shuffle, counts only.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from .ops.colstats import approx_quantiles
    from .ops.text import add_language_id, add_token_count

    def partials(t: pa.Table) -> pa.Table:
        s = t[text_col]
        valid = pc.is_valid(s)
        filled = pc.fill_null(pc.cast(s, pa.large_string()), "")
        nbytes = pc.binary_length(pc.cast(filled, pa.large_binary()))
        empty = pc.and_(valid, pc.equal(nbytes, 0))
        return pa.table({
            "docs": pa.array([t.num_rows], pa.int64()),
            "nulls": pa.array([t.num_rows -
                               pc.sum(pc.cast(valid, pa.int64())).as_py()],
                              pa.int64()),
            "empties": pa.array([pc.sum(pc.cast(empty, pa.int64()))
                                 .as_py() or 0], pa.int64()),
            "bytes": pa.array([pc.sum(nbytes).as_py() or 0], pa.int64()),
        })

    agg = ds.map_batches(partials, batch_format="pyarrow") \
        .sum(["docs", "nulls", "empties", "bytes"])
    n_docs = int(agg["sum(docs)"])

    counted = add_token_count(ds, text_col=text_col)
    n_tokens = int(counted.sum("n_tokens") or 0)
    qs = approx_quantiles(counted, "n_tokens",
                          quantiles=(0.1, 0.5, 0.9, 0.99))
    length_q = {f"p{int(r['quantile'] * 100)}": float(r["value"])
                for _, r in qs.iterrows()}

    if lang_col is None:
        lang_ds = add_language_id(ds.select_columns([text_col]),
                                  text_col=text_col)
        lang_col_eff = "lang_pred"
    else:
        lang_ds, lang_col_eff = ds, lang_col
    lang_rows = lang_ds.groupby(lang_col_eff).count().take_all()
    langs = {str(r[lang_col_eff]): int(r["count()"]) for r in lang_rows}

    from .ops.dedup import exact_dedup_by_hash
    n_distinct = exact_dedup_by_hash(
        ds.select_columns([id_col, text_col]), text_col, id_col).count()

    return {
        "n_docs": n_docs,
        "null_texts": int(agg["sum(nulls)"]),
        "empty_texts": int(agg["sum(empties)"]),
        "total_bytes": int(agg["sum(bytes)"]),
        "total_tokens": n_tokens,
        "mean_tokens": (n_tokens / n_docs) if n_docs else 0.0,
        "token_quantiles": length_q,
        "languages": langs,
        "n_distinct_texts": int(n_distinct),
        "exact_dup_rate": (1.0 - n_distinct / n_docs) if n_docs else 0.0,
    }


def temperature_proportions(counts: dict, temperature: float) -> dict:
    """The standard multilingual/multi-source sampling rule (public
    multilingual-pretraining practice, e.g. the mT5/XLM-R papers):
    mixing weight ``p_k ∝ count_k^(1/T)``. ``T=1`` reproduces natural
    proportions, larger ``T`` upsamples low-resource sources toward
    uniform (``T→∞``). Pure driver math over per-source counts — pass
    the result straight to :func:`mix_corpora`:

    >>> props = temperature_proportions({"en": 900, "yo": 100}, 3.0)
    >>> mixed = mix_corpora(sources, props, total_rows=...)
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    w = {k: float(c) ** (1.0 / temperature)
         for k, c in counts.items() if c > 0}
    if not w:
        raise ValueError("no source has rows")
    s = sum(w.values())
    return {k: v / s for k, v in w.items()}
