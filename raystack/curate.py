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
