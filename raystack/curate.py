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
