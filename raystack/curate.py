"""End-to-end training-data curation pipeline — the composition a real
pretraining-data user runs over a raw document corpus:

    language-ID → quality score → quality filter → exact dedup
    (fingerprint scale path) → MinHash-LSH near-dedup → deterministic
    holdout split

Every stage is an existing oracled operator, so the WHOLE pipeline has a
DuckDB mirror (the ``curate_corpus`` driver query composes the stages'
SQL). Ray-Data shape: the filter/split stages are pure ``map_batches``
(no shuffle); exact dedup shuffles 8-byte fingerprints; the near-dedup
candidate filter is distributed (see ops/dedup.py) and only the final
small PAIR list (bounded by the corpus's duplicate count) is collected
to drive the drop filter.
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
    # (the shuffle moves 8-byte fingerprints, never documents; the
    # collected drop set is the duplicate count — bounded and small,
    # unlike the survivor set, which is the whole corpus)
    from .ops.dedup import exact_dup_ids
    from .ops.join import semi_join
    dup_df = exact_dup_ids(kept, text_col, id_col).to_pandas()
    # an all-empty-groups result loses its schema — treat as no dups
    dups = dup_df[id_col] if id_col in dup_df.columns else []
    if len(dups):
        kept = semi_join(kept, list(dups), on=id_col, anti=True)

    # near-dedup: drop the non-minimal member of each duplicate set; the
    # pair list is bounded by the duplicate count (small on real corpora)
    pairs = minhash_lsh_dedup(kept, text_col=text_col, id_col=id_col,
                              sim_threshold=sim_threshold).to_pandas()
    if len(pairs):
        kept = semi_join(kept, list(pairs[id_col]), on=id_col, anti=True)

    out = hash_split(kept, id_col=id_col, fraction=holdout_fraction)
    return out.map_batches(
        lambda t: t.select([id_col, "lang_pred", "quality", "holdout"]),
        batch_format="pyarrow")
