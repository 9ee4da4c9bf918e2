"""Deterministic corpus mixing: proportion targeting, seed
reproducibility, partitioning invariance, and infeasible-total refusal."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from raystack.curate import mix_corpora


def _src(n, start=0, nparts=3):
    ids = list(range(start, start + n))
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([f"t{i}" for i in ids], pa.string()),
    })).repartition(nparts)


def test_proportions_and_determinism(ray_session):
    srcs = {"web": _src(4000), "code": _src(2000), "books": _src(1000)}
    props = {"web": 0.6, "code": 0.3, "books": 0.1}
    a = mix_corpora(srcs, props, total_rows=2000, seed=1).to_pandas()
    b = mix_corpora(srcs, props, total_rows=2000, seed=1).to_pandas()
    assert a.doc_id.tolist() == b.doc_id.tolist()
    assert a.source.tolist() == b.source.tolist()
    frac = a.source.value_counts(normalize=True)
    for k, p in props.items():
        assert abs(frac[k] - p) < 0.06, (k, frac[k], p)
    assert "__mix_key" not in a.columns


def test_partitioning_invariance_and_seed_dependence(ray_session):
    def build(nparts):
        return {"a": _src(1500, nparts=nparts),
                "b": _src(1500, start=5000, nparts=nparts)}
    x = mix_corpora(build(1), {"a": 0.5, "b": 0.5}, total_rows=1000,
                    seed=9).to_pandas()
    y = mix_corpora(build(7), {"a": 0.5, "b": 0.5}, total_rows=1000,
                    seed=9).to_pandas()
    assert x.doc_id.tolist() == y.doc_id.tolist()
    z = mix_corpora(build(1), {"a": 0.5, "b": 0.5}, total_rows=1000,
                    seed=10).to_pandas()
    assert z.doc_id.tolist() != x.doc_id.tolist()


def test_full_size_mix_uses_binding_source(ray_session):
    srcs = {"big": _src(3000), "small": _src(300, start=9000)}
    out = mix_corpora(srcs, {"big": 0.5, "small": 0.5},
                      seed=3).to_pandas()
    # small is binding: rate 1.0 -> every small row present
    assert (out.source == "small").sum() == 300
    assert abs((out.source == "big").sum() - 300) < 70


def test_infeasible_total_raises(ray_session):
    srcs = {"a": _src(100), "b": _src(100, start=500)}
    with pytest.raises(ValueError, match="unreachable"):
        mix_corpora(srcs, {"a": 0.9, "b": 0.1}, total_rows=500)


def test_same_ids_across_sources_order_deterministic(ray_session):
    srcs = {"a": _src(500), "b": _src(500)}  # identical id ranges
    p = {"a": 0.5, "b": 0.5}
    x = mix_corpora(srcs, p, total_rows=400, seed=4).to_pandas()
    y = mix_corpora(srcs, p, total_rows=400, seed=4).to_pandas()
    assert x.doc_id.tolist() == y.doc_id.tolist()
    assert x.source.tolist() == y.source.tolist()


def test_temperature_proportions():
    from raystack.curate import temperature_proportions
    counts = {"en": 900, "de": 90, "yo": 10}
    nat = temperature_proportions(counts, 1.0)
    assert abs(nat["en"] - 0.9) < 1e-12 and abs(nat["yo"] - 0.01) < 1e-12
    warm = temperature_proportions(counts, 3.0)
    # upsampling: low-resource share grows, high-resource shrinks,
    # order preserved, still a distribution
    assert warm["yo"] > nat["yo"] and warm["en"] < nat["en"]
    assert warm["en"] > warm["de"] > warm["yo"]
    assert abs(sum(warm.values()) - 1.0) < 1e-12
    # T→∞ approaches uniform
    flat = temperature_proportions(counts, 1e9)
    assert max(flat.values()) - min(flat.values()) < 1e-6
    # zero-count sources drop; bad temperature loud
    assert "x" not in temperature_proportions({"a": 5, "x": 0}, 2.0)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        temperature_proportions(counts, 0.0)


def test_temperature_mix_end_to_end(ray_session):
    """temperature proportions drive mix_corpora: the hot source's share
    shrinks vs the natural mix, deterministically."""
    import pyarrow as pa
    import ray.data

    from raystack.curate import mix_corpora, temperature_proportions
    big = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(range(900), pa.int64())}))
    small = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(range(100), pa.int64())}))
    sources = {"big": big, "small": small}
    props = temperature_proportions({"big": 900, "small": 100}, 4.0)
    mixed = mix_corpora(sources, props, total_rows=200, seed=3) \
        .to_pandas()
    share_small = (mixed["source"] == "small").mean()
    assert 0.2 < share_small < 0.5  # natural would be ~0.1
    again = mix_corpora(sources, props, total_rows=200, seed=3) \
        .to_pandas()
    assert mixed.equals(again)  # reproducible from the seed alone
