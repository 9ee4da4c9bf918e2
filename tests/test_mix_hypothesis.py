"""Property sweep: mix_corpora and stratified_sample vs pure splitmix64
oracles over randomized source sizes, proportions, seeds and
partitionings. Both ops' membership is documented as a pure function of
(id, seed/salt) — the sweep verifies the EXACT member set, not just the
counts, and that partitioning cannot change it."""

import numpy as np
import pyarrow as pa
import ray.data
from hypothesis import given, settings, strategies as st

from raystack.curate import mix_corpora
from raystack.ops.hashing import splitmix64
from raystack.ops.text import stratified_sample


def _src(ids):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([f"d{i}" for i in ids], pa.string())}))


def _mix_oracle(sources_ids: dict, props: dict, seed: int,
                total: float) -> dict:
    """name -> sorted kept ids, the documented per-row hash decision."""
    tot_p = sum(props.values())
    props = {k: p / tot_p for k, p in props.items()}
    out = {}
    for si, name in enumerate(sorted(sources_ids)):
        ids = np.array(sources_ids[name], np.uint64)
        n = len(ids)
        rate = props[name] * total / n if n else 0.0
        thresh = np.uint64(int(round(min(1.0, rate) * 10000)))
        salt = np.uint64(seed) ^ splitmix64(
            np.array([si + 1], np.uint64))[0]
        h = splitmix64(ids ^ salt)
        out[name] = sorted(int(i) for i in
                           ids[h % np.uint64(10000) < thresh])
    return out


_ids_a = st.lists(st.integers(min_value=0, max_value=10**6), min_size=2,
                  max_size=40, unique=True)
_ids_b = st.lists(st.integers(min_value=0, max_value=10**6), min_size=2,
                  max_size=40, unique=True)


@settings(max_examples=8, deadline=None)
@given(_ids_a, _ids_b,
       st.sampled_from([(1, 1), (3, 1), (1, 4)]),
       st.integers(min_value=0, max_value=2**31))
def test_mix_membership_matches_oracle(ray_session, ids_a, ids_b, pp,
                                       seed):
    sources = {"a": _src(ids_a), "b": _src(ids_b)}
    props = {"a": float(pp[0]), "b": float(pp[1])}
    got = mix_corpora(sources, props, seed=seed).to_pandas()
    tot_p = pp[0] + pp[1]
    total = min(len(ids_a) / (pp[0] / tot_p), len(ids_b) / (pp[1] / tot_p))
    want = _mix_oracle({"a": ids_a, "b": ids_b}, props, seed, total)
    for name in ("a", "b"):
        kept = sorted(got[got["source"] == name]["doc_id"].tolist())
        assert kept == want[name], (name, seed, pp)


@settings(max_examples=6, deadline=None)
@given(_ids_a, st.integers(min_value=0, max_value=2**31))
def test_mix_is_partitioning_invariant(ray_session, ids_a, seed):
    props = {"a": 1.0, "b": 1.0}
    ids_b = [i + 2_000_000 for i in ids_a]

    def run(nparts):
        sources = {"a": _src(ids_a).repartition(nparts),
                   "b": _src(ids_b).repartition(nparts)}
        df = mix_corpora(sources, props, seed=seed).to_pandas()
        return sorted(map(tuple, df[["source", "doc_id"]].to_numpy()))

    assert run(1) == run(5)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=3),
                          st.integers(min_value=0, max_value=10**6)),
                min_size=1, max_size=50, unique_by=lambda t: t[1]),
       st.integers(min_value=1, max_value=4))
def test_stratified_sample_matches_oracle(ray_session, rows, k):
    t = pa.table({
        "grp": pa.array([g for g, _ in rows], pa.int64()),
        "doc_id": pa.array([i for _, i in rows], pa.int64())})
    got = stratified_sample(ray.data.from_arrow(t).repartition(3),
                            "grp", k=k).to_pandas()
    # oracle: k smallest splitmix64(id) per group (int64 view ordering)
    by_grp = {}
    for g, i in rows:
        h = int(splitmix64(np.array([i], np.uint64)).view(np.int64)[0])
        by_grp.setdefault(g, []).append((h, i))
    want = {g: sorted(i for _, i in sorted(v)[:k])
            for g, v in by_grp.items()}
    gotm = {g: sorted(sub["doc_id"].tolist())
            for g, sub in got.groupby("grp")}
    assert gotm == want, (rows, k)
