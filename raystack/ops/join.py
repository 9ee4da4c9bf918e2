"""Joins and lookups (guide patterns; the reference itself has none —
SURVEY.md §2.4 — these are the training-pipeline additions).

- :func:`broadcast_join` — small side ``ray.put`` once, pandas merge per
  batch inside an actor pool (the dimension-table case; no shuffle).
- :func:`semi_join` / :func:`anti_join` — broadcast the key set, filter
  vectorized inside ``map_batches``.
- Both-sides-large joins: recent Ray ships ``Dataset.join`` (hash
  partitioned); we delegate (:func:`hash_join`) and document the key/skew
  assumptions rather than reimplementing it.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


class _BroadcastJoiner:
    def __init__(self, small_ref, on: str, how: str):
        import ray
        self.small: pd.DataFrame = ray.get(small_ref)
        self.on = on
        self.how = how

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(self.small, on=self.on, how=self.how)


def broadcast_join(ds, small_df: pd.DataFrame, on: str, how: str = "inner",
                   concurrency=(1, 4)):
    """Join a Dataset against a small in-memory table: the small side is put
    in the object store ONCE and read in each actor's ``__init__`` — never
    re-shipped per batch."""
    import ray
    ref = ray.put(small_df)
    return ds.map_batches(_BroadcastJoiner, batch_format="pandas",
                          concurrency=concurrency,
                          fn_constructor_kwargs={"small_ref": ref, "on": on,
                                                 "how": how})


def semi_join(ds, keys, on: str, anti: bool = False):
    """Keep rows whose ``on`` value is (not) in the broadcast key set."""
    import ray
    key_arr = pa.array(sorted(set(keys)))
    ref = ray.put(key_arr)

    def fn(t: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        mask = pc.is_in(t[on], value_set=ks)
        if anti:
            mask = pc.invert(mask)
        return t.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def anti_join(ds, keys, on: str):
    return semi_join(ds, keys, on, anti=True)


def hash_join(left, right, on, how: str = "inner", num_partitions: int = 32):
    """Both-sides-large join → Ray's hash-partitioned ``Dataset.join``.
    Partitioning assumption: ``on`` hashes evenly; salt hot keys upstream
    (see raystack.pipeline.add_partition_key) if one key dominates."""
    return left.join(right, join_type=how, on=(on,),
                     num_partitions=num_partitions)
