"""Read helpers.

:func:`read_parquet_clean` is ``ray.data.read_parquet`` with schema and
field metadata stripped AT THE SOURCE. Parquet files written through
pandas carry a ``pandas`` schema-metadata blob; a ``pa.Schema`` holding
metadata is UNHASHABLE (``hash()`` recurses into the metadata dict), so
every downstream ``unify_schemas`` — block coalescing for ``map_batches``
batch sizing, the hash-shuffle aggregators, the fused read's own
SplitBlocks — falls off Ray's schema-dedup fast path and logs
"Failed to hash the schemas (for deduplication)". Passing an explicit
bare schema to the read keeps every derived block hashable (join inputs
get a belt-and-braces strip in ``raystack.ops.join``)."""

from __future__ import annotations

import pyarrow as pa


def bare_schema(schema: pa.Schema,
                columns: list[str] | None = None) -> pa.Schema:
    """``schema`` without schema- or field-level metadata, optionally
    projected to ``columns`` (in the given order)."""
    names = columns if columns is not None else schema.names
    return pa.schema([pa.field(n, schema.field(n).type,
                               schema.field(n).nullable) for n in names])


def read_parquet_clean(paths, *, columns: list[str] | None = None, **kw):
    """``ray.data.read_parquet`` over files that may carry pandas schema
    metadata — stripped via an explicit bare ``schema=`` (see module
    docstring). ``paths`` is a path or list of paths; the first file's
    footer provides the types (same assumption the plain read's schema
    unification makes for like-schema'd inputs)."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    if os.path.isdir(first):
        import pyarrow.dataset as pads
        full = pads.dataset(first).schema
    else:
        full = pq.read_schema(first)
    schema = bare_schema(full, columns)
    return ray.data.read_parquet(paths, columns=columns, schema=schema,
                                 **kw)
