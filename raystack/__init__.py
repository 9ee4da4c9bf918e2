"""raystack — a Ray-Data-native schema-alignment + per-column lightweight
compression engine.

Re-expresses the capabilities of the d6tstack reference
(/root/reference/d6tstack: CombinerCSV sniff/align/combine/export,
combine_csv.py:57-504) as idiomatic Ray Data pipelines:

- ``raystack.plan``     — plan-time schema sniffing/unification over Parquet
  footers (union / intersection / modal column order / presence matrix,
  semantics of combine_csv.py:108-179).
- ``raystack.align``    — the align ``map_batches`` stage (rename → null-fill
  → reorder → cast → provenance, semantics of combine_csv.py:93-106,268-305).
- ``raystack.codecs``   — lightweight per-column codecs (plain, dict, rle,
  frame-of-reference bit-pack, FSST-style symbol table, cascades) with
  bit-identical decode.
- ``raystack.select``   — sampling-based codec auto-selection cost model.
- ``raystack.pipeline`` — Ray Data encode/decode pipelines with explicit
  hash partitioning, salt-based skew splitting, and a checkpoint manifest.
- ``raystack.stacker``  — API-parity facade mirroring the reference's
  inspection surface (columns(), is_all_equal(), combine_preview(), ...).
- ``raystack.ops``      — training-data operators: dedup (exact, MinHash-LSH,
  SimHash, embedding-cosine), similarity search, text analysis, multimodal
  column plumbing.

Library code never calls ``ray.init()`` — sessions are owned by the driver,
``bench.py`` and the test fixture.
"""

__version__ = "0.1.0"


def read_raystack(out_dir, *, columns=None, where=None, snapshot=None,
                  keys=None, parallelism: int = -1, **read_args):
    """Read an encoded layout as a composable Ray Data Dataset (see
    :mod:`raystack.datasource`). Lazy import so ``import raystack`` stays
    cheap and never touches ``ray.data`` at import time."""
    from .datasource import read_raystack as _impl
    return _impl(out_dir, columns=columns, where=where, snapshot=snapshot,
                 keys=keys, parallelism=parallelism, **read_args)
