"""The generated API page can never go stale: every module in the
generator's manifest imports, every documented symbol exists and appears
on docs/API.md, and the page regenerates without error."""

import importlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import gen_api_docs  # noqa: E402


def test_every_module_imports():
    for _, mods in gen_api_docs.MODULES:
        for mod_name, _ in mods:
            importlib.import_module(mod_name)


def test_every_documented_symbol_exists_and_is_on_the_page():
    text, documented = gen_api_docs.render()
    assert len(documented) > 150
    with open(os.path.join(REPO, "docs", "API.md")) as f:
        page = f.read()
    for mod_name, name in documented:
        obj = getattr(importlib.import_module(mod_name), name)
        assert obj is not None
        assert f" {name}" in page, (mod_name, name)


def test_page_is_current():
    """Regeneration is a no-op — a changed public surface without a
    docs regen fails here (run scripts/gen_api_docs.py)."""
    text, _ = gen_api_docs.render()
    with open(os.path.join(REPO, "docs", "API.md")) as f:
        assert f.read() == text


def test_key_entry_points_are_documented():
    _, documented = gen_api_docs.render()
    names = {n for _, n in documented}
    for required in ("Stacker", "read_aligned", "encode_partitioned",
                     "encode_sharded", "decode_dir", "scan",
                     "read_raystack", "build_dedup_index", "ingest_dedup",
                     "seeded_shuffle", "fetch_sequences", "bm25_topk",
                     "build_zone_maps", "rollback"):
        assert required in names, required
