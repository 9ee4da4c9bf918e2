"""Lineage + checkpoint manifest (SURVEY.md §7 step 5).

Each encoded partition emits a manifest row: input files, per-column codec
choices, row count, raw/encoded bytes, checksum. The manifest is the source
of truth for resume: a partition is "done" iff its row is present (rows are
only recorded after that partition's pages hit storage), so a crashed run
re-encodes exactly the missing partitions — the reference analog is the
Excel converter's file-level ``if_exists='skip'``
(d6tstack/convert_xls.py:238-245), upgraded to per-partition granularity
with checksums.

Written atomically (tmp file + ``os.replace``) and merged on update, so
concurrent resumed runs never truncate prior progress. The merge is a
read-modify-write: two drivers finalizing the SAME layout at the same
instant can each miss the other's in-flight rows (one driver per layout
is the operating assumption — the cost of a violation is re-encoding
work on the next resume, never data corruption, because rows are only
recorded after their pages hit storage).
"""

from __future__ import annotations

import json
import os
import tempfile

_MANIFEST_DIR = "_manifest"
_MANIFEST_FILE = "manifest.json"


def _path(out_dir: str) -> str:
    return os.path.join(out_dir, _MANIFEST_DIR, _MANIFEST_FILE)


def load_manifest(out_dir: str) -> dict[str, dict]:
    """part_key (as str) -> manifest row dict. Empty if none exists."""
    p = _path(out_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def update_manifest(out_dir: str, rows: dict[str, dict]) -> dict[str, dict]:
    """Merge ``rows`` into the manifest on disk, atomically. Returns the
    merged manifest."""
    os.makedirs(os.path.join(out_dir, _MANIFEST_DIR), exist_ok=True)
    merged = load_manifest(out_dir)
    merged.update({str(k): v for k, v in rows.items()})
    fd, tmp = tempfile.mkstemp(dir=os.path.join(out_dir, _MANIFEST_DIR),
                               suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    os.replace(tmp, _path(out_dir))
    return merged


def completed_part_keys(out_dir: str) -> set[int]:
    return {int(k) for k in load_manifest(out_dir)}


_CONFIG_FILE = "config.json"


def save_config(out_dir: str, cfg: dict) -> None:
    """Persist the partitioning config (url_col, num_partitions, hot_hosts)
    next to the manifest so readers can route point lookups to the right
    partition without a scan."""
    os.makedirs(os.path.join(out_dir, _MANIFEST_DIR), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.join(out_dir, _MANIFEST_DIR),
                               suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(cfg, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST_DIR, _CONFIG_FILE))


def load_config(out_dir: str) -> dict:
    p = os.path.join(out_dir, _MANIFEST_DIR, _CONFIG_FILE)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def manifest_summary(out_dir: str) -> dict:
    m = load_manifest(out_dir)
    return {
        "partitions": len(m),
        "rows": sum(r["rows"] for r in m.values()),
        "raw_bytes": sum(r["raw_bytes"] for r in m.values()),
        "encoded_bytes": sum(r["encoded_bytes"] for r in m.values()),
    }
