"""Snapshot log + time travel for encoded layouts.

Every layout-mutating operation (fresh encode, append, shard step,
compact, alter, rollback) commits a SNAPSHOT: an immutable record of
exactly which page files were live when the operation finished.
Rewriting operations (:func:`raystack.pipeline.compact_partitions`,
:func:`raystack.pipeline.alter_layout`, :func:`rollback`) RETIRE the
files they replace into ``out_dir/_history/<gen>/part_key=N/`` instead
of deleting them, so every recorded snapshot stays readable until
:func:`vacuum` reclaims it::

    decode_dir(out_dir, snapshot=3)    # the table exactly as of snapshot 3
    rollback(out_dir, 3)               # current state := snapshot 3
    vacuum(out_dir, keep_last=2)       # reclaim history older than the
                                       # last 2 snapshots

Design (Iceberg-flavored, filesystem-native — the reference's closest
analog is the Excel converter's per-file ``if_exists`` bookkeeping,
d6tstack/convert_xls.py:238-245, upgraded to whole-layout versioning):

- ``_manifest/snapshots.json`` — append-only log of
  ``{id, parent, op, listing, config, rows, encoded_bytes}`` entries,
  written with the same tmp + ``os.replace`` atomicity as the manifest.
- ``listing`` maps each ``part_key=N`` dirname to the sha1 of a listing
  file under ``_manifest/listings/<sha>.json`` holding the sorted page
  file names. Content-addressed: partitions untouched by an operation
  share the previous snapshot's listing file byte-for-byte, so log
  growth is O(changed partitions) per snapshot, not O(layout).
- Version resolution: the copy of file ``f`` that was live at snapshot
  ``S`` sits in ``_history/<J>/`` for the SMALLEST retirement
  generation ``J > S``, else it is the live copy. Rewrites give their
  outputs generation-unique names (``part-c<gen>``, ``<stem>.a<gen>``),
  and the smallest-J rule orders even re-created names correctly.
- Crash tolerance: retirement happens before the snapshot commit, and a
  history generation never needs a matching committed snapshot — an op
  that crashed after retiring files simply leaves them resolvable by the
  same smallest-J rule, and the next successful commit captures the live
  state. Readers of the CURRENT state never consult the log at all (they
  glob the live ``pages/`` tree, which contains exactly the live files).

One driver mutates a layout at a time (the same operating assumption the
manifest documents); snapshots make that history auditable and
reversible, they do not add a concurrency protocol.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

from . import manifest as mf

HISTORY_DIRNAME = "_history"
_SNAP_FILE = "snapshots.json"
_LISTINGS_DIRNAME = "listings"


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def _snap_path(out_dir: str) -> str:
    return os.path.join(_manifest_dir(out_dir), _SNAP_FILE)


def _listings_dir(out_dir: str) -> str:
    return os.path.join(_manifest_dir(out_dir), _LISTINGS_DIRNAME)


def history_root(out_dir: str) -> str:
    return os.path.join(out_dir, HISTORY_DIRNAME)


def list_snapshots(out_dir: str) -> list[dict]:
    """The snapshot log, oldest first. Empty list if the layout predates
    snapshots (or none were committed)."""
    p = _snap_path(out_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)


def current_snapshot_id(out_dir: str):
    snaps = list_snapshots(out_dir)
    return snaps[-1]["id"] if snaps else None


def next_gen(out_dir: str) -> int:
    """The generation id the NEXT snapshot will take. Rewriting ops call
    this before running so their output names and history dir carry the
    generation they will commit as."""
    cur = current_snapshot_id(out_dir)
    return 1 if cur is None else cur + 1


def capture_listing(out_dir: str) -> dict[str, list[str]]:
    """Live page-file listing: ``part_key=N`` dirname -> sorted file
    names. Driver-side directory metadata only."""
    pages_root = os.path.join(out_dir, "pages")
    if not os.path.isdir(pages_root):
        return {}
    out: dict[str, list[str]] = {}
    for d in sorted(os.listdir(pages_root)):
        if not d.startswith("part_key="):
            continue
        files = sorted(f for f in os.listdir(os.path.join(pages_root, d))
                       if f.endswith(".parquet"))
        if files:
            out[d] = files
    return out


def _write_atomic(path: str, payload) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _store_listing(out_dir: str, files: list[str]) -> str:
    """Content-addressed listing file; returns its sha key. An unchanged
    partition re-derives the same sha, so the write is a no-op replace of
    identical bytes."""
    blob = json.dumps(files, sort_keys=True)
    sha = hashlib.sha1(blob.encode()).hexdigest()
    p = os.path.join(_listings_dir(out_dir), f"{sha}.json")
    if not os.path.exists(p):
        _write_atomic(p, files)
    return sha


def commit_snapshot(out_dir: str, op: str) -> dict:
    """Record the CURRENT live file set as a new snapshot. Called by every
    layout-mutating op after its manifest finalize; the entry id equals
    :func:`next_gen` at call time."""
    listing = {d: _store_listing(out_dir, files)
               for d, files in capture_listing(out_dir).items()}
    snaps = list_snapshots(out_dir)
    summary = mf.manifest_summary(out_dir)
    entry = {
        "id": snaps[-1]["id"] + 1 if snaps else 1,
        "parent": snaps[-1]["id"] if snaps else None,
        "op": op,
        "listing": listing,
        "config": mf.load_config(out_dir) or {},
        "rows": summary["rows"],
        "encoded_bytes": summary["encoded_bytes"],
    }
    _write_atomic(_snap_path(out_dir), snaps + [entry])
    return entry


def snapshot_entry(out_dir: str, snapshot_id: int) -> dict:
    for s in list_snapshots(out_dir):
        if s["id"] == snapshot_id:
            return s
    have = [s["id"] for s in list_snapshots(out_dir)]
    raise KeyError(f"snapshot {snapshot_id} not in log (have {have}) — "
                   "vacuumed, or never committed")


def snapshot_listing(out_dir: str, snapshot_id: int) -> dict[str, list[str]]:
    """``part_key=N`` dirname -> file names live at ``snapshot_id``."""
    entry = snapshot_entry(out_dir, snapshot_id)
    out = {}
    for d, sha in entry["listing"].items():
        p = os.path.join(_listings_dir(out_dir), f"{sha}.json")
        with open(p) as f:
            out[d] = json.load(f)
    return out


def _history_gens(out_dir: str) -> list[int]:
    root = history_root(out_dir)
    if not os.path.isdir(root):
        return []
    gens = []
    for d in os.listdir(root):
        try:
            gens.append(int(d))
        except ValueError:
            continue
    return sorted(gens)


def resolve_snapshot_paths(out_dir: str,
                           snapshot_id: int) -> dict[str, list[str]]:
    """Absolute page-file paths realizing ``snapshot_id``, per partition
    dirname. The version of each listed file is the history copy with the
    smallest retirement generation > snapshot_id, else the live copy;
    missing both means the snapshot was vacuumed out from under the log
    (loud error, never a partial read)."""
    listing = snapshot_listing(out_dir, snapshot_id)
    pages_root = os.path.join(out_dir, "pages")
    gens = [g for g in _history_gens(out_dir) if g > snapshot_id]
    out: dict[str, list[str]] = {}
    for d, files in listing.items():
        paths = []
        for f in files:
            found = None
            for g in gens:  # ascending: smallest retirement gen wins
                cand = os.path.join(history_root(out_dir), str(g), d, f)
                if os.path.exists(cand):
                    found = cand
                    break
            if found is None:
                cand = os.path.join(pages_root, d, f)
                if os.path.exists(cand):
                    found = cand
            if found is None:
                raise FileNotFoundError(
                    f"snapshot {snapshot_id}: {d}/{f} is in the snapshot "
                    "listing but neither live nor in history — vacuumed?")
            paths.append(found)
        out[d] = paths
    return out


def retirement_gen(out_dir: str) -> int:
    """Generation id for a rewrite op to retire files under. Normally
    :func:`next_gen`, but never a generation that already exists in
    history (a crashed op may have retired files one generation ahead of
    the committed log — reusing its directory could overwrite the only
    copy of a version some snapshot still references)."""
    gens = _history_gens(out_dir)
    return max(next_gen(out_dir), (gens[-1] + 1) if gens else 1)


def retire_file(out_dir: str, gen: int, part_dirname: str,
                filename: str) -> None:
    """Move one live page file into ``_history/<gen>/<part_dirname>/``.
    Atomic rename on the same filesystem; idempotent if the file is
    already gone (a replayed crash journal)."""
    src = os.path.join(out_dir, "pages", part_dirname, filename)
    if not os.path.exists(src):
        return
    dst_dir = os.path.join(history_root(out_dir), str(gen), part_dirname)
    os.makedirs(dst_dir, exist_ok=True)
    os.replace(src, os.path.join(dst_dir, filename))


def rollback(out_dir: str, snapshot_id: int, logger=None) -> dict:
    """Make ``snapshot_id`` the CURRENT state, as a new snapshot (the log
    stays append-only — a rollback is undone by rolling forward). Files
    the target lacks are retired; files the target needs are moved back
    from history; the target's config is restored (covers url_col
    renames); zone sidecars of every changed partition are invalidated
    (stale min/max would otherwise describe the pre-rollback pages — the
    lookup paths' soundness gates would catch it, but decode_dir_where
    trusts sidecars); the manifest is re-finalized from the restored
    files. The shard ledger, if any, describes a superseded lineage and
    is dropped."""
    from .log import get_logger
    from .zones import invalidate_zone_sidecar
    log = get_logger(logger)
    target_entry = snapshot_entry(out_dir, snapshot_id)
    target = snapshot_listing(out_dir, snapshot_id)
    resolved = resolve_snapshot_paths(out_dir, snapshot_id)
    live = capture_listing(out_dir)
    gen = retirement_gen(out_dir)
    pages_root = os.path.join(out_dir, "pages")
    changed = []
    for d in sorted(set(live) | set(target)):
        want = set(target.get(d, []))
        have = set(live.get(d, []))
        if want == have and all(p.startswith(pages_root)
                                for p in resolved.get(d, [])):
            continue
        changed.append(d)
        for f in sorted(have - want):
            retire_file(out_dir, gen, d, f)
        # restore the exact resolved version (live-but-wrong-version names
        # were just retired above if not wanted; a same-named live file
        # that resolution skipped means the live copy is a LATER version
        # — retire it first, then pull the historical one back)
        for f, src in zip(target.get(d, []), resolved.get(d, [])):
            dst = os.path.join(pages_root, d, f)
            if src == dst:
                continue
            if os.path.exists(dst):
                retire_file(out_dir, gen, d, f)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(src, dst)
    for d in changed:
        try:
            invalidate_zone_sidecar(out_dir, int(d.split("=", 1)[1]))
        except ValueError:
            pass
    if target_entry.get("config"):
        mf.save_config(out_dir, target_entry["config"])
    ledger = os.path.join(_manifest_dir(out_dir), "shards.json")
    if os.path.exists(ledger):
        os.remove(ledger)
        log.send_log("rollback: dropped the shard ledger (superseded "
                     "lineage)")
    # manifest: REPLACE, not merge — partitions emptied by the rollback
    # must lose their rows
    mpath = os.path.join(_manifest_dir(out_dir), "manifest.json")
    if os.path.exists(mpath):
        os.remove(mpath)
    from .pipeline import _finalize_manifest, _layout_column_types
    cols = [c for c in _layout_column_types(out_dir)
            if c not in ("filepath", "filename")]
    summary = _finalize_manifest(out_dir, cols,
                                 snapshot_op=f"rollback({snapshot_id})") \
        if cols else {"partitions": 0, "rows": 0, "raw_bytes": 0,
                      "encoded_bytes": 0}
    log.send_log(f"rollback: layout restored to snapshot {snapshot_id} "
                 f"({len(changed)} partition(s) changed) as snapshot {gen}")
    return summary


def diff_snapshots(out_dir: str, a: int, b: int) -> dict:
    """What changed between snapshots ``a`` and ``b``: per-partition
    file adds/removes plus the row/byte deltas the log recorded.
    Metadata only — listings and log entries, no page reads."""
    la, lb = snapshot_listing(out_dir, a), snapshot_listing(out_dir, b)
    ea, eb = snapshot_entry(out_dir, a), snapshot_entry(out_dir, b)
    parts = {}
    for d in sorted(set(la) | set(lb)):
        added = sorted(set(lb.get(d, [])) - set(la.get(d, [])))
        removed = sorted(set(la.get(d, [])) - set(lb.get(d, [])))
        if added or removed:
            parts[d] = {"added": added, "removed": removed}
    return {
        "from": a, "to": b,
        "ops": [s["op"] for s in list_snapshots(out_dir)
                if a < s["id"] <= b],
        "rows_delta": eb["rows"] - ea["rows"],
        "encoded_bytes_delta": eb["encoded_bytes"] - ea["encoded_bytes"],
        "partitions_changed": parts,
    }


def vacuum(out_dir: str, keep_last: int = 2) -> dict:
    """Reclaim history: keep the last ``keep_last`` snapshots readable,
    delete every history generation older snapshots depended on, and
    prune the log. Files retired at generation J are needed only by
    snapshots with id < J, so with S_min = oldest retained id, every
    ``_history/<J ≤ S_min>`` directory is unreferenced and removed.
    Listing files no retained snapshot references are removed too."""
    import shutil
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    snaps = list_snapshots(out_dir)
    if not snaps:
        return {"removed_gens": [], "kept_snapshots": []}
    kept = snaps[-keep_last:]
    s_min = kept[0]["id"]
    removed = []
    for g in _history_gens(out_dir):
        if g <= s_min:
            shutil.rmtree(os.path.join(history_root(out_dir), str(g)),
                          ignore_errors=True)
            removed.append(g)
    hroot = history_root(out_dir)
    if os.path.isdir(hroot) and not os.listdir(hroot):
        os.rmdir(hroot)
    if len(kept) != len(snaps):
        _write_atomic(_snap_path(out_dir), kept)
    keep_shas = {sha for s in kept for sha in s["listing"].values()}
    ldir = _listings_dir(out_dir)
    pruned = 0
    if os.path.isdir(ldir):
        for f in os.listdir(ldir):
            if f.endswith(".json") and f[:-5] not in keep_shas:
                os.remove(os.path.join(ldir, f))
                pruned += 1
    return {"removed_gens": removed,
            "kept_snapshots": [s["id"] for s in kept],
            "pruned_listings": pruned}
