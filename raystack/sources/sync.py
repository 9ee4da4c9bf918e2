"""File-sync front door (reference d6tstack/sync.py:61-164) — the "get the
raw partitions onto storage" step that precedes ingestion.

The reference's ``FTPSync`` walks a remote FTP tree, diffs it against a
local dir (or an S3 bucket) by relative path, and copies only the missing
files. This container has no network, so the transport is pluggable:

- :class:`DirSync` — the full sync semantics (recursive/flat listing,
  set-difference diff, size accounting, copy of missing files, logger
  events) over any two filesystem roots. This is also the 100 TB shape:
  at scale the "remote" root is a mounted/object-store path and each copy
  is an independent task.
- :class:`FTPSync` — same class surface as the reference; constructing it
  requires ``ftputil``/``boto3`` (not in this container), so it is gated
  behind an import-try with the same constructor signature.
"""

from __future__ import annotations

import os
import shutil


class DirSync:
    """Sync missing files from ``remote_dir`` into ``local_dir`` (the
    reference's FTP→local flow with the transport swapped for the
    filesystem; semantics of FTPSync.get_all_files/get_files_for_sync/
    upload_ftp_files, sync.py:61-164)."""

    def __init__(self, remote_dir: str, local_dir: str = "./data/",
                 logger=None):
        self.remote_dir = remote_dir
        self.local_dir = local_dir
        os.makedirs(local_dir, exist_ok=True)
        self.logger = logger

    def _list(self, root: str, subdirs: bool = True) -> list[str]:
        """Sorted relative paths under ``root`` (reference get_all_files:
        recursive walk or flat listdir)."""
        if not os.path.isdir(root):
            # os.walk on a missing root yields NOTHING — a typo'd remote
            # dir would "sync 0 files" successfully; fail like the flat
            # listdir path does
            raise FileNotFoundError(f"sync root does not exist: {root}")
        out = set()
        if subdirs:
            for dir_, _, files in os.walk(root):
                for fn in files:
                    out.add(os.path.normpath(
                        os.path.join(os.path.relpath(dir_, root), fn)))
        else:
            for fn in os.listdir(root):
                if os.path.isfile(os.path.join(root, fn)):
                    out.add(fn)
        return sorted(out)

    def get_all_files(self, subdirs: bool = True,
                      remote: bool = False) -> list[str]:
        return self._list(self.remote_dir if remote else self.local_dir,
                          subdirs)

    def get_files_for_sync(self, subdirs: bool = True
                           ) -> tuple[set[str], int]:
        """(missing files, total byte size) — reference
        get_files_for_sync (set difference remote − local)."""
        remote = set(self.get_all_files(subdirs=subdirs, remote=True))
        local = set(self.get_all_files(subdirs=subdirs))
        missing = remote.difference(local)
        total = sum(os.path.getsize(os.path.join(self.remote_dir, f))
                    for f in missing)
        return missing, total

    def sync(self, subdirs: bool = True) -> list[str]:
        """Copy every missing file; returns the local paths copied
        (reference upload_ftp_files). Idempotent — a rerun copies
        nothing."""
        missing, total = self.get_files_for_sync(subdirs=subdirs)
        if self.logger:
            self.logger.send_log(
                f"syncing {len(missing)} file(s), {total} bytes", "ok")
        copied = []
        for rel in sorted(missing):
            src = os.path.join(self.remote_dir, rel)
            dst = os.path.join(self.local_dir, rel)
            os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
            shutil.copy2(src, dst)
            copied.append(dst)
        return copied


class FTPSync:  # pragma: no cover - network transport absent in container
    """Reference-compatible constructor surface; needs ftputil (+boto3 for
    the S3 side), neither shipped here."""

    def __init__(self, cfg_ftp_host, cfg_ftp_usr, cfg_ftp_pwd, cfg_ftp_dir,
                 cfg_s3_key=None, cfg_s3_secret=None, bucket_name=None,
                 local_dir="./data/", logger=None):
        try:
            import ftputil  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "FTPSync needs ftputil (and boto3 for S3); not installed in "
                "this container. Use DirSync for filesystem/object-store "
                "roots — the diff/copy semantics are identical.") from e
