"""Structured progress events — parity with the reference's logger surface
(``PrintLogger.send_log(msg, status)``, d6tstack/utils.py:7-12;
used combine_csv.py:52-53,71-75). Stages call ``send_log`` at milestones;
swap in any object with the same method (metrics pipe, file, ...)."""

from __future__ import annotations

import sys
import time


class PrintLogger:
    def send_log(self, msg: str, status: str = "ok") -> None:
        print(f"[raystack {time.strftime('%H:%M:%S')}] {status}: {msg}",
              file=sys.stderr)

    def send(self, data) -> None:  # reference parity (utils.py:11-12)
        print(f"[raystack] {data}", file=sys.stderr)


class NullLogger:
    def send_log(self, msg: str, status: str = "ok") -> None:
        pass

    def send(self, data) -> None:
        pass


_default = NullLogger()


def get_logger(logger=None):
    return logger if logger is not None else _default
