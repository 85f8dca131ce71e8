"""Structured logging + metrics, replacing the reference's glog/std::cout mix.

The reference interleaves ``LOG(INFO)`` with raw ``std::cout``
(``/root/reference/src/tracking.cpp:119,181,276,489-499``; SURVEY.md §5).
Here: one stdlib logger hierarchy plus a tiny metrics recorder that can dump
JSON lines for offline analysis.
"""
from __future__ import annotations

import json
import logging
import sys
import time


_CONFIGURED = False


def get_logger(name: str) -> logging.Logger:
    global _CONFIGURED
    if not _CONFIGURED:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname).1s %(name)s] %(message)s", "%H:%M:%S"))
        root = logging.getLogger("svo_tpu")
        root.addHandler(h)
        root.setLevel(logging.INFO)
        root.propagate = False
        _CONFIGURED = True
    return logging.getLogger(f"svo_tpu.{name}")


class MetricsRecorder:
    """Append-only metric stream; optionally mirrored to a JSONL file."""

    def __init__(self, path: str | None = None):
        self.path = path
        self.records: list[dict] = []
        self._fh = open(path, "a") if path else None

    def log(self, **kv) -> None:
        kv.setdefault("ts", time.time())
        self.records.append(kv)
        if self._fh:
            self._fh.write(json.dumps(kv, default=float) + "\n")
            self._fh.flush()

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
