"""Structured metric logging: JSONL per-step/per-epoch records (the
reference has only tqdm prints — SURVEY.md §5 observability)."""

from __future__ import annotations

import json
import sys
import time
from typing import Optional, TextIO


class MetricLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self._file: Optional[TextIO] = open(path, "a") if path else None
        self.echo = echo
        self._t0 = time.time()

    def log(self, **record):
        record.setdefault("t", round(time.time() - self._t0, 3))
        line = json.dumps(record, default=float)
        if self._file:
            self._file.write(line + "\n")
            self._file.flush()
        if self.echo:
            print(line, file=sys.stderr)

    def close(self):
        if self._file:
            self._file.close()
            self._file = None
