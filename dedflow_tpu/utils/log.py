"""Minimal leveled, optionally-structured logger.

The reference's only observability is raw printf (device banner
main.c:340-354, Newton residuals main.c:266-269, GMRES every 20 iters
krylov.c:284-285, assembly timings assemble.cu:1739-1744) with no levels,
files, or structure (SURVEY.md section 5). This replaces those with a
stdlib-logging-based logger plus an optional JSONL metrics stream.
"""

from __future__ import annotations

import json
import logging
import sys
import time


def get_logger(name: str = "dedflow", level: str = "info") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        logger.addHandler(h)
    logger.setLevel(getattr(logging, level.upper()))
    return logger


class MetricsWriter:
    """Append-only JSONL metrics (step, residuals, timings, ...)."""

    def __init__(self, path: str | None):
        self._f = open(path, "a") if path else None
        self._t0 = time.time()

    def write(self, **fields) -> None:
        if self._f is None:
            return
        fields.setdefault("wall_s", round(time.time() - self._t0, 3))
        self._f.write(json.dumps(fields) + "\n")
        self._f.flush()

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
