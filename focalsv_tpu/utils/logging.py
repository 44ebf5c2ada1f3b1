"""Structured logging (replaces the reference's per-step append-mode logs,
focalsv/utils.py:6-20) with optional per-step file sinks."""

from __future__ import annotations

import logging
import os
import sys

_FORMAT = "%(asctime)s %(levelname)-7s [%(name)s] %(message)s"
_configured = False


def get_logger(name: str, out_dir: str | None = None) -> logging.Logger:
    global _configured
    if not _configured:
        logging.basicConfig(format=_FORMAT, level=logging.INFO,
                            datefmt="%Y-%m-%d %H:%M:%S", stream=sys.stderr)
        _configured = True
    log = logging.getLogger(f"focalsv_tpu.{name}")
    if out_dir:
        os.makedirs(os.path.join(out_dir, "log"), exist_ok=True)
        path = os.path.join(out_dir, "log", f"{name}.log")
        if not any(isinstance(h, logging.FileHandler) and
                   getattr(h, "baseFilename", None) == os.path.abspath(path)
                   for h in log.handlers):
            fh = logging.FileHandler(path, mode="a")
            fh.setFormatter(logging.Formatter(_FORMAT))
            log.addHandler(fh)
    return log
