"""Logging setup (reference pict/util/logging.py:52-137): file + console
handlers and per-class loggers."""

from __future__ import annotations

import logging
import sys
from pathlib import Path

__all__ = ["setup_logging", "get_logger"]

_FORMAT = "[%(asctime)s][%(name)s:%(levelname)s] %(message)s"


def setup_logging(log_dir: str | Path | None = None, level=logging.INFO,
                  filename: str = "fluidgym_tpu.log") -> None:
    """Configure root logging with console + optional file handler."""
    handlers: list[logging.Handler] = [logging.StreamHandler(sys.stdout)]
    if log_dir is not None:
        log_dir = Path(log_dir)
        log_dir.mkdir(parents=True, exist_ok=True)
        handlers.append(logging.FileHandler(log_dir / filename))
    logging.basicConfig(level=level, format=_FORMAT, handlers=handlers,
                        force=True)


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(name)
