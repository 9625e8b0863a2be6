"""Timestamped structured logging (btllib log_info/check_error style,
reference: scripts/goldpolish:216,487; src/goldpolish_targeted_bfs.cpp:220)."""

from __future__ import annotations

import logging
import sys

_FORMAT = "[%(asctime)s] %(levelname)s %(name)s: %(message)s"
_configured = False


def get_logger(name: str) -> logging.Logger:
    global _configured
    if not _configured:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, "%Y-%m-%d %H:%M:%S"))
        root = logging.getLogger("goldpolish_tpu")
        root.addHandler(handler)
        root.setLevel(logging.INFO)
        _configured = True
    return logging.getLogger(f"goldpolish_tpu.{name}")


def check_error(condition: bool, message: str) -> None:
    """btllib check_error semantics: log and raise on failure."""
    if condition:
        logging.getLogger("goldpolish_tpu").error(message)
        raise RuntimeError(message)
