"""Process-zero-aware logging (reference: src/utils/pylogger.py, rich_utils.py)."""

from __future__ import annotations

import logging
import sys
from typing import Any, Mapping

import jax

_FORMAT = "[%(asctime)s][%(name)s][%(levelname)s] %(message)s"


def is_process_zero() -> bool:
    try:
        return jax.process_index() == 0
    except Exception:  # backend not initialised yet
        return True


class _RankZeroFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:
        return is_process_zero()


def get_logger(name: str = "videotgb") -> logging.Logger:
    """Logger that only emits on process 0 (reference rank_zero_only
    semantics, src/utils/pylogger.py:6-21)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        handler.addFilter(_RankZeroFilter())
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


def print_config_tree(cfg: Mapping[str, Any], logger: logging.Logger | None = None) -> str:
    """Plain-text config tree (reference prints a rich tree,
    src/utils/rich_utils.py:18-75)."""
    lines: list[str] = []

    def walk(node: Any, indent: int) -> None:
        pad = "  " * indent
        if isinstance(node, Mapping):
            for key, value in node.items():
                if isinstance(value, (Mapping, list)):
                    lines.append(f"{pad}{key}:")
                    walk(value, indent + 1)
                else:
                    lines.append(f"{pad}{key}: {value}")
        elif isinstance(node, list):
            for value in node:
                lines.append(f"{pad}- {value}")

    walk(cfg, 0)
    text = "\n".join(lines)
    (logger or get_logger()).info("config:\n%s", text)
    return text
