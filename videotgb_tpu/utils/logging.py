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


# run-scoped extra handlers (the per-run job log file, hydra
# job_logging.handlers.file analogue): every videotgb.* logger — the loggers
# don't propagate — gets each handler attached, including loggers created
# after the handler was registered (get_logger re-checks on every call).
_EXTRA_HANDLERS: list[logging.Handler] = []


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
    for extra in _EXTRA_HANDLERS:
        if extra not in logger.handlers:
            logger.addHandler(extra)
    return logger


def add_file_handler(path: str) -> logging.Handler:
    """Attach a job-log file handler to every ``videotgb*`` logger, present
    and future (the reference's hydra job_logging file handler,
    configs/hydra/default.yaml:17-21). Returns the handler; pass it to
    :func:`remove_file_handler` when the run ends."""
    handler = logging.FileHandler(path)
    handler.setFormatter(
        logging.Formatter(_FORMAT, datefmt="%Y-%m-%d %H:%M:%S"))
    handler.addFilter(_RankZeroFilter())
    _EXTRA_HANDLERS.append(handler)
    for name, logger in logging.Logger.manager.loggerDict.items():
        if name.startswith("videotgb") and isinstance(logger, logging.Logger):
            if handler not in logger.handlers:
                logger.addHandler(handler)
    return handler


def remove_file_handler(handler: logging.Handler) -> None:
    if handler in _EXTRA_HANDLERS:
        _EXTRA_HANDLERS.remove(handler)
    for name, logger in logging.Logger.manager.loggerDict.items():
        if name.startswith("videotgb") and isinstance(logger, logging.Logger):
            if handler in logger.handlers:
                logger.removeHandler(handler)
    handler.close()


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
