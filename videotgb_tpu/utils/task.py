"""Task wrapping and metric extraction glue.

Ports the reference's hydra-run utilities (reference: src/utils/utils.py):
``task_wrapper`` (:43-93 — log the exception into the run dir, always close
loggers so multiruns survive a crashed trial) and ``get_metric_value``
(:96-119 — pull the optimized metric for a sweep).
"""

from __future__ import annotations

import functools
import os
import traceback
from typing import Any, Callable, Mapping

from videotgb_tpu.utils.logging import get_logger

log = get_logger("videotgb.task")


def task_wrapper(task_fn: Callable) -> Callable:
    """Wrap an entry function: exceptions are written to
    ``<output_dir>/error.log`` and re-raised; any ``finish()``-able writers
    attached to the returned trainer close either way."""

    @functools.wraps(task_fn)
    def wrapped(cfg, *args: Any, **kwargs: Any):
        out_dir = None
        try:
            paths = cfg.get("paths") if hasattr(cfg, "get") else None
            out_dir = paths.get("output_dir") if paths else None
        except Exception:
            pass
        try:
            return task_fn(cfg, *args, **kwargs)
        except Exception:
            if out_dir:
                os.makedirs(out_dir, exist_ok=True)
                with open(os.path.join(out_dir, "error.log"), "a") as f:
                    f.write(traceback.format_exc())
                log.error("task failed; traceback saved to %s/error.log", out_dir)
            raise
        finally:
            # close anything the task registered for cleanup (wandb etc.)
            for closer in getattr(wrapped, "_closers", []):
                try:
                    closer()
                except Exception:
                    pass

    wrapped._closers = []
    return wrapped


def get_metric_value(metric_dict: Mapping[str, float],
                     metric_name: str | None) -> float | None:
    """Fetch the optimized metric for sweeps; None metric -> None
    (src/utils/utils.py:96-119 semantics incl. the not-found error)."""
    if not metric_name:
        return None
    if metric_name not in metric_dict:
        raise KeyError(
            f"metric '{metric_name}' not found in {sorted(metric_dict)}; "
            "make sure the name in hparams_search matches what the recipe logs"
        )
    return float(metric_dict[metric_name])


def apply_extras(cfg) -> None:
    """Apply the ``extras`` config group before a task runs (reference
    src/utils/utils.py:12-40 ``extras()``): ``ignore_warnings`` silences the
    python warnings module, ``enforce_tags`` requires a non-empty ``tags``
    list, ``print_config`` prints the composed tree."""
    import warnings

    from videotgb_tpu.utils.logging import print_config_tree

    extras = cfg.get("extras") if hasattr(cfg, "get") else None
    if extras is None:
        extras = {}
    if extras.get("ignore_warnings"):
        warnings.filterwarnings("ignore")
    if extras.get("enforce_tags") and not cfg.get("tags"):
        raise ValueError("extras.enforce_tags is set but cfg.tags is empty "
                         "(reference src/utils/utils.py enforce_tags)")
    if extras.get("print_config", True):
        print_config_tree(cfg)
