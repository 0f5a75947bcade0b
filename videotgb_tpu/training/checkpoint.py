"""Orbax checkpoint management + resume.

Replaces Lightning's ModelCheckpoint/ckpt_path machinery (reference:
configs/callbacks/default.yaml:7-13, src/train.py:87-98): sharded async
checkpoints with top-k retention on a monitored metric plus save_last,
restorable onto any mesh (GSPMD re-shards on load).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import orbax.checkpoint as ocp

from videotgb_tpu.utils.logging import get_logger

log = get_logger("videotgb.ckpt")


@dataclasses.dataclass
class CheckpointConfig:
    directory: str = "checkpoints"
    max_to_keep: int = 1
    save_last: bool = True
    monitor: str = "val/score"
    mode: str = "max"


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager with best-metric retention."""

    def __init__(self, config: CheckpointConfig):
        self.config = config
        os.makedirs(config.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=config.max_to_keep + (1 if config.save_last else 0),
            best_fn=(lambda m: m.get(config.monitor, 0.0)),
            best_mode=config.mode,
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(config.directory), options=options
        )

    def save(self, step: int, state: Any, metrics: dict | None = None) -> None:
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )

    def restore(self, step: int | None = None, template: Any = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.config.directory}")
        if template is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def best_step(self) -> int | None:
        return self._mgr.best_step()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
