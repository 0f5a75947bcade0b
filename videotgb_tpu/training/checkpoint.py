"""Orbax checkpoint management + resume.

Replaces Lightning's ModelCheckpoint/ckpt_path machinery (reference:
configs/callbacks/default.yaml:7-13, src/train.py:87-98): sharded async
checkpoints, restorable onto any mesh (GSPMD re-shards on load), with the
same retention semantics as the reference callback —

  best/   top-k on the monitored metric (saves carrying metrics)
  last/   the most recent save regardless of metrics (save_last; also where
          periodic between-eval saves and converted checkpoints land)

Full training state ({params, opt_state, step}) round-trips so a preempted
run resumes its optimizer moments and schedule, matching
``trainer.fit(ckpt_path=...)`` (src/train.py:87). RNG needs no extra state:
the trainer's RngStream folds (seed, step), so restoring ``step`` restores
the stream.
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
    """Top-k-on-metric + save_last retention over two Orbax managers."""

    def __init__(self, config: CheckpointConfig):
        self.config = config
        root = os.path.abspath(config.directory)
        os.makedirs(root, exist_ok=True)
        self._best = ocp.CheckpointManager(
            os.path.join(root, "best"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=config.max_to_keep,
                best_fn=(lambda m: m.get(config.monitor, 0.0)),
                best_mode=config.mode,
                enable_async_checkpointing=True,
            ),
        )
        self._last = ocp.CheckpointManager(
            os.path.join(root, "last"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1, enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state: dict, metrics: dict | None = None) -> None:
        """``state`` maps item name -> pytree ({"params": ..., "opt_state":
        ..., "step": ...}); items save independently so restores can pick a
        subset (eval restores params only). Metric-carrying saves compete for
        best/; every save lands in last/ (metric-less periodic saves land
        ONLY there)."""
        args = ocp.args.Composite(
            **{k: _save_arg(v) for k, v in state.items()})
        if metrics:
            self._best.save(
                step, args=args,
                metrics={k: float(v) for k, v in metrics.items()},
            )
        if self.config.save_last or not metrics:
            self._last.save(step, args=args)

    def restore(self, step: int | None = None, template: dict | None = None
                ) -> dict:
        """Restore ``step`` (or the newest step across best/ and last/).
        ``template`` maps item name -> abstract pytree; it may name a SUBSET
        of the stored items."""
        step, mgr = self._locate(step)
        if template is not None:
            args = ocp.args.Composite(
                **{k: _restore_arg(v) for k, v in template.items()})
            out = mgr.restore(step, args=args)
            # restored leaves carry their SAVED placements; re-place onto the
            # template's shardings so they compose with the live train state
            # (a resumed run may use a different mesh than the saver)
            return {k: _place_like(template[k], out[k]) for k in template}
        return dict(mgr.restore(step).items())

    def item_names(self, step: int | None = None) -> set[str]:
        """Item keys stored at ``step`` (probe before shaping a restore
        template: converted checkpoints hold params only)."""
        step, mgr = self._locate(step)
        meta = mgr.item_metadata(step)
        try:
            return set(meta.keys())
        except Exception:
            return set()

    def _locate(self, step: int | None):
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no checkpoint in {self.config.directory}")
        if step in (self._last.all_steps() or []):
            return step, self._last
        if step in (self._best.all_steps() or []):
            return step, self._best
        raise FileNotFoundError(
            f"step {step} not found in {self.config.directory}")

    def best_step(self) -> int | None:
        return self._best.best_step()

    def latest_step(self) -> int | None:
        steps = [s for s in (self._best.latest_step(),
                             self._last.latest_step()) if s is not None]
        return max(steps) if steps else None

    def wait(self) -> None:
        self._best.wait_until_finished()
        self._last.wait_until_finished()

    def close(self) -> None:
        self._best.close()
        self._last.close()


def _place_like(template: Any, restored: Any) -> Any:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import SingleDeviceSharding

    def place(t, r):
        sharding = getattr(t, "sharding", None)
        if sharding is None:
            return r
        if isinstance(sharding, SingleDeviceSharding):
            # orbax output is committed to its saved device; the live train
            # state's single-device leaves (optimizer counts etc.) are
            # UNcommitted jit outputs — rebuild as an uncommitted array so
            # jit is free to co-locate it with the mesh-sharded params
            return jnp.asarray(np.asarray(r), r.dtype)
        return jax.device_put(r, sharding)

    return jax.tree.map(place, template, restored)


def _is_array(v: Any) -> bool:
    return hasattr(v, "shape") and hasattr(v, "dtype")


def _save_arg(v: Any):
    # StandardSave refuses bare arrays/scalars (the "step" item)
    return ocp.args.ArraySave(v) if _is_array(v) else ocp.args.StandardSave(v)


def _restore_arg(v: Any):
    return (ocp.args.ArrayRestore(v) if _is_array(v)
            else ocp.args.StandardRestore(v))


def resolve_ckpt_path(path: str) -> tuple[str, int | None]:
    """Map a user-supplied ``ckpt_path`` to (manager root, step).

    Accepts the manager root, a ``best``/``last`` subdir, or a concrete step
    directory (``.../last/500``) — resuming from an explicit path must load
    exactly what the path names (ADVICE r1, train.py:270).
    """
    path = os.path.abspath(path.rstrip("/"))
    step = None
    base = os.path.basename(path)
    if base.isdigit():
        step = int(base)
        path = os.path.dirname(path)
        base = os.path.basename(path)
    if base in ("best", "last"):
        path = os.path.dirname(path)
    return path, step
