"""Multi-host initialization and process-level sharding helpers.

The reference's multi-process story is SLURM srun + Lightning DDP + NCCL
(reference: scripts/videoinstruct_train.slurm:7-19, SURVEY.md section 5.8).
On TPU pods every host runs the same program; :func:`initialize` wires
jax.distributed (controller discovery comes from the TPU runtime; explicit
coordinator args cover GPU/CPU fleets), after which ``jax.devices()`` spans
the pod and the (dp, fsdp, tp) mesh covers all chips.

Process-sharded inference (the reference's --num_chunks CLI loop,
eval/inference.py:21-29) maps to :func:`process_chunk`.
"""

from __future__ import annotations

import jax

from videotgb_tpu.utils.logging import get_logger

log = get_logger("videotgb.dist")


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Idempotent jax.distributed.initialize; no-ops single-process runs."""
    try:
        if num_processes is not None and num_processes <= 1:
            return
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        log.info("distributed: process %d/%d, %d devices (%d local)",
                 jax.process_index(), jax.process_count(),
                 len(jax.devices()), len(jax.local_devices()))
    except (RuntimeError, ValueError) as e:
        # already initialized, or single-host without coordinator info
        log.info("distributed init skipped: %s", e)


def process_chunk(items: list, process_index: int | None = None,
                  process_count: int | None = None) -> list:
    """Shard a work list across processes (contiguous chunks, matching the
    reference's split semantics, eval/inference.py:12-29)."""
    import math

    p = process_index if process_index is not None else jax.process_index()
    n = process_count if process_count is not None else jax.process_count()
    chunk = math.ceil(len(items) / n)
    return items[p * chunk : (p + 1) * chunk]


def is_coordinator() -> bool:
    return jax.process_index() == 0
