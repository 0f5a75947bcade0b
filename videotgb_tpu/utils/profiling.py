"""Profiling and debugging hooks.

TPU replacements for the reference's operational debug surface
(SURVEY.md sections 5.1-5.2): Lightning's profiler flag becomes
jax.profiler traces (Perfetto-compatible), detect_anomaly becomes
jax_debug_nans, and the decode-throughput microbenchmark (demo/debug.py:8-25)
becomes a first-class helper.

Timing note for this backend: execution is fully async and only a host fetch
synchronizes, so :func:`timed` blocks by fetching its result to numpy.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax
import numpy as np

from videotgb_tpu.utils.logging import get_logger

log = get_logger("videotgb.profile")


@contextlib.contextmanager
def trace(log_dir: str = "outputs/profile"):
    """Capture a jax.profiler trace viewable in Perfetto/TensorBoard
    (the reference's configs/debug/profiler.yaml analogue)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        log.info("profile trace written to %s", log_dir)


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """NaN-check every primitive (detect_anomaly analogue,
    configs/debug/default.yaml)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def fetch(tree: Any) -> Any:
    """Force real completion by copying to host (block_until_ready does not
    synchronize on tunneled backends)."""
    return jax.tree.map(np.asarray, tree)


def timed(fn: Callable, *args, iters: int = 5, warmup: int = 1,
          **kwargs) -> tuple[float, Any]:
    """Median wall-time of fn(*args) with host-fetch synchronization."""
    out = None
    for _ in range(warmup):
        out = fetch(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fetch(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], out


def decode_throughput(path: str, num_frames: int = 32, size: int = 224,
                      iters: int = 3) -> dict[str, float]:
    """Host video-decode microbenchmark (demo/debug.py:8-25 measured 19.3s
    per video in the reference)."""
    from videotgb_tpu.data.video_io import read_video_cv2

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        frames, _ = read_video_cv2(path, num_frames=num_frames,
                                   size=(size, size))
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    return {"decode_s": med, "frames_per_s": num_frames / med}
