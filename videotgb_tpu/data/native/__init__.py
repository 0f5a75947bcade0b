"""ctypes binding for the native host-preprocessing library.

Builds ``libvtgb_host.so`` from host_ops.cpp on first use (g++, no deps) and
exposes numpy-friendly wrappers. Falls back gracefully: callers check
:func:`available` and use the numpy paths in data.transforms otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "host_ops.cpp")
_LIB = os.path.join(_HERE, "libvtgb_host.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.vtgb_resize_normalize.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, ctypes.c_int, f32p, f32p, ctypes.c_int,
        ]
        lib.vtgb_normalize_flow.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.vtgb_flow_to_rgb.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def resize_normalize(
    frames: np.ndarray, size: int, mean, std, num_threads: int = 0
) -> np.ndarray:
    """uint8 (T, H, W, 3) -> float32 (T, size, size, 3) CLIP-normalized."""
    lib = _load()
    assert lib is not None
    frames = np.ascontiguousarray(frames, np.uint8)
    t, h, w, _ = frames.shape
    out = np.empty((t, size, size, 3), np.float32)
    mean_arr = np.asarray(mean, np.float32)
    std_arr = np.asarray(std, np.float32)
    lib.vtgb_resize_normalize(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), t, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), size, size,
        mean_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads,
    )
    return out


def normalize_flow(flow: np.ndarray, num_threads: int = 0) -> np.ndarray:
    """float32 (T, H, W, 2), returns a max-radius-normalized copy."""
    lib = _load()
    assert lib is not None
    out = np.ascontiguousarray(flow, np.float32).copy()
    t, h, w, _ = out.shape
    lib.vtgb_normalize_flow(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t, h, w, num_threads
    )
    return out


def flow_to_rgb(flow: np.ndarray, num_threads: int = 0) -> np.ndarray:
    """float32 (T, H, W, 2) -> uint8 (T, H, W, 3)."""
    lib = _load()
    assert lib is not None
    flow = np.ascontiguousarray(flow, np.float32)
    t, h, w, _ = flow.shape
    out = np.empty((t, h, w, 3), np.uint8)
    lib.vtgb_flow_to_rgb(
        flow.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), num_threads,
    )
    return out
