"""ctypes bindings for the native host ops (FPS + 1-NN).

Builds ``host_ops.cpp`` with g++ on first use (cached next to the source);
falls back to the numpy implementations in
:mod:`cmr_agent_tpu.data.pipeline` when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Callable, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "host_ops.cpp")
_LIB = os.path.join(_HERE, "libcmr_host_ops.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    # -ffp-contract=fast (FMA) instead of -ffast-math: reassociation and
    # -ffinite-math-only would make the FPS argmax toolchain-dependent on
    # near-tie distances and turn NaN inputs into undefined behaviour; the
    # SoA/branchless loops in host_ops.cpp already vectorise at -O3.
    cmd = ["g++", "-O3", "-march=native", "-ffp-contract=fast", "-shared",
           "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except Exception as e:  # pragma: no cover - depends on toolchain
        print(f"[cmr native] build failed, using numpy fallback: {e}",
              file=sys.stderr)
        return None


def load_lib():
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _LIB if os.path.exists(_LIB) and (
            os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)) else _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        i64 = ctypes.c_int64
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.cmr_fps.argtypes = [f32p, i64, i64, i64p, f32p]
        lib.cmr_fps.restype = None
        lib.cmr_nn_assign.argtypes = [f32p, i64, f32p, i64, i64p]
        lib.cmr_nn_assign.restype = None
        _lib = lib
        return _lib


def fps_native(rng: np.random.Generator, pts: np.ndarray,
               k: int) -> np.ndarray:
    """Native FPS with the same signature as
    :func:`cmr_agent_tpu.data.pipeline.farthest_point_sample_np`."""
    lib = load_lib()
    pts32 = np.ascontiguousarray(pts, dtype=np.float32)
    out = np.zeros(k, dtype=np.int64)
    out[0] = rng.integers(pts32.shape[0])
    scratch = np.empty(pts32.shape[0], dtype=np.float32)
    lib.cmr_fps(pts32, pts32.shape[0], k, out, scratch)
    return out


def nn_assign_native(points: np.ndarray, centers: np.ndarray) -> np.ndarray:
    lib = load_lib()
    p = np.ascontiguousarray(points, dtype=np.float32)
    c = np.ascontiguousarray(centers, dtype=np.float32)
    out = np.empty(p.shape[0], dtype=np.int64)
    lib.cmr_nn_assign(p, p.shape[0], c, c.shape[0], out)
    return out


def get_fast_host_ops() -> Tuple[Optional[Callable], Optional[Callable]]:
    """(fps_fn, nn_fn) — native versions, or (None, None) to use numpy."""
    if load_lib() is None:
        return None, None
    return fps_native, nn_assign_native
