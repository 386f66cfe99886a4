"""ctypes bindings for the native data-path kernels (native/dataio.cpp).

Builds the shared object on first use (g++, no external deps); every entry
point has a numpy fallback so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                          "..", ".."))
_SRC = os.path.join(_REPO_ROOT, "native", "dataio.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libdataio.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", _SRC, "-o", _SO],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.normalize_u8_hwc_to_f32_fchw.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
            lib.normalize_u8_simple.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def normalize_u8_hwc_to_fchw(frames_hwc: np.ndarray,
                             mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
                             nthreads: Optional[int] = None) -> np.ndarray:
    """(F, H, W, C) uint8 -> (F, C, H, W) float32 normalized, fused repack.
    Matches normalize_input semantics (reference utils/dataset.py:22-41)."""
    lib = _load()
    f, h, w, c = frames_hwc.shape
    if lib is None:
        x = frames_hwc.astype(np.float32) / 255.0
        x = (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
        return np.ascontiguousarray(x.transpose(0, 3, 1, 2))
    frames_hwc = np.ascontiguousarray(frames_hwc)
    out = np.empty((f, c, h, w), dtype=np.float32)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    nthreads = nthreads or min(8, os.cpu_count() or 1)
    lib.normalize_u8_hwc_to_f32_fchw(
        frames_hwc.ctypes.data, out.ctypes.data, f, h, w, c,
        mean_a.ctypes.data, std_a.ctypes.data, nthreads)
    return out
