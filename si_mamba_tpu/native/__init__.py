"""ctypes bindings for the native CPU preprocessing library.

Compiles ``pointops.cpp`` on first use (g++, cached as libpointops.so next to
the source); every entry point has a numpy fallback so the package works
without a toolchain. These are HOST-side ops for dataset preprocessing — the
TPU compute path uses si_mamba_tpu.ops (XLA/Pallas).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libpointops.so")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_HERE, "pointops.cpp")
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", _SO, src, "-lpthread"],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.fps_batch_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64)]
            lib.knn_batch_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int64)]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def fps_cpu(points: np.ndarray, n_samples: int, start: int = 0) -> np.ndarray:
    """Batched FPS on host. points: (B, N, D) or (N, D) float32 ->
    indices (B, n_samples) or (n_samples,) int64."""
    single = points.ndim == 2
    pts = np.ascontiguousarray(points[None] if single else points, np.float32)
    B, N, D = pts.shape
    out = np.empty((B, n_samples), np.int64)
    lib = _load()
    if lib is not None:
        lib.fps_batch_f32(_fptr(pts), B, N, D, n_samples, start, _iptr(out))
    else:  # numpy fallback
        for b in range(B):
            min_d = np.full(N, np.inf)
            far = start
            for i in range(n_samples):
                out[b, i] = far
                d = np.sum((pts[b] - pts[b, far]) ** 2, axis=-1)
                min_d = np.minimum(min_d, d)
                far = int(np.argmax(min_d))
    return out[0] if single else out


def knn_cpu(query: np.ndarray, points: np.ndarray, k: int) -> np.ndarray:
    """Batched brute-force kNN on host. query (B, Q, D), points (B, N, D) ->
    int64 (B, Q, k) ascending by distance."""
    single = query.ndim == 2
    q = np.ascontiguousarray(query[None] if single else query, np.float32)
    p = np.ascontiguousarray(points[None] if single else points, np.float32)
    B, Q, D = q.shape
    N = p.shape[1]
    out = np.empty((B, Q, k), np.int64)
    lib = _load()
    if lib is not None:
        lib.knn_batch_f32(_fptr(q), _fptr(p), B, Q, N, D, k, _iptr(out))
    else:
        for b in range(B):
            d = ((q[b][:, None, :] - p[b][None, :, :]) ** 2).sum(-1)
            out[b] = np.argsort(d, axis=-1)[:, :k]
    return out[0] if single else out


def native_available() -> bool:
    return _load() is not None
