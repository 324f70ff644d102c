"""ctypes bindings to the native C++ preprocessing kernels (native/gts_native.cc).

Auto-builds on first use if g++ is available; every caller has a pure-numpy
fallback (data/slic.py, data/graph_build.py), so the framework works without a
compiler — the native path is the fast one, not the only one.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

__all__ = ["available", "slic3d_native", "segment_quantiles_native",
           "segment_mode_native", "segment_centroids_native",
           "enforce_connectivity_native", "knn_regular_native"]

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    so = os.path.join(here, "native", "libgts_native.so")
    if not os.path.exists(so):
        try:
            import sys
            sys.path.insert(0, os.path.join(here, "native"))
            from build import build  # type: ignore

            build(verbose=False)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    i32, i64, f32p, f64p, i16p, i32p = (
        ctypes.c_int32, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32, flags="C"),
        np.ctypeslib.ndpointer(np.float64, flags="C"),
        np.ctypeslib.ndpointer(np.int16, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"),
    )
    lib.segment_quantiles.argtypes = [f32p, i32p, i64, i32, f64p, i32, f32p]
    lib.segment_mode_u16.argtypes = [i16p, i32p, i64, i32, i32, i32p]
    lib.segment_centroids.argtypes = [i32p, i64, i64, i64, i32, f32p]
    lib.slic3d.argtypes = [f32p, i64, i64, i64, i64, i32, i32, i32,
                           ctypes.c_double, ctypes.c_double, i32, i32p]
    lib.enforce_connectivity.argtypes = [i32p, i64, i64, i64, i32]
    lib.knn_regular.argtypes = [f32p, i64, i32, i32p, i32p, i64]
    lib.knn_regular.restype = ctypes.c_int64
    _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def segment_quantiles_native(values: np.ndarray, segs: np.ndarray, n_seg: int,
                             quantiles) -> np.ndarray:
    lib = _lib()
    values = np.ascontiguousarray(values, np.float32)
    segs = np.ascontiguousarray(segs, np.int32)
    qs = np.ascontiguousarray(quantiles, np.float64)
    out = np.empty((n_seg, len(qs)), np.float32)
    lib.segment_quantiles(values, segs, values.size, n_seg, qs, len(qs), out)
    return out


def segment_mode_native(labels: np.ndarray, segs: np.ndarray, n_seg: int,
                        n_vals: int) -> np.ndarray:
    lib = _lib()
    labels = np.ascontiguousarray(labels, np.int16)
    segs = np.ascontiguousarray(segs, np.int32)
    out = np.empty(n_seg, np.int32)
    lib.segment_mode_u16(labels, segs, labels.size, n_seg, n_vals, out)
    return out


def segment_centroids_native(segs_volume: np.ndarray, n_seg: int) -> np.ndarray:
    lib = _lib()
    segs_volume = np.ascontiguousarray(segs_volume, np.int32)
    X, Y, Z = segs_volume.shape
    out = np.empty((n_seg, 3), np.float32)
    lib.segment_centroids(segs_volume.reshape(-1), X, Y, Z, n_seg, out)
    return out


def slic3d_native(image: np.ndarray, gx: int, gy: int, gz: int,
                  compactness: float, step: float, iters: int) -> np.ndarray:
    lib = _lib()
    image = np.ascontiguousarray(image, np.float32)
    X, Y, Z, C = image.shape
    out = np.empty(X * Y * Z, np.int32)
    inv_m2 = 1.0 / max(compactness, 1e-8) ** 2
    inv_s2 = 1.0 / step ** 2
    lib.slic3d(image.reshape(-1), X, Y, Z, C, gx, gy, gz, inv_m2, inv_s2,
               iters, out)
    return out.reshape(X, Y, Z)


def knn_regular_native(centroids: np.ndarray, k: int):
    """Greedy symmetric k-regular kNN edges; same semantics as the numpy
    knn_adjacency_edges(enforce_regularity=True) (parity-tested)."""
    lib = _lib()
    centroids = np.ascontiguousarray(centroids, np.float32)
    n = len(centroids)
    cap = 4 * n * (k + 8)
    src = np.empty(cap, np.int32)
    dst = np.empty(cap, np.int32)
    written = lib.knn_regular(centroids, n, k, src, dst, cap)
    if written < 0:
        raise RuntimeError("knn_regular edge buffer overflow")
    return src[:written].copy(), dst[:written].copy()


def enforce_connectivity_native(labels: np.ndarray) -> np.ndarray:
    lib = _lib()
    labels = np.ascontiguousarray(labels, np.int32).copy()
    X, Y, Z = labels.shape
    n_labels = int(labels.max()) + 1
    lib.enforce_connectivity(labels.reshape(-1), X, Y, Z, n_labels)
    return labels
