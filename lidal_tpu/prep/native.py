"""ctypes bindings for the native C++ components (csrc/liblidal_native.so).

Build with ``make -C csrc``.  Both entry points have pure-python fallbacks so
the framework degrades gracefully on hosts without a toolchain:

* :func:`vccs_cluster` — VCCS supervoxel clustering (replaces the reference's
  PCL binary, ``pcl_related/supervoxel_clustering.cpp``; no PCD round trip —
  arrays in, labels out).
* :func:`balanced_kmeans_native` — capacity-constrained k-means (the
  ``k_means_constrained`` replacement), ~100x the python greedy loop.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc", "liblidal_native.so")
_lib: Optional[ctypes.CDLL] = None


def _load(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        csrc = os.path.dirname(_LIB_PATH)
        try:
            subprocess.run(["make", "-C", csrc], check=True, capture_output=True)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vccs_cluster.restype = ctypes.c_int
    lib.vccs_cluster.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_int, ctypes.POINTER(ctypes.c_uint),
    ]
    lib.balanced_kmeans.restype = ctypes.c_int
    lib.balanced_kmeans.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_longlong, ctypes.c_int,
        ctypes.c_float, ctypes.c_int, ctypes.c_ulonglong,
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


# Reference parameter defaults: pcl_related/supervoxel_clustering.cpp:44-66.
def vccs_cluster(
    xyz: np.ndarray,
    voxel_res: float = 0.5,
    seed_res: float = 10.0,
    color_w: float = 0.1,
    spatial_w: float = 0.4,
    normal_w: float = 1.0,
    iterations: int = 3,
) -> np.ndarray:
    """Per-point supervoxel labels (1-based; 0 = unassigned)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("liblidal_native.so unavailable — run `make -C csrc`")
    pts = np.ascontiguousarray(xyz, np.float32)
    n = len(pts)
    out = np.zeros(n, np.uint32)
    k = lib.vccs_cluster(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_longlong(n),
        ctypes.c_float(voxel_res), ctypes.c_float(seed_res),
        ctypes.c_float(color_w), ctypes.c_float(spatial_w),
        ctypes.c_float(normal_w), ctypes.c_int(iterations),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint)),
    )
    if k < 0:
        raise RuntimeError("vccs_cluster failed")
    return out.astype(np.int64)


def balanced_kmeans_native(
    xyz: np.ndarray,
    n_clusters: int = 20,
    size_tol: float = 0.05,
    lloyd_iters: int = 1,
    seed: int = 0,
) -> np.ndarray:
    """Capacity-constrained k-means labels [n] int32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("liblidal_native.so unavailable — run `make -C csrc`")
    pts = np.ascontiguousarray(xyz, np.float32)
    n = len(pts)
    out = np.zeros(n, np.int32)
    k = lib.balanced_kmeans(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_longlong(n), ctypes.c_int(n_clusters),
        ctypes.c_float(size_tol), ctypes.c_int(lloyd_iters),
        ctypes.c_ulonglong(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if k < 0:
        raise RuntimeError("balanced_kmeans failed")
    return out
