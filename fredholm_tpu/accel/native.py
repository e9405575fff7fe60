"""ctypes bindings for the native C++ BVH builder (native/bvh_builder.cpp).

Builds the shared library on demand with the system toolchain; callers fall
back to the numpy builder when compilation is unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

log = logging.getLogger("fredholm_tpu")

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbvh.so")
_lib = None
_tried = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_NATIVE_DIR, "bvh_builder.cpp")
    if not os.path.exists(src):
        return None
    try:
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        ):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
    except (OSError, subprocess.CalledProcessError) as e:
        log.warning("native BVH builder unavailable (%s); using numpy", e)
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.bvh_build.restype = ctypes.c_int64
    lib.bvh_build.argtypes = [
        f32p, f32p, ctypes.c_int64, ctypes.c_int32,
        f32p, f32p, i32p, i32p, i32p, i32p, i32p, i32p,
    ]
    lib.bvh_refit.restype = None
    lib.bvh_refit.argtypes = [
        f32p, f32p, ctypes.c_int64,
        i32p, i32p, i32p, i32p, i32p, f32p, f32p,
    ]
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.blocks_fill.restype = None
    lib.blocks_fill.argtypes = [
        i64p, f32p, f32p, f32p, i64p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, f32p,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _ensure_built() is not None


def build_bvh_native(tri_lo: np.ndarray, tri_hi: np.ndarray, leaf_size: int):
    """Returns the same tuple layout the numpy builder produces, or None if
    the native library is unavailable."""
    lib = _ensure_built()
    if lib is None:
        return None
    f = tri_lo.shape[0]
    cap = max(2 * f, 1)
    lo = np.ascontiguousarray(tri_lo, np.float32)
    hi = np.ascontiguousarray(tri_hi, np.float32)
    bounds_min = np.empty((cap, 3), np.float32)
    bounds_max = np.empty((cap, 3), np.float32)
    left = np.empty(cap, np.int32)
    right = np.empty(cap, np.int32)
    leaf_start = np.empty(cap, np.int32)
    leaf_count = np.empty(cap, np.int32)
    axis = np.empty(cap, np.int32)
    prim_order = np.empty(f, np.int32)
    n = lib.bvh_build(
        lo, hi, f, leaf_size,
        bounds_min, bounds_max, left, right, leaf_start, leaf_count, axis,
        prim_order,
    )
    return (
        bounds_min[:n].copy(),
        bounds_max[:n].copy(),
        left[:n].copy(),
        right[:n].copy(),
        leaf_start[:n].copy(),
        leaf_count[:n].copy(),
        axis[:n].copy(),
        prim_order,
    )


def refit_bvh_native(bvh, tri_lo: np.ndarray, tri_hi: np.ndarray) -> bool:
    lib = _ensure_built()
    if lib is None:
        return False
    lib.bvh_refit(
        np.ascontiguousarray(tri_lo, np.float32),
        np.ascontiguousarray(tri_hi, np.float32),
        bvh.n_nodes,
        np.ascontiguousarray(bvh.left),
        np.ascontiguousarray(bvh.right),
        np.ascontiguousarray(bvh.leaf_start),
        np.ascontiguousarray(bvh.leaf_count),
        np.ascontiguousarray(bvh.prim_order),
        bvh.bounds_min,
        bvh.bounds_max,
    )
    return True


def blocks_fill_native(perm, v0, e1, e2, prim_ids, cluster_size, tri_group):
    """Triangle-block SoA fill through the cached permutation (the per-
    frame hot path of the animation refit); None when the lib is absent."""
    lib = _ensure_built()
    if lib is None:
        return None
    n_slots = perm.shape[0]
    blocks = np.empty((16, n_slots), np.float32)
    lib.blocks_fill(
        np.ascontiguousarray(perm, np.int64),
        np.ascontiguousarray(v0, np.float32),
        np.ascontiguousarray(e1, np.float32),
        np.ascontiguousarray(e2, np.float32),
        np.ascontiguousarray(prim_ids, np.int64),
        n_slots, cluster_size, tri_group, blocks,
    )
    return blocks
