"""Native C++ helpers, loaded via ctypes (pybind11 not available in this image).

Currently: the binned-SAH BVH order builder (bvh_builder.cpp) — compiled on
first use with g++ into a cached shared object; falls back to the numpy builder
(scene/bvh.py) if compilation is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_LIB = None
_TRIED = False


def _build_lib() -> ctypes.CDLL | None:
    src = os.path.join(os.path.dirname(__file__), "bvh_builder.cpp")
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "nrdsample_tpu",
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "libbvh.so")
    if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(src):
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so_path + ".tmp",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(so_path + ".tmp", so_path)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.build_bvh_order.restype = ctypes.c_int
    lib.build_bvh_order.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
    ]
    return lib


def get_lib() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build_lib()
    return _LIB


def build_order(tri_min: np.ndarray, tri_max: np.ndarray, leaf_size: int = 8):
    """Native BVH order build. Returns (order int64 (n,), depth) or None when
    the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    tri_min = np.ascontiguousarray(tri_min, np.float32)
    tri_max = np.ascontiguousarray(tri_max, np.float32)
    n = len(tri_min)
    order = np.empty(n, np.int64)
    depth = lib.build_bvh_order(
        tri_min.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tri_max.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        leaf_size,
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if depth < 0:
        return None
    return order, depth
