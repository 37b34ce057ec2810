"""Native host runtime: lazy g++ build + ctypes bindings.

See newton_native.cpp for what lives here and why. The library is compiled
once on first use (cached next to the source); every entry point has a
pure-numpy fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ["get_lib", "native_bake_sdf", "native_candidate_pairs",
           "NATIVE_AVAILABLE"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "newton_native.cpp")
_LIB_PATH = os.path.join(_DIR, "libnewton_native.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_LIB_PATH) or \
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
        if not _build():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None
    lib.bake_sdf.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_float)]
    lib.bake_sdf.restype = None
    lib.build_candidate_pairs.argtypes = [
        ctypes.c_int64,
        *([ctypes.POINTER(ctypes.c_int32)] * 7),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
    lib.build_candidate_pairs.restype = ctypes.c_int64
    _lib = lib
    return lib


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


NATIVE_AVAILABLE = get_lib() is not None


def native_bake_sdf(vertices: np.ndarray, indices: np.ndarray,
                    resolution: int, lower: np.ndarray,
                    upper: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(vertices, dtype=np.float64)
    f = np.ascontiguousarray(indices, dtype=np.int32).reshape(-1)
    lo = np.ascontiguousarray(lower, dtype=np.float64)
    hi = np.ascontiguousarray(upper, dtype=np.float64)
    out = np.empty(resolution ** 3, dtype=np.float32)
    lib.bake_sdf(_ptr(v, ctypes.c_double), len(v),
                 _ptr(f, ctypes.c_int32), len(f) // 3,
                 resolution, _ptr(lo, ctypes.c_double),
                 _ptr(hi, ctypes.c_double), _ptr(out, ctypes.c_float))
    return out.reshape(resolution, resolution, resolution)


def native_candidate_pairs(shape_body, shape_world, shape_group,
                           shape_contype, shape_conaffinity, shape_type,
                           shape_flags, filter_pairs,
                           collide_flag: int, plane_type: int,
                           none_type: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    arrs = [np.ascontiguousarray(a, dtype=np.int32)
            for a in (shape_body, shape_world, shape_group, shape_contype,
                      shape_conaffinity, shape_type, shape_flags)]
    n = len(arrs[0])
    fp = np.ascontiguousarray(
        sorted((min(a, b) << 32) | max(a, b) for a, b in filter_pairs),
        dtype=np.int64) if filter_pairs else np.zeros(0, dtype=np.int64)
    cap = 64
    while True:
        out = np.empty((cap, 2), dtype=np.int32)
        cnt = lib.build_candidate_pairs(
            n, *[_ptr(a, ctypes.c_int32) for a in arrs],
            _ptr(fp, ctypes.c_int64), len(fp),
            collide_flag, plane_type, none_type,
            _ptr(out, ctypes.c_int32), cap)
        if cnt <= cap:
            return out[:cnt]
        cap = int(cnt) + 16
