"""Native (C++) host-side components, loaded via ctypes.

The reference's runtime is native C++; the performance-critical host
pieces here (the BVH builder -- ~100x faster than the numpy twin on the
92k-triangle benchmark scene) are C++ compiled on first use with g++ into
a cached shared library.  Callers fall back to the pure-numpy
implementations when no toolchain is available, so the framework never
hard-requires a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from cpugpupathtracing_tpu.utils.log import log_info, log_warn

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_SRC_DIR, "libbvh.so")
_lib = None
_lib_failed = False


def _compile() -> bool:
    src = os.path.join(_SRC_DIR, "bvh_builder.cc")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-ffp-contract=off",  # bit-parity with numpy (no FMA contraction)
        "-o", _LIB_PATH, src,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        log_warn("native", "BVH builder compile failed ({}); using numpy fallback", e)
        return False


def get_lib():
    """Load (compiling if needed) the native library, or None."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    src = os.path.join(_SRC_DIR, "bvh_builder.cc")
    if not os.path.exists(_LIB_PATH) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    ):
        if not _compile():
            _lib_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.bvh_build.restype = ctypes.c_int
        lib.bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        log_info("native", "loaded native BVH builder ({})", _LIB_PATH)
    except OSError as e:
        log_warn("native", "failed to load native library ({}); numpy fallback", e)
        _lib_failed = True
    return _lib


def native_bvh_build(
    tri_verts: np.ndarray,
    build_option: int,
    max_leaf_size: int | None,
    leaf_stop: int | None = None,
):
    """Run the native builder. tri_verts: (T, 9) f32 [v0, v1, v2].
    Returns (nodes_min, nodes_max, left_first, prim_count, perm, max_depth)
    or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    t = len(tri_verts)
    tri_verts = np.ascontiguousarray(tri_verts, np.float32)
    cap = 4 * t
    nodes_min = np.empty((cap, 3), np.float32)
    nodes_max = np.empty((cap, 3), np.float32)
    left_first = np.zeros(cap, np.int32)
    prim_count = np.zeros(cap, np.int32)
    perm = np.empty(t, np.int32)
    info = np.zeros(2, np.int32)

    def p(arr, typ):
        return arr.ctypes.data_as(ctypes.POINTER(typ))

    rc = lib.bvh_build(
        p(tri_verts, ctypes.c_float), t, int(build_option),
        int(max_leaf_size or 0), int(leaf_stop or 0),
        p(nodes_min, ctypes.c_float), p(nodes_max, ctypes.c_float),
        p(left_first, ctypes.c_int32), p(prim_count, ctypes.c_int32),
        p(perm, ctypes.c_int32), p(info, ctypes.c_int32),
    )
    if rc != 0:
        return None
    n = int(info[0])
    return (
        nodes_min[:n].copy(), nodes_max[:n].copy(),
        left_first[:n].copy(), prim_count[:n].copy(),
        perm, int(info[1]),
    )
