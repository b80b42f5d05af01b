"""Native (C++) acceleration-structure builder, loaded via ctypes.

The runtime around the TPU compute path is native where the reference's is
(SURVEY.md §2.8): cpp/bvh_builder.cpp implements the same binned-SAH
algorithm as accel/bvh.py and is compiled on demand with g++ (no pybind11 —
plain C ABI + ctypes).  Scene compiles fall back to the Python builder if
the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_FAILED = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "cpp",
    "bvh_builder.cpp",
)
_SO = os.path.join(os.path.dirname(_SRC), "build", "libbvh_builder.so")


def _load():
    global _LIB, _FAILED
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        try:
            if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                os.makedirs(os.path.dirname(_SO), exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_SO)
            lib.build_bvh_native.restype = ctypes.c_int
            lib.build_bvh_native.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # p0
                ctypes.POINTER(ctypes.c_float),  # e1
                ctypes.POINTER(ctypes.c_float),  # e2
                ctypes.c_int,                    # n_tris
                ctypes.c_float,                  # box_pad
                ctypes.POINTER(ctypes.c_float),  # node_min
                ctypes.POINTER(ctypes.c_float),  # node_max
                ctypes.POINTER(ctypes.c_int32),  # child0
                ctypes.POINTER(ctypes.c_int32),  # child1
                ctypes.POINTER(ctypes.c_int32),  # prim_idx
                ctypes.c_int,                    # max_nodes
                ctypes.POINTER(ctypes.c_int32),  # out_n_nodes
                ctypes.POINTER(ctypes.c_int32),  # out_max_depth
            ]
            _LIB = lib
        except Exception:
            _FAILED = True
            _LIB = None
        return _LIB


def native_available() -> bool:
    return _load() is not None


def build_bvh_native(p0: np.ndarray, e1: np.ndarray, e2: np.ndarray, box_pad: float):
    """Returns (node_min, node_max, child0, child1, prim_idx, max_depth)
    as numpy arrays, or None if the native builder is unavailable."""
    lib = _load()
    if lib is None:
        return None
    t = int(p0.shape[0])
    max_nodes = max(2 * t, 4)
    p0f = np.ascontiguousarray(p0, dtype=np.float32)
    e1f = np.ascontiguousarray(e1, dtype=np.float32)
    e2f = np.ascontiguousarray(e2, dtype=np.float32)
    node_min = np.empty((max_nodes, 3), dtype=np.float32)
    node_max = np.empty((max_nodes, 3), dtype=np.float32)
    child0 = np.empty((max_nodes,), dtype=np.int32)
    child1 = np.empty((max_nodes,), dtype=np.int32)
    prim_idx = np.empty((t,), dtype=np.int32)
    n_nodes = np.zeros((1,), dtype=np.int32)
    max_depth = np.zeros((1,), dtype=np.int32)

    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = lib.build_bvh_native(
        fp(p0f), fp(e1f), fp(e2f), t, ctypes.c_float(box_pad),
        fp(node_min), fp(node_max), ip(child0), ip(child1), ip(prim_idx),
        max_nodes, ip(n_nodes), ip(max_depth),
    )
    if rc != 0:
        return None
    n = int(n_nodes[0])
    return (
        node_min[:n].copy(),
        node_max[:n].copy(),
        child0[:n].copy(),
        child1[:n].copy(),
        prim_idx,
        int(max_depth[0]),
    )
