"""ctypes binding for the C++ graph kernels (euler.cpp).

Compiles `libggtnative.so` on first use (cached next to the source; rebuilt
when euler.cpp is newer). All entry points degrade gracefully: callers fall
back to the numpy implementations when the toolchain or build is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "euler.cpp")
_LIB_PATH = os.path.join(_HERE, "libggtnative.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH + ".tmp",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_LIB_PATH + ".tmp", _LIB_PATH)
        return _LIB_PATH
    except Exception:
        return None


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        lib.ggt_euler_walk.restype = ctypes.c_int64
        lib.ggt_euler_walk.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ggt_ego_k_hop.restype = ctypes.c_int64
        lib.ggt_ego_k_hop.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        _lib = lib
    return _lib


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def available() -> bool:
    return _load() is not None


def graph_to_walk(num_nodes: int, edge_index: np.ndarray, rng: np.random.Generator):
    """C++ Euler walk; returns int64 walk array or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(edge_index[0], np.int64)
    dst = np.ascontiguousarray(edge_index[1], np.int64)
    m = src.shape[0]
    cap = 2 * m + num_nodes + 2
    out = np.empty(cap, np.int64)
    seed = int(rng.integers(0, 2**63 - 1))
    n = lib.ggt_euler_walk(num_nodes, m, _ptr(src), _ptr(dst), seed, _ptr(out))
    if n < 0:
        return None
    return out[:n]


def ego_k_hop(indptr, indices, seeds, depth: int, fanout: int, rng, replace=False):
    """C++ ego-k-hop; returns sorted unique node array or None."""
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int64)
    seeds = np.ascontiguousarray(seeds, np.int64)
    # generous capacity bound: seeds + sum over hops of fanout growth
    cap = int(len(seeds) * max(fanout, 1) ** max(depth, 1) * 2 + len(seeds) + 16)
    cap = min(cap, len(indices) + len(seeds) + 1)
    out = np.empty(cap, np.int64)
    seed = int(rng.integers(0, 2**63 - 1))
    n = lib.ggt_ego_k_hop(
        _ptr(indptr), _ptr(indices), _ptr(seeds), len(seeds), depth, fanout,
        1 if replace else 0, seed, _ptr(out), cap,
    )
    if n < 0:
        return None
    return out[:n]
