"""ctypes loader (and on-demand builder) for the native C++ kernels.

pybind11 is not available in this image, so the native library exposes a
plain C ABI consumed through ctypes. The library is compiled on first use
with g++ and cached next to the sources; set ``MDT_TPU_NO_NATIVE=1`` to force
the pure-numpy fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "mdt_native.cc")
_LIB = os.path.join(_HERE, "libmdt_native.so")
_LOCK = threading.Lock()
_CACHED: Optional[ctypes.CDLL] = None
_FAILED = False


def build() -> bool:
    """Compile the native library. Returns True on success."""
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-o",
        _LIB,
        _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def try_load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None on failure."""
    global _CACHED, _FAILED
    if os.environ.get("MDT_TPU_NO_NATIVE"):
        return None
    if _CACHED is not None:
        return _CACHED
    if _FAILED:
        return None
    with _LOCK:
        if _CACHED is not None:
            return _CACHED
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
            _SRC
        ):
            if not build():
                _FAILED = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _FAILED = True
            return None
        i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
        lib.mdt_tree_distance_pairs.argtypes = [i64p, ctypes.c_int64, i64p]
        lib.mdt_tree_distance_pairs.restype = ctypes.c_int
        lib.mdt_floyd_warshall.argtypes = [
            i64p,
            ctypes.c_int64,
            ctypes.c_int64,
            i64p,
        ]
        lib.mdt_floyd_warshall.restype = None
        lib.mdt_spatial_buckets.argtypes = [
            i64p,
            ctypes.c_int64,
            i64p,
            ctypes.c_int64,
            i64p,
        ]
        lib.mdt_spatial_buckets.restype = None
        _CACHED = lib
        return lib


def tree_distance_pairs(lib: ctypes.CDLL, parents: np.ndarray) -> np.ndarray:
    parents = np.ascontiguousarray(parents, dtype=np.int64)
    n = len(parents)
    out = np.empty((n, n, 2), dtype=np.int64)
    rc = lib.mdt_tree_distance_pairs(parents, n, out)
    if rc != 0:
        raise ValueError(f"malformed tree (native rc={rc})")
    return out


def floyd_warshall(
    lib: ctypes.CDLL, adjacency: np.ndarray, unreachable: int
) -> np.ndarray:
    adj = np.ascontiguousarray(adjacency, dtype=np.int64)
    n = adj.shape[0]
    out = np.empty((n, n), dtype=np.int64)
    lib.mdt_floyd_warshall(adj, n, unreachable, out)
    return out


def spatial_buckets(
    lib: ctypes.CDLL, pairs: np.ndarray, table: np.ndarray, clip: int
) -> np.ndarray:
    pairs = np.ascontiguousarray(pairs, dtype=np.int64)
    table = np.ascontiguousarray(table, dtype=np.int64)
    n = pairs.shape[0]
    out = np.empty((n, n), dtype=np.int64)
    lib.mdt_spatial_buckets(pairs, n, table, clip, out)
    return out
