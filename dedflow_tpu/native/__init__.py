"""Native (C++) host-side fast paths, loaded via ctypes.

The reference implements its host layer (CSR construction, mesh tables)
in C99 (csr.c, Mesh.c); the equivalent here is dedflow_tpu/native/
topology.cpp, compiled on demand with g++ into _libdedflow.so. The NumPy
implementations in sparse/topology.py and parallel/partition.py are the
oracles and the fallback when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "topology.cpp")
_LIB = os.path.join(_DIR, "_libdedflow.so")
_lib = None
_tried = False


def ensure_built() -> bool:
    """Compile the shared library if missing/stale. Returns success."""
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
            _SRC
        ):
            subprocess.run(
                ["make", "-s", "-C", _DIR],
                check=True,
                capture_output=True,
            )
        return True
    except Exception:
        return False


def load():
    """ctypes handle to the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not ensure_built():
        return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    i64 = ctypes.c_int64
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.dedflow_topology.restype = i64
    lib.dedflow_topology.argtypes = [
        p_i32, i64, i64, p_i64, p_i32, i64, p_i32, p_i32, p_i32,
    ]
    lib.dedflow_rcb.restype = None
    lib.dedflow_rcb.argtypes = [p_f64, i64, i64, p_i64]
    _lib = lib
    return _lib


def topology(ien: np.ndarray, num_node: int):
    """Native sparsity + scatter plans; None if the library is missing.

    Returns (row_ptr, col_ind, elem_nnz (ne,4,4), mat_perm, node_perm).
    """
    lib = load()
    if lib is None:
        return None
    ien = np.ascontiguousarray(ien, dtype=np.int32)
    ne = ien.shape[0]
    n = int(num_node)
    cap = 16 * ne + n
    row_ptr = np.empty(n + 1, dtype=np.int64)
    col_ind = np.empty(cap, dtype=np.int32)
    elem_nnz = np.empty(16 * ne, dtype=np.int32)
    mat_perm = np.empty(16 * ne, dtype=np.int32)
    node_perm = np.empty(4 * ne, dtype=np.int32)
    nnz = lib.dedflow_topology(
        ien, ne, n, row_ptr, col_ind, cap, elem_nnz, mat_perm, node_perm
    )
    if nnz < 0:
        return None
    return (
        row_ptr,
        col_ind[:nnz].copy(),
        elem_nnz.reshape(ne, 4, 4),
        mat_perm,
        node_perm,
    )


def rcb(xg: np.ndarray, num_parts: int):
    """Native RCB node partition; None if the library is missing."""
    lib = load()
    if lib is None:
        return None
    xg = np.ascontiguousarray(xg, dtype=np.float64)
    part = np.empty(xg.shape[0], dtype=np.int64)
    lib.dedflow_rcb(xg, xg.shape[0], int(num_parts), part)
    return part
