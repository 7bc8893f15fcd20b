"""ctypes bindings for the native C++ host kernels (fedd_native.cpp).

The shared library is compiled on first use with g++ -O3 and cached next to
the source; if no compiler is available the package transparently falls
back to the pure-numpy implementations (callers check `available()`)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fedd_native.cpp")
_SO = os.path.join(_HERE, "libfedd_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
    lib.medit_sizes.argtypes = [ctypes.c_char_p, i64p]
    lib.medit_sizes.restype = ctypes.c_int
    lib.medit_read.argtypes = [ctypes.c_char_p, f64p, i32p, i64p, i32p,
                               i64p, i32p, i64p, i32p]
    lib.medit_read.restype = ctypes.c_int
    lib.coo_nnz.argtypes = [i64p, i64p, ctypes.c_int64, ctypes.c_int64]
    lib.coo_nnz.restype = ctypes.c_int64
    lib.coo_to_csr.argtypes = [i64p, i64p, ctypes.c_int64, ctypes.c_int64,
                               ctypes.c_int64, i64p, i64p, i64p]
    lib.coo_to_csr.restype = ctypes.c_int
    lib.rcb_partition.argtypes = [f64p, ctypes.c_int64, ctypes.c_int,
                                  ctypes.c_int, i32p]
    lib.rcb_partition.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


# -- high-level wrappers ------------------------------------------------------


def coo_to_csr(rows: np.ndarray, cols: np.ndarray, n_rows: int,
               n_cols: int):
    """Sort-based symbolic fillComplete.  Returns (indptr, indices,
    slot_of_coo) or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    nnz = lib.coo_nnz(rows, cols, len(rows), n_cols)
    indptr = np.zeros(n_rows + 1, dtype=np.int64)
    indices = np.zeros(nnz, dtype=np.int64)
    slot = np.zeros(len(rows), dtype=np.int64)
    rc = lib.coo_to_csr(rows, cols, len(rows), n_rows, n_cols, indptr,
                        indices, slot)
    if rc != 0:
        return None
    return indptr, indices, slot


def read_medit(path: str):
    """Native .mesh parse.  Returns dict of arrays or None."""
    lib = get_lib()
    if lib is None:
        return None
    sizes = np.zeros(5, dtype=np.int64)
    if lib.medit_sizes(path.encode(), sizes) != 0:
        return None
    dim, nv, ne, nt, ntet = (int(s) for s in sizes)
    verts = np.zeros((max(nv, 1), 3))
    vflags = np.zeros(max(nv, 1), dtype=np.int32)
    edges = np.zeros((max(ne, 1), 2), dtype=np.int64)
    eflags = np.zeros(max(ne, 1), dtype=np.int32)
    tris = np.zeros((max(nt, 1), 3), dtype=np.int64)
    tflags = np.zeros(max(nt, 1), dtype=np.int32)
    tets = np.zeros((max(ntet, 1), 4), dtype=np.int64)
    tetflags = np.zeros(max(ntet, 1), dtype=np.int32)
    rc = lib.medit_read(path.encode(), verts.ravel(), vflags, edges.ravel(),
                        eflags, tris.ravel(), tflags, tets.ravel(), tetflags)
    if rc != 0:
        return None
    return {
        "dim": dim,
        "vertices": verts[:nv], "vertex_flags": vflags[:nv],
        "edges": edges[:ne], "edge_flags": eflags[:ne],
        "triangles": tris[:nt], "triangle_flags": tflags[:nt],
        "tetrahedra": tets[:ntet], "tetrahedra_flags": tetflags[:ntet],
    }


def rcb(centroids: np.ndarray, n_parts: int):
    lib = get_lib()
    if lib is None:
        return None
    c = np.ascontiguousarray(centroids, dtype=np.float64)
    out = np.zeros(len(c), dtype=np.int32)
    if lib.rcb_partition(c.ravel(), len(c), c.shape[1], n_parts, out) != 0:
        return None
    return out
