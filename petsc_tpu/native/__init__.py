"""Native (C++) host kernels with automatic build + pure-Python fallback.

The reference's symbolic/graph phases are all native C (SURVEY §2.11);
here they live in graphops.cpp, compiled on first import with the system
toolchain and loaded via ctypes. Every entry point has a numpy fallback so
the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libgraphops.so")
_SRC = os.path.join(_HERE, "graphops.cpp")

_lib = None


def _build():
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def lib():
    """The loaded shared library, building it if needed; None if no
    toolchain is available."""
    global _lib
    if _lib is not None:
        return _lib if _lib is not False else None
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        L = ctypes.CDLL(_SO)
        i64 = ctypes.c_int64
        p64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        pf8 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        L.mis_aggregate.restype = i64
        L.mis_aggregate.argtypes = [i64, p64, p64, p64, p64, p64]
        L.fix_aggregates.restype = None
        L.fix_aggregates.argtypes = [i64, p64, p64, p64, i64, p64]
        L.ilu0.restype = i64
        L.ilu0.argtypes = [i64, p64, p64, pf8]
        L.levels.restype = i64
        L.levels.argtypes = [i64, p64, p64, i64, p64]
        L.rcm.restype = None
        L.rcm.argtypes = [i64, p64, p64, p64]
        L.greedy_color.restype = i64
        L.greedy_color.argtypes = [i64, p64, p64, p64]
        L.hem_aggregate.restype = i64
        L.hem_aggregate.argtypes = [i64, p64, p64, ctypes.c_void_p, i64, p64]
        L.iluk_symbolic.restype = i64
        L.iluk_symbolic.argtypes = [i64, p64, p64, i64,
                                    ctypes.c_void_p, ctypes.c_void_p]
        _lib = L
        return L
    except Exception:
        _lib = False
        return None


def _c64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def mis_aggregate(indptr, indices, perm):
    """(agg, nagg, roots) — native when available."""
    L = lib()
    n = len(indptr) - 1
    if L is None:
        return None
    agg = np.empty(n, dtype=np.int64)
    roots = np.empty(max(n, 1), dtype=np.int64)
    nagg = L.mis_aggregate(n, _c64(indptr), _c64(indices), _c64(perm),
                           agg, roots)
    return agg, int(nagg), roots[:nagg].copy()


def fix_aggregates(indptr, indices, roots, agg):
    L = lib()
    if L is None:
        return None
    agg = np.ascontiguousarray(agg, dtype=np.int64)
    L.fix_aggregates(len(indptr) - 1, _c64(indptr), _c64(indices),
                     _c64(roots), len(roots), agg)
    return agg


def ilu0_inplace(indptr, indices, vals):
    """Returns factored vals (copy) or None (no native lib); raises on
    zero pivot like the reference's MatLUFactorNumeric checks."""
    L = lib()
    if L is None:
        return None
    v = np.array(vals, dtype=np.float64)
    err = L.ilu0(len(indptr) - 1, _c64(indptr), _c64(indices), v)
    if err != 0:
        from ..sys.error import Error
        raise Error(f"ILU(0): zero pivot in row {-err - 1}")
    return v


def levels(indptr, indices, lower):
    L = lib()
    if L is None:
        return None
    n = len(indptr) - 1
    lev = np.zeros(n, dtype=np.int64)
    nlev = L.levels(n, _c64(indptr), _c64(indices), 1 if lower else 0, lev)
    return lev, int(nlev)


def rcm(indptr, indices):
    L = lib()
    if L is None:
        return None
    n = len(indptr) - 1
    perm = np.empty(n, dtype=np.int64)
    L.rcm(n, _c64(indptr), _c64(indices), perm)
    return perm


def greedy_color(indptr, indices):
    L = lib()
    if L is None:
        return None
    n = len(indptr) - 1
    colors = np.empty(n, dtype=np.int64)
    L.greedy_color(n, _c64(indptr), _c64(indices), colors)
    return colors


def iluk_symbolic(indptr, indices, k):
    """Level-of-fill ILU(k) pattern; returns (indptr, indices) or None."""
    L = lib()
    if L is None:
        return None
    n = len(indptr) - 1
    ip = _c64(indptr)
    ix = _c64(indices)
    nnz = L.iluk_symbolic(n, ip, ix, int(k), None, None)
    out_ip = np.empty(n + 1, dtype=np.int64)
    out_ix = np.empty(int(nnz), dtype=np.int64)
    L.iluk_symbolic(n, ip, ix, int(k),
                    out_ip.ctypes.data_as(ctypes.c_void_p),
                    out_ix.ctypes.data_as(ctypes.c_void_p))
    return out_ip, out_ix


def hem_aggregate(indptr, indices, weights, rounds):
    """Heavy-edge-matching aggregation; returns (agg, nagg) or None."""
    L = lib()
    if L is None:
        return None
    n = len(indptr) - 1
    agg = np.empty(n, dtype=np.int64)
    w = None if weights is None else np.ascontiguousarray(
        weights, dtype=np.float64)
    nagg = L.hem_aggregate(
        n, _c64(indptr), _c64(indices),
        w.ctypes.data_as(ctypes.c_void_p) if w is not None else None,
        int(rounds), agg)
    return agg, int(nagg)
