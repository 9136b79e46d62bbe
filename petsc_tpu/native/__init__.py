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
    base = [cxx, "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    try:
        subprocess.run(base[:1] + ["-fopenmp"] + base[1:],
                       check=True, capture_output=True)
    except subprocess.CalledProcessError:
        subprocess.run(base, check=True, capture_output=True)


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
        _setup_r3(L)  # round-3 GAMG setup kernels (int32/int64 pairs)
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


def hem_match(indptr, indices, weights, rounds, threshold):
    """Exact serial HEM (hem.c MatCoarsenApply_HEM_private semantics):
    edge-sorted matching with max-edge gating, BC pooling, and per-round
    contraction + unit-diagonal rescale. Input graph values must already
    be the SCALED strength graph (MatCreateGraph scale=TRUE: diag == 1).
    Returns (agg, nagg) or None."""
    L = lib()
    if L is None:
        return None
    if not hasattr(L, "_hem_ready"):
        i64 = ctypes.c_int64
        p64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        pf8 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        L.hem_match.restype = i64
        L.hem_match.argtypes = [i64, p64, p64, pf8, i64, ctypes.c_double,
                                p64]
        L._hem_ready = True
    n = len(indptr) - 1
    agg = np.empty(n, dtype=np.int64)
    nagg = L.hem_match(n, _c64(indptr), _c64(indices), _cf8(weights),
                       int(rounds), float(threshold), agg)
    return agg, int(nagg)


def _cf8(a):
    return np.ascontiguousarray(a, dtype=np.float64)


def _setup_r3(L):
    """Declare the round-3 templated kernels (int64 + int32 entry pairs)
    once per loaded library."""
    if getattr(L, "_r3_ready", False):
        return
    i64, i32 = ctypes.c_int64, ctypes.c_int32
    p64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    pf8 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    f8 = ctypes.c_double
    L.csr_transpose.restype = None
    L.csr_transpose.argtypes = [i64, i64, p64, p64, pf8, p64, p64, pf8]
    L.csr_transpose_i32.restype = None
    L.csr_transpose_i32.argtypes = [i32, i32, p32, p32, pf8, p32, p32, pf8]
    L.spgemm_count.restype = i64
    L.spgemm_count.argtypes = [i64, i64, p64, p64, p64, p64, p64]
    L.spgemm_count_i32.restype = i64
    L.spgemm_count_i32.argtypes = [i32, i32, p32, p32, p32, p32, p64]
    L.spgemm_fill.restype = None
    L.spgemm_fill.argtypes = [i64, i64, p64, p64, pf8, p64, p64, pf8,
                              p64, p64, pf8]
    L.spgemm_fill_i32.restype = None
    L.spgemm_fill_i32.argtypes = [i32, i32, p32, p32, pf8, p32, p32, pf8,
                                  p64, p32, pf8]
    L.strength_sym.restype = i64
    L.strength_sym.argtypes = [i64, p64, p64, pf8, f8, p64, p64, pf8]
    L.strength_sym_i32.restype = i64
    L.strength_sym_i32.argtypes = [i32, p32, p32, pf8, f8, p32, p32, pf8]
    L.mis2_aggregate.restype = i64
    L.mis2_aggregate.argtypes = [i64, p64, p64, p64, p64, p64]
    L.mis2_aggregate_i32.restype = i64
    L.mis2_aggregate_i32.argtypes = [i32, p32, p32, p64, p64, p64]
    L.csr_matvec.restype = None
    L.csr_matvec.argtypes = [i64, p64, p64, pf8, pf8, pf8]
    L.csr_matvec_i32.restype = None
    L.csr_matvec_i32.argtypes = [i32, p32, p32, pf8, pf8, pf8]
    L._r3_ready = True


def _idx(A):
    """(indptr, indices, is32) without copies when already int32/int64."""
    ip, ix = A.indptr, A.indices
    if ip.dtype == np.int32 and ix.dtype == np.int32:
        return (np.ascontiguousarray(ip), np.ascontiguousarray(ix), True)
    return (_c64(ip), _c64(ix), False)


def spgemm(A, B):
    """C = A @ B for scipy CSRs via the native Gustavson kernel
    (OpenMP row-parallel; matmatmult.c / mpimatmatmult.c numeric role).
    Returns a scipy CSR with sorted column indices, or None (no lib)."""
    L = lib()
    if L is None:
        return None
    _setup_r3(L)
    import scipy.sparse as sp
    n, _ = A.shape
    m = B.shape[1]
    Ai, Aj, a32 = _idx(A)
    Bi, Bj, b32 = _idx(B)
    Ax, Bx = _cf8(A.data), _cf8(B.data)
    Ci = np.empty(n + 1, dtype=np.int64)
    if a32 and b32:
        nnz = L.spgemm_count_i32(n, m, Ai, Aj, Bi, Bj, Ci)
        Cj = np.empty(nnz, dtype=np.int32)
        Cx = np.empty(nnz, dtype=np.float64)
        L.spgemm_fill_i32(n, m, Ai, Aj, Ax, Bi, Bj, Bx, Ci, Cj, Cx)
    else:
        Ai, Aj = _c64(Ai), _c64(Aj)
        Bi, Bj = _c64(Bi), _c64(Bj)
        nnz = L.spgemm_count(n, m, Ai, Aj, Bi, Bj, Ci)
        Cj = np.empty(nnz, dtype=np.int64)
        Cx = np.empty(nnz, dtype=np.float64)
        L.spgemm_fill(n, m, Ai, Aj, Ax, Bi, Bj, Bx, Ci, Cj, Cx)
    C = sp.csr_matrix((Cx, Cj, Ci if not (a32 and b32)
                       else Ci.astype(np.int32)), shape=(n, m))
    C.has_sorted_indices = True
    return C


def csr_transpose(A):
    """A^T as scipy CSR (counting-sort transpose) or None."""
    L = lib()
    if L is None:
        return None
    _setup_r3(L)
    import scipy.sparse as sp
    n, m = A.shape
    Ai, Aj, is32 = _idx(A)
    Ax = _cf8(A.data)
    it = np.int32 if is32 else np.int64
    Bi = np.empty(m + 1, dtype=it)
    Bj = np.empty(A.nnz, dtype=it)
    Bx = np.empty(A.nnz, dtype=np.float64)
    (L.csr_transpose_i32 if is32 else L.csr_transpose)(
        n, m, Ai, Aj, Ax, Bi, Bj, Bx)
    B = sp.csr_matrix((Bx, Bj, Bi), shape=(m, n))
    B.has_sorted_indices = True
    return B


def strength_sym(A, threshold):
    """G = |A| + |A|^T with threshold filtering (agg.c:752 bs=1 path) as
    scipy CSR, or None."""
    L = lib()
    if L is None:
        return None
    _setup_r3(L)
    import scipy.sparse as sp
    n = A.shape[0]
    Ai, Aj, is32 = _idx(A)
    Ax = _cf8(A.data)
    it = np.int32 if is32 else np.int64
    Gi = np.empty(n + 1, dtype=it)
    Gj = np.empty(2 * A.nnz, dtype=it)       # worst-case |A|+|A|^T bound
    Gx = np.empty(2 * A.nnz, dtype=np.float64)
    nnz = (L.strength_sym_i32 if is32 else L.strength_sym)(
        n, Ai, Aj, Ax, float(threshold), Gi, Gj, Gx)
    G = sp.csr_matrix((Gx[:nnz], Gj[:nnz], Gi), shape=(n, n))
    G.has_sorted_indices = True
    return G


def mis2_aggregate(indptr, indices, perm):
    """MIS aggregation on the implicit squared graph — same greedy
    semantics as mis_aggregate(square_graph(G), perm) without forming
    G^2. Returns (agg, nagg, roots) or None."""
    L = lib()
    if L is None:
        return None
    _setup_r3(L)
    n = len(indptr) - 1
    agg = np.empty(n, dtype=np.int64)
    roots = np.empty(max(n, 1), dtype=np.int64)
    pm = _c64(perm)
    if indptr.dtype == np.int32 and indices.dtype == np.int32:
        nagg = L.mis2_aggregate_i32(n, np.ascontiguousarray(indptr),
                                    np.ascontiguousarray(indices), pm,
                                    agg, roots)
    else:
        nagg = L.mis2_aggregate(n, _c64(indptr), _c64(indices), pm,
                                agg, roots)
    return agg, int(nagg), roots[:nagg].copy()


def csr_matvec_op(A):
    """Returns y=A@x closure over the native row-parallel matvec (for the
    host Arnoldi esteig), or None."""
    L = lib()
    if L is None:
        return None
    _setup_r3(L)
    n = A.shape[0]
    Ai, Aj, is32 = _idx(A)
    Ax = _cf8(A.data)
    fn = L.csr_matvec_i32 if is32 else L.csr_matvec

    def mv(x):
        y = np.empty(n, dtype=np.float64)
        fn(n, Ai, Aj, Ax, _cf8(x), y)
        return y

    return mv
