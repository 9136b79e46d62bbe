"""Factorizations: ILU(0), ICC(0), sparse LU (host symbolic+numeric, device
triangular solves).

Behavioral reference: MatILUFactorSymbolic_SeqAIJ (aijfact.c:1536),
MatLUFactorNumeric_SeqAIJ (aijfact.c:216), MatSolve_SeqAIJ (aijfact.c:2460).
The TPU split: factorization is a host 'symbolic+numeric' setup phase (numpy
here; the csrcore C++ extension accelerates it), while the solve is the
level-scheduled device kernel in ops.trisolve. Full LU with fill uses
scipy's SuperLU as the factor engine (PETSc's MatGetFactor external-solver
pattern, e.g. src/mat/impls/aij/mpi/mumps/mumps.c) but solves on-device.
"""

from __future__ import annotations

import numpy as np


def ilu0(indptr, indices, vals):
    """In-pattern incomplete LU, natural ordering, no shift.

    Returns (L_strict, U_strict, dinv) as CSR triples / array:
    A ≈ (I + L) (D + U_strict) with dinv = 1/diag(D).
    """
    m = len(indptr) - 1
    from .. import native
    a_native = native.ilu0_inplace(np.asarray(indptr, dtype=np.int64),
                                   np.asarray(indices, dtype=np.int64),
                                   vals)
    if a_native is not None:
        Li, Lj, Lv, Ui, Uj, Uv = _split_lu(indptr, indices, a_native, m)
        rows = np.repeat(np.arange(m), np.diff(indptr))
        d = a_native[np.asarray(indices) == rows]
        return (Li, Lj, Lv), (Ui, Uj, Uv), 1.0 / d
    a = np.array(vals, dtype=np.float64)
    # per-row position maps for O(1) (i,j) lookup
    colpos = [dict(zip(indices[indptr[i]:indptr[i + 1]],
                       range(indptr[i], indptr[i + 1]))) for i in range(m)]
    diag_pos = np.empty(m, dtype=np.int64)
    for i in range(m):
        dp = colpos[i].get(i, -1)
        if dp < 0:
            raise ValueError(f"ILU(0): missing diagonal in row {i}")
        diag_pos[i] = dp
    for i in range(m):
        row_lo, row_hi = indptr[i], indptr[i + 1]
        cols_i = indices[row_lo:row_hi]
        for p in range(row_lo, row_hi):
            k = indices[p]
            if k >= i:
                break
            akk = a[diag_pos[k]]
            lik = a[p] / akk
            a[p] = lik
            # subtract lik * U-part of row k restricted to row i's pattern
            kp = colpos[k]
            for q in range(diag_pos[k] + 1, indptr[k + 1]):
                j = indices[q]
                pj = colpos[i].get(j)
                if pj is not None:
                    a[pj] -= lik * a[q]
    # split
    d = a[diag_pos]
    if np.any(d == 0):
        from ..sys.error import Error
        raise Error("ILU(0): zero pivot")
    Li, Lj, Lv, Ui, Uj, Uv = _split_lu(indptr, indices, a, m)
    return (Li, Lj, Lv), (Ui, Uj, Uv), 1.0 / d


def iluk(indptr, indices, vals, k):
    """ILU(k): native level-of-fill symbolic pattern (graphops.cpp
    iluk_symbolic, the MatILUFactorSymbolic aijfact.c:1536 role) followed
    by the in-pattern numeric factorization on the extended structure."""
    if k <= 0:
        return ilu0(indptr, indices, vals)
    from .. import native
    out = native.iluk_symbolic(np.asarray(indptr, dtype=np.int64),
                               np.asarray(indices, dtype=np.int64), k)
    if out is None:   # no native lib: fall back to ILU(0)
        return ilu0(indptr, indices, vals)
    ip2, ix2 = out
    m = len(indptr) - 1
    # scatter original values into the extended pattern (fill slots = 0);
    # rows of both patterns are column-sorted, so positions come from a
    # per-row searchsorted
    ext_vals = np.zeros(len(ix2))
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    for i in range(m):
        lo, hi = indptr[i], indptr[i + 1]
        elo, ehi = ip2[i], ip2[i + 1]
        pos = elo + np.searchsorted(ix2[elo:ehi], indices[lo:hi])
        ext_vals[pos] = vals[lo:hi]
    return ilu0(ip2, ix2, ext_vals)


def _split_lu(indptr, indices, a, m):
    rows = np.repeat(np.arange(m), np.diff(indptr))
    lower = indices < rows
    upper = indices > rows
    Li = np.zeros(m + 1, dtype=np.int64)
    np.add.at(Li, rows[lower] + 1, 1)
    Li = np.cumsum(Li)
    Ui = np.zeros(m + 1, dtype=np.int64)
    np.add.at(Ui, rows[upper] + 1, 1)
    Ui = np.cumsum(Ui)
    return Li, indices[lower], a[lower], Ui, indices[upper], a[upper]


def splu_factors(A_scipy):
    """Sparse LU with fill via SuperLU; returns (L_strict, U_strict, dinv,
    perm_r, perm_c) ready for device trisolve: A = Pr^T (I+L)(D+U) Pc^T."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    lu = spla.splu(A_scipy.tocsc(),
                   permc_spec="COLAMD",
                   options=dict(SymmetricMode=False))
    L = lu.L.tocsr()  # unit lower incl diag
    U = lu.U.tocsr()  # upper incl diag
    d = U.diagonal()
    Ls = sp.tril(L, k=-1).tocsr()
    Us = sp.triu(U, k=1).tocsr()
    return ((Ls.indptr, Ls.indices, Ls.data),
            (Us.indptr, Us.indices, Us.data),
            1.0 / d, lu.perm_r, lu.perm_c)


def spilu_factors(A_scipy, drop_tol=1e-4, fill_factor=10.0):
    """Incomplete LU with drop tolerance (the ILUdt variant PETSc exposes
    through external packages / -pc_factor_drop_tolerance). SuperLU ILU
    keeps entries above drop_tol up to fill_factor growth; device apply is
    the same permuted trisolve as full LU."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    lu = spla.spilu(A_scipy.tocsc(), drop_tol=float(drop_tol),
                    fill_factor=float(fill_factor))
    L = lu.L.tocsr()
    U = lu.U.tocsr()
    d = U.diagonal()
    Ls = sp.tril(L, k=-1).tocsr()
    Us = sp.triu(U, k=1).tocsr()
    return ((Ls.indptr, Ls.indices, Ls.data),
            (Us.indptr, Us.indices, Us.data),
            1.0 / d, lu.perm_r, lu.perm_c)


def icc0(indptr, indices, vals):
    """ICC(0) via ILU(0) on the symmetric pattern: returns factors usable as
    L D L^T. For SPD inputs this equals PETSc's ICC(0) up to roundoff."""
    return ilu0(indptr, indices, vals)
