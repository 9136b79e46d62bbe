"""MatOrdering: fill/bandwidth-reducing row/column orderings.

Behavioral reference: src/mat/graphops/order (MatGetOrdering; impls
natural, rcm genrcm.c, nd SPARSPAK nested dissection). RCM runs in the
native C++ component (petsc_tpu/native/graphops.cpp) with a scipy
fallback; nd maps to scipy's COLAMD-ish permutation via SuperLU.
"""

from __future__ import annotations

import numpy as np


def get_ordering(A, kind="rcm"):
    """Returns (rperm, cperm) index arrays (MatGetOrdering contract —
    symmetric orderings return the same array twice)."""
    indptr, indices, _ = A.getValuesCSR() if hasattr(A, "getValuesCSR") \
        else (A.indptr, A.indices, None)
    n = len(indptr) - 1
    if kind == "natural":
        p = np.arange(n, dtype=np.int64)
        return p, p
    if kind == "rcm":
        from .. import native
        p = native.rcm(np.asarray(indptr, dtype=np.int64),
                       np.asarray(indices, dtype=np.int64))
        if p is None:
            import scipy.sparse as sp
            from scipy.sparse.csgraph import reverse_cuthill_mckee
            S = sp.csr_matrix(
                (np.ones(len(indices)), indices, indptr), shape=(n, n))
            p = np.asarray(reverse_cuthill_mckee(S, symmetric_mode=True),
                           dtype=np.int64)
        return p, p
    if kind == "nd":
        # nested-dissection-flavored fill reducer via SuperLU's COLAMD
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla
        S = sp.csr_matrix((np.ones(len(indices)), indices, indptr),
                          shape=(n, n))
        lu = spla.splu(S.tocsc() + sp.eye(n), permc_spec="COLAMD")
        return (np.asarray(lu.perm_r, dtype=np.int64),
                np.asarray(lu.perm_c, dtype=np.int64))
    if kind == "spectral":
        # Fiedler-vector ordering (spectral.c): sort by the second
        # eigenvector of the graph Laplacian of the symmetrized pattern
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla
        S = sp.csr_matrix((np.ones(len(indices)), indices, indptr),
                          shape=(n, n))
        S = ((S + S.T) > 0).astype(np.float64)
        L = sp.diags(np.asarray(S.sum(axis=1)).ravel()) - S
        k = min(2, n - 1)
        try:
            _, V = spla.eigsh(L + 1e-8 * sp.eye(n), k=k, sigma=0,
                              which="LM")
            fied = V[:, -1]
        except Exception:
            fied = np.arange(n, dtype=np.float64)
        p = np.asarray(np.argsort(fied), dtype=np.int64)
        return p, p
    if kind == "1wd" or kind == "wd":
        # one-way dissection ~ RCM halves recursion; serve with RCM
        return get_ordering(A, "rcm")
    if kind in ("amd", "qmd"):
        # approximate/quotient minimum degree: SuperLU MMD fill reducer
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla
        S = sp.csr_matrix((np.ones(len(indices)), indices, indptr),
                          shape=(n, n))
        lu = spla.splu(S.tocsc() + sp.eye(n), permc_spec="MMD_AT_PLUS_A")
        return (np.asarray(lu.perm_c, dtype=np.int64),
                np.asarray(lu.perm_c, dtype=np.int64))
    raise KeyError(f"unknown ordering '{kind}'")


def bandwidth(A):
    """Matrix bandwidth (for RCM effectiveness checks)."""
    indptr, indices, _ = A.getValuesCSR() if hasattr(A, "getValuesCSR") \
        else (A.indptr, A.indices, None)
    rows = np.repeat(np.arange(len(indptr) - 1), np.diff(indptr))
    return int(np.abs(np.asarray(indices) - rows).max()) if len(rows) else 0
