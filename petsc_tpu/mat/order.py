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
    raise KeyError(f"unknown ordering '{kind}'")


def bandwidth(A):
    """Matrix bandwidth (for RCM effectiveness checks)."""
    indptr, indices, _ = A.getValuesCSR() if hasattr(A, "getValuesCSR") \
        else (A.indptr, A.indices, None)
    rows = np.repeat(np.arange(len(indptr) - 1), np.diff(indptr))
    return int(np.abs(np.asarray(indices) - rows).max()) if len(rows) else 0
