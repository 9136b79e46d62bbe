"""MatSBAIJ: symmetric (block) storage — only the upper triangle is kept.

Behavioral reference: src/mat/impls/sbaij/seq/sbaij.c (MatCreateSeqSBAIJ,
MatSetValues_SeqSBAIJ: entries below the diagonal are ignored/mirrored;
MatMult_SeqSBAIJ computes U x + U^T x with the diagonal counted once;
MatSetOption SYMMETRIC/HERMITIAN flags, matrix.c:730).

TPU-first note: SBAIJ's purpose in the reference is halving HOST memory
and bandwidth on CPU SpMV. On TPU the stencil/ELL device layouts are
already the bandwidth-optimal form, so we keep the HOST representation
upper-triangular (the API contract: lower-triangle insertions are folded
into the upper triangle) and expand to the ordinary symmetric device
layout at assembly. API users get SBAIJ semantics, the device gets the
fastest kernel — nothing is paid for the symmetry bookkeeping inside jit.
"""

from __future__ import annotations

import numpy as np

from ..sys.error import Error
from .aij import MatAIJ
from .mat import InsertMode


class MatSBAIJ(MatAIJ):
    """Symmetric AIJ: stores/accepts the upper triangle, multiplies as the
    full symmetric operator."""

    def __init__(self, comm=None, bs=1, **kw):
        super().__init__(comm, **kw)
        self._bs_sym = int(bs)
        self.is_symmetric_storage = True

    @classmethod
    def create(cls, size, bs=1, comm=None):
        A = cls(comm, bs=bs)
        A.setSizes((size, size) if np.isscalar(size) else size)
        return A

    def setValues(self, rows, cols, values, addv=InsertMode.INSERT_VALUES):
        """Lower-triangle entries are folded to (j,i) — sbaij.c ignores
        them when bs-block-lower; folding keeps ADD_VALUES assembly from
        symmetric element loops exact."""
        rows = np.atleast_1d(np.asarray(rows, dtype=np.int64))
        cols = np.atleast_1d(np.asarray(cols, dtype=np.int64))
        vals = np.asarray(values, dtype=np.float64).reshape(len(rows),
                                                            len(cols))
        ii = np.repeat(rows, len(cols))
        jj = np.tile(cols, len(rows))
        vv = vals.reshape(-1)
        lower = ii > jj
        ii2 = np.where(lower, jj, ii)
        jj2 = np.where(lower, ii, jj)
        if addv == InsertMode.ADD_VALUES:
            # symmetric element matrices stage (i,j) AND (j,i): keep only
            # the upper copy so the fold doesn't double the value
            keep = ~lower
            ii2, jj2, vv = ii2[keep], jj2[keep], vv[keep]
        # stage directly (bypass the dense-block reshape of the parent)
        keep2 = (ii2 >= 0) & (jj2 >= 0)
        if self._st_mode is not None and self._st_mode != addv:
            raise Error("cannot mix INSERT_VALUES and ADD_VALUES")
        self._st_mode = addv
        self._sti.append(ii2[keep2])
        self._stj.append(jj2[keep2])
        self._stv.append(vv[keep2])

    def setValuesCSR(self, indptr, indices, values):
        """Accepts either an upper-triangular CSR or a full symmetric CSR
        (the lower part is dropped)."""
        import scipy.sparse as sp
        n = len(indptr) - 1
        A = sp.csr_matrix((np.asarray(values, dtype=np.float64),
                           np.asarray(indices, dtype=np.int64),
                           np.asarray(indptr, dtype=np.int64)),
                          shape=(n, n))
        U = sp.triu(A, k=0).tocsr()
        super().setValuesCSR(U.indptr, U.indices, U.data)

    @classmethod
    def from_scipy(cls, A, comm=None, bs=1):
        import scipy.sparse as sp
        M = cls(comm, bs=bs)
        M.setSizes(A.shape)
        U = sp.triu(A.tocsr(), k=0).tocsr()
        MatAIJ.setValuesCSR(M, U.indptr, U.indices, U.data)
        M.assemble()
        return M

    def assemble(self, *a):
        """Fold staged upper-triangular CSR into the FULL symmetric CSR for
        the device (U + U^T - D), keeping the upper copy for host queries
        via upper_csr()."""
        super().assemble()   # builds upper-only CSR in _indptr/_indices
        if self._indptr is None:
            return self
        import scipy.sparse as sp
        n = self.row_layout.N
        U = sp.csr_matrix((self._vals, self._indices, self._indptr),
                          shape=(n, n))
        self._upper = (U.indptr.copy(), U.indices.copy(), U.data.copy())
        D = sp.diags(U.diagonal())
        F = (U + U.T - D).tocsr()
        MatAIJ.setValuesCSR(self, F.indptr, F.indices, F.data)
        return MatAIJ.assemble(self)

    def upper_csr(self):
        """The stored (upper-triangular) factor-ready triple."""
        return self._upper

    def isSymmetric(self, tol=0.0):
        return True
