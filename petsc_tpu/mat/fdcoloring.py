"""MatFDColoring: finite-difference Jacobians compressed by coloring
(reference src/mat/matfd/fdmatrix.c + graphops/color). Standalone class
form of the machinery SNES uses internally."""

from __future__ import annotations

import numpy as np

from .aij import MatAIJ


class MatFDColoring:
    def __init__(self, pattern: MatAIJ, ctype="greedy"):
        import scipy.sparse as sp
        S = pattern.to_scipy()
        self._S = sp.csr_matrix(
            (np.ones_like(S.data), S.indices, S.indptr), shape=S.shape)
        colors = None
        if ctype == "greedy":
            C = (self._S.T @ self._S).tocsr()
            from .. import native
            colors = native.greedy_color(C.indptr.astype(np.int64),
                                         C.indices.astype(np.int64))
        if colors is None:
            from .coloring import MatColoring
            mc = MatColoring(pattern, ctype)
            colors = mc.apply()
        self.colors = colors
        self.ncolors = int(colors.max()) + 1

    def apply(self, fn, x, f0=None, comm=None):
        """J approx via ncolors residual evaluations; fn(x_np)->np array."""
        import scipy.sparse as sp
        x = np.asarray(x, dtype=np.float64)
        f0 = fn(x) if f0 is None else np.asarray(f0)
        eps = np.sqrt(np.finfo(float).eps)
        Sc = self._S.tocsc()
        data = np.zeros_like(Sc.data)
        for c in range(self.ncolors):
            cols = np.nonzero(self.colors == c)[0]
            h = eps * np.maximum(np.abs(x[cols]), 1.0)
            xp = x.copy()
            xp[cols] += h
            df = fn(xp) - f0
            for ci, col in enumerate(cols):
                lo, hi = Sc.indptr[col], Sc.indptr[col + 1]
                data[lo:hi] = df[Sc.indices[lo:hi]] / h[ci]
        J = sp.csc_matrix((data, Sc.indices, Sc.indptr),
                          shape=Sc.shape).tocsr()
        return MatAIJ.from_scipy(J, comm=comm)
