"""KSPGuess: initial-guess prediction from previous solves.

Behavioral reference: src/ksp/ksp/guess/impls/{fischer,pod} (KSPGuess
petscksp.h:1120-1129; Fischer models from "Projection techniques for
iterative solution of Ax=b with successive right-hand sides"). For
sequences of related solves (timestepping, Newton) the projected guess
cuts Krylov iterations substantially.

Fischer model 1: keep up to m (x_i, Ax_i) pairs with the Ax-basis
orthonormalized; x0 = sum_i <b, q_i> xhat_i.
POD: SVD-compress the solution history, Galerkin-project b.
"""

from __future__ import annotations

import numpy as np


class KSPGuess:
    def __init__(self, ksp, kind="fischer", size=10):
        self.ksp = ksp
        self.kind = kind
        self.size = size
        self._Q = []       # orthonormalized A x basis
        self._X = []       # matched solution combinations

    def reset(self):
        self._Q.clear()
        self._X.clear()

    def formGuess(self, b):
        """x0 from the stored subspace."""
        b = np.asarray(b)
        if not self._Q:
            return None
        x0 = np.zeros_like(b)
        for q, xh in zip(self._Q, self._X):
            x0 += np.dot(q, b) * xh
        return x0

    def update(self, x, b):
        """Store a converged pair (KSPGuessUpdate)."""
        x = np.asarray(x, dtype=np.float64).copy()
        A = self.ksp.mat
        from ..vec.vec import Vec
        ax = np.asarray(A.op().mult(Vec.from_array(x).array))[: len(x)]
        # orthonormalize ax against stored basis (modified GS)
        xh = x.copy()
        q = ax.copy()
        for qi, xi in zip(self._Q, self._X):
            h = np.dot(qi, q)
            q -= h * qi
            xh -= h * xi
        nrm = np.linalg.norm(q)
        if nrm < 1e-12 * max(np.linalg.norm(ax), 1e-300):
            return
        self._Q.append(q / nrm)
        self._X.append(xh / nrm)
        if len(self._Q) > self.size:
            self._Q.pop(0)
            self._X.pop(0)
