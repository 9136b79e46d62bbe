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
        self._Q = []       # fischer: orthonormalized A x basis
        self._X = []       # fischer: matched solution combinations
        self._snaps = []   # pod: solution snapshot window
        self._asnaps = []  # pod: cached A @ snapshot (one matvec/update)
        self._phi = None   # pod: POD basis (n, k)
        self._red = None   # pod: reduced operator Phi^T A Phi (k, k)

    def reset(self):
        self._Q.clear()
        self._X.clear()
        self._snaps.clear()
        self._asnaps.clear()
        self._phi = None
        self._red = None

    def formGuess(self, b):
        """x0 from the stored subspace (padded to b's layout length)."""
        b = np.asarray(b)
        if self.kind == "pod":
            if self._phi is None:
                return None
            # Galerkin projection onto the POD basis (pod.c KSPGuessFormGuess):
            # solve (Phi^T A Phi) y = Phi^T b, x0 = Phi y
            n = self._phi.shape[0]
            rhs = self._phi.T @ b[:n]
            try:
                y = np.linalg.solve(self._red, rhs)
            except np.linalg.LinAlgError:
                y, *_ = np.linalg.lstsq(self._red, rhs, rcond=None)
            return np.pad(self._phi @ y, (0, len(b) - n))
        if not self._Q:
            return None
        x0 = np.zeros_like(b)
        n = len(self._X[0])
        for q, xh in zip(self._Q, self._X):
            x0[:n] += np.dot(q, b[:n]) * xh
        return x0

    def _apply_A(self, v):
        """A @ v honoring the operator's padded, possibly sharded layout
        (a plain Vec.from_array would be single-shard/unpadded and break
        mpiaij shard_map operators)."""
        import jax
        import jax.numpy as jnp
        A = self.ksp.mat
        npad = A.row_layout.Npad
        vv = np.zeros(npad)
        vv[: len(v)] = v
        arr = jnp.asarray(vv)
        comm = getattr(A, "comm", None)
        if comm is not None and getattr(comm, "nshards", 1) > 1:
            arr = jax.device_put(arr, comm.row_sharding())
        return np.asarray(A.op().mult(arr))[: len(v)]

    def _pod_recompute(self):
        """SVD-compress the snapshot window into a POD basis and build
        the reduced operator (pod.c KSPGuessUpdate_POD: correlation-matrix
        eigendecomposition; the thin SVD of the snapshot matrix is the
        same subspace). A@Phi comes from the CACHED per-snapshot matvecs:
        Phi = X V diag(1/s) so A Phi = (A X) V diag(1/s) — one new matvec
        per update, not k per rebuild."""
        X = np.stack(self._snaps, axis=1)              # (n, m)
        AX = np.stack(self._asnaps, axis=1)            # (n, m)
        U, s, Vt = np.linalg.svd(X, full_matrices=False)
        k = max(int(np.sum(s > 1e-10 * max(s[0], 1e-300))), 1)
        self._phi = U[:, :k]
        aphi = AX @ (Vt.T[:, :k] / s[:k])              # A X V S^-1
        self._red = self._phi.T @ aphi                 # Phi^T A Phi

    def update(self, x, b):
        """Store a converged pair (KSPGuessUpdate)."""
        x = np.asarray(x, dtype=np.float64).copy()
        if self.kind == "pod":
            self._snaps.append(x)
            self._asnaps.append(self._apply_A(x))
            if len(self._snaps) > self.size:
                self._snaps.pop(0)
                self._asnaps.pop(0)
            self._pod_recompute()
            return
        ax = self._apply_A(x)
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
