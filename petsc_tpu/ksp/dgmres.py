"""KSPDGMRES: GMRES with adaptive eigen-deflated restarts.

Behavioral reference: src/ksp/ksp/impls/gmres/dgmres/dgmres.c (at each
restart, extract the smallest-magnitude Ritz pairs of the preconditioned
operator from the Arnoldi Hessenberg; build the deflation operator

    M_D^{-1} = I + U (|lambda_max| T^{-1} - I) (U^T U)^{-1} U^T,
    T = U^T (B A) U

and compose it with the base preconditioner for subsequent cycles —
shifting the deflated eigenvalues near |lambda_max| so the restart
stagnation of small eigenvalues disappears).

Host-orchestrated by design: the Ritz extraction is a NONSYMMETRIC dense
eigenproblem, which has no TPU lowering — but it is (m x m), tiny. So the
cycle is: device matvecs / host orthogonalization Arnoldi, host eig on H,
deflation matrices as numpy, repeat. The driver plugs into KSP.solve via
the host_driven registry flag (the same escape hatch mixed-precision
uses); DGMRES targets hard stagnating systems where the per-cycle host
work is noise against the matvec count it saves.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..sys.error import KSPConvergedReason as KR


def solve_dgmres_host(ksp, b_np, x0_np):
    """Runs the deflated-restart loop; returns (x, its, rnorm, reason,
    history, rnorm0). b/x0 are padded numpy arrays."""
    from ..ops import operator
    A = operator.bind(ksp.mat.meta, ksp.mat.device_data())
    B = operator.bind(ksp.pc.meta, ksp.pc.device_data())
    m = int(ksp._params.get("restart", 30))
    kmax = int(ksp._params.get("max_eigen",
                               ksp.opt("get_int", "ksp_dgmres_max_eigen",
                                       None) or 8))
    kextract = int(ksp.opt("get_int", "ksp_dgmres_eigen", None) or 1)

    n = len(b_np)
    x = np.asarray(x0_np, dtype=np.float64).copy()
    U = np.zeros((n, 0))
    Xinv = None          # (U^T U)^{-1}
    Tinv = None
    lam_max = 1.0

    def mv(v):
        return np.array(A.mult(jnp.asarray(v)))      # writable copy

    def pc(v):
        return np.array(B.mult(jnp.asarray(v)))

    def defl(v):
        """M_D^{-1} v (identity while no deflation vectors)."""
        if U.shape[1] == 0:
            return v
        w = Xinv @ (U.T @ v)
        return v + U @ (lam_max * (Tinv @ w) - w)

    def op(v):
        return pc(mv(defl(v)))      # right-deflated, left base PC

    r = pc(b_np - mv(x))
    rnorm0 = float(np.linalg.norm(r))
    ttol = max(ksp.rtol * rnorm0, ksp.abstol)
    hist = [rnorm0]
    its = 0
    reason = 0
    rnorm = rnorm0
    if rnorm0 <= ksp.abstol:
        return x, 0, rnorm0, int(KR.CONVERGED_ATOL), hist, rnorm0

    while its < ksp.max_it and reason == 0:
        # ---- Arnoldi(m) on the deflated operator (host MGS) ----
        V = np.zeros((m + 1, n))
        H = np.zeros((m + 1, m))
        beta = float(np.linalg.norm(r))
        V[0] = r / beta
        j_used = m
        for j in range(m):
            w = op(V[j])
            for i in range(j + 1):
                H[i, j] = float(np.dot(V[i], w))
                w -= H[i, j] * V[i]
            H[j + 1, j] = float(np.linalg.norm(w))
            its += 1
            if H[j + 1, j] < 1e-14 or its >= ksp.max_it:
                j_used = j + 1
                break
            V[j + 1] = w / H[j + 1, j]
        mj = j_used
        e1 = np.zeros(mj + 1)
        e1[0] = beta
        y, *_ = np.linalg.lstsq(H[: mj + 1, :mj], e1, rcond=None)
        x = x + defl(V[:mj].T @ y)
        r = pc(b_np - mv(x))
        rnorm = float(np.linalg.norm(r))
        hist.append(rnorm)
        if rnorm <= ttol:
            reason = int(KR.CONVERGED_ATOL if rnorm < ksp.abstol
                         else KR.CONVERGED_RTOL)
            break
        if not np.isfinite(rnorm):
            reason = int(KR.DIVERGED_NANORINF)
            break
        if rnorm > ksp.divtol * rnorm0:
            reason = int(KR.DIVERGED_DTOL)
            break
        # ---- deflation update: smallest-|lambda| Ritz pairs ----
        if U.shape[1] < kmax and mj >= 2:
            Hs = H[:mj, :mj]
            lam, Y = np.linalg.eig(Hs)
            order = np.argsort(np.abs(lam))
            lam_max = float(np.max(np.abs(lam)))
            take = []
            for idx in order:
                if len(take) >= kextract:
                    break
                take.append(idx)
                # keep conjugate partner for complex pairs
                if abs(lam[idx].imag) > 1e-12 and len(take) < kextract + 1:
                    conj = np.argmin(np.abs(lam - np.conj(lam[idx])))
                    if conj not in take:
                        take.append(conj)
            Yr = np.real(Y[:, take])
            Unew = V[:mj].T @ Yr
            U = np.hstack([U, Unew])
            # re-orthonormalize the deflation basis for conditioning
            U, _ = np.linalg.qr(U)
            AU = np.stack([pc(mv(U[:, k])) for k in range(U.shape[1])],
                          axis=1)
            T = U.T @ AU
            try:
                Tinv = np.linalg.inv(T)
                Xinv = np.linalg.inv(U.T @ U)
            except np.linalg.LinAlgError:
                U = U[:, :0]
                Tinv = Xinv = None
    if reason == 0:
        reason = int(KR.CONVERGED_ITS if ksp._static_cfg().converged_maxits
                     else KR.DIVERGED_ITS)
    return x, its, rnorm, reason, hist, rnorm0
