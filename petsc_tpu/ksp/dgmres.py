"""KSPDGMRES: GMRES with adaptive eigen-deflated restarts.

Behavioral reference: src/ksp/ksp/impls/gmres/dgmres/dgmres.c (at each
restart, extract the smallest-magnitude Ritz pairs of the preconditioned
operator from the Arnoldi Hessenberg; build the deflation operator

    M_D^{-1} = I + U (|lambda_max| T^{-1} - I) (U^T U)^{-1} U^T,
    T = U^T (B A) U

and compose it with the base preconditioner for subsequent cycles —
shifting the deflated eigenvalues near |lambda_max| so the restart
stagnation of small eigenvalues disappears).

TPU contract (round-2 rework of the round-1 host loop): each restart
CYCLE — the CGS2 Arnoldi(m) on the deflated operator, the solution
update, the true residual, and the deflation-basis refresh (new Ritz
vectors, re-orthonormalization, T/X Gram matrices) — runs as compiled
device programs with the Krylov basis V and deflation basis U resident
in HBM; only the (m x m) nonsymmetric eigenproblem and the (k x k)
inverses run on host (no TPU lowering exists for either, and both are
tiny). Deflation arrays are padded to kmax so program shapes are static.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..sys.error import KSPConvergedReason as KR
from ..ops.reduce import fgemv, fgemvT

_progs: dict = {}


def _get_progs(A_meta, B_meta, n, m, kpad):
    key = (A_meta, B_meta, n, m, kpad)
    if key in _progs:
        return _progs[key]
    from ..ops import operator

    def defl(U, Tinv, Xinv, lam_max, v):
        # M_D^{-1} v with zero-padded inactive columns (they contribute 0)
        w = Xinv @ jnp.sum(U * v[:, None], axis=0)
        return v + jnp.sum(U * (lam_max * (Tinv @ w) - w)[None, :], axis=1)

    def arnoldi(Ad, Bd, U, Tinv, Xinv, lam_max, r):
        A = operator.bind(A_meta, Ad)
        B = operator.bind(B_meta, Bd)
        beta = jnp.sqrt(jnp.sum(r * r))
        safe = jnp.where(beta > 0, beta, 1.0)
        V = jnp.zeros((m + 1, n), r.dtype).at[0].set(r / safe)
        H = jnp.zeros((m + 1, m), r.dtype)

        def body(j, carry):
            V, H = carry
            w = B.mult(A.mult(defl(U, Tinv, Xinv, lam_max, V[j])))
            mask = (jnp.arange(m + 1) <= j).astype(w.dtype)
            h1 = mask * fgemv(V, w)
            w = w - fgemvT(h1, V)
            h2 = mask * fgemv(V, w)
            w = w - fgemvT(h2, V)
            hb = jnp.sqrt(jnp.sum(w * w))
            H = jax.lax.dynamic_update_slice(H, (h1 + h2)[:, None], (0, j))
            H = H.at[j + 1, j].set(hb)
            sf = jnp.where(hb > 1e-30, hb, 1.0)
            V = V.at[j + 1].set(jnp.where(hb > 1e-30, w / sf, 0.0))
            return V, H

        V, H = jax.lax.fori_loop(0, m, body, (V, H))
        return V, H, beta

    def update(Ad, Bd, U, Tinv, Xinv, lam_max, V, y, x, b):
        A = operator.bind(A_meta, Ad)
        B = operator.bind(B_meta, Bd)
        x = x + defl(U, Tinv, Xinv, lam_max, fgemvT(y, V[:m]))
        r = B.mult(b - A.mult(x))
        return x, r, jnp.sqrt(jnp.sum(r * r))

    def basis(Ad, Bd, V, Yr, U):
        """Append Unew = V[:m]^T Yr to U, re-orthonormalize by static MGS
        (zero columns stay zero), and form AU, T = U^T AU, X = U^T U."""
        A = operator.bind(A_meta, Ad)
        B = operator.bind(B_meta, Bd)
        Unew = jax.vmap(lambda yc: fgemvT(yc, V[:m]),
                        in_axes=1, out_axes=1)(Yr)    # (n, kpad)
        U = U + Unew                                   # slots disjoint
        cols = []
        for i in range(kpad):                          # static MGS
            u = U[:, i]
            for cprev in cols:
                u = u - jnp.sum(cprev * u) * cprev
            nrm = jnp.sqrt(jnp.sum(u * u))
            u = jnp.where(nrm > 1e-12, u / jnp.where(nrm > 1e-12, nrm, 1.0),
                          jnp.zeros_like(u))
            cols.append(u)
        U = jnp.stack(cols, axis=1)
        AUcols = [B.mult(A.mult(U[:, i])) for i in range(kpad)]
        AU = jnp.stack(AUcols, axis=1)
        T = jnp.stack([jnp.sum(U[:, i:i + 1] * AU, axis=0)
                       for i in range(kpad)])          # (kpad, kpad)
        X = jnp.stack([jnp.sum(U[:, i:i + 1] * U, axis=0)
                       for i in range(kpad)])
        return U, T, X

    out = (jax.jit(arnoldi), jax.jit(update), jax.jit(basis))
    if len(_progs) >= 8:          # bound the compiled-executable cache
        _progs.pop(next(iter(_progs)))
    _progs[key] = out
    return out


def solve_dgmres_host(ksp, b_np, x0_np):
    """Deflated-restart loop; returns (x, its, rnorm, reason, history,
    rnorm0). b/x0 are padded numpy arrays; the heavy state (V, U, x, r)
    stays on device between host decisions."""
    m = int(ksp._params.get("restart", 30))
    kmax = int(ksp._params.get("max_eigen",
                               ksp.opt("get_int", "ksp_dgmres_max_eigen",
                                       None) or 8))
    kextract = int(ksp.opt("get_int", "ksp_dgmres_eigen", None) or 1)
    kpad = kmax + 2                     # room for a conjugate partner
    n = len(b_np)
    Ad = ksp.mat.device_data()
    Bd = ksp.pc.device_data()
    arnoldi, update, basis = _get_progs(ksp.mat.meta, ksp.pc.meta,
                                        n, m, kpad)
    from ..ops import operator
    A = operator.bind(ksp.mat.meta, Ad)
    B = operator.bind(ksp.pc.meta, Bd)

    x = jnp.asarray(x0_np, dtype=jnp.float64)
    b = jnp.asarray(b_np, dtype=jnp.float64)
    U = jnp.zeros((n, kpad))
    Tinv = jnp.zeros((kpad, kpad))
    Xinv = jnp.zeros((kpad, kpad))
    lam_max = jnp.asarray(1.0)
    kcount = 0

    r = B.mult(b - A.mult(x))
    rnorm0 = float(jnp.sqrt(jnp.sum(r * r)))
    ttol = max(ksp.rtol * rnorm0, ksp.abstol)
    hist = [rnorm0]
    its = 0
    reason = 0
    rnorm = rnorm0
    if rnorm0 <= ksp.abstol:
        return (np.asarray(x), 0, rnorm0, int(KR.CONVERGED_ATOL), hist,
                rnorm0)

    while its < ksp.max_it and reason == 0:
        V, H_dev, beta_dev = arnoldi(Ad, Bd, U, Tinv, Xinv, lam_max, r)
        H = np.asarray(H_dev)                    # (m+1, m): tiny
        beta = float(beta_dev)
        sub = np.abs(np.diag(H[1:, :]))
        brk = np.nonzero(sub < 1e-14)[0]
        mj = min(int(brk[0]) + 1 if len(brk) else m, ksp.max_it - its)
        its += mj
        e1 = np.zeros(mj + 1)
        e1[0] = beta
        y, *_ = np.linalg.lstsq(H[: mj + 1, :mj], e1, rcond=None)
        ypad = np.zeros(m)
        ypad[:mj] = y
        x, r, rn_dev = update(Ad, Bd, U, Tinv, Xinv, lam_max, V,
                              jnp.asarray(ypad), x, b)
        rnorm = float(rn_dev)
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
        # ---- deflation update: smallest-|lambda| Ritz pairs (host eig
        # of the tiny Hessenberg; everything sized n stays on device) ----
        if kcount < kmax and mj >= 2:
            Hs = H[:mj, :mj]
            lam, Y = np.linalg.eig(Hs)
            order = np.argsort(np.abs(lam))
            lam_max = jnp.asarray(float(np.max(np.abs(lam))))
            take = []
            for idx in order:
                if len(take) >= kextract:
                    break
                take.append(idx)
                if abs(lam[idx].imag) > 1e-12 and len(take) < kextract + 1:
                    conj = int(np.argmin(np.abs(lam - np.conj(lam[idx]))))
                    if conj not in take:
                        take.append(conj)
            take = take[: kpad - kcount]
            Yr = np.zeros((m, kpad))
            Yr[:mj, kcount:kcount + len(take)] = np.real(Y[:, take])
            U, T_dev, X_dev = basis(Ad, Bd, V, jnp.asarray(Yr), U)
            kcount = min(kcount + len(take), kpad)
            T = np.array(T_dev)
            X = np.array(X_dev)
            # inactive slots -> identity so the inverses exist and the
            # deflation stays block-isolated (zero columns contribute 0)
            act = (np.abs(np.diag(X)) > 1e-12)
            act[kcount:] = False
            for M_ in (T, X):
                M_[~act, :] = 0.0
                M_[:, ~act] = 0.0
                M_[np.ix_(~act, ~act)] = np.eye(int((~act).sum()))
            try:
                Tinv = jnp.asarray(np.linalg.inv(T))
                Xinv = jnp.asarray(np.linalg.inv(X))
                # zero the identity placeholders back out of the apply
                mask = np.outer(act, act).astype(float)
                Tinv = Tinv * mask
                Xinv = Xinv * mask
            except np.linalg.LinAlgError:
                U = jnp.zeros((n, kpad))
                Tinv = jnp.zeros((kpad, kpad))
                Xinv = jnp.zeros((kpad, kpad))
                kcount = 0
    if reason == 0:
        reason = int(KR.CONVERGED_ITS if ksp._static_cfg().converged_maxits
                     else KR.DIVERGED_ITS)
    return np.asarray(x), its, rnorm, reason, hist, rnorm0
