"""Trust-region Krylov methods and BiCGStab(L).

Behavioral references: src/ksp/ksp/impls/cg/stcg/stcg.c (Steihaug-Toint
truncated CG), cg/nash/nash.c, cg/gltr/gltr.c, qcg/qcg.c, bcgsl/bcgsl.c
(Sleijpen-Fokkema BiCGstab(ell)). Pure-function contract as elsewhere:
fn(A, B, b, x0, rtol, abstol, divtol, cfg) -> SolveResult, whole solve in
one lax.while_loop.

TPU notes: the trust-region methods carry the boundary test inside the
compiled loop (predicated with lax selects, no host branches); bcgsl keeps
the ell+1 residual/search bases as stacked (ell+1, n) arrays with the BiCG
and MR sweeps unrolled over the STATIC ell, so the polynomial least-squares
step is one tiny dense solve the MXU handles inline.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.reduce import fdot
from jax import lax

from ..sys.error import KSPConvergedReason as KR
from .common import (KSPConfig, NONE, SolveResult, check_converged,
                     empty_history, finalize_reason, initial_residual,
                     norm2)
from .impls_basic import _dp


def _tr_radius(cfg: KSPConfig):
    for k, v in cfg.extra:
        if k == "radius":
            return float(v)
    return 0.0   # PETSc default: radius 0 => plain (truncated) CG


def solve_stcg(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """Steihaug-Toint truncated preconditioned CG (stcg.c): CG on the
    quadratic model, stopping on the trust-region boundary ||x||_M <= Delta
    (M the preconditioner norm) or at negative curvature, where the step is
    extended exactly to the boundary."""
    radius = _tr_radius(cfg)
    big = radius <= 0.0          # no trust region: plain CG semantics
    Delta = jnp.asarray(radius if radius > 0 else 1e300, b.dtype)

    r0 = initial_residual(A, b, x0, cfg)
    x = jnp.zeros_like(b)        # TR solves always start from 0 (stcg.c)
    r = r0
    z = B.mult(r)
    p = z
    rz = fdot(r, z)
    dp0 = _dp(cfg.normtype, r0, z)
    hist = empty_history(cfg, b.dtype).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0
    # M-norm bookkeeping: ||x||_M^2 via recurrences (stcg.c norm_d updates)
    xMx = jnp.zeros((), b.dtype)
    xMp = jnp.zeros((), b.dtype)
    pMp = rz                      # p = z => p'Mp = r'z with M = B^{-1}

    def boundary_tau(xMx, xMp, pMp):
        """tau >= 0 with ||x + tau p||_M = Delta."""
        disc = jnp.maximum(xMp * xMp + pMp * (Delta * Delta - xMx), 0.0)
        return (-xMp + jnp.sqrt(disc)) / jnp.where(pMp == 0, 1.0, pMp)

    def body(s):
        x, r, z, p, rz, xMx, xMp, pMp, rnorm, its, reason, hist = s
        Ap = A.mult(p)
        kappa = fdot(p, Ap)
        alpha_cg = rz / jnp.where(kappa == 0, 1.0, kappa)
        # step that would be taken; boundary / negative-curvature handling
        xMx_new = xMx + 2 * alpha_cg * xMp + alpha_cg ** 2 * pMp
        hit = (~jnp.asarray(big)) & ((kappa <= 0)
                                     | (xMx_new > Delta * Delta))
        tau = boundary_tau(xMx, xMp, pMp)
        alpha = jnp.where(hit, tau, alpha_cg)
        x_ = x + alpha * p
        r_ = r - alpha * Ap
        z_ = B.mult(r_)
        rz_ = fdot(r_, z_)
        beta = rz_ / jnp.where(rz == 0, 1.0, rz)
        p_ = z_ + beta * p
        xMx_ = xMx + 2 * alpha * xMp + alpha ** 2 * pMp
        xMp_ = beta * (xMp + alpha * pMp)
        pMp_ = rz_ + beta * beta * pMp
        dp = _dp(cfg.normtype, r_, z_)
        its = its + 1
        hist_ = hist.at[its].set(dp)
        conv = check_converged(dp, ttol, abstol, dtol_bound) \
            if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
        conv = jnp.where(hit, int(KR.CONVERGED_STEP_LENGTH), conv)
        return (x_, r_, z_, p_, rz_, xMx_, xMp_, pMp_, dp, its,
                jnp.asarray(conv, jnp.int32), hist_)

    def cond(s):
        return (s[-2] == 0) & (s[-3] < cfg.max_it)

    s0 = (x, r, z, p, rz, xMx, xMp, pMp, dp0, jnp.array(0),
          jnp.zeros((), jnp.int32), hist)
    x, r, z, p, rz, xMx, xMp, pMp, rnorm, its, reason, hist = \
        lax.while_loop(cond, body, s0)
    reason = finalize_reason(reason, its, cfg)
    return SolveResult(x, its, rnorm, reason, hist, dp0)


def solve_bcgsl(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """BiCGstab(ell) (bcgsl.c, Sleijpen-Fokkema): ell BiCG sweeps followed
    by a degree-ell minimum-residual polynomial update. ell is static
    (-ksp_bcgsl_ell, default 2) so both sweeps unroll at trace time."""
    ell = 2
    for k, v in cfg.extra:
        if k == "ell":
            ell = int(v)

    r0v = initial_residual(A, b, x0, cfg)
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    n = b.shape[0]
    dt = b.dtype
    r_first = B.mult(r0v)
    rt = r_first
    dp0 = norm2(r_first)
    hist = empty_history(cfg, dt).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0

    R = jnp.zeros((ell + 1, n), dt).at[0].set(r_first)
    U = jnp.zeros((ell + 1, n), dt)

    def K(v):
        return B.mult(A.mult(v))

    def body(s):
        x, R, U, rho0, alpha, omega, rnorm, its, reason, hist = s
        rho0 = -omega * rho0
        # ---- BiCG part (unrolled over static ell) ----
        for j in range(ell):
            rho1 = fdot(rt, R[j])
            beta = alpha * rho1 / jnp.where(rho0 == 0, 1.0, rho0)
            rho0 = rho1
            U = U.at[: j + 1].set(R[: j + 1] - beta * U[: j + 1])
            U = U.at[j + 1].set(K(U[j]))
            gamma = fdot(rt, U[j + 1])
            alpha = rho0 / jnp.where(gamma == 0, 1.0, gamma)
            R = R.at[: j + 1].set(R[: j + 1] - alpha * U[1: j + 2])
            R = R.at[j + 1].set(K(R[j]))
            x = x + alpha * U[0]
        # ---- MR part: min ||R0 - Z g||, Z = [R1..Rell] ----
        Z = R[1:]                              # (ell, n)
        G = Z @ Z.conj().T                     # tiny Gram, MXU inline
        rhs = Z @ R[0].conj()
        g = jnp.linalg.solve(G + 1e-300 * jnp.eye(ell, dtype=dt), rhs)
        omega = g[ell - 1]
        # r_{j} = K r_{j-1}: r0 - sum g_j r_j = r0 - K sum g_j r_{j-1}
        # => the solution correction uses the SHIFTED basis R[0..ell-1]
        x = x + jnp.tensordot(g, R[:ell], axes=1)
        Rnew0 = R[0] - jnp.tensordot(g, Z, axes=1)
        Unew0 = U[0] - jnp.tensordot(g, U[1:], axes=1)
        R = R.at[0].set(Rnew0)
        U = U.at[0].set(Unew0)
        dp = norm2(Rnew0)
        its = its + 1
        hist_ = hist.at[its].set(dp)
        conv = check_converged(dp, ttol, abstol, dtol_bound) \
            if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
        conv = jnp.where(jnp.abs(omega) == 0,
                         int(KR.DIVERGED_BREAKDOWN), conv)
        return (x, R, U, rho0, alpha, omega, dp, its,
                jnp.asarray(conv, jnp.int32), hist_)

    def cond(s):
        return (s[-2] == 0) & (s[-3] < cfg.max_it)

    s0 = (x, R, U, jnp.ones((), dt), jnp.zeros((), dt), jnp.ones((), dt),
          dp0, jnp.array(0), jnp.zeros((), jnp.int32), hist)
    x, R, U, rho0, alpha, omega, rnorm, its, reason, hist = \
        lax.while_loop(cond, body, s0)
    reason = finalize_reason(reason, its, cfg)
    return SolveResult(x, its, rnorm, reason, hist, dp0)


def solve_lcd(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """Left conjugate directions (lcd.c, Yuan/Golub/Dai): restart cycles
    of k steps; each new direction p = r is A-biorthogonalized against the
    cycle's stored directions using ONLY the cached q_j = B A p_j images
    (one matvec per iteration). TPU shape: the j<=it orthogonalization
    loop becomes one masked (k+1, n) matvec pair — P @ q and the rank-1
    downdates — so the inner step is fully vectorized; the cycle runs as a
    lax.fori with predicated no-ops after convergence."""
    k = 30
    for key, v in cfg.extra:
        if key == "restart":
            k = int(v)

    r0 = initial_residual(A, b, x0, cfg)
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    n = b.shape[0]
    dt = b.dtype
    r = B.mult(r0)
    dp0 = norm2(r)
    hist = empty_history(cfg, dt).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0

    def cycle(st):
        x, r, p0, rnorm, its, reason = st
        P = jnp.zeros((k + 1, n), dt).at[0].set(p0)
        Q = jnp.zeros((k + 1, n), dt).at[0].set(B.mult(A.mult(p0)))
        pq = jnp.ones((k + 1,), dt).at[0].set(fdot(P[0], Q[0]))

        def inner(it, s):
            x, r, P, Q, pq, rnorm, its, reason = s
            live = reason == 0
            num = fdot(P[it], r)
            den = jnp.where(pq[it] == 0, 1.0, pq[it])
            alfa = jnp.where(live, num / den, 0.0)
            x = x + alfa * P[it]
            r = r - alfa * Q[it]
            dp = norm2(r)
            its = jnp.where(live, its + 1, its)
            conv = check_converged(dp, ttol, abstol, dtol_bound) \
                if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
            reason = jnp.where(live, jnp.asarray(conv, jnp.int32), reason)
            # new direction: A-biorthogonalize r against stored P's
            pn = r
            qn = B.mult(A.mult(pn))
            mask = (jnp.arange(k + 1) <= it).astype(dt)
            coeffs = mask * (P @ qn) / jnp.where(pq == 0, 1.0, pq)
            pn = pn - coeffs @ P
            qn = qn - coeffs @ Q
            P = P.at[it + 1].set(jnp.where(live, pn, P[it + 1]))
            Q = Q.at[it + 1].set(jnp.where(live, qn, Q[it + 1]))
            pq = pq.at[it + 1].set(jnp.where(live, fdot(pn, qn),
                                             pq[it + 1]))
            rnorm = jnp.where(live, dp, rnorm)
            return (x, r, P, Q, pq, rnorm, its, reason)

        x, r, P, Q, pq, rnorm, its, reason = lax.fori_loop(
            0, k, inner, (x, r, P, Q, pq, rnorm, its, reason))
        # restart from the freshest direction (lcd.c: P[0] <- P[it])
        return (x, r, r, rnorm, its, reason)

    def cond(st):
        return (st[-1] == 0) & (st[-2] < cfg.max_it)

    st = (x, r, r, dp0, jnp.array(0), jnp.zeros((), jnp.int32))
    x, r, p0, rnorm, its, reason = lax.while_loop(cond, cycle, st)
    reason = finalize_reason(reason, its, cfg)
    hist = hist.at[jnp.minimum(its, hist.shape[0] - 1)].set(rnorm) \
        if hist.shape[0] else hist
    return SolveResult(x, its, rnorm, reason, hist, dp0)
