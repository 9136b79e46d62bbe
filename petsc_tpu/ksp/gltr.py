"""GLTR: Gould-Lucidi-Roma-Toint generalized Lanczos trust region.

Behavioral reference: src/ksp/ksp/impls/cg/gltr/gltr.c — preconditioned CG
that simultaneously accumulates the Lanczos tridiagonal T from the CG
coefficients; while the iterate stays inside the trust region ||x||_M <= Δ
it IS plain STCG, but on hitting the boundary (or negative curvature) the
Lanczos recurrence continues and the solve finishes by minimizing the
model IN THE KRYLOV SUBSPACE subject to the boundary:

    min_h  1/2 h^T T h + ||r0||_M e1^T h   s.t. ||h|| <= Δ

via a Moré-Sorensen Newton iteration on λ with tridiagonal LDL^T factors,
including the HARD CASE (λ = -λ_min(T), boundary attained by adding a
multiple of the minimum eigenvector — gltr.c's LAPACKstebz + perturbation
path). x = Q h is reconstructed by replaying the CG recurrence (the
reference also re-generates the Lanczos vectors rather than storing them).

TPU design: one compiled program. Fixed-size coefficient buffers (TMAX),
the Newton iteration and the Sturm-sequence bisection for λ_min(T) are
fori_loops over masked tridiagonal sweeps, the replay is a second fori_loop
of the same A/B applications. No host round-trips.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.reduce import fdot
from jax import lax

from ..sys.error import KSPConvergedReason as KR
from .common import (KSPConfig, NONE, SolveResult, check_converged,
                     empty_history, finalize_reason, initial_residual, norm2)
from .impls_basic import _dp


def _nz(v):
    return jnp.where(v == 0, jnp.ones((), v.dtype), v)


def _tr_params(cfg: KSPConfig):
    radius = 0.0
    for k, v in cfg.extra:
        if k == "radius":
            radius = float(v)
    return radius


def _ldl_sweep(d, e, lam, t_size, TMAX, rhs0):
    """Masked LDL^T of (T + lam I) with T = tridiag(e, d, e): returns
    (c, h, wsq, negct) where c are the pivots, h solves (T+lam I) h =
    rhs0*e1, wsq = ||L_chol^{-1} h||^2, negct = #negative pivots (Sturm)."""
    dt = d.dtype

    def body(i, s):
        c, u, negct = s
        active = i < t_size
        ei = jnp.where(i > 0, e[i], 0.0)
        cim1 = jnp.where(i > 0, c[jnp.maximum(i - 1, 0)], 1.0)
        ci = d[i] + lam - ei * ei / _nz(cim1)
        rhs_i = jnp.where(i == 0, rhs0, 0.0)
        li = ei / _nz(cim1)
        uim1 = jnp.where(i > 0, u[jnp.maximum(i - 1, 0)], 0.0)
        ui = rhs_i - li * uim1
        c = c.at[i].set(jnp.where(active, ci, 1.0))
        u = u.at[i].set(jnp.where(active, ui, 0.0))
        negct = negct + jnp.where(active & (ci < 0), 1, 0)
        return (c, u, negct)

    c0 = jnp.ones((TMAX,), dt)
    u0 = jnp.zeros((TMAX,), dt)
    c, u, negct = lax.fori_loop(0, TMAX, body, (c0, u0, jnp.array(0)))
    # back substitution: h_i = u_i/c_i - l_{i+1} h_{i+1}
    def back(k, h):
        i = TMAX - 1 - k
        active = i < t_size
        lip1 = jnp.where(i + 1 < t_size, e[jnp.minimum(i + 1, TMAX - 1)]
                         / _nz(c[i]), 0.0)
        hip1 = jnp.where(i + 1 < TMAX, h[jnp.minimum(i + 1, TMAX - 1)], 0.0)
        hi = u[i] / _nz(c[i]) - lip1 * hip1
        return h.at[i].set(jnp.where(active, hi, 0.0))

    h = lax.fori_loop(0, TMAX, back, jnp.zeros((TMAX,), dt))
    wsq = jnp.sum(jnp.where(jnp.arange(TMAX) < t_size,
                            u * u / _nz(c), 0.0))
    return c, h, wsq, negct


def _lambda_min(d, e, t_size, TMAX, iters=60):
    """Smallest eigenvalue of T by Sturm-count bisection (stebz role)."""
    mask = jnp.arange(TMAX) < t_size
    absd = jnp.where(mask, d, 0.0)
    abse = jnp.where(mask, jnp.abs(e), 0.0)
    rad = abse + jnp.concatenate([abse[1:], jnp.zeros((1,), d.dtype)])
    lo = jnp.min(jnp.where(mask, d - rad, jnp.inf))
    hi = jnp.max(jnp.where(mask, d + rad, -jnp.inf))

    def body(_, s):
        lo, hi = s
        mid = 0.5 * (lo + hi)
        _, _, _, negct = _ldl_sweep(d, e, -mid, t_size, TMAX, 0.0)
        below = negct >= 1           # exists eigenvalue < mid
        return (jnp.where(below, lo, mid), jnp.where(below, mid, hi))

    lo, hi = lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi)


def _fwd_wsq(c, e, h, t_size, TMAX):
    """||Lhat^{-1} h||^2 for the Moré-Sorensen Newton step, with Lhat the
    Cholesky factor of the current LDL^T (l_i = e_i/c_{i-1})."""

    def body(i, s):
        u, wsq = s
        active = i < t_size
        ei = jnp.where(i > 0, e[i], 0.0)
        cim1 = jnp.where(i > 0, c[jnp.maximum(i - 1, 0)], 1.0)
        uim1 = jnp.where(i > 0, u[jnp.maximum(i - 1, 0)], 0.0)
        ui = h[i] - (ei / _nz(cim1)) * uim1
        u = u.at[i].set(jnp.where(active, ui, 0.0))
        wsq = wsq + jnp.where(active, ui * ui / _nz(c[i]), 0.0)
        return (u, wsq)

    _, wsq = lax.fori_loop(0, TMAX, body,
                           (jnp.zeros((TMAX,), h.dtype),
                            jnp.zeros((), h.dtype)))
    return wsq


def _solve_tridiag_tr(d, e, t_size, TMAX, rnorm0, Delta, dt):
    """Moré-Sorensen on the tridiagonal subproblem; returns h (TMAX,).
    Stationarity of min 1/2 h^T T h - ||r0|| e1^T h: (T+lam I) h = ||r0|| e1.
    (T built with POSITIVE offdiagonals; the diag(+-1) similarity is undone
    by the sign alternation in the replay.) Safeguarded Newton: a [lo, hi]
    bracket maintained from the sign of ||h(lam)|| - Delta; the hard case
    (gltr.c LAPACKstebz + perturbation path) adds tau*v along the minimum
    eigenvector when the boundary cannot be attained otherwise."""
    rhs0 = rnorm0
    lmin = _lambda_min(d, e, t_size, TMAX)
    lam_floor = jnp.maximum(0.0, -lmin) * (1 + 1e-10) + 1e-12

    _, h0, _, _ = _ldl_sweep(d, e, 0.0, t_size, TMAX, rhs0)
    interior_ok = (lmin > 0) & (norm2(h0) <= Delta)

    # upper bound: ||h(lam)|| <= gamma/lam  =>  lam <= gamma/Delta + floor
    hi0 = lam_floor + rnorm0 / _nz(Delta) + 1.0

    def newton(_, s):
        lam, lo, hi = s
        c, h, _, _ = _ldl_sweep(d, e, lam, t_size, TMAX, rhs0)
        hn = norm2(h)
        wsq = _fwd_wsq(c, e, h, t_size, TMAX)
        too_big = hn > Delta                  # lam too small
        lo2 = jnp.where(too_big, lam, lo)
        hi2 = jnp.where(too_big, hi, lam)
        step = (hn * hn / _nz(wsq)) * (hn - Delta) / _nz(Delta)
        lam_n = lam + step
        inside = (lam_n > lo2) & (lam_n < hi2) & jnp.isfinite(lam_n)
        lam2 = jnp.where(inside, lam_n, 0.5 * (lo2 + hi2))
        return (lam2, lo2, hi2)

    lam, _, _ = lax.fori_loop(0, 60, newton,
                              (lam_floor + 0.5 * (hi0 - lam_floor),
                               lam_floor, hi0))
    _, h, _, _ = _ldl_sweep(d, e, lam, t_size, TMAX, rhs0)
    hn = norm2(h)

    # hard case: ||h|| < Delta even at lam ~ -lmin (only possible when the
    # gradient is (numerically) orthogonal to the minimum eigenvector and
    # lmin <= 0): add tau*v with v from inverse iteration at lmin
    at_floor = lam <= lam_floor * (1 + 1e-6) + 1e-12
    hard = (hn < (1 - 1e-6) * Delta) & at_floor & (lmin <= 0)
    shift = -(lmin - 1e-8 * jnp.maximum(jnp.abs(lmin), 1.0))
    _, v1, _, _ = _ldl_sweep(d, e, shift, t_size, TMAX, 1.0)
    v = v1 / _nz(norm2(v1))
    hv = fdot(h, v)
    disc = jnp.maximum(hv * hv + (Delta * Delta - hn * hn), 0.0)
    tau = -hv + jnp.sqrt(disc)
    h = jnp.where(hard & ~interior_ok, h + tau * v, h)
    h = jnp.where(interior_ok, h0, h)
    return h


def solve_gltr(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    radius = _tr_params(cfg)
    big = radius <= 0.0
    Delta = jnp.asarray(radius if radius > 0 else 1e300, b.dtype)
    dt = b.dtype
    LANCZOS_EXTRA = 20                      # gltr.c max_lanczos_its default
    TMAX = int(min(cfg.max_it + LANCZOS_EXTRA, 160))

    r0 = initial_residual(A, b, x0, cfg)
    x = jnp.zeros_like(b)                   # TR solves start from 0
    z0 = B.mult(r0)
    rz0 = fdot(r0, z0)
    dp0 = _dp(cfg.normtype, r0, z0)
    hist = empty_history(cfg, dt).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0
    rnorm0_M = jnp.sqrt(jnp.abs(rz0))       # ||r0||_{B} for the e1 rhs

    # ---- phase 1+2: CG with Lanczos accumulation --------------------
    # alpha/beta buffers reconstruct T: d_0 = 1/a_0; d_i = 1/a_i + b_i/a_{i-1}
    # e_i = sqrt(b_i)/|a_{i-1}|   (standard CG<->Lanczos relations)
    def body(s):
        (x, r, z, p, rz, xMx, xMp, pMp, alphas, betas, k, its, boundary,
         lanczos_left, rnorm, reason, hist) = s
        Ap = A.mult(p)
        kappa = fdot(p, Ap)
        alpha = rz / _nz(kappa)
        xMx_new = xMx + 2 * alpha * xMp + alpha ** 2 * pMp
        hit_now = (~jnp.asarray(big)) & ((kappa <= 0)
                                         | (xMx_new > Delta * Delta))
        boundary2 = boundary | hit_now
        # interior CG update only while not past the boundary
        upd = ~boundary2
        x2 = jnp.where(upd, x + alpha * p, x)
        r2 = r - alpha * Ap                 # Lanczos continues regardless
        z2 = B.mult(r2)
        rz2 = fdot(r2, z2)
        beta = rz2 / _nz(rz)
        p2 = z2 + beta * p
        alphas2 = alphas.at[k].set(alpha)
        betas2 = betas.at[k].set(beta)
        xMx2 = jnp.where(upd, xMx_new, xMx)
        xMp2 = jnp.where(upd, beta * (xMp + alpha * pMp), xMp)
        pMp2 = rz2 + beta * beta * pMp
        dp = _dp(cfg.normtype, r2, z2)
        its2 = its + jnp.where(boundary, 0, 1)   # lanczos its not counted
        hist2 = hist.at[jnp.minimum(its2, cfg.max_it)].set(
            jnp.where(boundary, hist[jnp.minimum(its2, cfg.max_it)], dp))
        conv = check_converged(dp, ttol, abstol, dtol_bound) \
            if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
        conv = jnp.where(boundary2, 0, conv)     # finish via subproblem
        lanczos_left2 = jnp.where(boundary2, lanczos_left - 1, lanczos_left)
        done = jnp.where(boundary2 & (lanczos_left2 <= 0),
                         int(KR.CONVERGED_STEP_LENGTH), conv)
        # breakdown in the continued recurrence: stop the Lanczos phase
        brk = (rz2 == 0) | ~jnp.isfinite(rz2)
        done = jnp.where(boundary2 & brk, int(KR.CONVERGED_STEP_LENGTH),
                         done)
        return (x2, r2, z2, p2, rz2, xMx2, xMp2, pMp2, alphas2, betas2,
                k + 1, its2, boundary2, lanczos_left2,
                jnp.where(boundary, rnorm, dp),
                jnp.asarray(done, jnp.int32), hist2)

    def cond(s):
        reason, its, k = s[-2], s[11], s[10]
        return (reason == 0) & (its < cfg.max_it) & (k < TMAX)

    s0 = (x, r0, z0, z0, rz0, jnp.zeros((), dt), jnp.zeros((), dt), rz0,
          jnp.zeros((TMAX,), dt), jnp.zeros((TMAX,), dt),
          jnp.array(0), jnp.array(0), jnp.array(False),
          jnp.array(LANCZOS_EXTRA), dp0, jnp.zeros((), jnp.int32), hist)
    out = lax.while_loop(cond, body, s0)
    (x_cg, _, _, _, _, _, _, _, alphas, betas, k, its, boundary, _,
     rnorm, reason, hist) = out

    # ---- phase 3: tridiagonal TR subproblem + replay ----------------
    idx = jnp.arange(TMAX)
    a_prev = jnp.where(idx > 0, alphas[jnp.maximum(idx - 1, 0)], 1.0)
    b_prev = jnp.where(idx > 0, betas[jnp.maximum(idx - 1, 0)], 0.0)
    d = 1.0 / _nz(alphas) + b_prev / _nz(a_prev)
    e = jnp.where(idx > 0, jnp.sqrt(jnp.abs(b_prev)) / _nz(jnp.abs(a_prev)),
                  0.0)
    t_size = k
    h = _solve_tridiag_tr(d, e, t_size, TMAX, rnorm0_M, Delta, dt)

    def replay(i, s):
        xh, r, z, p, rz = s
        # Lanczos vector q_i = (-1)^i z / sqrt(rz) (CG residuals alternate
        # sign vs the Lanczos basis); accumulate x += h_i q_i
        q = z / _nz(jnp.sqrt(jnp.abs(rz)))
        sign = (1.0 - 2.0 * (i % 2)).astype(q.dtype)
        xh = xh + sign * jnp.where(i < t_size,
                                   h[jnp.minimum(i, TMAX - 1)], 0.0) * q
        Ap = A.mult(p)
        alpha = alphas[jnp.minimum(i, TMAX - 1)]
        r2 = r - alpha * Ap
        z2 = B.mult(r2)
        rz2 = fdot(r2, z2)
        beta = betas[jnp.minimum(i, TMAX - 1)]
        p2 = z2 + beta * p
        return (xh, r2, z2, p2, rz2)

    def do_replay(_):
        xh0 = jnp.zeros_like(b)
        xh, _, _, _, _ = lax.fori_loop(
            0, TMAX, lambda i, s: lax.cond(i < t_size, lambda ss:
                                           replay(i, ss), lambda ss: ss, s),
            (xh0, r0, z0, z0, rz0))
        return xh

    x_final = lax.cond(boundary, do_replay, lambda _: x_cg, None)
    # Lanczos-capacity exit (k == TMAX before max_it): gltr.c returns the
    # trust-region solution over the space built so far with
    # KSP_CONVERGED_ITS — never reason 0 ("still iterating")
    from ..sys.error import KSPConvergedReason as _KR
    reason = jnp.where((reason == 0) & (its < cfg.max_it),
                       jnp.asarray(int(_KR.CONVERGED_ITS), reason.dtype),
                       reason)
    reason = finalize_reason(reason, its, cfg)
    return SolveResult(x_final, its, rnorm, reason, hist, dp0)
