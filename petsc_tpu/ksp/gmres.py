"""GMRES(m) with left preconditioning and Givens-rotation residual recurrence.

Behavioral reference: src/ksp/ksp/impls/gmres/gmres.c (KSPSolve_GMRES /
KSPGMRESCycle) and borthog2.c:11 (classical Gram-Schmidt with optional
iterative refinement). TPU design: the restart cycle is a lax.while_loop
whose state carries the full Krylov basis V (m+1, n) in HBM; CGS
orthogonalization is ONE (m+1, n) x (n,) matmul on the MXU — unwritten basis
rows are zero so no masking is needed. Happy-breakdown and NaN guards carry
typed reasons (KSPCheckNorm semantics).

cfg.extra = (restart, refine)  with refine in {0: never, 1: ifneeded,
2: always} (KSPGMRESSetCGSRefinementType analog).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.reduce import fgemv, fgemvT
from jax import lax

from ..sys.error import KSPConvergedReason as KR
from .common import (KSPConfig, NONE, SolveResult, check_converged,
                     empty_history, finalize_reason, initial_residual, norm2)

HAPTOL = 1e-10  # gmres->haptol default


def solve_gmres(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    m = int(cfg.extra[0]) if cfg.extra else 30
    refine = int(cfg.extra[1]) if len(cfg.extra) > 1 else 0
    n = b.shape[0]
    dt = b.dtype

    x_init = x0 if cfg.guess_nonzero else jnp.zeros_like(b)

    def prec_residual(x, first):
        if cfg.guess_nonzero or not first:
            r = b - A.mult(x)
        else:
            r = b
        return B.mult(r)

    def orthogonalize(V, w, it):
        """CGS: one tall matmul; V rows > it are zero so they contribute 0."""
        h = fgemv(V, w)                      # (m+1,)
        w = w - fgemvT(h, V)                  # w -= sum h_i V_i
        if refine == 2:
            h2 = fgemv(V, w)
            w = w - fgemvT(h2, V)
            h = h + h2
        elif refine == 1:
            # refine if ||h_correction|| large relative to ||w|| (hhes test)
            h2 = fgemv(V, w)
            do = norm2(h2) > 1e-8 * norm2(h)  # practical ifneeded criterion
            w = jnp.where(do, w - fgemvT(h2, V), w)
            h = jnp.where(do, h + h2, h)
        return h, w

    def cycle(x, its, hist, ttol, dtol_bound, first):
        """One restart cycle; returns updated (x, its, rnorm, reason, hist)."""
        z = prec_residual(x, first)
        res0 = norm2(z)
        V = jnp.zeros((m + 1, n), dtype=dt)
        V = V.at[0].set(z / jnp.where(res0 == 0, 1.0, res0))
        rs = jnp.zeros((m + 1,), dtype=dt).at[0].set(res0)
        cc = jnp.zeros((m,), dtype=dt)
        ss = jnp.zeros((m,), dtype=dt)
        R = jnp.zeros((m + 1, m), dtype=dt)

        def inner_cond(s):
            (V, R, cc, ss, rs, k, its, res, reason, hist) = s
            return (reason == 0) & (k < m) & (its < cfg.max_it)

        def inner_body(s):
            (V, R, cc, ss, rs, k, its, res, reason, hist) = s
            w = B.mult(A.mult(V[k]))
            h, w = orthogonalize(V, w, k)
            tt = norm2(w)
            h = h.at[k + 1].set(tt)
            # happy breakdown guard (gmres.c hapbnd logic)
            hapbnd = jnp.minimum(jnp.abs(tt / jnp.where(rs[k] == 0, 1.0, rs[k])),
                                 HAPTOL)
            hapend = tt < hapbnd
            V = V.at[k + 1].set(jnp.where(tt == 0, 0.0, w / jnp.where(tt == 0, 1.0, tt)))

            # apply previous Givens rotations to column h
            def rot_body(i, hh):
                t = hh[i]
                hh = hh.at[i].set(cc[i] * t + ss[i] * hh[i + 1])
                hh = hh.at[i + 1].set(-ss[i] * t + cc[i] * hh[i + 1])
                return hh

            h = lax.fori_loop(0, k, rot_body, h)
            # new rotation
            g = jnp.sqrt(h[k] ** 2 + h[k + 1] ** 2)
            g_safe = jnp.where(g == 0, 1.0, g)
            c, sn = h[k] / g_safe, h[k + 1] / g_safe
            cc = cc.at[k].set(c)
            ss = ss.at[k].set(sn)
            R = R.at[:, k].set(h.at[k].set(g).at[k + 1].set(0.0))
            rs = rs.at[k + 1].set(-sn * rs[k])
            rs = rs.at[k].set(c * rs[k])
            res = jnp.abs(rs[k + 1])
            res = jnp.where(hapend, 0.0, res)
            its = its + 1
            hist = hist.at[jnp.minimum(its, cfg.max_it)].set(res)
            conv = check_converged(res, ttol, abstol, dtol_bound) \
                if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
            # breakdown with g == 0 -> DIVERGED_NULL; happy end converges
            conv = jnp.where(hapend & (conv == 0),
                             int(KR.CONVERGED_HAPPY_BREAKDOWN), conv)
            conv = jnp.where((g == 0) & ~hapend, int(KR.DIVERGED_NULL), conv)
            return (V, R, cc, ss, rs, k + 1, its,
                    res, jnp.asarray(conv, jnp.int32), hist)

        reason0 = jnp.zeros((), jnp.int32)
        s0 = (V, R, cc, ss, rs, jnp.array(0), its, res0, reason0, hist)
        V, R, cc, ss, rs, k, its, res, reason, hist = \
            lax.while_loop(inner_cond, inner_body, s0)

        # build solution: back-substitute R[:k,:k] y = rs[:k], x += y . V[:m]
        def back_body(i_, y):
            i = k - 1 - i_
            num = rs[i] - jnp.where(jnp.arange(m) > i, R[i, :] * y, 0.0).sum()
            d = R[i, i]
            yi = num / jnp.where(d == 0, 1.0, d)
            return y.at[i].set(jnp.where(i >= 0, yi, 0.0))

        y = lax.fori_loop(0, k, back_body, jnp.zeros((m,), dtype=dt))
        x = x + fgemvT(y, V[:m])
        return x, its, res, reason, hist, res0

    # iteration 0 history entry
    z0 = prec_residual(x_init, True)
    dp0 = norm2(z0)
    hist0 = empty_history(cfg, dt).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0

    def outer_cond(s):
        x, its, rnorm, reason, hist = s
        return (reason == 0) & (its < cfg.max_it)

    def outer_body(s):
        x, its, rnorm, reason, hist = s
        x, its, rnorm, reason, hist, _ = cycle(x, its, hist, ttol, dtol_bound,
                                               first=False)
        return (x, its, rnorm, reason, hist)

    # first cycle reuses dp0 bookkeeping (residual = b - A x0 exactly)
    x, its, rnorm, reason, hist, _ = cycle(x_init, jnp.array(0), hist0,
                                           ttol, dtol_bound, first=True)
    x, its, rnorm, reason, hist = lax.while_loop(
        outer_cond, outer_body, (x, its, rnorm, reason, hist))
    reason = finalize_reason(reason, its, cfg)
    return SolveResult(x, its, rnorm, reason, hist, dp0)


def solve_fgmres(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """Flexible GMRES (right preconditioning, per-iteration preconditioner
    allowed; reference src/ksp/ksp/impls/gmres/fgmres/fgmres.c). Keeps TWO
    bases: V (Arnoldi, for A) and Z = B V (solution updates come from Z), so
    the preconditioner may be a nonlinear operator like an inner Krylov
    solve. Convergence is on the unpreconditioned residual."""
    m = int(cfg.extra[0]) if cfg.extra else 30
    refine = int(cfg.extra[1]) if len(cfg.extra) > 1 else 0
    n = b.shape[0]
    dt = b.dtype
    x_init = x0 if cfg.guess_nonzero else jnp.zeros_like(b)

    def orthogonalize(V, w):
        h = fgemv(V, w)
        w = w - fgemvT(h, V)
        if refine == 2:
            h2 = fgemv(V, w)
            w = w - fgemvT(h2, V)
            h = h + h2
        elif refine == 1:
            h2 = fgemv(V, w)
            do = norm2(h2) > 1e-8 * norm2(h)
            w = jnp.where(do, w - fgemvT(h2, V), w)
            h = jnp.where(do, h + h2, h)
        return h, w

    def cycle(x, its, hist, ttol, dtol_bound):
        r = b - A.mult(x)
        res0 = norm2(r)
        V = jnp.zeros((m + 1, n), dtype=dt)
        Z = jnp.zeros((m, n), dtype=dt)
        V = V.at[0].set(r / jnp.where(res0 == 0, 1.0, res0))
        rs = jnp.zeros((m + 1,), dtype=dt).at[0].set(res0)
        cc = jnp.zeros((m,), dtype=dt)
        ss = jnp.zeros((m,), dtype=dt)
        R = jnp.zeros((m + 1, m), dtype=dt)

        def inner_cond(s):
            (V, Z, R, cc, ss, rs, k, its, res, reason, hist) = s
            return (reason == 0) & (k < m) & (its < cfg.max_it)

        def inner_body(s):
            (V, Z, R, cc, ss, rs, k, its, res, reason, hist) = s
            z = B.mult(V[k])
            Z = Z.at[k].set(z)
            w = A.mult(z)
            h, w = orthogonalize(V, w)
            tt = norm2(w)
            h = h.at[k + 1].set(tt)
            hapbnd = jnp.minimum(
                jnp.abs(tt / jnp.where(rs[k] == 0, 1.0, rs[k])), HAPTOL)
            hapend = tt < hapbnd
            V = V.at[k + 1].set(
                jnp.where(tt == 0, 0.0, w / jnp.where(tt == 0, 1.0, tt)))

            def rot_body(i, hh):
                t = hh[i]
                hh = hh.at[i].set(cc[i] * t + ss[i] * hh[i + 1])
                hh = hh.at[i + 1].set(-ss[i] * t + cc[i] * hh[i + 1])
                return hh

            h = lax.fori_loop(0, k, rot_body, h)
            g = jnp.sqrt(h[k] ** 2 + h[k + 1] ** 2)
            g_safe = jnp.where(g == 0, 1.0, g)
            c, sn = h[k] / g_safe, h[k + 1] / g_safe
            cc = cc.at[k].set(c)
            ss = ss.at[k].set(sn)
            R = R.at[:, k].set(h.at[k].set(g).at[k + 1].set(0.0))
            rs = rs.at[k + 1].set(-sn * rs[k])
            rs = rs.at[k].set(c * rs[k])
            res = jnp.abs(rs[k + 1])
            res = jnp.where(hapend, 0.0, res)
            its = its + 1
            hist = hist.at[jnp.minimum(its, cfg.max_it)].set(res)
            conv = check_converged(res, ttol, abstol, dtol_bound) \
                if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
            conv = jnp.where(hapend & (conv == 0),
                             int(KR.CONVERGED_HAPPY_BREAKDOWN), conv)
            conv = jnp.where((g == 0) & ~hapend, int(KR.DIVERGED_NULL), conv)
            return (V, Z, R, cc, ss, rs, k + 1, its,
                    res, jnp.asarray(conv, jnp.int32), hist)

        reason0 = jnp.zeros((), jnp.int32)
        s0 = (V, Z, R, cc, ss, rs, jnp.array(0), its, res0, reason0, hist)
        V, Z, R, cc, ss, rs, k, its, res, reason, hist = \
            lax.while_loop(inner_cond, inner_body, s0)

        def back_body(i_, y):
            i = k - 1 - i_
            num = rs[i] - jnp.where(jnp.arange(m) > i, R[i, :] * y, 0.0).sum()
            d = R[i, i]
            yi = num / jnp.where(d == 0, 1.0, d)
            return y.at[i].set(jnp.where(i >= 0, yi, 0.0))

        y = lax.fori_loop(0, k, back_body, jnp.zeros((m,), dtype=dt))
        x = x + fgemvT(y, Z)
        return x, its, res, reason, hist, res0

    r0 = b - A.mult(x_init) if cfg.guess_nonzero else b
    dp0 = norm2(r0)
    hist0 = empty_history(cfg, dt).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0

    def outer_cond(s):
        x, its, rnorm, reason, hist = s
        return (reason == 0) & (its < cfg.max_it)

    def outer_body(s):
        x, its, rnorm, reason, hist = s
        x, its, rnorm, reason, hist, _ = cycle(x, its, hist, ttol, dtol_bound)
        return (x, its, rnorm, reason, hist)

    x, its, rnorm, reason, hist, _ = cycle(x_init, jnp.array(0), hist0,
                                           ttol, dtol_bound)
    x, its, rnorm, reason, hist = lax.while_loop(
        outer_cond, outer_body, (x, its, rnorm, reason, hist))
    reason = finalize_reason(reason, its, cfg)
    return SolveResult(x, its, rnorm, reason, hist, dp0)
