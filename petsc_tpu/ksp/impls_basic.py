"""KSP implementations: preonly, richardson, cg (+cg variants later).

Each solver is a trace-time builder producing a pure jittable function.
Semantics follow the reference implementations (behavior, not code):
  preonly    src/ksp/ksp/impls/preonly/preonly.c
  richardson src/ksp/ksp/impls/rich/rich.c
  cg         src/ksp/ksp/impls/cg/cg.c:119 (KSPSolve_CG)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.reduce import fdot
from jax import lax

from ..sys.error import KSPConvergedReason as KR
from .common import (KSPConfig, NATURAL, NONE, PRECONDITIONED,
                     SolveResult, UNPRECONDITIONED, check_converged,
                     empty_history, finalize_reason, initial_residual, norm2)


def solve_preonly(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """x = B b: apply the preconditioner exactly once (preonly.c)."""
    x = B.mult(b if not cfg.guess_nonzero else initial_residual(A, b, x0, cfg))
    if cfg.guess_nonzero:
        x = x0 + x
    hist = empty_history(cfg, b.dtype)
    zero = jnp.zeros((), b.dtype)
    return SolveResult(x, jnp.array(1), zero, jnp.array(int(KR.CONVERGED_ITS)),
                       hist, zero)


def _dp(normtype, r, z):
    if normtype == PRECONDITIONED:
        return norm2(z)
    if normtype == UNPRECONDITIONED:
        return norm2(r)
    if normtype == NATURAL:
        return jnp.sqrt(jnp.abs(fdot(z, r)))
    return jnp.zeros((), r.dtype)


def solve_richardson(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """x <- x + scale * B(b - A x) (rich.c). cfg.extra = (scale,)."""
    scale = cfg.extra[0] if cfg.extra else 1.0
    r0 = initial_residual(A, b, x0, cfg)
    x0v = x0 if cfg.guess_nonzero else jnp.zeros_like(b)

    z0 = B.mult(r0)
    dp0 = _dp(cfg.normtype, r0, z0)
    hist = empty_history(cfg, b.dtype).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0

    def cond(s):
        x, r, z, its, rnorm, reason, hist = s
        return (reason == 0) & (its < cfg.max_it)

    def body(s):
        x, r, z, its, rnorm, reason, hist = s
        x = x + scale * z
        w = A.mult(x)
        r = b - w
        z = B.mult(r)
        dp = _dp(cfg.normtype, r, z)
        its = its + 1
        hist = hist.at[its].set(dp)
        reason = check_converged(dp, ttol, abstol, dtol_bound) \
            if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
        return (x, r, z, its, dp, jnp.asarray(reason, jnp.int32), hist)

    state = (x0v, r0, z0, jnp.array(0), dp0,
             jnp.zeros((), jnp.int32), hist)
    x, r, z, its, rnorm, reason, hist = lax.while_loop(cond, body, state)
    reason = finalize_reason(reason, its, cfg)
    return SolveResult(x, its, rnorm, reason, hist, dp0)


def solve_cg(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """Preconditioned conjugate gradients, PETSc ordering (cg.c:119):
    breakdown/indefiniteness checks on beta and p'Ap, convergence tested on
    the preconditioned norm by default, iteration-0 norm monitored but not
    tested (chknorm)."""
    nt = cfg.normtype
    r0 = initial_residual(A, b, x0, cfg)
    # KSP.solve passes x0 == zeros when the guess is not nonzero, so x0
    # is ALWAYS the initial iterate — consuming it (instead of a fresh
    # jnp.zeros_like) lets the jit-level donation alias its buffer into
    # the while-loop state (1.07 GB at 512^3 f64)
    x0v = x0

    z0 = B.mult(r0)
    beta0 = fdot(z0, r0)
    dp0 = _dp(nt, r0, z0)
    hist = empty_history(cfg, b.dtype).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0

    # state: (x, r, z, p, beta, betaold, its, rnorm, reason, hist)
    def cond(s):
        return (s[7] == 0) & (s[5] < cfg.max_it)

    def body(s):
        # z = B r lives only WITHIN the body: carrying it across
        # iterations costs a dedicated while-state buffer (1.07 GB at
        # 512^3 f64), so p is advanced at the END of the step instead
        # of the start (same recurrence, one-position shift; p0 = z0)
        x, r, p, beta, betaold, its, rnorm, reason, hist = s
        i = its
        # breakdown checks (before any update, like the reference)
        brk = jnp.where(beta == 0, int(KR.CONVERGED_ATOL), 0)
        brk = jnp.where((i > 0) & (beta * betaold < 0),
                        int(KR.DIVERGED_INDEFINITE_PC), brk)
        w = A.mult(p)
        dpi = fdot(p, w)
        brk = jnp.where((brk == 0) & (dpi <= 0),
                        int(KR.DIVERGED_INDEFINITE_MAT), brk)
        ok = brk == 0
        a = jnp.where(ok, beta / jnp.where(dpi == 0, 1.0, dpi), 0.0)
        # breakdown (a == 0) makes x/r updates IDENTITIES, so no
        # where(ok, ...) select is needed on the big vectors — each
        # select keeps both operands live, double-buffering three
        # 1.07 GB buffers at 512^3 f64; scalars keep their guards
        x = x + a * p
        r = r - a * w
        z_new = B.mult(r)
        beta_new = fdot(z_new, r)
        dp = _dp(nt, r, z_new)
        its_new = i + 1
        conv = check_converged(dp, ttol, abstol, dtol_bound) \
            if nt != NONE else jnp.zeros((), jnp.int32)
        reason_new = jnp.where(ok, conv, brk).astype(jnp.int32)
        bcoef = beta_new / jnp.where(beta == 0, 1.0, beta)
        # p's post-breakdown value is never read (the loop exits on
        # reason != 0 and only x is returned) — unguarded like x/r
        p = z_new + bcoef * p
        hist = jnp.where(ok, hist.at[its_new].set(dp), hist)
        rnorm = jnp.where(ok, dp, rnorm)
        its = jnp.where(ok, its_new, its_new)  # PETSc sets its=i+1 either way
        beta, betaold = jnp.where(ok, beta_new, beta), jnp.where(ok, beta, betaold)
        return (x, r, p, beta, betaold, its, rnorm, reason_new, hist)

    state = (x0v, r0, z0, beta0, jnp.ones((), b.dtype),
             jnp.array(0), dp0, jnp.zeros((), jnp.int32), hist)
    x, r, p, beta, betaold, its, rnorm, reason, hist = \
        lax.while_loop(cond, body, state)
    reason = finalize_reason(reason, its, cfg)
    # returning r lets a donated rhs alias an output (SolveResult.r note)
    return SolveResult(x, its, rnorm, reason, hist, dp0, r)


def solve_minres(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """MINRES for symmetric (indefinite) systems with SPD preconditioner
    (behavioral reference src/ksp/ksp/impls/minres/minres.c)."""
    r0 = initial_residual(A, b, x0, cfg)
    x0v = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    z0 = B.mult(r0)
    dp0 = jnp.sqrt(jnp.abs(fdot(z0, r0)))   # natural norm drives MINRES
    mon0 = _dp(cfg.normtype, r0, z0)
    hist = empty_history(cfg, b.dtype).at[0].set(mon0)
    ttol = jnp.maximum(rtol * mon0, abstol)
    dtol_bound = divtol * mon0

    dt = b.dtype
    eta0 = dp0
    state = dict(x=x0v, v_old=jnp.zeros_like(b), v=r0, z_old=jnp.zeros_like(b),
                 z=z0, beta=dp0, beta_old=jnp.ones((), dt),
                 c=jnp.ones((), dt), c_old=jnp.ones((), dt),
                 s=jnp.zeros((), dt), s_old=jnp.zeros((), dt),
                 w=jnp.zeros_like(b), w_old=jnp.zeros_like(b),
                 eta=eta0, its=jnp.array(0), rnorm=mon0,
                 reason=jnp.zeros((), jnp.int32), hist=hist)

    def cond(s):
        return (s["reason"] == 0) & (s["its"] < cfg.max_it)

    def body(s):
        beta = s["beta"]
        v_hat = s["z"] / beta
        Av = A.mult(v_hat)
        alpha = fdot(v_hat, Av)
        v_new = Av - (alpha / beta) * s["v"] - (beta / s["beta_old"]) * s["v_old"]
        z_new = B.mult(v_new)
        beta_new = jnp.sqrt(jnp.abs(fdot(z_new, v_new)))
        # Givens
        d0 = s["c"] * alpha - s["c_old"] * s["s"] * beta
        d1 = jnp.sqrt(d0 * d0 + beta_new * beta_new)
        d2 = s["s"] * alpha + s["c_old"] * s["c"] * beta
        d3 = s["s_old"] * beta
        c_new = d0 / d1
        s_new = beta_new / d1
        w_new = (v_hat - d3 * s["w_old"] - d2 * s["w"]) / d1
        x = s["x"] + c_new * s["eta"] * w_new
        eta = -s_new * s["eta"]
        its = s["its"] + 1
        dp = jnp.abs(eta)
        hist2 = s["hist"].at[its].set(dp)
        reason = check_converged(dp, ttol, abstol, dtol_bound)
        return dict(x=x, v_old=s["v"], v=v_new, z_old=s["z"], z=z_new,
                    beta=beta_new, beta_old=beta, c=c_new, c_old=s["c"],
                    s=s_new, s_old=s["s"], w=w_new, w_old=s["w"],
                    eta=eta, its=its, rnorm=dp,
                    reason=jnp.asarray(reason, jnp.int32), hist=hist2)

    out = lax.while_loop(cond, body, state)
    reason = finalize_reason(out["reason"], out["its"], cfg)
    return SolveResult(out["x"], out["its"], out["rnorm"], reason,
                       out["hist"], mon0)
