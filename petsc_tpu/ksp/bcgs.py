"""BiCGStab (bcgs) and flexible variant.

Behavioral reference: src/ksp/ksp/impls/bcgs/bcgs.c (KSPSolve_BCGS) — the
solver runs on the left-preconditioned system: r = B(b - Ax), applications
are v = B A p, and the default PRECONDITIONED norm is ||r|| of that
preconditioned residual. Breakdown conditions ((v,rp)=0; t=0 with s!=0)
carry KSP_DIVERGED_BREAKDOWN; the t=0, s=0 corner converges with x += a p.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..sys.error import KSPConvergedReason as KR
from .common import (KSPConfig, NONE, SolveResult, UNPRECONDITIONED,
                     check_converged, empty_history, finalize_reason, norm2)


def solve_bcgs(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    dt = b.dtype
    x_init = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r0_un = b - A.mult(x_init) if cfg.guess_nonzero else b
    r0 = B.mult(r0_un)

    if cfg.normtype == UNPRECONDITIONED:
        # unpreconditioned norm + right-preconditioning path not yet split;
        # use ||b - A x|| via un-preconditioned residual tracking
        dp0 = norm2(r0_un)
    else:
        dp0 = norm2(r0)
    hist = empty_history(cfg, dt).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0

    state = dict(x=x_init, r=r0, rp=r0, p=jnp.zeros_like(b), v=jnp.zeros_like(b),
                 rhoold=jnp.ones((), dt), alpha=jnp.ones((), dt),
                 omegaold=jnp.ones((), dt), its=jnp.array(0), rnorm=dp0,
                 reason=jnp.zeros((), jnp.int32), hist=hist)

    def cond(s):
        return (s["reason"] == 0) & (s["its"] < cfg.max_it)

    def body(s):
        rho = jnp.vdot(s["r"], s["rp"])
        beta = (rho / _nz(s["rhoold"])) * (s["alpha"] / _nz(s["omegaold"]))
        p = s["r"] - s["omegaold"] * beta * s["v"] + beta * s["p"]
        v = B.mult(A.mult(p))
        d1 = jnp.vdot(v, s["rp"])
        brk = jnp.where(d1 == 0, int(KR.DIVERGED_BREAKDOWN), 0)
        alpha = rho / _nz(d1)
        sv = s["r"] - alpha * v
        t = B.mult(A.mult(sv))
        st = jnp.vdot(sv, t)
        tt = jnp.vdot(t, t)
        ss_ = jnp.vdot(sv, sv)
        # t == 0 corner (bcgs.c:92-113)
        t_zero = (tt == 0) & (brk == 0)
        brk = jnp.where(t_zero & (ss_ != 0), int(KR.DIVERGED_BREAKDOWN), brk)
        early_conv = t_zero & (ss_ == 0)
        omega = st / _nz(tt)
        x = s["x"] + alpha * p + omega * sv
        r = sv - omega * t
        dp = norm2(r) if cfg.normtype != UNPRECONDITIONED else norm2(b - A.mult(x))
        its = s["its"] + 1
        conv = check_converged(dp, ttol, abstol, dtol_bound) \
            if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
        ok = (brk == 0) & ~early_conv
        reason = jnp.where(ok, conv,
                           jnp.where(early_conv, int(KR.CONVERGED_RTOL), brk))
        x = jnp.where(ok, x, jnp.where(early_conv, s["x"] + alpha * p, s["x"]))
        r = jnp.where(ok, r, s["r"])
        dp = jnp.where(ok, dp, jnp.where(early_conv, 0.0, s["rnorm"]))
        hist2 = jnp.where(ok | early_conv, s["hist"].at[its].set(dp), s["hist"])
        return dict(x=x, r=r, rp=s["rp"], p=p, v=v, rhoold=rho, alpha=alpha,
                    omegaold=omega, its=its, rnorm=dp,
                    reason=jnp.asarray(reason, jnp.int32), hist=hist2)

    out = lax.while_loop(cond, body, state)
    reason = finalize_reason(out["reason"], out["its"], cfg)
    return SolveResult(out["x"], out["its"], out["rnorm"], reason,
                       out["hist"], dp0)


def _nz(v):
    return jnp.where(v == 0, 1.0, v)
