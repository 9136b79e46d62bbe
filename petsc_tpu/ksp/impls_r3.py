"""Round-3 KSP implementations: bicg, cgls, qmrcgs.

Behavioral references:
  bicg    src/ksp/ksp/impls/bicg/bicg.c (KSPSolve_BiCG) — biconjugate
          gradients on the left-preconditioned system; the shadow
          recurrence applies B^T and A^T.
  cgls    src/ksp/ksp/impls/cg/cgls/cgls.c — conjugate gradients on the
          normal equations A^T A x = A^T b (least squares; unpreconditioned
          like the reference, which only monitors ||r||).
  qmrcgs  src/ksp/ksp/impls/bcgs/qmrcgs/qmrcgs.c — QMRCGSTAB (Chan,
          Gallopoulos, Simoncini, Szeto, Tong): BiCGStab with two
          quasi-minimization half-steps smoothing the residual.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..ops.reduce import fdot
from ..sys.error import KSPConvergedReason as KR
from .common import (KSPConfig, NONE, PRECONDITIONED, SolveResult,
                     UNPRECONDITIONED, check_converged, empty_history,
                     finalize_reason, initial_residual, norm2)


def _nz(x):
    return jnp.where(x == 0, 1.0, x)


def solve_bicg(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """Biconjugate gradients (bicg.c): CG-like recurrences driven by a
    shadow system with A^T/B^T; for symmetric A it reproduces CG at twice
    the matvec cost. Falls back to mult when an operator provides no
    transpose apply (then A = A^T is assumed, the reference's MatMult-
    Transpose requirement)."""
    At = A.mult_t if A.mult_t is not None else A.mult
    Bt = B.mult_t if getattr(B, "mult_t", None) is not None else B.mult
    x_init = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r0 = initial_residual(A, b, x0, cfg)
    z0 = B.mult(r0)
    rt0 = r0            # shadow residual seeded with r (bicg.c)
    zt0 = Bt(rt0)
    dp0 = norm2(z0) if cfg.normtype == PRECONDITIONED else norm2(r0)
    hist = empty_history(cfg, b.dtype).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0

    state = dict(x=x_init, r=r0, z=z0, rt=rt0, zt=zt0,
                 p=z0, pt=zt0, beta=fdot(z0, rt0),
                 its=jnp.array(0), rnorm=dp0,
                 reason=jnp.zeros((), jnp.int32), hist=hist)

    def cond(s):
        return (s["reason"] == 0) & (s["its"] < cfg.max_it)

    def body(s):
        w = A.mult(s["p"])
        wt = At(s["pt"])
        dpi = fdot(s["pt"], w)
        brk = jnp.where(dpi == 0, int(KR.DIVERGED_BREAKDOWN), 0)
        a = s["beta"] / _nz(dpi)
        x = s["x"] + a * s["p"]
        r = s["r"] - a * w
        rt = s["rt"] - a * wt
        z = B.mult(r)
        zt = Bt(rt)
        beta = fdot(z, rt)
        brk = jnp.where((brk == 0) & (beta == 0),
                        int(KR.CONVERGED_ATOL), brk)
        bc = beta / _nz(s["beta"])
        p = z + bc * s["p"]
        pt = zt + bc * s["pt"]
        dp = norm2(z) if cfg.normtype == PRECONDITIONED else norm2(r)
        its = s["its"] + 1
        conv = check_converged(dp, ttol, abstol, dtol_bound) \
            if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
        reason = jnp.where(brk != 0, brk, conv)
        hist2 = s["hist"].at[its].set(dp)
        return dict(x=x, r=r, z=z, rt=rt, zt=zt, p=p, pt=pt, beta=beta,
                    its=its, rnorm=dp,
                    reason=jnp.asarray(reason, jnp.int32), hist=hist2)

    s = lax.while_loop(cond, body, state)
    reason = finalize_reason(s["reason"], s["its"], cfg)
    return SolveResult(s["x"], s["its"], s["rnorm"], reason, s["hist"], dp0)


def solve_cgls(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """CGLS (cgls.c): least-squares CG on A^T A x = A^T b in the stable
    Paige-Saunders form. Like the reference, the preconditioner is not
    applied (cgls.c works on the normal equations directly) and
    convergence tests ||r|| = ||b - A x||."""
    At = A.mult_t if A.mult_t is not None else A.mult
    x_init = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r0 = b - A.mult(x_init) if cfg.guess_nonzero else b
    s0 = At(r0)
    gamma0 = fdot(s0, s0)
    dp0 = norm2(r0)
    hist = empty_history(cfg, b.dtype).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0

    state = dict(x=x_init, r=r0, p=s0, gamma=gamma0,
                 its=jnp.array(0), rnorm=dp0,
                 reason=jnp.zeros((), jnp.int32), hist=hist)

    def cond(s):
        return (s["reason"] == 0) & (s["its"] < cfg.max_it)

    def body(s):
        q = A.mult(s["p"])
        qq = fdot(q, q)
        brk = jnp.where(qq == 0, int(KR.DIVERGED_BREAKDOWN), 0)
        a = s["gamma"] / _nz(qq)
        x = s["x"] + a * s["p"]
        r = s["r"] - a * q
        sv = At(r)
        gamma = fdot(sv, sv)
        bc = gamma / _nz(s["gamma"])
        p = sv + bc * s["p"]
        dp = norm2(r)
        its = s["its"] + 1
        conv = check_converged(dp, ttol, abstol, dtol_bound) \
            if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
        reason = jnp.where(brk != 0, brk, conv)
        hist2 = s["hist"].at[its].set(dp)
        return dict(x=x, r=r, p=p, gamma=gamma, its=its, rnorm=dp,
                    reason=jnp.asarray(reason, jnp.int32), hist=hist2)

    s = lax.while_loop(cond, body, state)
    reason = finalize_reason(s["reason"], s["its"], cfg)
    return SolveResult(s["x"], s["its"], s["rnorm"], reason, s["hist"], dp0)


def solve_qmrcgs(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """QMRCGSTAB (qmrcgs.c): the BiCGStab recurrence with two quasi-
    minimization half-steps per iteration that smooth the residual
    (tau/theta/eta bookkeeping per Chan et al. 1994). Left-preconditioned
    like the bcgs family here; dp is the quasi-minimal tau, matching the
    reference's monitor quantity."""
    dt = b.dtype
    x_init = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r0_un = b - A.mult(x_init) if cfg.guess_nonzero else b
    r0 = B.mult(r0_un)
    tau0 = norm2(r0)
    hist = empty_history(cfg, dt).at[0].set(tau0)
    ttol = jnp.maximum(rtol * tau0, abstol)
    dtol_bound = divtol * tau0
    zero = jnp.zeros_like(b)

    state = dict(x=x_init, r=r0, rt=r0, p=zero, v=zero, d=zero,
                 rho=jnp.ones((), dt), alpha=jnp.ones((), dt),
                 omega=jnp.ones((), dt), tau=tau0,
                 theta=jnp.zeros((), dt), eta=jnp.zeros((), dt),
                 its=jnp.array(0), rnorm=tau0,
                 reason=jnp.zeros((), jnp.int32), hist=hist)

    def cond(s):
        return (s["reason"] == 0) & (s["its"] < cfg.max_it)

    def body(s):
        rho = fdot(s["rt"], s["r"])
        brk = jnp.where(rho == 0, int(KR.DIVERGED_BREAKDOWN), 0)
        beta = (rho / _nz(s["rho"])) * (s["alpha"] / _nz(s["omega"]))
        p = s["r"] + beta * (s["p"] - s["omega"] * s["v"])
        v = B.mult(A.mult(p))
        d1 = fdot(s["rt"], v)
        brk = jnp.where((brk == 0) & (d1 == 0),
                        int(KR.DIVERGED_BREAKDOWN), brk)
        alpha = rho / _nz(d1)
        sv = s["r"] - alpha * v
        # first quasi-minimization half-step
        th1 = norm2(sv) / _nz(s["tau"])
        c1 = 1.0 / jnp.sqrt(1.0 + th1 * th1)
        tau1 = s["tau"] * th1 * c1
        eta1 = c1 * c1 * alpha
        d1v = p + (s["theta"] * s["theta"] * s["eta"] / _nz(alpha)) * s["d"]
        x1 = s["x"] + eta1 * d1v
        # second half-step
        t = B.mult(A.mult(sv))
        tt = fdot(t, t)
        omega = fdot(t, sv) / _nz(tt)
        brk = jnp.where((brk == 0) & (tt == 0),
                        int(KR.DIVERGED_BREAKDOWN), brk)
        r = sv - omega * t
        th2 = norm2(r) / _nz(tau1)
        c2 = 1.0 / jnp.sqrt(1.0 + th2 * th2)
        tau = tau1 * th2 * c2
        eta2 = c2 * c2 * omega
        d2v = sv + (th1 * th1 * eta1 / _nz(omega)) * d1v
        x = x1 + eta2 * d2v
        dp = tau
        its = s["its"] + 1
        conv = check_converged(dp, ttol, abstol, dtol_bound) \
            if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
        reason = jnp.where(brk != 0, brk, conv)
        hist2 = s["hist"].at[its].set(dp)
        return dict(x=x, r=r, rt=s["rt"], p=p, v=v, d=d2v, rho=rho,
                    alpha=alpha, omega=omega, tau=tau, theta=th2,
                    eta=eta2, its=its, rnorm=dp,
                    reason=jnp.asarray(reason, jnp.int32), hist=hist2)

    s = lax.while_loop(cond, body, state)
    reason = finalize_reason(s["reason"], s["its"], cfg)
    return SolveResult(s["x"], s["its"], s["rnorm"], reason, s["hist"], tau0)
