"""BiCGStab (bcgs) and flexible variant.

Behavioral reference: src/ksp/ksp/impls/bcgs/bcgs.c (KSPSolve_BCGS) — the
solver runs on the left-preconditioned system: r = B(b - Ax), applications
are v = B A p, and the default PRECONDITIONED norm is ||r|| of that
preconditioned residual. Breakdown conditions ((v,rp)=0; t=0 with s!=0)
carry KSP_DIVERGED_BREAKDOWN; the t=0, s=0 corner converges with x += a p.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.reduce import fdot
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
        rho = fdot(s["r"], s["rp"])
        beta = (rho / _nz(s["rhoold"])) * (s["alpha"] / _nz(s["omegaold"]))
        p = s["r"] - s["omegaold"] * beta * s["v"] + beta * s["p"]
        v = B.mult(A.mult(p))
        d1 = fdot(v, s["rp"])
        brk = jnp.where(d1 == 0, int(KR.DIVERGED_BREAKDOWN), 0)
        alpha = rho / _nz(d1)
        sv = s["r"] - alpha * v
        t = B.mult(A.mult(sv))
        st = fdot(sv, t)
        tt = fdot(t, t)
        ss_ = fdot(sv, sv)
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


def solve_ibcgs(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """IBCGS (src/ksp/ksp/impls/ibcgs/ibcgs.c, Yang & Brent 2002):
    BiCGStab restructured so all six inner products of an iteration
    (phi, pi, gamma, eta, theta, kappa) are computed from the SAME vector
    set and fused into one reduction — the single-allreduce trajectory.
    On TPU the six dots lower into one fused HBM pass / one psum, so the
    communication profile matches the reference's single MPI_Allreduce.

    Requires one application of (BA)^T up front (f0); falls back to the
    forward operators when transposes are unavailable (symmetric case)."""
    dt = b.dtype
    x_init = x0 if cfg.guess_nonzero else jnp.zeros_like(b)

    def opBA(v):
        return B.mult(A.mult(v))

    # ibcgs.c contract: the single-reduction recurrence needs the TRUE
    # f0 = (BA)^T r0 — silently substituting forward applies corrupts the
    # fused sigma/tau/alpha constants for nonsymmetric PCs (measured: 13
    # vs 41 its on convection-diffusion with ILU). Error out instead.
    if getattr(A, "mult_t", None) is None or \
            getattr(B, "mult_t", None) is None:
        from ..sys.error import Error
        raise Error(
            "KSP ibcgs needs MatMultTranspose and PCApplyTranspose "
            "(ibcgs.c); this operator/PC pair provides no transpose "
            "apply — use bcgs, or a transpose-capable PC (e.g. "
            "-pc_factor_transpose_solve for ilu/lu)")
    At = A.mult_t
    Bt = B.mult_t

    r0u = b - A.mult(x_init) if cfg.guess_nonzero else b
    r0 = B.mult(r0u)
    dp0 = norm2(r0)
    hist = empty_history(cfg, dt).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0

    u0 = opBA(r0)
    f0 = At(Bt(r0))                       # (BA)^T r0 for left side
    zero = jnp.zeros_like(b)
    one = jnp.ones((), dt)
    z0_ = jnp.zeros((), dt)

    state = dict(x=x_init, r=r0, u=u0, z=zero, v=zero, q=zero,
                 sig2=z0_, sig1=fdot(r0, u0), pi1=z0_,
                 phi1=fdot(r0, r0), tau1=z0_, alpha1=one, omega1=one,
                 its=jnp.array(0), rnorm=dp0,
                 reason=jnp.zeros((), jnp.int32), hist=hist)

    def cond(s):
        return (s["reason"] == 0) & (s["its"] < cfg.max_it)

    def body(s):
        first = s["its"] == 0
        rho = s["phi1"] - s["omega1"] * s["sig2"] \
            + s["omega1"] * s["alpha1"] * s["pi1"]
        delta = jnp.where(first, rho, rho / _nz(s["tau1"]))
        beta = delta / _nz(s["omega1"])
        tau = s["sig1"] + beta * s["tau1"] - delta * s["pi1"]
        brk = jnp.where(tau == 0, int(KR.DIVERGED_BREAKDOWN), 0)
        alpha = rho / _nz(tau)
        zn = alpha * s["r"] + (alpha / _nz(s["alpha1"])) * beta * s["z"] \
            - alpha * delta * s["v"]
        vn = s["u"] + beta * s["v"] - delta * s["q"]
        sn = s["r"] - alpha * vn
        qn = opBA(vn)
        tn = s["u"] - alpha * qn
        # the six dots — one fused pass / one psum (the ibcgs point)
        phi = fdot(r0, sn)
        pi_ = fdot(r0, qn)
        gamma = fdot(f0, sn)
        eta = fdot(f0, tn)
        theta = fdot(sn, tn)
        kappa = fdot(tn, tn)
        brk = jnp.where((kappa == 0) | (theta == 0),
                        int(KR.DIVERGED_BREAKDOWN), brk)
        omega = theta / _nz(kappa)
        sigma = gamma - omega * eta
        rn = sn - omega * tn
        xn = s["x"] + zn + omega * sn
        dp = norm2(rn)
        its = s["its"] + 1
        conv = check_converged(dp, ttol, abstol, dtol_bound) \
            if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
        reason = jnp.where(brk != 0, brk, conv)
        ok = brk == 0
        un = opBA(rn)
        xn = jnp.where(ok, xn, s["x"])
        rn = jnp.where(ok, rn, s["r"])
        dp = jnp.where(ok, dp, s["rnorm"])
        hist2 = jnp.where(ok, s["hist"].at[its].set(dp), s["hist"])
        return dict(x=xn, r=rn, u=un, z=zn, v=vn, q=qn,
                    sig2=s["sig1"], sig1=sigma, pi1=pi_, phi1=phi,
                    tau1=tau, alpha1=alpha, omega1=omega,
                    its=its, rnorm=dp,
                    reason=jnp.asarray(reason, jnp.int32), hist=hist2)

    out = lax.while_loop(cond, body, state)
    reason = finalize_reason(out["reason"], out["its"], cfg)
    return SolveResult(out["x"], out["its"], out["rnorm"], reason,
                       out["hist"], dp0)
