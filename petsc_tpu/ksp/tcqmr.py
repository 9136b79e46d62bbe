"""KSPTCQMR: Tony Chan's transpose-free QMR variant.

Behavioral reference: src/ksp/ksp/impls/tcqmr/tcqmr.c (squared-Lanczos
vectors + two trailing Givens rotations; the reported "residual norm" is
the QMR upper bound rnorm0 * sqrt(its+2) * prod|s| — same contract here).

TPU form: the whole recurrence is one lax.while_loop; the its>1/its>2
rotation warm-up branches become jnp.where selects so the loop body is a
single trace.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.reduce import fdot
from jax import lax

from .common import (KSPConfig, NONE, SolveResult, check_converged,
                     empty_history, finalize_reason, initial_residual,
                     norm2)


def solve_tcqmr(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    r0 = initial_residual(A, b, x0, cfg)
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r = B.mult(r0)
    dt = b.dtype
    rnorm0 = norm2(r)
    hist = empty_history(cfg, dt).at[0].set(rnorm0)
    ttol = jnp.maximum(rtol * rnorm0, abstol)
    dtol_bound = divtol * rnorm0

    def BA(w):
        return B.mult(A.mult(w))

    def sdiv(a, c):
        return a / jnp.where(c == 0, 1.0, c)

    inv0 = sdiv(1.0, rnorm0)
    u = r * inv0
    v = u
    v0 = u
    z = jnp.zeros_like(b)
    st0 = dict(x=x, u=u, um1=z, v=v, vm1=z, p=z, pvec1=z, pvec2=z,
               theta=jnp.zeros((), dt), ep=jnp.zeros((), dt),
               cl1=jnp.zeros((), dt), sl1=jnp.zeros((), dt),
               cl=jnp.zeros((), dt), sl=jnp.zeros((), dt),
               sprod=jnp.ones((), dt), tau_n1=rnorm0,
               f=jnp.ones((), dt), Gamma=jnp.ones((), dt),
               rhom1=jnp.ones((), dt), rnorm=rnorm0,
               its=jnp.array(0), reason=jnp.zeros((), jnp.int32),
               hist=hist)

    def body(s):
        its = s["its"] + 1
        y = BA(s["u"])
        dp11 = fdot(y, v0)
        dp2 = fdot(s["u"], v0)
        alpha = sdiv(dp11, dp2)
        deltmp = alpha
        zv = y - alpha * s["u"]
        rho = fdot(s["u"], v0)
        beta = sdiv(rho, s["f"] * s["rhom1"])
        rhom1 = rho
        utmp = zv - 2.0 * beta * s["p"]
        up1 = BA(utmp) - alpha * utmp + s["f"] * beta * beta * s["um1"]
        dp1 = norm2(up1)
        f = sdiv(1.0, dp1)
        up1 = up1 * f
        p = f * (zv - beta * s["p"])
        um1, u = s["u"], up1
        beta = sdiv(beta, s["Gamma"])
        eptmp = beta
        vp1 = BA(s["v"]) - alpha * s["v"] - beta * s["vm1"]
        Gamma = norm2(vp1)
        vp1 = vp1 * sdiv(1.0, Gamma)
        vm1, v = s["v"], vp1
        # trailing Givens rotations (warm-up selects)
        theta = jnp.where(its > 2, s["sl1"] * beta, s["theta"])
        eptmp = jnp.where(its > 2, -s["cl1"] * beta, eptmp)
        ep = jnp.where(its > 1, -s["cl"] * eptmp + s["sl"] * alpha,
                       s["ep"])
        deltmp = jnp.where(its > 1, -s["sl"] * eptmp - s["cl"] * alpha,
                           deltmp)
        big = jnp.abs(Gamma) > jnp.abs(deltmp)
        ta1 = sdiv(-deltmp, Gamma)
        s_a = sdiv(1.0, jnp.sqrt(1.0 + ta1 * ta1))
        c_a = s_a * ta1
        ta2 = sdiv(-Gamma, deltmp)
        c_b = sdiv(1.0, jnp.sqrt(1.0 + ta2 * ta2))
        s_b = c_b * ta2
        c = jnp.where(big, c_a, c_b)
        sg = jnp.where(big, s_a, s_b)
        delta = -c * deltmp + sg * Gamma
        tau_n = -c * s["tau_n1"]
        tau_n1 = -sg * s["tau_n1"]
        pvec = (vm1 - theta * s["pvec2"] - ep * s["pvec1"]) \
            * sdiv(1.0, delta)
        x = s["x"] + tau_n * pvec
        sprod = s["sprod"] * jnp.abs(sg)
        rnorm = rnorm0 * jnp.sqrt(its.astype(dt) + 2.0) * sprod
        hist2 = s["hist"].at[its].set(rnorm)
        conv = check_converged(rnorm, ttol, abstol, dtol_bound) \
            if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
        return dict(x=x, u=u, um1=um1, v=v, vm1=vm1, p=p,
                    pvec1=pvec, pvec2=s["pvec1"], theta=theta, ep=ep,
                    cl1=s["cl"], sl1=s["sl"], cl=c, sl=sg, sprod=sprod,
                    tau_n1=tau_n1, f=f, Gamma=Gamma, rhom1=rhom1,
                    rnorm=rnorm, its=its,
                    reason=jnp.asarray(conv, jnp.int32), hist=hist2)

    def cond(s):
        return (s["reason"] == 0) & (s["its"] < cfg.max_it)

    out = lax.while_loop(cond, body, st0)
    reason = finalize_reason(out["reason"], out["its"], cfg)
    return SolveResult(out["x"], out["its"], out["rnorm"], reason,
                       out["hist"], rnorm0)
