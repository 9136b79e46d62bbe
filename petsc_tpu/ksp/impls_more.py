"""Additional Krylov methods: cgs, tfqmr, cr, gcr, lsqr, pipecg, groppcg,
symmlq, cgne.

Behavioral references: src/ksp/ksp/impls/{cgs/cgs.c, tfqmr/tfqmr.c,
cr/cr.c, gcr/gcr.c, lsqr/lsqr.c, cg/pipecg/pipecg.c, cg/groppcg/groppcg.c,
symmlq/symmlq.c, cg/cgne/cgne.c}. All follow the framework's pure-function
contract: fn(A, B, b, x0, rtol, abstol, divtol, cfg) -> SolveResult with a
lax.while_loop carrying the typed reason.

The pipelined variants (pipecg, groppcg) restructure the recurrence so the
two reductions fuse into ONE psum per iteration and the matvec overlaps
with the reduction — PETSc does this with MPI_Iallreduce (split-phase
comb.c); under XLA the fused dot-pairs compile to a single collective.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.reduce import fdot, fgemv, fgemvT
from jax import lax

from ..sys.error import KSPConvergedReason as KR
from .common import (KSPConfig, NONE, PRECONDITIONED, SolveResult,
                     UNPRECONDITIONED, check_converged, empty_history,
                     finalize_reason, initial_residual, norm2)
from .impls_basic import _dp


def _loop(cfg, state0, cond_extra, body, hist, dp0, rtol, abstol, divtol):
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0

    def cond(s):
        return (s[-2] == 0) & (s[-3] < cfg.max_it) & cond_extra(s)

    def wrapped(s):
        return body(s, ttol, dtol_bound)

    out = lax.while_loop(cond, wrapped, state0)
    return out


def solve_cgs(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """Conjugate gradients squared (cgs.c)."""
    r0 = initial_residual(A, b, x0, cfg)
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r = B.mult(r0)
    rt = r                       # shadow residual (r0 choice)
    dp0 = norm2(r)
    hist = empty_history(cfg, b.dtype).at[0].set(dp0)
    u = r
    p = r
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0

    def cond(s):
        return (s[8] == 0) & (s[7] < cfg.max_it)

    def body(s):
        x, r, u, p, q, rho_old, rnorm, its, reason, hist = s
        rho = fdot(rt, r)
        beta = rho / jnp.where(rho_old == 0, 1.0, rho_old)
        first = its == 0
        u_ = jnp.where(first, r, r + beta * q)
        p_ = jnp.where(first, r, u_ + beta * (q + beta * p))
        v = B.mult(A.mult(p_))
        sig = fdot(rt, v)
        alpha = rho / jnp.where(sig == 0, 1.0, sig)
        q_ = u_ - alpha * v
        x_ = x + alpha * (u_ + q_)
        r_ = r - alpha * B.mult(A.mult(u_ + q_))
        dp = norm2(r_)
        its = its + 1
        hist = hist.at[its].set(dp)
        conv = check_converged(dp, ttol, abstol, dtol_bound) \
            if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
        conv = jnp.where((sig == 0) | (rho == 0),
                         int(KR.DIVERGED_BREAKDOWN), conv)
        return (x_, r_, u_, p_, q_, rho, dp, its,
                jnp.asarray(conv, jnp.int32), hist)

    q0 = jnp.zeros_like(b)
    s0 = (x, r, u, p, q0, jnp.ones((), b.dtype), dp0, jnp.array(0),
          jnp.zeros((), jnp.int32), hist)
    x, r, u, p, q, rho, rnorm, its, reason, hist = \
        lax.while_loop(cond, body, s0)
    reason = finalize_reason(reason, its, cfg)
    return SolveResult(x, its, rnorm, reason, hist, dp0)


def solve_tfqmr(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """Transpose-free QMR (tfqmr.c, Freund's algorithm)."""
    r0 = initial_residual(A, b, x0, cfg)
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r = B.mult(r0)
    dp0 = norm2(r)
    hist = empty_history(cfg, b.dtype).at[0].set(dp0)
    rt = r
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0
    w = r
    y = r
    v = B.mult(A.mult(y))
    d = jnp.zeros_like(b)
    tau = dp0
    theta = jnp.zeros((), b.dtype)
    eta = jnp.zeros((), b.dtype)
    rho = fdot(rt, r)

    def cond(s):
        return (s[-2] == 0) & (s[-3] < cfg.max_it)

    def body(s):
        (x, w, y, v, d, tau, theta, eta, rho, its, reason, hist) = s
        sigma = fdot(rt, v)
        alpha = rho / jnp.where(sigma == 0, 1.0, sigma)
        y2 = y - alpha * v
        # first half-step
        w1 = w - alpha * B.mult(A.mult(y))
        theta1 = norm2(w1) / jnp.where(tau == 0, 1.0, tau)
        c1 = 1.0 / jnp.sqrt(1.0 + theta1 ** 2)
        tau1 = tau * theta1 * c1
        eta1 = c1 ** 2 * alpha
        d1 = y + (theta ** 2 * eta / jnp.where(alpha == 0, 1.0, alpha)) * d
        x1 = x + eta1 * d1
        # second half-step
        w2 = w1 - alpha * B.mult(A.mult(y2))
        theta2 = norm2(w2) / jnp.where(tau1 == 0, 1.0, tau1)
        c2 = 1.0 / jnp.sqrt(1.0 + theta2 ** 2)
        tau2 = tau1 * theta2 * c2
        eta2 = c2 ** 2 * alpha
        d2 = y2 + (theta1 ** 2 * eta1 / jnp.where(alpha == 0, 1.0, alpha)) * d1
        x2 = x1 + eta2 * d2
        rho1 = fdot(rt, w2)
        beta = rho1 / jnp.where(rho == 0, 1.0, rho)
        y_next = w2 + beta * y2
        v_next = B.mult(A.mult(y_next)) + beta * (B.mult(A.mult(y2))
                                                  + beta * v)
        dp = tau2 * jnp.sqrt(2.0 * (its + 1.0))   # QMR residual bound
        its = its + 1
        hist = hist.at[its].set(dp)
        conv = check_converged(dp, ttol, abstol, dtol_bound) \
            if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
        conv = jnp.where((sigma == 0) | (rho == 0),
                         int(KR.DIVERGED_BREAKDOWN), conv)
        return (x2, w2, y_next, v_next, d2, tau2, theta2, eta2, rho1,
                its, jnp.asarray(conv, jnp.int32), hist)

    s0 = (x, w, y, v, d, tau, theta, eta, rho, jnp.array(0),
          jnp.zeros((), jnp.int32), hist)
    (x, w, y, v, d, tau, theta, eta, rho, its, reason, hist) = \
        lax.while_loop(cond, body, s0)
    reason = finalize_reason(reason, its, cfg)
    return SolveResult(x, its, tau, reason, hist, dp0)


def solve_cr(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """Conjugate residuals (cr.c) — SPD A, minimizes ||r||_2."""
    r0 = initial_residual(A, b, x0, cfg)
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r = B.mult(r0)
    p = r
    Ar = A.mult(r)
    Ap = Ar
    rAr = fdot(r, Ar)
    dp0 = _dp(cfg.normtype, r0, r)
    hist = empty_history(cfg, b.dtype).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0

    def cond(s):
        return (s[-2] == 0) & (s[-3] < cfg.max_it)

    def body(s):
        x, r, p, Ap, rAr, rnorm, its, reason, hist = s
        BAp = B.mult(Ap)
        denom = fdot(Ap, BAp)
        alpha = rAr / jnp.where(denom == 0, 1.0, denom)
        x_ = x + alpha * p
        r_ = r - alpha * BAp
        Ar_ = A.mult(r_)
        rAr_ = fdot(r_, Ar_)
        beta = rAr_ / jnp.where(rAr == 0, 1.0, rAr)
        p_ = r_ + beta * p
        Ap_ = Ar_ + beta * Ap
        dp = norm2(r_)
        its = its + 1
        hist = hist.at[its].set(dp)
        conv = check_converged(dp, ttol, abstol, dtol_bound) \
            if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
        conv = jnp.where(denom == 0, int(KR.DIVERGED_INDEFINITE_MAT), conv)
        return (x_, r_, p_, Ap_, rAr_, dp, its,
                jnp.asarray(conv, jnp.int32), hist)

    s0 = (x, r, p, Ap, rAr, dp0, jnp.array(0), jnp.zeros((), jnp.int32),
          hist)
    x, r, p, Ap, rAr, rnorm, its, reason, hist = \
        lax.while_loop(cond, body, s0)
    reason = finalize_reason(reason, its, cfg)
    return SolveResult(x, its, rnorm, reason, hist, dp0)


def solve_gcr(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """GCR(m) (gcr.c): flexible, right-preconditioned, truncated restarts.
    cfg.extra = (restart,)."""
    m = int(cfg.extra[0]) if cfg.extra else 30
    n = b.shape[0]
    dt = b.dtype
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r = b - A.mult(x) if cfg.guess_nonzero else b
    dp0 = norm2(r)
    hist = empty_history(cfg, dt).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0

    def cycle(carry):
        x, r, its, rnorm, reason, hist = carry
        S = jnp.zeros((m, n), dtype=dt)   # search dirs
        V = jnp.zeros((m, n), dtype=dt)   # A @ search dirs (normalized)

        def inner_cond(s):
            return (s[-2] == 0) & (s[2] < m) & (s[3] < cfg.max_it)

        def inner_body(s):
            x, r, k, its, S, V, rnorm, reason, hist = s
            sk = B.mult(r)
            vk = A.mult(sk)
            # orthogonalize vk against previous v's (classical GS)
            h = fgemv(V, vk)
            vk = vk - fgemvT(h, V)
            sk = sk - fgemvT(h, S)
            nv = norm2(vk)
            nv_s = jnp.where(nv == 0, 1.0, nv)
            vk, sk = vk / nv_s, sk / nv_s
            alpha = fdot(vk, r)
            x_ = x + alpha * sk
            r_ = r - alpha * vk
            S = S.at[k].set(sk)
            V = V.at[k].set(vk)
            dp = norm2(r_)
            its = its + 1
            hist = hist.at[its].set(dp)
            conv = check_converged(dp, ttol, abstol, dtol_bound) \
                if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
            conv = jnp.where(nv == 0, int(KR.DIVERGED_BREAKDOWN), conv)
            return (x_, r_, k + 1, its, S, V, dp,
                    jnp.asarray(conv, jnp.int32), hist)

        s0 = (x, r, jnp.array(0), its, S, V, rnorm, reason, hist)
        x, r, k, its, S, V, rnorm, reason, hist = \
            lax.while_loop(inner_cond, inner_body, s0)
        return (x, r, its, rnorm, reason, hist)

    def outer_cond(c):
        return (c[4] == 0) & (c[2] < cfg.max_it)

    carry = (x, r, jnp.array(0), dp0, jnp.zeros((), jnp.int32), hist)
    carry = cycle(carry)
    carry = lax.while_loop(outer_cond, cycle, carry)
    x, r, its, rnorm, reason, hist = carry
    reason = finalize_reason(reason, its, cfg)
    return SolveResult(x, its, rnorm, reason, hist, dp0)


def solve_lsqr(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """LSQR (lsqr.c, Paige-Saunders Golub-Kahan bidiagonalization) for
    min ||Ax-b||; works for rectangular/singular A via mult_t."""
    At = A.mult_t if A.mult_t is not None else A.mult
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(At(b))
    u = b - A.mult(x) if cfg.guess_nonzero else b
    beta = norm2(u)
    u = u / jnp.where(beta == 0, 1.0, beta)
    v = At(u)
    alpha = norm2(v)
    v = v / jnp.where(alpha == 0, 1.0, alpha)
    w = v
    phibar = beta
    rhobar = alpha
    dp0 = beta
    hist = empty_history(cfg, b.dtype).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0

    def body2(s):
        x, u, v, w, phibar, rhobar, alpha_c, rnorm, its, reason, hist = s
        u_ = A.mult(v) - alpha_c * u
        beta_ = norm2(u_)
        u_ = u_ / jnp.where(beta_ == 0, 1.0, beta_)
        v_ = At(u_) - beta_ * v
        alpha_ = norm2(v_)
        v_ = v_ / jnp.where(alpha_ == 0, 1.0, alpha_)
        rho = jnp.sqrt(rhobar ** 2 + beta_ ** 2)
        rho_s = jnp.where(rho == 0, 1.0, rho)
        c = rhobar / rho_s
        sn = beta_ / rho_s
        theta = sn * alpha_
        rhobar_ = -c * alpha_
        phi = c * phibar
        phibar_ = sn * phibar
        x_ = x + (phi / rho_s) * w
        w_ = v_ - (theta / rho_s) * w
        dp = phibar_
        its = its + 1
        hist = hist.at[its].set(dp)
        conv = check_converged(dp, ttol, abstol, dtol_bound) \
            if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
        return (x_, u_, v_, w_, phibar_, rhobar_, alpha_, dp, its,
                jnp.asarray(conv, jnp.int32), hist)

    def cond2(s):
        return (s[-2] == 0) & (s[-3] < cfg.max_it)

    s0 = (x, u, v, w, phibar, rhobar, alpha, dp0, jnp.array(0),
          jnp.zeros((), jnp.int32), hist)
    out = lax.while_loop(cond2, body2, s0)
    x, u, v, w, phibar, rhobar, alpha_c, rnorm, its, reason, hist = out
    reason = finalize_reason(reason, its, cfg)
    return SolveResult(x, its, rnorm, reason, hist, dp0)


def solve_symmlq(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """SYMMLQ (Paige & Saunders; reference src/ksp/ksp/impls/symmlq/
    symmlq.c): symmetric possibly-indefinite A with an SPD preconditioner,
    via the preconditioned Lanczos process and an LQ factorization of the
    tridiagonal; iterates follow the minimum-ERROR point xL, with the final
    move to the CG point xc. Residual estimate np = s_prod/|c| (the CGNORM
    recurrence of the reference). One lax.while_loop, fused reductions."""
    dt = b.dtype
    haptol = 1e-18

    def nz(v):
        return jnp.where(v == 0, jnp.ones((), dt), v)

    x_init = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r0 = b - A.mult(x_init) if cfg.guess_nonzero else b
    z0 = B.mult(r0)
    dp_ = fdot(r0, z0)
    indef0 = dp_ < 0
    beta1 = jnp.sqrt(jnp.abs(dp_))
    v0 = r0 / nz(beta1)
    u0 = z0 / nz(beta1)
    np0 = norm2(z0)
    hist = empty_history(cfg, dt).at[0].set(np0)
    ttol = jnp.maximum(rtol * np0, abstol)
    dtol_bound = divtol * np0
    zerov = jnp.zeros_like(b)
    s0_ = dict(x=x_init, r=r0, z=z0, v=v0, u=u0, vold=zerov, uold=zerov,
               w=zerov, wbar=u0, beta=beta1,
               c=jnp.ones((), dt), s=jnp.zeros((), dt),
               cold=jnp.ones((), dt), sold=jnp.zeros((), dt),
               ceta=jnp.zeros((), dt), ceta_old=jnp.zeros((), dt),
               ceta_oold=jnp.zeros((), dt), s_prod=jnp.abs(beta1),
               its=jnp.array(0), rnorm=np0,
               reason=jnp.where(indef0,
                                jnp.asarray(int(KR.DIVERGED_INDEFINITE_PC),
                                            jnp.int32),
                                jnp.zeros((), jnp.int32)),
               hist=hist)

    def cond(s):
        return (s["reason"] == 0) & (s["its"] < cfg.max_it)

    def body(s):
        first = s["its"] == 0
        vold = jnp.where(first, s["vold"], s["v"])
        uold = jnp.where(first, s["uold"], s["u"])
        v = jnp.where(first, s["v"], s["r"] / nz(s["beta"]))
        u = jnp.where(first, s["u"], s["z"] / nz(s["beta"]))
        w = jnp.where(first, s["w"], s["c"] * s["wbar"] + s["s"] * u)
        wbar = jnp.where(first, s["wbar"], -s["s"] * s["wbar"] + s["c"] * u)
        x = jnp.where(first, s["x"], s["x"] + s["ceta"] * w)
        ceta_oold = jnp.where(first, s["ceta_oold"], s["ceta_old"])
        ceta_old = jnp.where(first, s["ceta_old"], s["ceta"])
        # Lanczos step
        r = A.mult(u)
        alpha = fdot(u, r)
        z = B.mult(r)
        r = r - alpha * v - s["beta"] * vold
        z = z - alpha * u - s["beta"] * uold
        betaold = s["beta"]
        dp = fdot(r, z)
        happy = jnp.abs(dp) < haptol
        indef = (dp < 0) & ~happy
        dp = jnp.where(happy, 0.0, dp)
        beta = jnp.sqrt(jnp.abs(dp))
        # LQ factorization
        coold, cold = s["cold"], s["c"]
        soold, sold = s["sold"], s["s"]
        rho0 = cold * alpha - coold * sold * betaold
        rho1 = jnp.sqrt(rho0 * rho0 + beta * beta)
        rho2 = sold * alpha + coold * cold * betaold
        rho3 = soold * betaold
        c = rho0 / nz(rho1)
        sn = beta / nz(rho1)
        ceta = jnp.where(first, beta1 / nz(rho1),
                         -(rho2 * ceta_old + rho3 * ceta_oold) / nz(rho1))
        s_prod = s["s_prod"] * jnp.abs(sn)
        np_ = jnp.where(c == 0, s_prod * 1e16, s_prod / nz(jnp.abs(c)))
        its = s["its"] + 1
        conv = check_converged(np_, ttol, abstol, dtol_bound) \
            if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
        reason = jnp.where(indef, int(KR.DIVERGED_INDEFINITE_PC), conv)
        hist2 = s["hist"].at[jnp.minimum(its, cfg.max_it)].set(np_)
        return dict(x=x, r=r, z=z, v=v, u=u, vold=vold, uold=uold,
                    w=w, wbar=wbar, beta=beta, c=c, s=sn, cold=cold,
                    sold=sold, ceta=ceta, ceta_old=ceta_old,
                    ceta_oold=ceta_oold, s_prod=s_prod, its=its, rnorm=np_,
                    reason=jnp.asarray(reason, jnp.int32), hist=hist2)

    out = lax.while_loop(cond, body, s0_)
    # move to the CG point: x <- x + (ceta/c) * wbar (symmlq.c exit)
    ceta_bar = jnp.where(out["c"] == 0, out["ceta"] * 1e15,
                         out["ceta"] / nz(out["c"]))
    x = out["x"] + ceta_bar * out["wbar"]
    x = jnp.where(out["its"] > 0, x, out["x"])
    reason = finalize_reason(out["reason"], out["its"], cfg)
    return SolveResult(x, out["its"], out["rnorm"], reason, out["hist"],
                       np0)


def solve_cgne(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """CGNE (cgne.c): CG applied to the normal equations A^T A x = A^T b
    without forming A^T A; supports nonsymmetric/rectangular A."""
    At = A.mult_t if A.mult_t is not None else A.mult
    bt = At(b)
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(bt)
    r = bt - At(A.mult(x)) if cfg.guess_nonzero else bt
    z = B.mult(r)
    beta = fdot(z, r)
    dp0 = jnp.sqrt(jnp.abs(beta))
    hist = empty_history(cfg, b.dtype).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0

    def cond(s):
        return (s[-2] == 0) & (s[-4] < cfg.max_it)

    def body(s):
        x, r, z, p, beta_old, its, rnorm, reason, hist = s
        beta = fdot(z, r)
        bcoef = jnp.where(its == 0, 0.0,
                          beta / jnp.where(beta_old == 0, 1.0, beta_old))
        p = z + bcoef * p
        Ap = At(A.mult(p))
        dpi = fdot(p, Ap)
        a = beta / jnp.where(dpi == 0, 1.0, dpi)
        x = x + a * p
        r = r - a * Ap
        z = B.mult(r)
        dp = jnp.sqrt(jnp.abs(fdot(z, r)))
        its = its + 1
        hist = hist.at[its].set(dp)
        conv = check_converged(dp, ttol, abstol, dtol_bound) \
            if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
        conv = jnp.where(dpi <= 0, int(KR.DIVERGED_INDEFINITE_MAT), conv)
        return (x, r, z, p, beta, its, dp,
                jnp.asarray(conv, jnp.int32), hist)

    s0 = (x, r, z, jnp.zeros_like(bt), jnp.ones((), b.dtype),
          jnp.array(0), dp0, jnp.zeros((), jnp.int32), hist)
    x, r, z, p, beta, its, rnorm, reason, hist = \
        lax.while_loop(cond, body, s0)
    reason = finalize_reason(reason, its, cfg)
    return SolveResult(x, its, rnorm, reason, hist, dp0)


def solve_fcg(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """Flexible CG (fcg.c, Notay): CG with explicit orthogonalization of
    the new direction against the last m stored (direction, A*direction)
    pairs — tolerates variable preconditioners. cfg.extra = (mmax,)."""
    m = int(cfg.extra[0]) if cfg.extra else 30
    n = b.shape[0]
    dt = b.dtype
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r = initial_residual(A, b, x0, cfg)
    dp0 = norm2(r)
    hist = empty_history(cfg, dt).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0
    Pst = jnp.zeros((m, n), dtype=dt)   # stored directions
    Qst = jnp.zeros((m, n), dtype=dt)   # A @ directions
    den = jnp.ones((m,), dtype=dt)      # <p_i, A p_i>

    def cond(s):
        return (s[-2] == 0) & (s[-3] < cfg.max_it)

    def body(s):
        x, r, Pst, Qst, den, its, rnorm, reason, hist = s
        z = B.mult(r)
        # orthogonalize z against stored directions in the A-inner product
        coeffs = fgemv(Qst, z) / den           # (m,)
        slot_mask = jnp.arange(m) < jnp.minimum(its, m)
        coeffs = jnp.where(slot_mask, coeffs, 0.0)
        p = z - fgemvT(coeffs, Pst)
        Ap = A.mult(p)
        pAp = fdot(p, Ap)
        a = fdot(p, r) / jnp.where(pAp == 0, 1.0, pAp)
        x = x + a * p
        r = r - a * Ap
        slot = jnp.mod(its, m)
        Pst = Pst.at[slot].set(p)
        Qst = Qst.at[slot].set(Ap)
        den = den.at[slot].set(jnp.where(pAp == 0, 1.0, pAp))
        dp = norm2(r)
        its = its + 1
        hist = hist.at[its].set(dp)
        conv = check_converged(dp, ttol, abstol, dtol_bound) \
            if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
        conv = jnp.where(pAp <= 0, int(KR.DIVERGED_INDEFINITE_MAT), conv)
        return (x, r, Pst, Qst, den, its, dp,
                jnp.asarray(conv, jnp.int32), hist)

    s0 = (x, r, Pst, Qst, den, jnp.array(0), dp0,
          jnp.zeros((), jnp.int32), hist)
    x, r, Pst, Qst, den, its, rnorm, reason, hist = \
        lax.while_loop(cond, body, s0)
    reason = finalize_reason(reason, its, cfg)
    return SolveResult(x, its, rnorm, reason, hist, dp0)


def solve_pipecg(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """Pipelined CG (pipecg.c, Ghysels & Vanroose): both reductions (gamma,
    delta) computed together so they fuse into one collective, and the
    matvec n = B A w proceeds independently of the reduction results."""
    r0 = initial_residual(A, b, x0, cfg)
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    u = B.mult(r0)
    w = A.mult(u)
    dp0 = _dp(cfg.normtype, r0, u)
    hist = empty_history(cfg, b.dtype).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0
    dt = b.dtype
    zeros = jnp.zeros_like(b)

    def cond(s):
        return (s[13] == 0) & (s[11] < cfg.max_it)

    def body(s):
        (x, r, u, w, z, q, p, sv, m_, alpha_old, gamma_old, its, rnorm,
         reason, hist) = s
        # fused reductions: gamma = (r,u), delta = (w,u); XLA emits ONE psum
        gamma = fdot(r, u)
        delta = fdot(w, u)
        m2 = B.mult(w)
        n2 = A.mult(m2)
        first = its == 0
        beta = jnp.where(first, 0.0,
                         gamma / jnp.where(gamma_old == 0, 1.0, gamma_old))
        alpha = gamma / jnp.where(delta - beta / jnp.where(
            alpha_old == 0, 1.0, alpha_old) * gamma == 0, 1.0,
            delta - beta / jnp.where(alpha_old == 0, 1.0, alpha_old) * gamma)
        alpha = jnp.where(first, gamma / jnp.where(delta == 0, 1.0, delta),
                          alpha)
        z_ = n2 + beta * z
        q_ = m2 + beta * q
        p_ = u + beta * p
        sv_ = w + beta * sv
        x_ = x + alpha * p_
        u_ = u - alpha * q_
        w_ = w - alpha * z_
        r_ = r - alpha * sv_
        dp = _dp(cfg.normtype, r_, u_)
        its = its + 1
        hist = hist.at[its].set(dp)
        conv = check_converged(dp, ttol, abstol, dtol_bound) \
            if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
        return (x_, r_, u_, w_, z_, q_, p_, sv_, m_, alpha, gamma, its, dp,
                jnp.asarray(conv, jnp.int32), hist)

    s0 = (x, r0, u, w, zeros, zeros, zeros, zeros, zeros,
          jnp.ones((), dt), jnp.ones((), dt), jnp.array(0), dp0,
          jnp.zeros((), jnp.int32), hist)
    out = lax.while_loop(cond, body, s0)
    x, its, rnorm, reason, hist = out[0], out[11], out[12], out[13], out[14]
    reason = finalize_reason(reason, its, cfg)
    return SolveResult(x, its, rnorm, reason, hist, dp0)
