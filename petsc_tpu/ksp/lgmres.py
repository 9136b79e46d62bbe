"""LGMRES(m, k): GMRES augmented with error approximations.

Behavioral reference: src/ksp/ksp/impls/gmres/lgmres/lgmres.c (Baker,
Jessup & Manteuffel "loose" GMRES): each restart cycle runs m-k Arnoldi
directions and then k "augmentation" directions whose sources are the
error approximations z_j = x_after_cycle - x_before_cycle of previous
cycles; the correction of the finished cycle replaces the oldest stored
z (cyclic). This recovers most of full-GMRES convergence at restart cost,
curing the stall of plain GMRES(m) on restart-sensitive problems.

TPU design: identical one-program structure to gmres.py — the cycle is a
lax.while_loop over a static m+1-row basis V in HBM; the per-direction
Arnoldi SOURCE is selected with a predicated gather (V[kk] for Krylov
directions, AUG[j] for augmented ones), and the solution update uses the
stored preimage matrix U (m, n) so both direction kinds contribute x += y@U
with no host branching. cfg.extra = (restart, refine, aug_dim).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.reduce import fgemv, fgemvT
from jax import lax

from ..sys.error import KSPConvergedReason as KR
from .common import (KSPConfig, NONE, SolveResult, check_converged,
                     empty_history, finalize_reason, norm2)

HAPTOL = 1e-10


def solve_lgmres(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    m = int(cfg.extra[0]) if cfg.extra else 30
    refine = int(cfg.extra[1]) if len(cfg.extra) > 1 else 0
    k_aug = int(cfg.extra[2]) if len(cfg.extra) > 2 else 2
    k_aug = min(k_aug, m - 1)
    if k_aug <= 0:
        from .gmres import solve_gmres
        return solve_gmres(A, B, b, x0, rtol, abstol, divtol, cfg)
    n = b.shape[0]
    dt = b.dtype
    x_init = x0 if cfg.guess_nonzero else jnp.zeros_like(b)

    def prec_residual(x, first):
        if cfg.guess_nonzero or not first:
            r = b - A.mult(x)
        else:
            r = b
        return B.mult(r)

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

    def cycle(x, AUG, AAUG, a_ct, its, hist, ttol, dtol_bound, first):
        z = prec_residual(x, first)
        res0 = norm2(z)
        n_kry = m - a_ct                      # Krylov directions this cycle
        V = jnp.zeros((m + 1, n), dtype=dt)
        V = V.at[0].set(z / jnp.where(res0 == 0, 1.0, res0))
        U = jnp.zeros((m, n), dtype=dt)       # preimages for the update
        HES = jnp.zeros((m + 1, m), dtype=dt)  # unrotated Hessenberg
        rs = jnp.zeros((m + 1,), dtype=dt).at[0].set(res0)
        cc = jnp.zeros((m,), dtype=dt)
        ss = jnp.zeros((m,), dtype=dt)
        R = jnp.zeros((m + 1, m), dtype=dt)

        def inner_cond(s):
            (V, U, HES, R, cc, ss, rs, kk, its, res, reason, hist) = s
            return (reason == 0) & (kk < m) & (its < cfg.max_it)

        def inner_body(s):
            (V, U, HES, R, cc, ss, rs, kk, its, res, reason, hist) = s
            is_aug = kk >= n_kry
            j = jnp.clip(kk - n_kry, 0, k_aug - 1)
            src = jnp.where(is_aug, AUG[j], V[kk])
            U = U.at[kk].set(src)
            # aug steps reuse the CACHED product BA*z_j (A_AUGVEC,
            # lgmres.c) — an augmentation direction costs no matvec
            w = lax.cond(is_aug, lambda _: AAUG[j],
                         lambda _: B.mult(A.mult(V[kk])), None)
            h, w = orthogonalize(V, w)
            tt = norm2(w)
            h = h.at[kk + 1].set(tt)
            hapbnd = jnp.minimum(
                jnp.abs(tt / jnp.where(rs[kk] == 0, 1.0, rs[kk])), HAPTOL)
            hapend = tt < hapbnd
            V = V.at[kk + 1].set(
                jnp.where(tt == 0, 0.0, w / jnp.where(tt == 0, 1.0, tt)))

            def rot_body(i, hh):
                t = hh[i]
                hh = hh.at[i].set(cc[i] * t + ss[i] * hh[i + 1])
                hh = hh.at[i + 1].set(-ss[i] * t + cc[i] * hh[i + 1])
                return hh

            HES = HES.at[:, kk].set(h)        # raw column, pre-rotation
            h = lax.fori_loop(0, kk, rot_body, h)
            g = jnp.sqrt(h[kk] ** 2 + h[kk + 1] ** 2)
            g_safe = jnp.where(g == 0, 1.0, g)
            c, sn = h[kk] / g_safe, h[kk + 1] / g_safe
            cc = cc.at[kk].set(c)
            ss = ss.at[kk].set(sn)
            R = R.at[:, kk].set(h.at[kk].set(g).at[kk + 1].set(0.0))
            rs = rs.at[kk + 1].set(-sn * rs[kk])
            rs = rs.at[kk].set(c * rs[kk])
            res = jnp.abs(rs[kk + 1])
            res = jnp.where(hapend, 0.0, res)
            its = its + 1
            hist = hist.at[jnp.minimum(its, cfg.max_it)].set(res)
            conv = check_converged(res, ttol, abstol, dtol_bound) \
                if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
            conv = jnp.where(hapend & (conv == 0),
                             int(KR.CONVERGED_HAPPY_BREAKDOWN), conv)
            conv = jnp.where((g == 0) & ~hapend, int(KR.DIVERGED_NULL), conv)
            return (V, U, HES, R, cc, ss, rs, kk + 1, its,
                    res, jnp.asarray(conv, jnp.int32), hist)

        reason0 = jnp.zeros((), jnp.int32)
        s0 = (V, U, HES, R, cc, ss, rs, jnp.array(0), its, res0, reason0,
              hist)
        V, U, HES, R, cc, ss, rs, kk, its, res, reason, hist = \
            lax.while_loop(inner_cond, inner_body, s0)

        def back_body(i_, y):
            i = kk - 1 - i_
            num = rs[i] - jnp.where(jnp.arange(m) > i, R[i, :] * y, 0.0).sum()
            d = R[i, i]
            yi = num / jnp.where(d == 0, 1.0, d)
            return y.at[i].set(jnp.where(i >= 0, yi, 0.0))

        y = lax.fori_loop(0, kk, back_body, jnp.zeros((m,), dtype=dt))
        zc = y @ U                            # this cycle's error approx
        Azc = (HES @ y) @ V                   # BA*zc = V (Hbar y), no matvec
        x = x + zc
        return x, zc, Azc, its, res, reason, hist, res0

    z0 = prec_residual(x_init, True)
    dp0 = norm2(z0)
    hist0 = empty_history(cfg, dt).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0

    AUG0 = jnp.zeros((k_aug, n), dtype=dt)
    AAUG0 = jnp.zeros((k_aug, n), dtype=dt)

    def store_aug(AUG, AAUG, a_ct, n_cycles, zc, Azc):
        """Scaled error approximation (and its cached BA product) replaces
        the oldest slot (lgmres.c cyclic aug storage); zero corrections are
        skipped."""
        zn = norm2(zc)
        ok = zn > 0
        inv = 1.0 / jnp.where(ok, zn, 1.0)
        slot = n_cycles % k_aug
        AUG = jnp.where(ok, AUG.at[slot].set(zc * inv), AUG)
        AAUG = jnp.where(ok, AAUG.at[slot].set(Azc * inv), AAUG)
        a_ct = jnp.where(ok, jnp.minimum(a_ct + 1, k_aug), a_ct)
        return AUG, AAUG, a_ct

    def outer_cond(s):
        x, AUG, AAUG, a_ct, ncyc, its, rnorm, reason, hist = s
        return (reason == 0) & (its < cfg.max_it)

    def outer_body(s):
        x, AUG, AAUG, a_ct, ncyc, its, rnorm, reason, hist = s
        x, zc, Azc, its, rnorm, reason, hist, _ = cycle(
            x, AUG, AAUG, a_ct, its, hist, ttol, dtol_bound, first=False)
        AUG, AAUG, a_ct = store_aug(AUG, AAUG, a_ct, ncyc, zc, Azc)
        return (x, AUG, AAUG, a_ct, ncyc + 1, its, rnorm, reason, hist)

    x, zc, Azc, its, rnorm, reason, hist, _ = cycle(
        x_init, AUG0, AAUG0, jnp.array(0), jnp.array(0), hist0, ttol,
        dtol_bound, first=True)
    AUG, AAUG, a_ct = store_aug(AUG0, AAUG0, jnp.array(0), jnp.array(0),
                                zc, Azc)
    x, AUG, AAUG, a_ct, ncyc, its, rnorm, reason, hist = lax.while_loop(
        outer_cond, outer_body,
        (x, AUG, AAUG, a_ct, jnp.array(1), its, rnorm, reason, hist))
    reason = finalize_reason(reason, its, cfg)
    return SolveResult(x, its, rnorm, reason, hist, dp0)
