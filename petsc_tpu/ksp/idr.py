"""IDR(s): Induced Dimension Reduction (van Gijzen & Sonneveld).

Behavioral reference: the reference ships IDR via external interfaces; the
method (TOMS Algorithm 913 idrs) converges in at most N + N/s matvecs for
nonsymmetric systems with short recurrences — between BiCGStab (s=1
equivalent) and full GMRES.

TPU design: the shadow space P (n x s) and the direction blocks G, U live
as stacked arrays; the inner k = 0..s-1 sweep is unrolled at trace time
(s is STATIC from -ksp_idr_s, default 4), so each outer iteration is one
fused XLA region containing s preconditioned matvecs, the s x s
projections (tiny MXU matmuls), and the omega step. The small triangular
solves on M[k:, k:] use static slices — no dynamic shapes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.reduce import fdot, fgemvT
from jax import lax

from .common import (KSPConfig, NONE, SolveResult, check_converged,
                     empty_history, finalize_reason, initial_residual,
                     norm2)


def solve_idr(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """IDR(s) with biorthogonalized intermediate residuals."""
    s = 4
    for k, v in cfg.extra:
        if k == "s":
            s = int(v)

    r0 = initial_residual(A, b, x0, cfg)
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    n = b.shape[0]
    dt = b.dtype
    r = r0
    dp0 = norm2(r)
    hist = empty_history(cfg, dt).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0

    # fixed shadow space: orthonormalized deterministic pseudo-random block
    rng = np.random.default_rng(20260817)
    P_np, _ = np.linalg.qr(rng.standard_normal((n, s)))
    P = jnp.asarray(P_np.T, dt)                  # (s, n) rows

    G = jnp.zeros((s, n), dt)
    U = jnp.zeros((s, n), dt)
    M = jnp.eye(s, dtype=dt)
    om = jnp.ones((), dt)

    def body(st):
        x, r, G, U, M, om, rnorm, its, reason = st
        f = P @ r                                # (s,)
        for k in range(s):
            # c solves M[k:, k:] c = f[k:]  (static lower-right block)
            Mk = M[k:, k:]
            c = jnp.linalg.solve(
                Mk + 1e-300 * jnp.eye(s - k, dtype=dt), f[k:])
            v = r - fgemvT(c, G[k:])
            v = B.mult(v)
            uk = fgemvT(c, U[k:]) + om * v
            gk = A.mult(uk)
            # biorthogonalize against P[:k]
            for i in range(k):
                alpha = fdot(P[i], gk) / jnp.where(M[i, i] == 0, 1.0,
                                                       M[i, i])
                gk = gk - alpha * G[i]
                uk = uk - alpha * U[i]
            G = G.at[k].set(gk)
            U = U.at[k].set(uk)
            mk = P[k:] @ gk                      # new column entries
            M = M.at[k:, k].set(mk)
            beta = f[k] / jnp.where(M[k, k] == 0, 1.0, M[k, k])
            r = r - beta * gk
            x = x + beta * uk
            if k + 1 < s:
                f = f.at[k + 1:].add(-beta * mk[1:])
        # move to the next Sonneveld space
        v = B.mult(r)
        t = A.mult(v)
        tt = fdot(t, t)
        om = fdot(t, r) / jnp.where(tt == 0, 1.0, tt)
        x = x + om * v
        r = r - om * t
        dp = norm2(r)
        its = its + 1
        conv = check_converged(dp, ttol, abstol, dtol_bound) \
            if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
        return (x, r, G, U, M, om, dp, its, jnp.asarray(conv, jnp.int32))

    def cond(st):
        return (st[-1] == 0) & (st[-2] < cfg.max_it)

    st0 = (x, r, G, U, M, om, dp0, jnp.array(0), jnp.zeros((), jnp.int32))
    x, r, G, U, M, om, rnorm, its, reason = lax.while_loop(cond, body, st0)
    reason = finalize_reason(reason, its, cfg)
    hist = hist.at[jnp.minimum(its, hist.shape[0] - 1)].set(rnorm) \
        if hist.shape[0] else hist
    return SolveResult(x, its, rnorm, reason, hist, dp0)
