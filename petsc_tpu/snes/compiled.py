"""Fully-jitted Jacobian-free Newton-Krylov (the TPU-native SNES path).

The host-driven SNESSolve mirrors PETSc's structure (one compiled linear
solve per Newton step). This module instead compiles the ENTIRE nonlinear
solve — Newton loop, matrix-free GMRES inner solves on exact jax.jvp
Jacobian actions, cubic backtracking — into one XLA program with a
lax.while_loop, so implicit timestepping and embedded solves run with zero
host round trips. Requires a pure residual fn(x, *args).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.reduce import fgemv, fgemvT
from jax import lax


def _gmres_mf(jvp_fn, b, m, tol):
    """Matrix-free GMRES(m), single cycle, fixed basis size; returns the
    least-squares solution over the Krylov space (enough as an inexact
    Newton step)."""
    n = b.shape[0]
    dt = b.dtype
    nb = jnp.linalg.norm(b)
    nb_s = jnp.where(nb == 0, 1.0, nb)
    V = jnp.zeros((m + 1, n), dt).at[0].set(b / nb_s)
    H = jnp.zeros((m + 1, m), dt)

    def body(k, carry):
        V, H = carry
        w = jvp_fn(V[k])
        h = fgemv(V, w)
        w = w - fgemvT(h, V)
        h2 = fgemv(V, w)      # one refinement pass (CGS2)
        w = w - fgemvT(h2, V)
        h = h + h2
        nw = jnp.linalg.norm(w)
        h = h.at[k + 1].set(nw)
        V = V.at[k + 1].set(jnp.where(nw > 0, w / jnp.where(nw == 0, 1.0, nw),
                                      0.0))
        H = H.at[:, k].set(h)
        return (V, H)

    V, H = lax.fori_loop(0, m, body, (V, H))
    e1 = jnp.zeros((m + 1,), dt).at[0].set(nb)
    y, *_ = jnp.linalg.lstsq(H, e1)
    return fgemvT(y, V[:m])


@functools.partial(jax.jit,
                   static_argnames=("fn", "max_it", "gmres_m", "nargs"))
def jfnk_solve(fn, x0, args, rtol, atol, max_it=50, gmres_m=20,
               inner_rtol=1e-4, nargs=0):
    """Returns (x, its, fnorm, converged). fn(x, *args) -> residual."""
    del nargs

    def F(x):
        return fn(x, *args)

    f0 = F(x0)
    fnorm0 = jnp.linalg.norm(f0)
    ttol = jnp.maximum(rtol * fnorm0, atol)

    def cond(s):
        x, f, fnorm, its, done = s
        return (~done) & (its < max_it)

    def body(s):
        x, f, fnorm, its, done = s
        jvp_fn = lambda v: jax.jvp(F, (x,), (v,))[1]
        step = _gmres_mf(jvp_fn, f, gmres_m, inner_rtol)

        # cubic-ish backtracking: try lambda in {1, 1/2, ... 1/2^6}
        def try_lam(carry, lam):
            best_x, best_f, best_norm, accepted = carry
            xn = x - lam * step
            fn_ = F(xn)
            nn = jnp.linalg.norm(fn_)
            better = (~accepted) & (nn < (1.0 - 1e-4 * lam) * fnorm)
            return (jnp.where(better, xn, best_x),
                    jnp.where(better, fn_, best_f),
                    jnp.where(better, nn, best_norm),
                    accepted | better), None

        lams = 0.5 ** jnp.arange(7, dtype=x.dtype)
        (xn, fn_, nn, acc), _ = lax.scan(try_lam, (x, f, fnorm, False),
                                         lams)
        # if no decrease at all, take the tiny damped step anyway
        xn = jnp.where(acc, xn, x - (1.0 / 64.0) * step)
        fn2 = jnp.where(acc, fn_, F(xn))
        nn2 = jnp.where(acc, nn, jnp.linalg.norm(fn2))
        its = its + 1
        done = nn2 <= ttol
        return (xn, fn2, nn2, its, done)

    x, f, fnorm, its, done = lax.while_loop(
        cond, body, (x0, f0, fnorm0, jnp.array(0), fnorm0 <= ttol))
    return x, its, fnorm, done
