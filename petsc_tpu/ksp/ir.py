"""Mixed-precision iterative refinement driver.

Role: the TPU has no native f64 ALUs (f64 is software-emulated, ~5x slower
than f32 streams), so the idiomatic way to reach PETSc's double-precision
accuracy at TPU speed is classical iterative refinement (Wilkinson; the
GMRES-IR scheme of Carson & Higham used by HPL-AI): an inner Krylov solve
runs entirely in f32 on a f32 copy of the operator, the outer loop
computes true f64 residuals with the f64 operator and accumulates the
solution in f64. Each outer pass regains ~7 digits, so 2-3 passes reach
rtol 1e-12 while >90% of the flops run at f32 rates.

The reference has no equivalent (CPUs do f64 natively); the capability it
maps to is PETSc's `--with-precision=single` builds + `-pc_precision`
mixed-precision preconditioner options.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..sys.error import KSPConvergedReason as KR
from .common import KSPConfig, NONE, SolveResult, empty_history, norm2


def _to_f32(tree):
    def conv(x):
        if hasattr(x, "dtype") and x.dtype == jnp.float64:
            return x.astype(jnp.float32)
        return x
    return jax.tree_util.tree_map(conv, tree)


def solve_ir(inner_fn, inner_cfg, A64, A32, B32, b, x0, rtol, abstol,
             divtol, cfg: KSPConfig):
    """Outer f64 refinement around an inner f32 Krylov solve.
    cfg.extra = (max_outer, inner_rtol)."""
    max_outer = int(cfg.extra[0]) if cfg.extra else 30
    inner_rtol = cfg.extra[1] if len(cfg.extra) > 1 else 1e-6
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r = b - A64.mult(x) if cfg.guess_nonzero else b
    dp0 = norm2(r)
    hist = empty_history(cfg, b.dtype).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0

    def cond(s):
        x, r, rnorm, rnorm_prev, its, inner_its, reason, hist = s
        return (reason == 0) & (its < max_outer)

    def body(s):
        x, r, rnorm, rnorm_prev, its, inner_its, reason, hist = s
        scale = jnp.where(rnorm == 0, 1.0, rnorm)
        res = inner_fn(A32, B32, (r / scale).astype(jnp.float32),
                       jnp.zeros_like(r, dtype=jnp.float32),
                       jnp.float32(inner_rtol), jnp.float32(0.0),
                       jnp.float32(1e30), inner_cfg)
        x = x + scale * res.x.astype(b.dtype)
        r = b - A64.mult(x)
        dp = norm2(r)
        its = its + 1
        inner_its = inner_its + res.its
        hist = hist.at[jnp.minimum(its, cfg.max_it)].set(dp)
        conv = jnp.where(dp <= ttol,
                         jnp.where(dp < abstol, int(KR.CONVERGED_ATOL),
                                   int(KR.CONVERGED_RTOL)), 0)
        conv = jnp.where(dp > dtol_bound, int(KR.DIVERGED_DTOL), conv)
        conv = jnp.where(jnp.isnan(dp) | jnp.isinf(dp),
                         int(KR.DIVERGED_NANORINF), conv)
        # stagnation: refinement stopped improving (f32 floor)
        conv = jnp.where((conv == 0) & (dp > 0.9 * rnorm_prev) & (its > 1),
                         int(KR.CONVERGED_STEP_LENGTH), conv)
        return (x, r, dp, rnorm, its, inner_its,
                jnp.asarray(conv, jnp.int32), hist)

    s0 = (x, r, dp0, jnp.asarray(jnp.inf, b.dtype), jnp.array(0),
          jnp.array(0), jnp.zeros((), jnp.int32), hist)
    x, r, rnorm, rnp, its, inner_its, reason, hist = \
        lax.while_loop(cond, body, s0)
    reason = jnp.where((reason == 0), int(KR.DIVERGED_ITS), reason)
    return SolveResult(x, inner_its, rnorm, reason, hist, dp0)
