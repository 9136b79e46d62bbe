"""Shared machinery for jitted Krylov solve loops.

Every KSP implementation is a pure function
    fn(A: Op, B: Op, b, x0, rtol, abstol, divtol, cfg) -> SolveResult
written with lax.while_loop, carrying the typed convergence reason in the
loop state (PETSc's KSPConvergedReason design, reference
src/ksp/ksp/interface/iterativ.c:1519 KSPConvergedDefault): converged when
rnorm <= ttol = max(rtol*rnorm0, abstol); diverged when rnorm > divtol*rnorm0
or NaN/Inf (KSPCheckNorm kspimpl.h:568); reaching max_it is DIVERGED_ITS.
Convergence is NOT tested at iteration 0 (chknorm semantics) but the
iteration-0 norm seeds rnorm0 and the monitor history.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp

from ..ops.reduce import fdot

from ..sys.error import KSPConvergedReason as KR

# norm types (string-static at trace time)
PRECONDITIONED = "preconditioned"
UNPRECONDITIONED = "unpreconditioned"
NATURAL = "natural"
NONE = "none"


class SolveResult(NamedTuple):
    x: jnp.ndarray
    its: jnp.ndarray        # int
    rnorm: jnp.ndarray      # final residual norm (per norm type)
    reason: jnp.ndarray     # int, KSPConvergedReason value
    history: jnp.ndarray    # (max_it+1,) residual norms, NaN where unset
    rnorm0: jnp.ndarray
    # final recursive residual, when the method carries one (KSPBuildResidual
    # role). ALSO a memory device: with -ksp_donate_rhs, b can only free its
    # buffer by aliasing an OUTPUT — returning r (same shape, dead b) lets
    # XLA alias them; at 512^3 the un-aliased 1.07 GB rhs pushed the
    # program over the HBM comfort line (round-5: 7.7x per-iteration
    # slowdown vs linear scaling from 256^3).
    r: jnp.ndarray | None = None


@dataclass(frozen=True)
class KSPConfig:
    """Static solver configuration — part of the jit cache key."""
    max_it: int = 10000
    normtype: str = PRECONDITIONED
    guess_nonzero: bool = False
    converged_maxits: bool = False   # -ksp_converged_maxits
    extra: tuple = ()                # solver-specific statics


def norm2(v):
    return jnp.sqrt(fdot(v, v))


def check_converged(dp, ttol, abstol, dtol_bound):
    """KSPConvergedDefault body for n >= 1 (iterativ.c:1585-1620)."""
    bad = jnp.isnan(dp) | jnp.isinf(dp)
    r = jnp.where(dp <= ttol,
                  jnp.where(dp < abstol, int(KR.CONVERGED_ATOL), int(KR.CONVERGED_RTOL)),
                  0)
    r = jnp.where((r == 0) & (dp > dtol_bound), int(KR.DIVERGED_DTOL), r)
    r = jnp.where(bad, int(KR.DIVERGED_NANORINF), r)
    return r


def finalize_reason(reason, its, cfg: KSPConfig):
    """After the loop: max-out handling."""
    hit_max = (reason == 0) & (its >= cfg.max_it)
    code = int(KR.CONVERGED_ITS) if cfg.converged_maxits else int(KR.DIVERGED_ITS)
    return jnp.where(hit_max, code, reason)


def initial_residual(A, b, x0, cfg: KSPConfig):
    """r0 = b - A x0, skipping the matvec for a zero initial guess."""
    if cfg.guess_nonzero:
        return b - A.mult(x0)
    return b


def empty_history(cfg: KSPConfig, dtype):
    return jnp.full((cfg.max_it + 1,), jnp.nan, dtype=dtype)
