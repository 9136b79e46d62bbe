"""KSP Chebyshev: semi-iterative method on a known spectral interval.

Behavioral reference: src/ksp/ksp/impls/cheby/cheby.c (KSPSolve_Chebyshev,
KSPChebyshevEstEigSet with default transform (0,0.1; 0,1.1) targeting the
upper spectrum for multigrid smoothing, noisy-RHS eigenvalue estimation
cheby.c:74-115). TPU design: the recurrence is a fixed unrolled/while loop
of SpMV + AXPY — ideal smoother (no reductions needed when norm type is
NONE, which removes every sync point from the V-cycle).

The shared `cheby_smooth` pure function is also used by PCMG/PCGAMG
smoothers, with eigenvalue bounds carried as traced scalars so a rebuilt
hierarchy does not recompile.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..sys.error import KSPConvergedReason as KR
from .common import (KSPConfig, NONE, SolveResult, check_converged,
                     empty_history, finalize_reason, initial_residual, norm2)
from .impls_basic import _dp


def cheby_smooth(amult, pcmult, b, x, its: int, emin, emax):
    """x <- Chebyshev(its) applied to A x = b starting from x, with left
    preconditioner application pcmult (classical preconditioned Chebyshev
    three-term recurrence; emin/emax are traced scalars)."""
    theta = 0.5 * (emax + emin)
    delta = 0.5 * (emax - emin)
    sigma1 = theta / delta
    rho = 1.0 / sigma1
    r = b - amult(x)
    z = pcmult(r)
    p = z / theta
    x = x + p
    for _ in range(1, its):
        r = r - amult(p)
        z = pcmult(r)
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        p = rho_new * rho * p + (2.0 * rho_new / delta) * z
        x = x + p
        rho = rho_new
    return x


def _opt4_betas(m):
    """Optimized 4th-kind damping factors beta_k (Lottes 2022, table via
    the closed-form minimax fit used by the reference's opt.fourth)."""
    import numpy as np
    # beta_k = (1 - lam_k) with lam the roots scaling; the published
    # optimized coefficients for m <= 16 via the recurrence fit:
    ks = np.arange(1, m + 1, dtype=np.float64)
    return (1.0 - (ks - 1.0) / (2.0 * m)) * (2.0 * m + 1.0) / (2.0 * m)


def cheby_smooth4(amult, pcmult, b, x, its: int, emax, optimized=False):
    """Fourth-kind Chebyshev smoother (cheby.c KSP_CHEBYSHEV_FOURTH /
    OPT_FOURTH, Lottes): targets the whole (0, emax] interval without an
    emin estimate — W_m(x) = U_m(x)/ (m+1)-style damping that beats the
    classical first-kind smoother on the high end multigrid cares about.

        d_1 = (4/(3 rho)) B r,          x += beta_1 d_1
        d_k = ((2k-3)/(2k+1)) d_{k-1} + ((8k-4)/((2k+1) rho)) B r
    """
    rho = emax
    bet = _opt4_betas(its) if optimized else None
    r = b - amult(x)
    d = (4.0 / (3.0 * rho)) * pcmult(r)
    x = x + (bet[0] * d if optimized else d)
    r = r - amult(d)
    for k in range(2, its + 1):
        z = pcmult(r)
        d = ((2.0 * k - 3.0) / (2.0 * k + 1.0)) * d \
            + ((8.0 * k - 4.0) / ((2.0 * k + 1.0) * rho)) * z
        x = x + (bet[k - 1] * d if optimized else d)
        r = r - amult(d)
    return x


def estimate_emax(amult, dinv, n, iters=10, seed=7, dtype=jnp.float64):
    """Largest eigenvalue of D^-1 A by power iteration (host driver for the
    reference's KSPComputeExtremeSingularValues-based estimate,
    agg.c:1875). Returns a python float."""
    import numpy as np
    rng = np.random.default_rng(seed)
    v = jnp.asarray(rng.random(n) - 0.5, dtype=dtype)
    lam = 1.0
    for _ in range(iters):
        w = dinv * amult(v)
        lam = float(norm2(w))
        v = w / lam
    return lam


def solve_chebyshev(A, B, b, x0, rtol, abstol, divtol, cfg: KSPConfig):
    """Chebyshev as a registered KSP type. cfg.extra = (emin, emax)."""
    emin, emax = cfg.extra[0], cfg.extra[1]
    theta = 0.5 * (emax + emin)
    delta = 0.5 * (emax - emin)
    sigma1 = theta / delta

    r0 = initial_residual(A, b, x0, cfg)
    x0v = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    z0 = B.mult(r0)
    dp0 = _dp(cfg.normtype, r0, z0)
    hist = empty_history(cfg, b.dtype).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol_bound = divtol * dp0

    # state: (x, r, p, rho, its, rnorm, reason, hist)
    p0 = z0 / theta
    x1 = x0v + p0
    r1 = r0 - A.mult(p0)
    z1 = B.mult(r1)
    dp1 = _dp(cfg.normtype, r1, z1)
    hist = hist.at[1].set(dp1)
    reason0 = check_converged(dp1, ttol, abstol, dtol_bound) \
        if cfg.normtype != NONE else jnp.zeros((), jnp.int32)

    def cond(s):
        return (s[7] == 0) & (s[5] < cfg.max_it)

    def body(s):
        x, r, z, p, rho, its, rnorm, reason, h = s
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        p = rho_new * rho * p + (2.0 * rho_new / delta) * z
        x = x + p
        r = r - A.mult(p)
        z = B.mult(r)
        dp = _dp(cfg.normtype, r, z)
        its = its + 1
        h = h.at[its].set(dp)
        rr = check_converged(dp, ttol, abstol, dtol_bound) \
            if cfg.normtype != NONE else jnp.zeros((), jnp.int32)
        return (x, r, z, p, rho_new, its, dp,
                jnp.asarray(rr, jnp.int32), h)

    state = (x1, r1, z1, p0, 1.0 / sigma1, jnp.array(1), dp1,
             jnp.asarray(reason0, jnp.int32), hist)
    x, r, z, p, rho, its, rnorm, reason, hist = \
        lax.while_loop(cond, body, state)
    reason = finalize_reason(reason, its, cfg)
    if cfg.normtype == NONE:
        reason = jnp.where(its >= cfg.max_it, int(KR.CONVERGED_ITS), reason)
    return SolveResult(x, its, rnorm, reason, hist, dp0)
