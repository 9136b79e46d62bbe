"""Additional Tao types: bncg (bound-constrained nonlinear CG), owlqn
(orthant-wise L-BFGS for L1 regularization), tron (trust-region Newton
with bounds).

Behavioral references: src/tao/bound/impls/bncg, src/tao/unconstrained/
impls/owlqn (pseudo-gradient + orthant projection), src/tao/bound/impls/
tron (active-set TR Newton).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..sys.error import Error, TaoConvergedReason as TaoR
from .tao import Tao, _cg_hess, _project, _steihaug, _wolfe_ls


def solve_bncg(tao: Tao, x, xvec):
    """Projected PRP+ nonlinear CG with restart on active-set change."""
    lb, ub = tao._lb, tao._ub
    x = _project(x, lb, ub)
    f, g = tao._fg(x)

    def pgnorm(xv, gv):
        pg = xv - _project(xv - gv, lb, ub)
        return float(np.linalg.norm(pg))

    gnorm = pgnorm(x, g)
    g0norm = gnorm
    tao._monitor(0, f, gnorm)
    d = -g
    it = 0
    reason = tao._check(0, f, gnorm, g0norm)
    active = None
    while reason == TaoR.CONTINUE_ITERATING:
        # projected backtracking along d
        t, ok = 1.0, False
        for _ in range(30):
            xn = _project(x + t * d, lb, ub)
            fx, gx = tao._fg(xn)
            if fx <= f + 1e-4 * np.dot(g, xn - x):
                ok = True
                break
            t *= 0.5
        if not ok:
            d = -g
            continue_fail = False
            for _ in range(30):
                xn = _project(x + t * d, lb, ub)
                fx, gx = tao._fg(xn)
                if fx < f:
                    break
                t *= 0.5
            else:
                continue_fail = True
            if continue_fail:
                reason = TaoR.DIVERGED_LS_FAILURE
                break
        new_active = ((xn <= lb + 1e-12) | (xn >= ub - 1e-12)) \
            if lb is not None else np.zeros_like(xn, dtype=bool)
        beta = max(0.0, float(np.dot(gx, gx - g) / max(np.dot(g, g),
                                                       1e-300)))
        if active is not None and (new_active != active).any():
            beta = 0.0   # restart on active-set change
        d = -gx + beta * d
        active = new_active
        x, f, g = xn, fx, gx
        gnorm = pgnorm(x, g)
        it += 1
        tao._monitor(it, f, gnorm)
        reason = tao._check(it, f, gnorm, g0norm)
    tao._its, tao._fval, tao._gnorm, tao._reason = it, f, gnorm, reason
    xvec.setArray(x)


def solve_owlqn(tao: Tao, x, xvec):
    """Orthant-wise limited-memory QN for min f(x) + lam*||x||_1 (owlqn.c).
    tao.setRegularizerWeight sets lam. Pseudo-gradient selects the
    steepest descent sub-gradient; search is confined to the orthant."""
    lam = tao._reg if tao._reg else 1.0
    m = 10
    S, Y = [], []

    def pseudo_grad(xv, gv):
        pg = np.where(xv > 0, gv + lam, np.where(xv < 0, gv - lam, 0.0))
        at0 = xv == 0
        pg = np.where(at0 & (gv + lam < 0), gv + lam, pg)
        pg = np.where(at0 & (gv - lam > 0), gv - lam, pg)
        return pg

    def fval(xv):
        f, g = tao._fg(xv)
        return f + lam * float(np.abs(xv).sum()), g

    f, g = fval(x)
    pg = pseudo_grad(x, g)
    gnorm = float(np.linalg.norm(pg))
    g0norm = gnorm
    tao._monitor(0, f, gnorm)
    it = 0
    reason = tao._check(0, f, gnorm, g0norm)
    while reason == TaoR.CONTINUE_ITERATING:
        from .tao import _lbfgs_dir
        d = -_lbfgs_dir(S, Y, pg)
        # align direction with the pseudo-gradient's descent orthant
        d = np.where(d * -pg > 0, d, 0.0)
        if not d.any():
            d = -pg
        orthant = np.where(x != 0, np.sign(x), np.sign(-pg))
        t, ok = 1.0, False
        for _ in range(40):
            xn = x + t * d
            xn = np.where(np.sign(xn) == orthant, xn, 0.0)  # orthant proj
            fx, gx = fval(xn)
            if fx <= f - 1e-4 * t * float(np.dot(pg, pg)):
                ok = True
                break
            t *= 0.5
        if not ok:
            reason = TaoR.DIVERGED_LS_FAILURE if it == 0 \
                else TaoR.CONVERGED_STEPTOL
            break
        s_new, y_new = xn - x, pseudo_grad(xn, gx) - pg
        if float(np.dot(s_new, y_new)) > 1e-14:
            S.append(s_new); Y.append(y_new)
            if len(S) > m:
                S.pop(0); Y.pop(0)
        x, f, g = xn, fx, gx
        pg = pseudo_grad(x, g)
        gnorm = float(np.linalg.norm(pg))
        it += 1
        tao._monitor(it, f, gnorm)
        reason = tao._check(it, f, gnorm, g0norm)
    tao._its, tao._fval, tao._gnorm, tao._reason = it, f, gnorm, reason
    xvec.setArray(x)


def solve_tron(tao: Tao, x, xvec):
    """TRON: trust-region Newton for bound constraints (tron.c): projected
    Cauchy step defines the active set; Steihaug on the free variables."""
    lb, ub = tao._lb, tao._ub
    x = _project(x, lb, ub)
    f, g = tao._fg(x)

    def pgnorm(xv, gv):
        return float(np.linalg.norm(xv - _project(xv - gv, lb, ub)))

    gnorm = pgnorm(x, g)
    g0norm = gnorm
    tao._monitor(0, f, gnorm)
    delta = max(1.0, 0.1 * float(np.linalg.norm(x)))
    it = 0
    reason = tao._check(0, f, gnorm, g0norm)
    while reason == TaoR.CONTINUE_ITERATING:
        hmv = tao._hessmult(x)
        free = ~(((x <= lb + 1e-12) & (g > 0)) | ((x >= ub - 1e-12)
                                                  & (g < 0))) \
            if lb is not None else np.ones_like(x, dtype=bool)

        def hmv_free(v):
            vf = np.where(free, v, 0.0)
            return np.where(free, hmv(vf), v)

        d = _steihaug(hmv_free, -np.where(free, g, 0.0), delta,
                      tol=min(0.5, np.sqrt(gnorm)) * gnorm)
        xn = _project(x + d, lb, ub)
        fx, gx = tao._fg(xn)
        pred = -(float(np.dot(g, xn - x))
                 + 0.5 * float(np.dot(xn - x, hmv(xn - x))))
        ared = f - fx
        rho = ared / pred if pred > 0 else (1.0 if ared > 0 else -1.0)
        if rho < 0.25:
            delta *= 0.25
        elif rho > 0.75:
            delta = min(2 * delta, 1e10)
        if ared > 0:
            x, f, g = xn, fx, gx
            gnorm = pgnorm(x, g)
            it += 1
            tao._monitor(it, f, gnorm)
            reason = tao._check(it, f, gnorm, g0norm)
        elif delta < 1e-30:
            reason = TaoR.DIVERGED_TR_REDUCTION
    tao._its, tao._fval, tao._gnorm, tao._reason = it, f, gnorm, reason
    xvec.setArray(x)


Tao._impls.update({
    "bncg": solve_bncg,
    "owlqn": solve_owlqn,
    "tron": solve_tron,
    "bqnls": solve_bncg,   # projected-QN role served by the bncg path
})
