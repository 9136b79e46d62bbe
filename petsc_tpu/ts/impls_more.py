"""Additional TS types: basicsymplectic (1/2/4), pseudo (PTC), alpha.

Behavioral references: src/ts/impls/symplectic/basicsymplectic (separable
Hamiltonian splits, symplectic Euler / velocity Verlet / 4th-order Yoshida),
src/ts/impls/pseudo (pseudo-transient continuation with SER timestep
growth), src/ts/impls/implicit/alpha (generalized-alpha, spectral-radius
parameterized).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..sys.error import Error, TSConvergedReason as TR
from .ts import TS, _stage_residual, _snes_stage_solve


# ---------------------------------------------------------------------
# basicsymplectic: separable H(q,p) = T(p) + V(q)
# ---------------------------------------------------------------------

def setHamiltonianSplit(ts, fq, fp, nq=None):
    """dq/dt = fq(t, p), dp/dt = fp(t, q) (TSRHSSplitSetRHSFunction
    model); state u = [q, p], nq = len(q) (default half)."""
    ts._ham_fq = fq
    ts._ham_fp = fp
    ts._ham_nq = nq
    return ts


TS.setHamiltonianSplit = setHamiltonianSplit

# Yoshida 4th-order coefficients
_Y4 = 2.0 ** (1.0 / 3.0)
_Y4_C = [1.0 / (2 * (2 - _Y4)), (1 - _Y4) / (2 * (2 - _Y4)),
         (1 - _Y4) / (2 * (2 - _Y4)), 1.0 / (2 * (2 - _Y4))]
_Y4_D = [1.0 / (2 - _Y4), -_Y4 / (2 - _Y4), 1.0 / (2 - _Y4), 0.0]


def _symp_coeffs(order):
    if order == 1:
        return [1.0], [1.0]
    if order == 2:                      # velocity Verlet (leapfrog)
        return [0.5, 0.5], [1.0, 0.0]
    if order == 4:
        return _Y4_C, _Y4_D
    raise Error(f"basicsymplectic: order {order} not in (1,2,4)")


def step_symplectic(ts: TS, t, u, dt):
    fq, fp = getattr(ts, "_ham_fq", None), getattr(ts, "_ham_fp", None)
    if fq is None:
        raise Error("basicsymplectic: call setHamiltonianSplit(fq, fp)")
    nq = ts._ham_nq or len(u) // 2
    order = getattr(ts, "symplectic_order", 2)
    cs, ds = _symp_coeffs(order)
    q = jnp.asarray(u[:nq])
    p = jnp.asarray(u[nq:])
    tt = t
    for c, d in zip(cs, ds):
        q = q + (c * dt) * fq(tt, p)
        if d != 0.0:
            p = p + (d * dt) * fp(tt, q)
        tt += c * dt
    un = np.concatenate([np.asarray(q), np.asarray(p)])
    return un, None, order, np.all(np.isfinite(un))


# ---------------------------------------------------------------------
# pseudo: pseudo-transient continuation to steady state
# ---------------------------------------------------------------------

def step_pseudo(ts: TS, t, u, dt):
    """One backward-Euler step; the driver grows dt by SER
    (switched evolution relaxation: dt_{n+1} = dt_n ||F_old||/||F_new||,
    pseudo.c TSPseudoTimeStepDefault)."""
    uj = jnp.asarray(u)

    def build():
        F = ts.ifunction

        def residual(x, tt, dtt, uprev):
            return F(tt + dtt, x, (x - uprev) / dtt)
        return residual

    residual = _stage_residual(ts, ("pseudo",), build)
    un, ok = _snes_stage_solve(ts, residual, (t, dt, u), u)
    if not ok:
        return u, None, 1, False
    # SER: scale dt by residual decrease of the STEADY equation G(u)=0
    fnew = float(np.linalg.norm(np.asarray(ts.rhs(t + dt, jnp.asarray(un)))))
    fold = getattr(ts, "_pseudo_fnorm", None)
    if fold is not None and fnew > 0:
        growth = min(max(fold / fnew, 0.1), ts.pseudo_max_growth)
        ts.dt = dt * growth
    ts._pseudo_fnorm = fnew
    if fnew < getattr(ts, "pseudo_fatol", 1e-10):
        ts._reason = TR.CONVERGED_USER   # steady state reached
    return un, None, 1, np.all(np.isfinite(un))


TS.pseudo_max_growth = 10.0


# ---------------------------------------------------------------------
# alpha: generalized-alpha for first-order systems
# ---------------------------------------------------------------------

def step_alpha(ts: TS, t, u, dt):
    """Generalized-alpha (Jansen-Whiting-Hulbert; impls/implicit/alpha):
    parameters from spectral radius rho_inf (default 0.2 like PETSc):
    alpha_m = (3-rho)/(2(1+rho)), alpha_f = 1/(1+rho),
    gamma = 1/2 + alpha_m - alpha_f. Solves for udot at the alpha point."""
    rho = getattr(ts, "alpha_radius", 0.2)
    am = 0.5 * (3.0 - rho) / (1.0 + rho)
    af = 1.0 / (1.0 + rho)
    gamma = 0.5 + am - af
    uj = jnp.asarray(u)
    v0 = getattr(ts, "_alpha_v", None)
    if v0 is None:
        v0 = np.asarray(ts.rhs(t, uj))
    v0j = jnp.asarray(v0)

    def build():
        F = ts.ifunction

        def residual(x, tt, dtt, uprev, vprev):
            # x = u_{n+1}; v_{n+1} from the Newmark-like update
            v1 = (x - uprev) / (gamma * dtt) - (1.0 - gamma) / gamma * vprev
            ua = uprev + af * (x - uprev)
            va = vprev + am * (v1 - vprev)
            return F(tt + af * dtt, ua, va)
        return residual

    residual = _stage_residual(ts, ("alpha", rho), build)
    un, ok = _snes_stage_solve(ts, residual, (t, dt, u, v0), u)
    if not ok:
        return u, None, 2, False
    v1 = (un - u) / (gamma * dt) - (1.0 - gamma) / gamma * v0
    ts._alpha_v = v1
    return un, None, 2, np.all(np.isfinite(un))


# Gauss-Legendre collocation (impls/irk): s=2, order 4, A-stable
_IRK_C = [0.5 - np.sqrt(3) / 6, 0.5 + np.sqrt(3) / 6]
_IRK_A = [[0.25, 0.25 - np.sqrt(3) / 6],
          [0.25 + np.sqrt(3) / 6, 0.25]]
_IRK_B = [0.5, 0.5]


def step_irk(ts: TS, t, u, dt):
    """Fully implicit Gauss(2) RK: both stage derivatives solved as ONE
    stacked nonlinear system (impls/irk)."""
    uj = jnp.asarray(u)
    n = len(u)

    def build():
        f = ts.rhs

        def residual(kflat, tt, dtt, uprev):
            k = kflat.reshape(2, -1)
            r = []
            for i in range(2):
                ui = uprev + dtt * (_IRK_A[i][0] * k[0]
                                    + _IRK_A[i][1] * k[1])
                r.append(k[i] - f(tt + _IRK_C[i] * dtt, ui))
            return jnp.concatenate(r)
        return residual

    residual = _stage_residual(ts, ("irk",), build)
    k0 = np.concatenate([np.asarray(ts.rhs(t, uj))] * 2)
    kflat, ok = _snes_stage_solve(ts, residual, (t, dt, u), k0)
    if not ok:
        return u, None, 4, False
    k = kflat.reshape(2, -1)
    un = u + dt * (_IRK_B[0] * k[0] + _IRK_B[1] * k[1])
    return un, None, 4, np.all(np.isfinite(un))


TS._impls.update({
    "irk": step_irk,
    "basicsymplectic": step_symplectic,
    "symplectic": step_symplectic,
    "pseudo": step_pseudo,
    "alpha": step_alpha,
})
