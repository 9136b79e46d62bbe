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


def step_alpha2(ts: TS, t, u, dt):
    """Generalized-alpha for 2nd-order systems (Chung-Hulbert;
    impls/implicit/alpha/alpha2.c): Newmark state (u, v, a) with
    alpha_m = (2*rho-1)/(rho+1), alpha_f = rho/(rho+1),
    gamma = 1/2 - alpha_m + alpha_f, beta = (1 - alpha_m + alpha_f)^2/4;
    solves F(t_mid, u_mid, v_mid, a_mid) = 0 for a_{n+1} with the TS SNES
    (TSSetI2Function residual F(t, u, u', u'')). Velocity state persists
    on the TS (ts.alpha2_v0 initial velocity)."""
    F2 = getattr(ts, "_i2func", None)
    if F2 is None:
        raise Error("alpha2: call setI2Function(F(t, u, v, a)) first")
    rho = float(getattr(ts, "alpha_radius", 0.2))
    am = (2.0 * rho - 1.0) / (rho + 1.0)
    af = rho / (rho + 1.0)
    gamma = 0.5 - am + af
    beta = 0.25 * (1.0 - am + af) ** 2
    v0 = getattr(ts, "_alpha2_v", None)
    a0 = getattr(ts, "_alpha2_a", None)
    if v0 is None or v0.shape != u.shape:
        v0 = np.asarray(getattr(ts, "alpha2_v0", np.zeros_like(u)),
                        dtype=np.float64)
        # consistent initial acceleration: F(t, u0, v0, a0) = 0
        from .ts import _snes_stage_solve, _stage_residual

        def build0():
            f2 = ts._i2func

            def residual(a, tt, uu, vv):
                return f2(tt, uu, vv, a)
            return residual
        res0 = _stage_residual(ts, ("alpha2_init",), build0)
        a0, ok0 = _snes_stage_solve(
            ts, res0, (jnp.asarray(t), jnp.asarray(u), jnp.asarray(v0)),
            np.zeros_like(u))
        if not ok0:
            a0 = np.zeros_like(u)
    from .ts import _snes_stage_solve, _stage_residual

    def build():
        f2 = ts._i2func

        def residual(a1, tt, dtt, uu, vv, aa):
            u1 = uu + dtt * vv + dtt * dtt * ((0.5 - beta) * aa
                                              + beta * a1)
            v1 = vv + dtt * ((1.0 - gamma) * aa + gamma * a1)
            um = (1.0 - af) * u1 + af * uu
            vm = (1.0 - af) * v1 + af * vv
            aam = (1.0 - am) * a1 + am * aa
            tm = tt + (1.0 - af) * dtt
            return f2(tm, um, vm, aam)
        return residual

    residual = _stage_residual(ts, ("alpha2", rho), build)
    a1, ok = _snes_stage_solve(
        ts, residual,
        (jnp.asarray(t), jnp.asarray(dt), jnp.asarray(u),
         jnp.asarray(v0), jnp.asarray(a0)), np.asarray(a0))
    if not ok:
        return u, None, 2, False
    u1 = u + dt * v0 + dt * dt * ((0.5 - beta) * a0 + beta * a1)
    v1 = v0 + dt * ((1.0 - gamma) * a0 + gamma * a1)
    ts._alpha2_v = np.asarray(v1)
    ts._alpha2_a = np.asarray(a1)
    return np.asarray(u1), None, 2, bool(np.all(np.isfinite(u1)))


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


# Radau IIA 3-stage (order 5) Butcher table — the method RADAU5 wraps
# (Hairer-Wanner); exact rational/radical coefficients
_R6 = np.sqrt(6.0)
_RADAU_C = [(4.0 - _R6) / 10.0, (4.0 + _R6) / 10.0, 1.0]
_RADAU_A = [
    [(88.0 - 7.0 * _R6) / 360.0, (296.0 - 169.0 * _R6) / 1800.0,
     (-2.0 + 3.0 * _R6) / 225.0],
    [(296.0 + 169.0 * _R6) / 1800.0, (88.0 + 7.0 * _R6) / 360.0,
     (-2.0 - 3.0 * _R6) / 225.0],
    [(16.0 - _R6) / 36.0, (16.0 + _R6) / 36.0, 1.0 / 9.0],
]
_RADAU_B = [(16.0 - _R6) / 36.0, (16.0 + _R6) / 36.0, 1.0 / 9.0]


def step_radau5(ts: TS, t, u, dt):
    """Radau IIA(3), order 5, L-stable — the native replacement for the
    reference's RADAU5 external wrapper (impls: sundials/radau5 rows).
    All three stage derivatives solve as ONE stacked system with the
    cached parametric SNES (same pattern as irk)."""
    uj = jnp.asarray(u)

    def build():
        f = ts.rhs

        def residual(kflat, tt, dtt, uprev):
            k = kflat.reshape(3, -1)
            r = []
            for i in range(3):
                ui = uprev + dtt * (_RADAU_A[i][0] * k[0]
                                    + _RADAU_A[i][1] * k[1]
                                    + _RADAU_A[i][2] * k[2])
                r.append(k[i] - f(tt + _RADAU_C[i] * dtt, ui))
            return jnp.concatenate(r)
        return residual

    residual = _stage_residual(ts, ("radau5",), build)
    k0 = np.concatenate([np.asarray(ts.rhs(t, uj))] * 3)
    kflat, ok = _snes_stage_solve(ts, residual, (t, dt, u), k0)
    if not ok:
        return u, None, 5, False
    k = kflat.reshape(3, -1)
    un = u + dt * (_RADAU_B[0] * k[0] + _RADAU_B[1] * k[1]
                   + _RADAU_B[2] * k[2])
    return un, None, 5, np.all(np.isfinite(un))


TS._impls.update({
    "radau5": step_radau5,
    "irk": step_irk,
    "basicsymplectic": step_symplectic,
    "symplectic": step_symplectic,
    "pseudo": step_pseudo,
    "alpha": step_alpha,
    "alpha2": step_alpha2,
})


# =====================================================================
# TSGLEE — General Linear with global Error Estimation (glee.c)
# =====================================================================

def _glee_tab(name):
    """Explicit GLEE tableaus (glee.c TSGLEERegisterAll; r=2 'items'
    carrying (y, y~) or (y, eps)). Coefficient values are the published
    method constants."""
    th = 1.0 / 3.0
    tabs = {
        "23": dict(p=2, A=[[0, 0, 0], [1, 0, 0], [0.25, 0.25, 0]],
                   B=[[1 / 12, 1 / 12, 5 / 6], [1 / 12, 1 / 12, -1 / 6]],
                   U=[[1, 0], [1, 10], [1, -1]],
                   S=[1, 0], F=[1, 0], Ferror=[0, 1]),
        "24": dict(p=2,
                   A=[[0, 0, 0, 0], [0.75, 0, 0, 0],
                      [0.25, 29 / 60, 0, 0],
                      [-21 / 44, 145 / 44, -20 / 11, 0]],
                   B=[[109 / 275, 58 / 75, -37 / 110, 1 / 6],
                      [3 / 11, 0, 75 / 88, -1 / 8]],
                   U=[[0, 1], [75 / 58, -17 / 58], [0, 1], [0, 1]],
                   S=[1, 1], F=[1, 0], Ferror=[-1.0, 1.0]),
        "exrk2a": dict(p=2,
                       A=[[0, 0, 0, 0, 0, 0], [1, 0, 0, 0, 0, 0],
                          [0, 0, 0, 0, 0, 0], [0, 0, 0.5, 0, 0, 0],
                          [0, 0, 0.25, 0.25, 0, 0],
                          [0, 0, 0.25, 0.25, 0.5, 0]],
                       B=[[0.5, 0.5, 0, 0, 0, 0],
                          [-2 / 3, -2 / 3, 1 / 3, 1 / 3, 1 / 3, 1 / 3]],
                       U=[[1, 0], [1, 0], [1, 0.75], [1, 0.75], [1, 0.75],
                          [1, 0.75]],
                       S=[1, 0], F=[1, 0], Ferror=[0, 1]),
        "rk32g1": dict(p=3,
                       A=[[0, 0, 0, 0, 0, 0, 0, 0],
                          [0.5, 0, 0, 0, 0, 0, 0, 0],
                          [-1, 2, 0, 0, 0, 0, 0, 0],
                          [1 / 6, 2 / 3, 1 / 6, 0, 0, 0, 0, 0],
                          [0, 0, 0, 0, 0, 0, 0, 0],
                          [-7 / 24, th, 1 / 12, -0.125, 0.5, 0, 0, 0],
                          [7 / 6, -4 / 3, -th, 0.5, -1, 2, 0, 0],
                          [0, 0, 0, 0, 1 / 6, 2 / 3, 1 / 6, 0]],
                       B=[[1 / 6, 2 / 3, 1 / 6, 0, 0, 0, 0, 0],
                          [-1 / 6, -2 / 3, -1 / 6, 0, 1 / 6, 2 / 3, 1 / 6,
                           0]],
                       U=[[1, 0], [1, 0], [1, 0], [1, 0], [1, 1], [1, 1],
                          [1, 1], [1, 1]],
                       S=[1, 0], F=[1, 0], Ferror=[0, 1]),
    }
    t = tabs[name]
    t["A"] = np.asarray(t["A"], dtype=np.float64)
    t["B"] = np.asarray(t["B"], dtype=np.float64)
    t["U"] = np.asarray(t["U"], dtype=np.float64)
    t["c"] = t["A"].sum(axis=1)
    return t


def step_glee(ts: TS, t, u, dt):
    """TSStep_GLEE (glee.c:207): r=2 carried items Y, s explicit stages
    YStage_i = sum_j U[ij] Y_j + dt sum_j A[ij] f(YStage_j); new items
    Y'_i = Y_i + dt sum_j B[ij] f(YStage_j) (V=I for all shipped methods);
    solution u = F·Y', global-error estimate Ferror·Y'. State commits only
    after the adaptor accepts (proposal pattern — the host loop may
    reject)."""
    name = getattr(ts, "glee_type", "rk32g1")
    tab = _glee_tab(name)
    A, B, U, c = tab["A"], tab["B"], tab["U"], tab["c"]
    S, F, Fer, p = tab["S"], tab["F"], tab["Ferror"], tab["p"]
    s = A.shape[0]

    prop = getattr(ts, "_glee_prop", None)
    if prop is not None and prop[0].shape == u.shape \
            and np.array_equal(prop[0], u):
        ts._glee_Y = prop[1]          # previous proposal was accepted
    ts._glee_prop = None
    Y = getattr(ts, "_glee_Y", None)
    if ts._steps == 0 or Y is None or Y[0].shape != u.shape:
        Y = [Si * u for Si in S]      # S-init (zero initial global error)

    Ydot = []
    for i in range(s):
        yi = U[i, 0] * Y[0] + U[i, 1] * Y[1]
        for j in range(i):
            if A[i, j] != 0:
                yi = yi + dt * A[i, j] * Ydot[j]
        Ydot.append(np.asarray(ts.rhs(t + c[i] * dt, jnp.asarray(yi))))
    Ynew = []
    for i in range(2):
        yi = Y[i].astype(np.float64, copy=True)
        for j in range(s):
            if B[i][j] != 0:
                yi = yi + dt * B[i][j] * Ydot[j]
        Ynew.append(yi)
    unew = F[0] * Ynew[0] + F[1] * Ynew[1]
    err = Fer[0] * Ynew[0] + Fer[1] * Ynew[1]
    ts._glee_prop = (unew, Ynew)
    ok = np.all(np.isfinite(unew))
    return unew, (err if ts.adapt.kind != "none" else None), p, ok


# =====================================================================
# TSEIMEX — extrapolated partitioned IMEX (eimex.c)
# =====================================================================

def step_eimex(ts: TS, t, u, dt):
    """TSStep_EIMEX (eimex.c): build T[i][0] by i+1 sub-steps of the
    1st-order partitioned IMEX Euler (implicit in fi, explicit in fe),
    then Romberg-extrapolate T[i][j] = T[i][j-1] + (T[i][j-1]-T[i-1][j-1])
    / ((n_i/n_{i-j}) - 1) up the table; row index set by -ts_eimex_max_rows
    (default 3 => order 3). The implicit sub-solves reuse the cached
    parametric SNES residual so every sub-step hits the same compiled
    kernel."""
    from .ts import _snes_stage_solve, _stage_residual
    nrows = int(getattr(ts, "eimex_max_rows", 3))
    fe = ts._rhs or (lambda tt, uu: jnp.zeros_like(uu))
    fi = ts._ifunc

    if fi is None:
        def euler_substeps(nsub):
            h = dt / nsub
            v = u
            tt = t
            for _ in range(nsub):
                v = v + h * np.asarray(fe(tt, jnp.asarray(v)))
                tt += h
            return v, True
    else:
        def build():
            fi_ = ts._ifunc
            fe_ = ts._rhs

            def residual(x, tt, hh, uprev):
                udot = (x - uprev) / hh
                r = fi_(tt, x, udot)
                if fe_ is not None:
                    r = r - fe_(tt - hh, uprev)
                return r
            return residual
        residual = _stage_residual(ts, ("eimex",), build)

        def euler_substeps(nsub):
            h = dt / nsub
            v = u
            tt = t
            allok = True
            for _ in range(nsub):
                v, ok = _snes_stage_solve(
                    ts, residual,
                    (jnp.asarray(tt + h), jnp.asarray(h), jnp.asarray(v)), v)
                allok = allok and ok
                tt += h
            return v, allok

    ns = [i + 1 for i in range(nrows)]      # harmonic sequence 1,2,3,...
    T = []
    ok = True
    for i in range(nrows):
        ti0, okk = euler_substeps(ns[i])
        ok = ok and okk
        row = [ti0]
        for j in range(1, i + 1):
            q = ns[i] / ns[i - j]
            row.append(row[j - 1]
                       + (row[j - 1] - T[i - 1][j - 1]) / (q - 1.0))
        T.append(row)
    unew = T[nrows - 1][nrows - 1]
    err = (unew - T[nrows - 1][nrows - 2]) if nrows > 1 else None
    return (np.asarray(unew), err if ts.adapt.kind != "none" else None,
            nrows, ok and np.all(np.isfinite(np.asarray(unew))))


# =====================================================================
# TSMPRK — multirate partitioned Runge-Kutta (multirate/mprk.c)
# =====================================================================

def _mprk_tableau2(ratio, Abase, bbase):
    """TSMPRKGenerateTableau2 (mprk.c:69): repeat the base tableau per
    subcycle; the SLOW partition keeps the base diagonal blocks with
    b/ratio weights, the FAST partition scales diagonals by 1/ratio and
    accumulates completed subcycles through b/ratio off-diagonal blocks."""
    s = len(bbase)
    ns = ratio * s
    A1 = np.zeros((ns, ns))
    A2 = np.zeros((ns, ns))
    b1 = np.zeros(ns)
    b2 = np.zeros(ns)
    for k in range(ratio):
        A1[k * s:(k + 1) * s, k * s:(k + 1) * s] = Abase
        A2[k * s:(k + 1) * s, k * s:(k + 1) * s] = Abase / ratio
        for l in range(k):
            A2[k * s:(k + 1) * s, l * s:(l + 1) * s] = \
                np.tile(bbase / ratio, (s, 1))
        b1[k * s:(k + 1) * s] = bbase / ratio
        b2[k * s:(k + 1) * s] = bbase / ratio
    return A1, b1, A2, b2


def step_mprk(ts: TS, t, u, dt):
    """TSStep_MPRK: explicit partitioned RK over "slow"/"fast" RHS splits
    (setRHSSplit) with subcycle ratio -ts_mprk_ratio (default 2), base
    scheme RK2A — the fast part takes `ratio` sub-steps per slow step
    inside ONE partitioned tableau."""
    ratio = int(getattr(ts, "mprk_ratio", 2))
    splits = getattr(ts, "_rhs_splits", {})
    if "slow" not in splits or "fast" not in splits:
        raise Error("mprk: setRHSSplit('slow', fs) and ('fast', ff) first")
    fs, iss = splits["slow"]
    ff, isf = splits["fast"]

    def f_of(fn, iset, tt, y):
        out = np.asarray(fn(tt, jnp.asarray(y)))
        if iset is not None:
            m = np.zeros_like(out)
            m[iset] = out[iset]
            out = m
        return out

    Abase = np.array([[0.0, 0.0], [1.0, 0.0]])
    bbase = np.array([0.5, 0.5])
    A1, b1, A2, b2 = _mprk_tableau2(ratio, Abase, bbase)
    c = A2.sum(axis=1)
    ns = len(b1)
    Fs, Ff = [], []
    for i in range(ns):
        y = u.astype(np.float64, copy=True)
        for j in range(i):
            if A1[i, j] != 0:
                y = y + dt * A1[i, j] * Fs[j]
            if A2[i, j] != 0:
                y = y + dt * A2[i, j] * Ff[j]
        Fs.append(f_of(fs, iss, t + c[i] * dt, y))
        Ff.append(f_of(ff, isf, t + c[i] * dt, y))
    un = u.astype(np.float64, copy=True)
    for j in range(ns):
        un = un + dt * (b1[j] * Fs[j] + b2[j] * Ff[j])
    return un, None, 2, np.all(np.isfinite(un))


def step_mimex(ts: TS, t, u, dt):
    """TSMIMEX (mimex.c "makeshift IMEX"): one backward-Euler solve on the
    IFunction with the explicit RHS frozen at the step start — the
    nrows=1 base step of the EIMEX extrapolation table."""
    saved = getattr(ts, "eimex_max_rows", None)
    ts.eimex_max_rows = 1
    try:
        return step_eimex(ts, t, u, dt)
    finally:
        if saved is None:
            del ts.eimex_max_rows
        else:
            ts.eimex_max_rows = saved


TS._impls.update({
    "mimex": step_mimex,
    "mprk": step_mprk,
    "glee": step_glee,
    "eimex": step_eimex,
})
