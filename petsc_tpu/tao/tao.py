"""Tao: optimization solvers.

Behavioral reference: src/tao/ (TaoSolve interface/taosolver.c:170;
unconstrained impls/: lmvm (L-BFGS, src/tao/unconstrained/impls/lmvm),
nls (Newton line search), ntr (Newton trust region), cg (nonlinear CG
FR/PR/PRP+), neldermead; bound/: blmvm (projected L-BFGS), tron;
leastsquares/: brgn (regularized Gauss-Newton); TaoLineSearch armijo /
more-thuente (linesearch/impls)).

TPU design: objectives are pure jax functions; gradients default to
jax.grad (exact), Hessian actions to jax.jvp-of-grad (Newton-CG without
ever forming the Hessian), Gauss-Newton products to jvp/vjp of the
residual — every evaluation is one jitted XLA program. PETSc-style
separate objective/gradient callbacks are also accepted.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..sys.error import Error, TaoConvergedReason as TaoR
from ..sys.object import PObject
from ..vec.vec import Vec


class Tao(PObject):
    _class_name = "Tao"
    _impls = {}

    def __init__(self, comm=None, **kw):
        super().__init__(**kw)
        self.comm = comm
        self._type = "lmvm"
        self.gatol, self.grtol, self.gttol = 1e-8, 1e-8, 0.0
        self.max_it, self.max_funcs = 2000, 10000
        self._obj = None          # pure f(x) -> scalar
        self._grad = None         # optional pure g(x) -> array
        self._objgrad_jit = None
        self._residual = None     # pure r(x) -> array (least squares)
        self._hess = None         # optional pure H(x) @ v builder
        self._lb = None
        self._ub = None
        self._reg = 0.0           # brgn tikhonov weight
        self._its = 0
        self._fval = 0.0
        self._gnorm = 0.0
        self._reason = TaoR.CONTINUE_ITERATING
        self._history = []
        self._monitors = []
        self._nfuncs = 0

    # ---------------- setup ----------------

    def create(self, comm=None):
        self.comm = comm or self.comm
        return self

    def setType(self, t):
        if t not in self._impls:
            raise KeyError(f"unknown Tao type '{t}'; have "
                           f"{sorted(self._impls)}")
        self._type = t
        return self

    def getType(self):
        return self._type

    def setObjective(self, fn):
        """Pure jax scalar objective f(x)."""
        self._obj = fn
        self._objgrad_jit = None
        return self

    def setGradient(self, fn):
        self._grad = fn
        return self

    def setObjectiveGradient(self, fn_obj, fn_grad=None):
        self._obj = fn_obj
        self._grad = fn_grad
        self._objgrad_jit = None
        return self

    def setResidual(self, fn):
        """Least-squares residual r(x) (TaoSetResidualRoutine; brgn)."""
        self._residual = fn
        if self._obj is None:
            self._obj = lambda x: 0.5 * jnp.sum(fn(x) ** 2)
        return self

    def setRegularizerWeight(self, w):
        self._reg = float(w)

    def setConstraints(self, fn):
        """TaoSetConstraintsRoutine: pure jax fn(x) -> c(x) (used by the
        complementarity solvers ssils/ssfls and almm)."""
        self._constraints = fn
        return self

    def setVariableBounds(self, lb, ub):
        self._lb = np.asarray(lb.getArray() if isinstance(lb, Vec) else lb)
        self._ub = np.asarray(ub.getArray() if isinstance(ub, Vec) else ub)
        return self

    def setTolerances(self, gatol=None, grtol=None, gttol=None):
        if gatol is not None:
            self.gatol = gatol
        if grtol is not None:
            self.grtol = grtol
        if gttol is not None:
            self.gttol = gttol
        return self

    def setMaximumIterations(self, n):
        self.max_it = int(n)

    def setFromOptions(self):
        t = self.opt("get_string", "tao_type", None)
        if t:
            self.setType(t)
        for name in ("gatol", "grtol", "gttol"):
            v = self.opt("get_real", f"tao_{name}", None)
            if v is not None:
                setattr(self, name, v)
        n = self.opt("get_int", "tao_max_it", None)
        if n:
            self.max_it = n
        return self

    def setMonitor(self, fn):
        self._monitors.append(fn)

    # ---------------- evaluation ----------------

    def _fg(self, x_np):
        """(f, g) with jitted value_and_grad when gradient not provided."""
        self._nfuncs += 1
        x = jnp.asarray(x_np)
        if self._grad is not None:
            return float(self._obj(x)), np.asarray(self._grad(x))
        if self._objgrad_jit is None:
            self._objgrad_jit = jax.jit(jax.value_and_grad(self._obj))
        f, g = self._objgrad_jit(x)
        return float(f), np.asarray(g)

    def _hessmult(self, x_np):
        """v -> H(x) v (jvp of gradient — exact, matrix-free)."""
        if self._hess is not None:
            return self._hess(x_np)
        gfun = self._grad if self._grad is not None \
            else jax.grad(self._obj)
        x0 = jnp.asarray(x_np)

        def hmv(v):
            return np.asarray(
                jax.jvp(gfun, (x0,), (jnp.asarray(v),))[1])
        return hmv

    # ---------------- convergence ----------------

    def _check(self, it, f, gnorm, gnorm0):
        if np.isnan(f) or np.isnan(gnorm):
            return TaoR.DIVERGED_NAN
        if gnorm <= self.gatol:
            return TaoR.CONVERGED_GATOL
        if f != 0 and abs(gnorm / f) <= self.grtol:
            return TaoR.CONVERGED_GRTOL
        if gnorm0 > 0 and self.gttol > 0 and gnorm / gnorm0 <= self.gttol:
            return TaoR.CONVERGED_GTTOL
        if it >= self.max_it:
            return TaoR.DIVERGED_MAXITS
        if self._nfuncs >= self.max_funcs:
            return TaoR.DIVERGED_MAXFCN
        return TaoR.CONTINUE_ITERATING

    def _monitor(self, it, f, gnorm):
        self._history.append((f, gnorm))
        if self.opt("get_bool", "tao_monitor", False):
            print(f"{it:3d} TAO,  Function value: {f:g},  Residual: {gnorm:g}")
        for m in self._monitors:
            m(self, it, f, gnorm)

    # ---------------- drive ----------------

    def solve(self, x: Vec):
        self.setFromOptions()
        self._history = []
        self._nfuncs = 0
        self._reason = TaoR.CONTINUE_ITERATING
        x_np = np.asarray(x.getArray(), dtype=np.float64).copy()
        self._impls[self._type](self, x_np, x)
        if self.opt("get_bool", "tao_converged_reason", False):
            print(f"TAO solve converged due to {self._reason.name} "
                  f"iterations {self._its}")
        return x

    def getIterationNumber(self):
        return self._its

    def getObjectiveValue(self):
        return self._fval

    getFunctionValue = getObjectiveValue

    def getGradientNorm(self):
        return self._gnorm

    def getConvergedReason(self):
        return self._reason

    def view(self, viewer=None):
        print(f"Tao Object: type: {self._type}")
        print(f"  convergence tolerances: gatol={self.gatol:g}, "
              f"grtol={self.grtol:g}, gttol={self.gttol:g}")
        print(f"  total number of iterations={self._its}")


# =====================================================================
# line search (strong-Wolfe backtracking with interpolation — the role of
# TaoLineSearch more-thuente / armijo)
# =====================================================================

def _wolfe_ls(tao, x, f0, g0, d, c1=1e-4, c2=0.9, max_its=25, t0=1.0):
    """Returns (x_new, f_new, g_new, t, ok). d is a DESCENT direction
    (x_new = x + t d)."""
    dphi0 = float(np.dot(g0, d))
    if dphi0 >= 0:
        return x, f0, g0, 0.0, False
    t, tmin, tmax = t0, 0.0, np.inf
    f_prev, t_prev = f0, 0.0
    for _ in range(max_its):
        fx, gx = tao._fg(x + t * d)
        if not np.isfinite(fx) or fx > f0 + c1 * t * dphi0 \
                or (t_prev > 0 and fx >= f_prev):
            tmax = t
            t = 0.5 * (tmin + tmax)
            continue
        dphi = float(np.dot(gx, d))
        if abs(dphi) <= c2 * abs(dphi0):
            return x + t * d, fx, gx, t, True
        if dphi >= 0:
            tmax = t
            t = 0.5 * (tmin + tmax)
        else:
            tmin = t
            t = 2.0 * t if not np.isfinite(tmax) else 0.5 * (tmin + tmax)
        f_prev, t_prev = fx, t
    fx, gx = tao._fg(x + t * d)
    return x + t * d, fx, gx, t, fx < f0


def _project(x, lb, ub):
    if lb is not None:
        x = np.maximum(x, lb)
    if ub is not None:
        x = np.minimum(x, ub)
    return x


# =====================================================================
# implementations
# =====================================================================

def _lbfgs_dir(S, Y, g):
    q = g.copy()
    alphas = []
    for s, yv in zip(reversed(S), reversed(Y)):
        rho = 1.0 / float(np.dot(yv, s))
        a = rho * float(np.dot(s, q))
        alphas.append((a, rho, s, yv))
        q -= a * yv
    if Y:
        s, yv = S[-1], Y[-1]
        q *= float(np.dot(s, yv)) / float(np.dot(yv, yv))
    for a, rho, s, yv in reversed(alphas):
        b = rho * float(np.dot(yv, q))
        q += (a - b) * s
    return q


def solve_lmvm(tao: Tao, x, xvec, bounded=False):
    """L-BFGS (impls/lmvm; blmvm = gradient-projection variant)."""
    m = 10
    lb, ub = (tao._lb, tao._ub) if bounded else (None, None)
    x = _project(x, lb, ub)
    f, g = tao._fg(x)
    if bounded:
        pg = x - _project(x - g, lb, ub)
        gnorm = float(np.linalg.norm(pg))
    else:
        gnorm = float(np.linalg.norm(g))
    g0norm = gnorm
    tao._monitor(0, f, gnorm)
    S, Y = [], []
    it = 0
    reason = tao._check(0, f, gnorm, g0norm)
    while reason == TaoR.CONTINUE_ITERATING:
        d = -_lbfgs_dir(S, Y, g)
        if float(np.dot(d, g)) >= 0:
            S.clear(); Y.clear()
            d = -g
        if bounded:
            xn = _project(x + d, lb, ub)
            fx, gx = tao._fg(xn)
            t = 1.0
            while fx > f - 1e-4 * float(np.dot(g, x - xn)) and t > 1e-12:
                t *= 0.5
                xn = _project(x + t * d, lb, ub)
                fx, gx = tao._fg(xn)
            ok = fx < f
        else:
            xn, fx, gx, t, ok = _wolfe_ls(tao, x, f, g, d)
        if not ok:
            if len(S) == 0:
                reason = TaoR.DIVERGED_LS_FAILURE
                break
            S.clear(); Y.clear()
            continue
        s_new, y_new = xn - x, gx - g
        if float(np.dot(s_new, y_new)) > 1e-14:
            S.append(s_new); Y.append(y_new)
            if len(S) > m:
                S.pop(0); Y.pop(0)
        x, f, g = xn, fx, gx
        if bounded:
            pg = x - _project(x - g, lb, ub)
            gnorm = float(np.linalg.norm(pg))
        else:
            gnorm = float(np.linalg.norm(g))
        it += 1
        tao._monitor(it, f, gnorm)
        reason = tao._check(it, f, gnorm, g0norm)
    tao._its, tao._fval, tao._gnorm, tao._reason = it, f, gnorm, reason
    xvec.setArray(x)


def solve_blmvm(tao, x, xvec):
    solve_lmvm(tao, x, xvec, bounded=True)


def solve_nls(tao: Tao, x, xvec):
    """Newton line search with CG inner solves on exact Hessian actions
    (impls/nls; Steihaug-style negative-curvature exit)."""
    f, g = tao._fg(x)
    gnorm = float(np.linalg.norm(g))
    g0norm = gnorm
    tao._monitor(0, f, gnorm)
    it = 0
    reason = tao._check(0, f, gnorm, g0norm)
    while reason == TaoR.CONTINUE_ITERATING:
        hmv = tao._hessmult(x)
        d = _cg_hess(hmv, -g, tol=min(0.5, np.sqrt(gnorm)) * gnorm)
        if float(np.dot(d, g)) >= 0:
            d = -g
        xn, fx, gx, t, ok = _wolfe_ls(tao, x, f, g, d)
        if not ok:
            xn, fx, gx, t, ok = _wolfe_ls(tao, x, f, g, -g)
            if not ok:
                reason = TaoR.DIVERGED_LS_FAILURE
                break
        x, f, g = xn, fx, gx
        gnorm = float(np.linalg.norm(g))
        it += 1
        tao._monitor(it, f, gnorm)
        reason = tao._check(it, f, gnorm, g0norm)
    tao._its, tao._fval, tao._gnorm, tao._reason = it, f, gnorm, reason
    xvec.setArray(x)


def _cg_hess(hmv, b, tol, max_it=200):
    """CG on H d = b with negative-curvature truncation (Newton-CG)."""
    x = np.zeros_like(b)
    r = b.copy()
    p = r.copy()
    rr = float(np.dot(r, r))
    for _ in range(max_it):
        if np.sqrt(rr) <= tol:
            break
        Hp = hmv(p)
        pHp = float(np.dot(p, Hp))
        if pHp <= 0:
            if not x.any():
                return b
            break
        a = rr / pHp
        x += a * p
        r -= a * Hp
        rr_new = float(np.dot(r, r))
        p = r + (rr_new / rr) * p
        rr = rr_new
    return x


def solve_ntr(tao: Tao, x, xvec):
    """Newton trust region (impls/ntr): Steihaug-Toint CG on the TR
    subproblem, standard radius update."""
    f, g = tao._fg(x)
    gnorm = float(np.linalg.norm(g))
    g0norm = gnorm
    tao._monitor(0, f, gnorm)
    delta = max(1.0, 0.1 * float(np.linalg.norm(x)))
    it = 0
    reason = tao._check(0, f, gnorm, g0norm)
    while reason == TaoR.CONTINUE_ITERATING:
        hmv = tao._hessmult(x)
        d = _steihaug(hmv, -g, delta, tol=min(0.5, np.sqrt(gnorm)) * gnorm)
        xn = x + d
        fx, gx = tao._fg(xn)
        pred = -(float(np.dot(g, d)) + 0.5 * float(np.dot(d, hmv(d))))
        ared = f - fx
        rho = ared / pred if pred > 0 else -1.0
        if rho < 0.25:
            delta *= 0.25
        elif rho > 0.75 and abs(np.linalg.norm(d) - delta) < 1e-10:
            delta = min(2 * delta, 1e10)
        if rho > 1e-4 and np.isfinite(fx):
            x, f, g = xn, fx, gx
            gnorm = float(np.linalg.norm(g))
            it += 1
            tao._monitor(it, f, gnorm)
            reason = tao._check(it, f, gnorm, g0norm)
        elif delta < 1e-30:
            reason = TaoR.DIVERGED_TR_REDUCTION
        else:
            reason = tao._check(it, f, gnorm, g0norm)
    tao._its, tao._fval, tao._gnorm, tao._reason = it, f, gnorm, reason
    xvec.setArray(x)


def solve_ntl(tao: Tao, x, xvec):
    """Newton trust region with line-search fallback (impls/ntl/ntl.c):
    the TR step is tried first; on rejection a Wolfe line search along the
    same direction salvages the Newton work instead of only shrinking the
    radius."""
    f, g = tao._fg(x)
    gnorm = float(np.linalg.norm(g))
    g0norm = gnorm
    tao._monitor(0, f, gnorm)
    delta = max(1.0, 0.1 * float(np.linalg.norm(x)))
    it = 0
    reason = tao._check(0, f, gnorm, g0norm)
    while reason == TaoR.CONTINUE_ITERATING:
        hmv = tao._hessmult(x)
        d = _steihaug(hmv, -g, delta, tol=min(0.5, np.sqrt(gnorm)) * gnorm)
        xn = x + d
        fx, gx = tao._fg(xn)
        pred = -(float(np.dot(g, d)) + 0.5 * float(np.dot(d, hmv(d))))
        ared = f - fx
        rho = ared / pred if pred > 0 else -1.0
        accepted = rho > 1e-4 and np.isfinite(fx)
        if not accepted and float(np.dot(g, d)) < 0:
            # ntl.c: salvage with a line search along d
            xw, fw, gw, t, ok = _wolfe_ls(tao, x, f, g, d)
            if ok and fw < f:
                xn, fx, gx = xw, fw, gw
                accepted = True
        if rho < 0.25:
            delta *= 0.25
        elif rho > 0.75 and abs(np.linalg.norm(d) - delta) < 1e-10:
            delta = min(2 * delta, 1e10)
        if accepted:
            x, f, g = xn, fx, gx
            gnorm = float(np.linalg.norm(g))
            it += 1
            tao._monitor(it, f, gnorm)
            reason = tao._check(it, f, gnorm, g0norm)
        elif delta < 1e-30:
            reason = TaoR.DIVERGED_TR_REDUCTION
        else:
            reason = tao._check(it, f, gnorm, g0norm)
    tao._its, tao._fval, tao._gnorm, tao._reason = it, f, gnorm, reason
    xvec.setArray(x)


def _steihaug(hmv, b, delta, tol, max_it=200):
    x = np.zeros_like(b)
    r = b.copy()
    p = r.copy()
    rr = float(np.dot(r, r))
    for _ in range(max_it):
        if np.sqrt(rr) <= tol:
            break
        Hp = hmv(p)
        pHp = float(np.dot(p, Hp))
        if pHp <= 0:
            return x + _to_boundary(x, p, delta) * p
        a = rr / pHp
        if np.linalg.norm(x + a * p) >= delta:
            return x + _to_boundary(x, p, delta) * p
        x += a * p
        r -= a * Hp
        rr_new = float(np.dot(r, r))
        p = r + (rr_new / rr) * p
        rr = rr_new
    return x


def _to_boundary(x, p, delta):
    pp = float(np.dot(p, p))
    xp = float(np.dot(x, p))
    xx = float(np.dot(x, x))
    return (-xp + np.sqrt(max(xp * xp + pp * (delta * delta - xx), 0.0))) / pp


def solve_cg(tao: Tao, x, xvec):
    """Nonlinear CG, PRP+ with restart (impls/cg)."""
    f, g = tao._fg(x)
    gnorm = float(np.linalg.norm(g))
    g0norm = gnorm
    tao._monitor(0, f, gnorm)
    d = -g
    it = 0
    reason = tao._check(0, f, gnorm, g0norm)
    while reason == TaoR.CONTINUE_ITERATING:
        xn, fx, gx, t, ok = _wolfe_ls(tao, x, f, g, d, c2=0.4)
        if not ok:
            d = -g
            xn, fx, gx, t, ok = _wolfe_ls(tao, x, f, g, d, c2=0.4)
            if not ok:
                reason = TaoR.DIVERGED_LS_FAILURE
                break
        beta = max(0.0, float(np.dot(gx, gx - g)) / float(np.dot(g, g)))
        d = -gx + beta * d
        x, f, g = xn, fx, gx
        gnorm = float(np.linalg.norm(g))
        it += 1
        tao._monitor(it, f, gnorm)
        reason = tao._check(it, f, gnorm, g0norm)
    tao._its, tao._fval, tao._gnorm, tao._reason = it, f, gnorm, reason
    xvec.setArray(x)


def solve_brgn(tao: Tao, x, xvec):
    """Bounded/regularized Gauss-Newton for least squares (leastsquares/
    impls/brgn): min 0.5||r(x)||^2 + 0.5*reg*||x||^2, GN step via CG on
    (J^T J + reg I) d = -(J^T r + reg x) using jvp/vjp products."""
    if tao._residual is None:
        raise Error("brgn: call setResidual first")
    rfun = tao._residual
    reg = tao._reg
    f, g = tao._fg(x)
    if reg:
        f += 0.5 * reg * float(np.dot(x, x))
        g = g + reg * x
    gnorm = float(np.linalg.norm(g))
    g0norm = gnorm
    tao._monitor(0, f, gnorm)
    it = 0
    reason = tao._check(0, f, gnorm, g0norm)
    while reason == TaoR.CONTINUE_ITERATING:
        x0 = jnp.asarray(x)
        _, vjp = jax.vjp(rfun, x0)

        def jtj(v):
            jv = jax.jvp(rfun, (x0,), (jnp.asarray(v),))[1]
            out = np.asarray(vjp(jv)[0])
            return out + reg * np.asarray(v)

        d = _cg_hess(jtj, -g, tol=1e-2 * gnorm)
        xn, fx, gx, t, ok = _wolfe_ls(tao, x, f, g, d)
        if reg:
            fx += 0.5 * reg * float(np.dot(xn, xn))
            gx = gx + reg * xn
        if not ok:
            reason = TaoR.DIVERGED_LS_FAILURE
            break
        x, f, g = xn, fx, gx
        gnorm = float(np.linalg.norm(g))
        it += 1
        tao._monitor(it, f, gnorm)
        reason = tao._check(it, f, gnorm, g0norm)
    tao._its, tao._fval, tao._gnorm, tao._reason = it, f, gnorm, reason
    xvec.setArray(x)


def solve_almm(tao: Tao, x, xvec):
    """Augmented Lagrangian multiplier method for equality/inequality
    constraints (constrained/impls/almm): min f(x) s.t. g(x)=0, h(x)<=0.
    Subproblems solved with the lmvm path; classic multiplier/penalty
    updates. Constraints set via tao.setEqualityConstraints(g) /
    tao.setInequalityConstraints(h) (pure jax functions)."""
    g = getattr(tao, "_eq", None)
    h = getattr(tao, "_ineq", None)
    if g is None and h is None:
        raise Error("almm: set equality/inequality constraints first")
    mu = 10.0
    lam_eq = None
    lam_in = None
    f_obj = tao._obj
    x_cur = x.copy()
    outer_its = 0
    for outer in range(30):
        geval = np.asarray(g(jnp.asarray(x_cur))) if g else np.zeros(0)
        heval = np.asarray(h(jnp.asarray(x_cur))) if h else np.zeros(0)
        if lam_eq is None:
            lam_eq = np.zeros(len(geval))
            lam_in = np.zeros(len(heval))
        viol = max(float(np.abs(geval).max()) if len(geval) else 0.0,
                   float(np.maximum(heval, 0.0).max()) if len(heval) else 0.0)
        if viol < tao.gatol * 10 and outer > 0:
            break
        le = jnp.asarray(lam_eq)
        li = jnp.asarray(lam_in)
        muj = mu

        def aug(z, le=le, li=li, muj=muj):
            val = f_obj(z)
            if g is not None:
                gz = g(z)
                val = val + jnp.sum(le * gz) + 0.5 * muj * jnp.sum(gz ** 2)
            if h is not None:
                hz = h(z)
                s = jnp.maximum(0.0, li / muj + hz)
                val = val + 0.5 * muj * jnp.sum(s ** 2 - (li / muj) ** 2)
            return val

        sub = Tao(options=tao._options)
        sub.create(tao.comm)
        sub.setType("lmvm")
        sub.setObjective(aug)
        sub.setTolerances(gatol=max(tao.gatol, 1e-2 / (10 ** outer)))
        sub.setMaximumIterations(200)
        xv = Vec.from_array(x_cur, comm=tao.comm)
        sub.solve(xv)
        x_cur = np.asarray(xv.getArray())
        outer_its += sub.getIterationNumber()
        # multiplier updates
        if g is not None:
            lam_eq = lam_eq + mu * np.asarray(g(jnp.asarray(x_cur)))
        if h is not None:
            lam_in = np.maximum(
                0.0, lam_in + mu * np.asarray(h(jnp.asarray(x_cur))))
        mu = min(mu * 4.0, 1e8)
    f, gr = tao._fg(x_cur)
    tao._its = outer_its
    tao._fval = f
    tao._gnorm = float(np.linalg.norm(gr))
    tao._reason = TaoR.CONVERGED_USER
    xvec.setArray(x_cur)


def setEqualityConstraints(tao, fn):
    tao._eq = fn
    return tao


def setInequalityConstraints(tao, fn):
    tao._ineq = fn
    return tao


Tao.setEqualityConstraints = setEqualityConstraints
Tao.setInequalityConstraints = setInequalityConstraints


def solve_neldermead(tao: Tao, x, xvec):
    """Derivative-free simplex (impls/neldermead)."""
    from scipy.optimize import minimize
    res = minimize(lambda z: float(tao._obj(jnp.asarray(z))), x,
                   method="Nelder-Mead",
                   options={"maxiter": tao.max_it, "xatol": tao.gatol,
                            "fatol": tao.gatol})
    tao._its = res.nit
    tao._fval = float(res.fun)
    tao._gnorm = 0.0
    tao._reason = TaoR.CONVERGED_USER if res.success \
        else TaoR.DIVERGED_MAXITS
    xvec.setArray(res.x)


def _fischer_burmeister(a, b):
    return jnp.sqrt(a * a + b * b + 1e-300) - a - b


def solve_ssils(tao: Tao, x, xvec):
    """Semismooth infeasible line-search solver for the nonlinear
    complementarity problem 0 <= x  ⊥  F(x) >= 0 (complementarity/impls/
    ssls/ssils.c): Newton on the Fischer-Burmeister reformulation
    Phi_i = phi(x_i, F_i(x)) with an Armijo search on the merit
    0.5||Phi||^2. The generalized Jacobian comes from jax.jacfwd of the
    (smoothed) FB residual — one compiled kernel per problem."""
    F = getattr(tao, "_constraints", None)
    if F is None:
        raise Error("ssils: call setConstraints first")
    import jax

    def Phi(z):
        return _fischer_burmeister(z, F(z))

    phi_jit = jax.jit(Phi)
    J_jit = jax.jit(jax.jacfwd(Phi))
    merit = lambda z: 0.5 * float(np.dot(np.asarray(phi_jit(z)),
                                         np.asarray(phi_jit(z))))
    it = 0
    reason = TaoR.CONTINUE_ITERATING
    xk = jnp.asarray(x)
    m = merit(xk)
    gnorm = float(np.sqrt(2 * m))
    g0 = max(gnorm, 1e-300)
    tao._monitor(0, m, gnorm)
    while it < tao.max_it:
        if gnorm <= tao.gatol or gnorm / g0 <= tao.grtol:
            reason = TaoR.CONVERGED_GATOL
            break
        P = np.asarray(phi_jit(xk))
        J = np.asarray(J_jit(xk))
        try:
            d = np.linalg.solve(J + 1e-12 * np.eye(len(P)), -P)
        except np.linalg.LinAlgError:
            d, *_ = np.linalg.lstsq(J, -P, rcond=None)
        t = 1.0
        ok = False
        for _ in range(30):
            mn = merit(xk + t * jnp.asarray(d))
            if mn <= (1 - 1e-4 * t) * m:
                ok = True
                break
            t *= 0.5
        if not ok:
            reason = TaoR.DIVERGED_LS_FAILURE
            break
        xk = xk + t * jnp.asarray(d)
        m = merit(xk)
        gnorm = float(np.sqrt(2 * m))
        it += 1
        tao._monitor(it, m, gnorm)
    else:
        reason = TaoR.DIVERGED_MAXITS
    if reason == TaoR.CONTINUE_ITERATING:
        reason = TaoR.CONVERGED_GATOL
    tao._its, tao._fval, tao._gnorm, tao._reason = it, m, gnorm, reason
    xvec.setArray(np.asarray(xk))


def solve_pdipm(tao: Tao, x, xvec):
    """Primal-dual interior point for bound-constrained (and optional
    equality-constrained) minimization (constrained/impls/ipm/pdipm.c
    role). Log-barrier on the bounds, Newton on the perturbed KKT system
    with fraction-to-the-boundary steps, mu driven by the complementarity
    average. Hessian-vector products come from jax (dense assembly for
    the KKT block — appropriate at Tao problem sizes)."""
    import jax
    lb = getattr(tao, "_lb", None)
    ub = getattr(tao, "_ub", None)
    n = len(x)
    lb = np.full(n, -np.inf) if lb is None else np.asarray(lb)
    ub = np.full(n, np.inf) if ub is None else np.asarray(ub)
    has_lb = np.isfinite(lb)
    has_ub = np.isfinite(ub)
    # strictly interior start
    xk = np.clip(x, np.where(has_lb, lb + 1e-2, -np.inf),
                 np.where(has_ub, ub - 1e-2, np.inf))
    zl = np.where(has_lb, 1.0, 0.0)      # duals for x - lb >= 0
    zu = np.where(has_ub, 1.0, 0.0)
    obj = tao._obj
    grad = jax.jit(jax.grad(obj))
    hess = jax.jit(jax.hessian(obj))
    mu = 1.0
    it = 0
    reason = TaoR.CONTINUE_ITERATING
    while it < tao.max_it:
        g = np.asarray(grad(jnp.asarray(xk)))
        rd = g - zl + zu                       # dual residual
        sl = np.where(has_lb, xk - lb, 1.0)
        su = np.where(has_ub, ub - xk, 1.0)
        rcl = np.where(has_lb, sl * zl - mu, 0.0)
        rcu = np.where(has_ub, su * zu - mu, 0.0)
        kkt = np.linalg.norm(np.concatenate([rd, rcl, rcu]))
        gnorm = float(np.linalg.norm(rd))
        tao._monitor(it, float(obj(jnp.asarray(xk))), kkt)
        if kkt <= tao.gatol:
            reason = TaoR.CONVERGED_GATOL
            break
        H = np.asarray(hess(jnp.asarray(xk)))
        # condensed system: (H + Sl^-1 Zl + Su^-1 Zu) dx = -rd_bar
        sl = np.where(has_lb, np.maximum(sl, 1e-300), 1.0)
        su = np.where(has_ub, np.maximum(su, 1e-300), 1.0)
        D = np.where(has_lb, zl / sl, 0.0) + np.where(has_ub, zu / su, 0.0)
        # eliminate dzl,dzu: (H + D) dx = -(rd + rcl/sl - rcu/su)
        rd_bar = rd + np.where(has_lb, rcl / sl, 0.0) \
            - np.where(has_ub, rcu / su, 0.0)
        dx = np.linalg.solve(H + np.diag(D) + 1e-12 * np.eye(n), -rd_bar)
        dzl = np.where(has_lb, -(rcl + zl * dx) / sl, 0.0)
        dzu = np.where(has_ub, -(rcu - zu * dx) / su, 0.0)
        # fraction-to-boundary
        tau = 0.995

        def maxstep(v, dv):
            neg = dv < 0
            return float(min(1.0, np.min(np.where(neg, -tau * v
                                                  / np.where(neg, dv, -1.0),
                                                  1.0)))) if neg.any() \
                else 1.0

        ap = min(maxstep(sl[has_lb], dx[has_lb])
                 if has_lb.any() else 1.0,
                 maxstep(su[has_ub], -dx[has_ub])
                 if has_ub.any() else 1.0)
        ad = min(maxstep(zl[has_lb], dzl[has_lb])
                 if has_lb.any() else 1.0,
                 maxstep(zu[has_ub], dzu[has_ub])
                 if has_ub.any() else 1.0)
        xk = xk + ap * dx
        zl = zl + ad * dzl
        zu = zu + ad * dzu
        # mu update: average complementarity, superlinear push
        nact = max(int(has_lb.sum() + has_ub.sum()), 1)
        mu_est = (np.where(has_lb, (xk - lb) * zl, 0.0).sum()
                  + np.where(has_ub, (ub - xk) * zu, 0.0).sum()) / nact
        mu = max(min(0.2 * mu_est, mu * 0.9), 1e-16)
        it += 1
    else:
        reason = TaoR.DIVERGED_MAXITS
    if reason == TaoR.CONTINUE_ITERATING:
        reason = TaoR.CONVERGED_GATOL
    tao._its = it
    tao._fval = float(obj(jnp.asarray(xk)))
    tao._gnorm = gnorm
    tao._reason = reason
    xvec.setArray(xk)


def solve_lcl(tao: Tao, x, xvec):
    """Linearly constrained Lagrangian for PDE-constrained optimization
    (pde_constrained/impls/lcl): min f(d, u) s.t. c(d, u) = 0 with the
    variable split [design d | state u] (setStateDesignIS). This
    implementation takes the REDUCED-space path the TPU stack makes
    natural: eliminate the state with Newton on c(d, .) = 0, get the
    reduced gradient by the adjoint method — both via jax autodiff (the
    hand-coded adjoint solves in lcl.c) — and drive the design with
    L-BFGS + Armijo."""
    import jax
    con = getattr(tao, "_constraints", None)
    if con is None:
        raise Error("lcl: setConstraints(c(d, u)) first")
    nd = getattr(tao, "n_design", None)
    if nd is None:
        raise Error("lcl: set tao.n_design (leading design dofs)")
    obj = tao._obj

    def split(z):
        return z[:nd], z[nd:]

    def c_of(d, u):
        return con(jnp.concatenate([d, u]))

    def f_of(d, u):
        return obj(jnp.concatenate([d, u]))

    cu = jax.jit(jax.jacfwd(c_of, argnums=1))
    newton_rhs = jax.jit(c_of)

    def state_solve(d, u0):
        u = u0
        for _ in range(30):
            r = np.asarray(newton_rhs(d, u))
            if np.linalg.norm(r) < 1e-12:
                break
            J = np.asarray(cu(d, u))
            u = u - jnp.asarray(np.linalg.solve(J, r))
        return u

    # reduced gradient: g = f_d - c_d^T lambda,  c_u^T lambda = f_u
    fd_fu = jax.jit(jax.grad(f_of, argnums=(0, 1)))
    cd = jax.jit(jax.jacfwd(c_of, argnums=0))

    def reduced(d, u0):
        u = state_solve(jnp.asarray(d), u0)
        f = float(f_of(jnp.asarray(d), u))
        gd, gu = fd_fu(jnp.asarray(d), u)
        lam = np.linalg.solve(np.asarray(cu(jnp.asarray(d), u)).T,
                              np.asarray(gu))
        g = np.asarray(gd) - np.asarray(cd(jnp.asarray(d), u)).T @ lam
        return f, g, u

    d = np.asarray(x[:nd])
    u = jnp.asarray(x[nd:])
    S, Y = [], []
    f, g, u = reduced(d, u)
    gnorm = float(np.linalg.norm(g))
    g0 = max(gnorm, 1e-300)
    tao._monitor(0, f, gnorm)
    it = 0
    reason = TaoR.CONTINUE_ITERATING
    while it < tao.max_it:
        if gnorm <= tao.gatol or gnorm / g0 <= tao.grtol:
            reason = TaoR.CONVERGED_GATOL
            break
        p = -_lbfgs_dir(S, Y, g.copy()) if S else -g
        if float(np.dot(p, g)) >= 0:
            p = -g
        t = 1.0
        ok = False
        for _ in range(30):
            fn_, gn_, un_ = reduced(d + t * p, u)
            if np.isfinite(fn_) and fn_ <= f + 1e-4 * t * float(
                    np.dot(g, p)):
                ok = True
                break
            t *= 0.5
        if not ok:
            reason = TaoR.DIVERGED_LS_FAILURE
            break
        S.append(t * p)
        Y.append(gn_ - g)
        if len(S) > 8:
            S.pop(0)
            Y.pop(0)
        d, f, g, u = d + t * p, fn_, gn_, un_
        gnorm = float(np.linalg.norm(g))
        it += 1
        tao._monitor(it, f, gnorm)
    else:
        reason = TaoR.DIVERGED_MAXITS
    if reason == TaoR.CONTINUE_ITERATING:
        reason = TaoR.CONVERGED_GATOL
    tao._its, tao._fval, tao._gnorm, tao._reason = it, f, gnorm, reason
    xvec.setArray(np.concatenate([d, np.asarray(u)]))


def solve_bmrm(tao: Tao, x, xvec):
    """Bundle method for regularized risk minimization (unconstrained/
    impls/bmrm): J(w) = lambda/2 ||w||^2 + R(w) with R the user objective.
    Cutting planes (R_k, g_k) accumulate; each master problem is the tiny
    dual QP over the simplex min_a 1/(2 lambda)||G a||^2 - a.b, solved
    with projected gradient (the Dai-Fletcher role). Converges when the
    duality gap J(w) - master_min <= gatol."""
    lam = float(getattr(tao, "bmrm_lambda", 1.0))
    import jax
    Rg = jax.jit(jax.value_and_grad(tao._obj))
    G = []          # subgradients
    bvec = []       # intercepts b_i = R_i - g_i . w_i
    wk = np.zeros_like(x)       # bmrm starts from w=0 (reference)
    it = 0
    reason = TaoR.CONTINUE_ITERATING
    Jbest = np.inf
    while it < tao.max_it:
        R, g = Rg(jnp.asarray(wk))
        R, g = float(R), np.asarray(g)
        J = 0.5 * lam * float(np.dot(wk, wk)) + R
        Jbest = min(Jbest, J)
        G.append(g)
        bvec.append(R - float(np.dot(g, wk)))
        Gm = np.stack(G)                       # (k, n)
        bm = np.asarray(bvec)
        Q = (Gm @ Gm.T) / lam                  # dual Hessian
        k = len(bvec)
        # projected gradient on the simplex
        a = np.full(k, 1.0 / k)
        for _ in range(300):
            grad = Q @ a - bm
            step = 1.0 / (np.linalg.norm(Q, 2) + 1e-12)
            a_new = _project_simplex(a - step * grad)
            if np.linalg.norm(a_new - a) < 1e-12:
                a = a_new
                break
            a = a_new
        wk = -(Gm.T @ a) / lam                 # primal from dual
        master = -(0.5 * float(a @ Q @ a) - float(a @ bm))
        gap = Jbest - master
        tao._monitor(it, J, max(gap, 0.0))
        if gap <= max(tao.gatol, tao.grtol * abs(Jbest)):
            reason = TaoR.CONVERGED_GATOL
            break
        it += 1
    else:
        reason = TaoR.DIVERGED_MAXITS
    if reason == TaoR.CONTINUE_ITERATING:
        reason = TaoR.CONVERGED_GATOL
    tao._its, tao._fval, tao._gnorm, tao._reason = it, Jbest, 0.0, reason
    xvec.setArray(wk)


def _project_simplex(v):
    """Euclidean projection onto {a >= 0, sum a = 1} (sorting method)."""
    u = np.sort(v)[::-1]
    css = np.cumsum(u) - 1.0
    rho = np.nonzero(u * np.arange(1, len(v) + 1) > css)[0][-1]
    theta = css[rho] / (rho + 1.0)
    return np.maximum(v - theta, 0.0)


def solve_pounders(tao: Tao, x, xvec):
    """Model-based derivative-free least squares (leastsquares/impls/
    pounders): keep an interpolation set of evaluated points, fit models of
    each residual component by least squares over the displaced set, take
    Gauss-Newton trust-region steps on the model Jacobian. (The reference
    adds quadratic model curvature; the linear-model variant below is the
    same framework and needs only residual evaluations.)"""
    if tao._residual is None:
        raise Error("pounders: call setResidual first")
    rfun = tao._residual

    def rf(z):
        return np.asarray(rfun(jnp.asarray(z)), dtype=np.float64)

    n = len(x)
    delta = 0.1 * max(1.0, float(np.linalg.norm(x)))
    pts = [x.copy()]
    R = [rf(x)]
    for i in range(n):                       # seed: coordinate simplex
        p = x.copy()
        p[i] += delta
        pts.append(p)
        R.append(rf(p))
    k = int(np.argmin([0.5 * float(np.dot(r, r)) for r in R]))
    xk, rk = pts[k].copy(), R[k].copy()
    fk = 0.5 * float(np.dot(rk, rk))
    tao._monitor(0, fk, 0.0)
    it = 0
    reason = TaoR.CONTINUE_ITERATING
    maxpts = 2 * n + 1
    while it < tao.max_it:
        X = np.asarray(pts) - xk             # (m, n) displacements
        F = np.asarray(R) - rk               # (m, p) residual deltas
        # row scaling by distance stabilizes the LS model fit
        Jt, *_ = np.linalg.lstsq(X, F, rcond=None)    # (n, p)
        J = Jt.T                                       # (p, n) model Jac
        g = J.T @ rk
        gnorm = float(np.linalg.norm(g))
        if gnorm <= tao.gatol:
            reason = TaoR.CONVERGED_GATOL
            break
        d = _steihaug(lambda v: J.T @ (J @ v), -g, delta,
                      tol=1e-10 * gnorm)
        if float(np.linalg.norm(d)) == 0:
            reason = TaoR.CONVERGED_STEPTOL
            break
        xn = xk + d
        rn = rf(xn)
        fn = 0.5 * float(np.dot(rn, rn))
        pred = fk - 0.5 * float(np.dot(rk + J @ d, rk + J @ d))
        rho = (fk - fn) / pred if pred > 0 else -1.0
        pts.append(xn)
        R.append(rn)
        if len(pts) > maxpts:                # drop farthest-from-center
            dists = [float(np.linalg.norm(p - xk)) for p in pts]
            drop = int(np.argmax(dists))
            pts.pop(drop)
            R.pop(drop)
        if rho > 1e-4 and np.isfinite(fn) and fn < fk:
            xk, rk, fk = xn, rn, fn
            it += 1
            tao._monitor(it, fk, gnorm)
            if rho > 0.75:
                delta = min(2.0 * delta, 1e6)
        else:
            delta *= 0.5
            if delta < 1e-14:
                reason = TaoR.CONVERGED_STEPTOL
                break
    else:
        reason = TaoR.DIVERGED_MAXITS if reason == TaoR.CONTINUE_ITERATING \
            else reason
    if reason == TaoR.CONTINUE_ITERATING:
        reason = TaoR.CONVERGED_GATOL if float(
            np.linalg.norm(g)) <= max(tao.gatol, 1e-6) \
            else TaoR.CONVERGED_STEPTOL
    tao._its, tao._fval, tao._gnorm, tao._reason = it, fk, 0.0, reason
    xvec.setArray(xk)


Tao._impls.update({
    "lmvm": solve_lmvm,
    "blmvm": solve_blmvm,
    "nls": solve_nls,
    "ntr": solve_ntr,
    "ntl": solve_ntl,
    "pounders": solve_pounders,
    "ssils": solve_ssils,
    "ssfls": solve_ssils,
    "asils": solve_ssils,
    "asfls": solve_ssils,
    "ipm": solve_pdipm,
    "bmrm": solve_bmrm,
    "lcl": solve_lcl,
    "pdipm": solve_pdipm,
    "bnls": solve_nls,
    "cg": solve_cg,
    "brgn": solve_brgn,
    "nm": solve_neldermead,
    "almm": solve_almm,
    "neldermead": solve_neldermead,
})
