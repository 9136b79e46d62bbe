"""SNES: nonlinear solvers.

Behavioral reference: src/snes/interface/snes.c (SNESSolve :4875,
SNESConvergedDefault semantics, FD Jacobians snesj.c / snesj2.c w/
coloring, Eisenstat-Walker forcing snesut.c) and impls:
newtonls (impls/ls/ls.c:125), newtontr (impls/tr), ksponly, nrichardson,
qn (impls/qn L-BFGS), anderson/ngmres (impls/ngmres).

TPU design: the outer Newton loop is host-driven (one KSP solve — itself a
single jitted XLA program — per iteration, matching PETSc's structure);
residual/Jacobian callbacks may be either PETSc-style fn(snes, X, F) on Vec
or a PURE jax function fn(x)->r, in which case the Jacobian action is exact
via jax.jvp (the idiomatic MATMFFD replacement, reference src/snes/mf) and
assembled Jacobians come from jax.jacfwd (dense) or FD with graph coloring
(MatFDColoring analog).
"""

from __future__ import annotations

import inspect

import numpy as np
import jax
import jax.numpy as jnp

from .. import config
from ..mat.aij import MatAIJ
from ..mat.mat import MatShell
from ..sys.error import Error, SNESConvergedReason as SR
from ..sys.object import PObject
from ..vec.vec import Vec
from .linesearch import LineSearch


def snes_reason_string(r):
    return SR(r).name


class SNES(PObject):
    _class_name = "SNES"
    _impls = {}

    def __init__(self, comm=None, **kw):
        super().__init__(**kw)
        self.comm = comm
        self._type = "newtonls"
        self.rtol, self.abstol, self.stol = 1e-8, 1e-50, 1e-8
        self.divtol = 1e4
        self.max_it, self.max_funcs = 50, 10000
        self.ksp = None
        self.linesearch = LineSearch(self)
        self._func = None           # host-style fn(snes, X, F)
        self._func_pure = None      # pure fn(x)->r
        self._jac = None            # host-style fn(snes, X, J, P)
        self._jac_mat = None
        self._jac_pmat = None
        self._jac_mode = None       # user | fd | fd_color | jvp | jacfwd
        self._fd_coloring = None
        self.use_ew = False
        self._ew_eta = 0.1
        self._its = 0
        self._fnorm = 0.0
        self._reason = SR.ITERATING
        self._history = []
        self._monitors = []
        self._nfuncs = 0
        self.npc = None
        self.dm = None

    # ---------------- lifecycle ----------------

    def create(self, comm=None):
        self.comm = comm or self.comm
        return self

    def setType(self, t):
        if t not in self._impls:
            raise KeyError(f"unknown SNES type '{t}'; have "
                           f"{sorted(self._impls)}")
        self._type = t
        return self

    def getType(self):
        return self._type

    def setDM(self, dm):
        self.dm = dm
        return self

    def setTolerances(self, rtol=None, atol=None, stol=None, max_it=None,
                      divtol=None):
        if rtol is not None:
            self.rtol = rtol
        if atol is not None:
            self.abstol = atol
        if stol is not None:
            self.stol = stol
        if max_it is not None:
            self.max_it = max_it
        if divtol is not None:
            self.divtol = divtol
        return self

    def getKSP(self):
        if self.ksp is None:
            from ..ksp.ksp import KSP
            self.ksp = KSP(options=self._options, prefix=self._prefix)
            self.ksp.create(self.comm)
        return self.ksp

    def setFromOptions(self):
        t = self.opt("get_string", "snes_type", None)
        if t:
            self.setType(t)
        for name, attr in (("snes_rtol", "rtol"), ("snes_atol", "abstol"),
                           ("snes_stol", "stol"), ("snes_divergence_tolerance",
                                                   "divtol")):
            v = self.opt("get_real", name, None)
            if v is not None:
                setattr(self, attr, v)
        n = self.opt("get_int", "snes_max_it", None)
        if n:
            self.max_it = n
        if self.opt("get_bool", "snes_ksp_ew", False):
            self.use_ew = True
        v = self.opt("get_int", "snes_lag_jacobian", None)
        if v is not None:
            self.lag_jacobian = v
        v = self.opt("get_int", "snes_lag_preconditioner", None)
        if v is not None:
            self.lag_preconditioner = v
        if self.opt("get_bool", "snes_mf", False):
            self._jac_mode = "jvp"
        if self.opt("get_bool", "snes_fd", False):
            self._jac_mode = "fd"
        if self.opt("get_bool", "snes_fd_color", False):
            self._jac_mode = "fd_color"
        self.linesearch.set_from_options()
        return self

    # ---------------- callbacks ----------------

    def setFunction(self, fn, f=None, args=None):
        """PETSc-style fn(snes, X, F) filling Vec F, or a pure jax
        fn(x, *args)->r over arrays (enables exact JVP Jacobians).
        `args` are extra traced parameters (e.g. t, dt, u_prev for TS
        stage residuals): updating args REUSES every compiled kernel —
        only the data changes, never the trace."""
        if args is not None or len(inspect.signature(fn).parameters) == 1:
            if self._func_pure is not fn:
                self._func_pure = fn
                self._mf_shell = None      # new trace identity
                self._jacfwd_jit = None
            self._func_args = tuple(jnp.asarray(a) for a in (args or ()))
        else:
            self._func = fn
            self._fvec = f
        return self

    def setJacobian(self, fn=None, J=None, P=None):
        if fn is not None:
            self._jac = fn
            self._jac_mode = "user"
        self._jac_mat = J
        self._jac_pmat = P if P is not None else J
        return self

    def setUseMF(self, flag=True):
        self._jac_mode = "jvp" if flag else self._jac_mode

    def setUseFD(self, flag=True, coloring=True):
        self._jac_mode = ("fd_color" if coloring else "fd") if flag \
            else self._jac_mode

    # ---------------- function/jacobian evaluation ----------------

    def _func_np(self, x_np):
        """Residual as numpy array (host)."""
        self._nfuncs += 1
        if self._func_pure is not None:
            args = getattr(self, "_func_args", ())
            return np.asarray(self._func_pure(jnp.asarray(x_np), *args))
        X = Vec.from_array(x_np, comm=self.comm)
        F = self._fvec if self._fvec is not None else X.duplicate()
        self._func(self, X, F)
        return np.asarray(F.getArray())

    def computeFunction(self, X: Vec, F: Vec):
        F.setArray(self._func_np(np.asarray(X.getArray())))
        return F

    def _resolve_jac_mode(self):
        if self._jac_mode is not None:
            return self._jac_mode
        if self._jac is not None:
            return "user"
        if self._func_pure is not None:
            return "jvp"
        return "fd"

    def setLagJacobian(self, lag):
        """SNESSetLagJacobian (-snes_lag_jacobian): rebuild the Jacobian
        every `lag` iterations; -2 = build once then freeze, -1 = never
        build (reuse whatever exists), 1 = every iteration (default)."""
        self.lag_jacobian = int(lag)
        return self

    def setLagPreconditioner(self, lag):
        """SNESSetLagPreconditioner (-snes_lag_preconditioner): rebuild
        the preconditioner MATRIX every `lag` Jacobian rebuilds (the
        frozen-PC / fresh-J-action pattern; reusing the same P object
        lets PCSetUp's state-counter skip the AMG/ILU re-setup)."""
        self.lag_preconditioner = int(lag)
        return self

    lag_jacobian = 1
    lag_preconditioner = 1
    _jac_calls = 0
    _lag_cache = None

    def computeJacobian(self, x_np):
        """Returns (J, P) Mats for the current iterate, honoring the
        -snes_lag_jacobian / -snes_lag_preconditioner reuse policy
        (snes.c SNESComputeJacobian lagging semantics)."""
        calls = self._jac_calls
        self._jac_calls = calls + 1
        lj, lp = self.lag_jacobian, self.lag_preconditioner
        if self._lag_cache is not None:
            if lj == -1 or (lj == -2 and calls > 0) \
                    or (lj > 1 and calls % lj != 0):
                return self._lag_cache
        J, P = self._compute_jacobian_now(x_np)
        if self._lag_cache is not None and (
                lp == -1 or (lp == -2 and calls > 0)
                or (lp > 1 and calls % lp != 0)):
            P = self._lag_cache[1]      # frozen preconditioner matrix
        self._lag_cache = (J, P)
        return J, P

    def _compute_jacobian_now(self, x_np):
        mode = self._resolve_jac_mode()
        if mode == "user":
            X = Vec.from_array(x_np, comm=self.comm)
            if self._jac_mat is None:
                n = len(x_np)
                self._jac_mat = MatAIJ(self.comm)
                self._jac_mat.setSizes((n, n))
                self._jac_pmat = self._jac_mat
            self._jac(self, X, self._jac_mat, self._jac_pmat)
            if not self._jac_mat._assembled:
                self._jac_mat.assemble()
            return self._jac_mat, self._jac_pmat or self._jac_mat
        if mode == "jvp":
            # exact Jacobian action via forward-mode AD (MATMFFD done right)
            if self._func_pure is None:
                P = self._assemble_pmat(x_np, "fd")
                return P, P
            x0 = jnp.asarray(x_np)
            args = getattr(self, "_func_args", ())
            if getattr(self, "_mf_shell", None) is None:
                # built ONCE per residual function: linearization point AND
                # parametric args travel in the shell context, so the KSP
                # jit cache stays warm across Newton its and outer steps
                fn = self._func_pure

                def _shell_mult(ctx, v):
                    xc, ac = ctx
                    return jax.jvp(lambda z: fn(z, *ac), (xc,), (v,))[1]

                J = MatShell(self.comm)
                n = len(x_np)
                J.setSizes((n, n))
                J.setShellOperations(mult=_shell_mult, context=(x0, args))
                self._mf_shell = J
            else:
                self._mf_shell._context = (x0, args)
            # preconditioner matrix: FD-colored if a pattern is known,
            # else dense jacfwd
            P = self._assemble_pmat(x_np)
            return self._mf_shell, P
        if mode in ("fd", "jacfwd", "fd_color"):
            P = self._assemble_pmat(x_np, mode)
            return P, P
        raise Error(f"SNES: unknown jacobian mode {mode}")

    def _assemble_pmat(self, x_np, mode=None):
        n = len(x_np)
        pattern = None
        if self._jac_pmat is not None and self._jac_pmat.nnz() > 0:
            pattern = self._jac_pmat
        elif self.dm is not None and hasattr(self.dm,
                                             "preallocateStencilPattern"):
            # DMDA stencil preallocation -> colored FD Jacobian, the
            # classic SNESSetDM + SNESComputeJacobianDefaultColor workflow
            self._jac_pmat = self.dm.createMatrix(preallocate_pattern=True)
            pattern = self._jac_pmat
        if mode is None:
            mode = "fd_color" if pattern is not None else (
                "jacfwd" if self._func_pure is not None else "fd")
        if mode == "jacfwd" or (mode == "fd" and self._func_pure is not None):
            if getattr(self, "_jacfwd_jit", None) is None:
                self._jacfwd_jit = jax.jit(jax.jacfwd(self._func_pure))
            args = getattr(self, "_func_args", ())
            dense = np.asarray(self._jacfwd_jit(jnp.asarray(x_np), *args))
            import scipy.sparse as sp
            A = sp.csr_matrix(dense)
            M = MatAIJ.from_scipy(A, comm=self.comm)
            return M
        if mode == "fd":
            return self._fd_dense(x_np)
        if mode == "fd_color":
            if pattern is None:
                raise Error("SNES fd_color: provide a preallocated pmat "
                            "pattern via setJacobian(J=..., P=...)")
            return self._fd_colored(x_np, pattern)
        raise Error(f"unknown pmat mode {mode}")

    def _fd_dense(self, x_np):
        """SNESComputeJacobianDefault (snesj.c): dense forward differences."""
        import scipy.sparse as sp
        n = len(x_np)
        f0 = self._func_np(x_np)
        J = np.zeros((n, n))
        eps = np.sqrt(np.finfo(float).eps)
        for j in range(n):
            h = eps * max(abs(x_np[j]), 1.0)
            xp = x_np.copy()
            xp[j] += h
            J[:, j] = (self._func_np(xp) - f0) / h
        return MatAIJ.from_scipy(sp.csr_matrix(J), comm=self.comm)

    def _fd_colored(self, x_np, pattern: MatAIJ):
        """SNESComputeJacobianDefaultColor (snesj2.c + MatFDColoring): FD
        with distance-2 greedy coloring of the pattern columns."""
        import scipy.sparse as sp
        S = pattern.to_scipy()
        S = sp.csr_matrix((np.ones_like(S.data), S.indices, S.indptr),
                          shape=S.shape)
        if self._fd_coloring is None or self._fd_coloring[0] != S.shape[0]:
            self._fd_coloring = (S.shape[0], _greedy_color(S))
        colors = self._fd_coloring[1]
        ncolor = colors.max() + 1
        f0 = self._func_np(x_np)
        eps = np.sqrt(np.finfo(float).eps)
        Sc = S.tocsc()
        for c in range(ncolor):
            cols = np.nonzero(colors == c)[0]
            h = eps * np.maximum(np.abs(x_np[cols]), 1.0)
            xp = x_np.copy()
            xp[cols] += h
            df = (self._func_np(xp) - f0)
            for ci, col in enumerate(cols):
                lo, hi = Sc.indptr[col], Sc.indptr[col + 1]
                rws = Sc.indices[lo:hi]
                Sc.data[lo:hi] = df[rws] / h[ci]
        J = Sc.tocsr()
        return MatAIJ.from_scipy(J, comm=self.comm)

    # ---------------- convergence ----------------

    def _converged(self, it, xnorm, snorm, fnorm):
        """SNESConvergedDefault (snes/interface/snesut.c semantics)."""
        if np.isnan(fnorm) or np.isinf(fnorm):
            return SR.DIVERGED_FNORM_NAN
        if fnorm < self.abstol:
            return SR.CONVERGED_FNORM_ABS
        if it > 0:
            if fnorm <= self._ttol:
                return SR.CONVERGED_FNORM_RELATIVE
            if snorm < self.stol * xnorm:
                return SR.CONVERGED_SNORM_RELATIVE
            if self.divtol > 0 and fnorm > self.divtol * self._fnorm0:
                return SR.DIVERGED_DTOL
        if self._nfuncs >= self.max_funcs:
            return SR.DIVERGED_FUNCTION_COUNT
        return SR.ITERATING

    def _ew_rtol(self, fnorm, fnorm_old):
        """Eisenstat-Walker forcing, version 2 (snesut.c):
        eta = gamma * (fnorm/fnorm_old)^alpha with safeguard."""
        gamma, alpha = 1.0, 0.5 * (1.0 + np.sqrt(5.0))
        eta = gamma * (fnorm / fnorm_old) ** alpha
        safeguard = gamma * self._ew_eta ** alpha
        if safeguard > 0.1:
            eta = max(eta, safeguard)
        eta = min(max(eta, 1e-10), 0.9)
        self._ew_eta = eta
        return eta

    # ---------------- drive ----------------

    def _monitor(self, it, fnorm):
        self._history.append(fnorm)
        if self.opt("get_bool", "snes_monitor", False):
            print(f"{it:3d} SNES Function norm {fnorm:14.12e}")
        if self.opt("get_bool", "snes_monitor_short", False):
            print(f"{it:3d} SNES Function norm {fnorm:g}")
        for m in self._monitors:
            m(self, it, fnorm)

    def setMonitor(self, fn):
        self._monitors.append(fn)

    def solveCompiled(self, x: Vec, args=None):
        """Fully-jitted JFNK (snes/compiled.py): the whole Newton-Krylov
        solve — matrix-free GMRES inner solves on exact JVPs, backtracking
        — in ONE XLA program. Requires a pure residual; args are traced
        parameters (kernel reuse across calls)."""
        from .compiled import jfnk_solve
        if self._func_pure is None:
            raise Error("solveCompiled needs a pure residual (setFunction "
                        "with fn(x, *args))")
        a = tuple(jnp.asarray(v) for v in (
            args if args is not None else getattr(self, "_func_args", ())))
        xx, its, fnorm, done = jfnk_solve(
            self._func_pure, x.array, a, jnp.float64(self.rtol),
            jnp.float64(self.abstol), max_it=self.max_it,
            nargs=len(a))
        x.array = xx
        self._its = int(its)
        self._fnorm = float(fnorm)
        self._reason = SR.CONVERGED_FNORM_RELATIVE if bool(done) \
            else SR.DIVERGED_MAX_IT
        return x

    def solve(self, b: Vec | None, x: Vec):
        self.setFromOptions()
        self._history = []
        self._nfuncs = 0
        self._reason = SR.ITERATING
        # lag counters restart per solve unless -snes_lag_jacobian_persists
        # (SNESSetLagJacobianPersists semantics)
        if not self.opt("get_bool", "snes_lag_jacobian_persists", False):
            self._jac_calls = 0
            self._lag_cache = None
        impl = self._impls[self._type]
        x_np = np.asarray(x.getArray(), dtype=np.float64).copy()
        if b is not None:
            raise Error("SNES: nonzero b not yet supported")
        import time as _time
        _t0 = _time.perf_counter()
        impl(self, x_np, x)
        config.log().log_event("SNESSolve", _time.perf_counter() - _t0)
        if self.opt("get_bool", "snes_converged_reason", False):
            verb = "converged" if self._reason.converged else "did not converge"
            lab = ("CONVERGED_" + self._reason.name.split("CONVERGED_")[-1]
                   if self._reason.converged else self._reason.name)
            print(f"Nonlinear solve {verb} due to {lab} iterations "
                  f"{self._its}")
        return x

    # ---------------- results ----------------

    def getIterationNumber(self):
        return self._its

    def getFunctionNorm(self):
        return self._fnorm

    def getConvergedReason(self):
        return self._reason

    def getConvergenceHistory(self):
        return np.asarray(self._history)

    def view(self, viewer=None):
        print(f"SNES Object: type: {self._type}")
        print(f"  maximum iterations={self.max_it}, "
              f"maximum function evaluations={self.max_funcs}")
        print(f"  tolerances: relative={self.rtol:g}, absolute={self.abstol:g},"
              f" solution={self.stol:g}")


def _greedy_color(S):
    """Distance-2 greedy column coloring (MatColoring greedy analog,
    src/mat/graphops/color/impls/greedy): columns sharing a row get
    different colors."""
    import scipy.sparse as sp
    Sc = S.tocsc()
    n = S.shape[1]
    colors = np.full(n, -1, dtype=np.int64)
    # column conflict graph: C = S^T S pattern
    C = (Sc.T @ Sc).tocsr()
    from .. import native
    out = native.greedy_color(C.indptr.astype(np.int64),
                              C.indices.astype(np.int64))
    if out is not None:
        return out
    for j in range(n):
        nbr = C.indices[C.indptr[j]:C.indptr[j + 1]]
        used = set(colors[nbr[nbr < j]].tolist()) if len(nbr) else set()
        c = 0
        while c in used:
            c += 1
        colors[j] = c
    return colors


# =====================================================================
# implementations
# =====================================================================

def _ksp_solve_newton(snes, F_np, J, P):
    """One linear solve J y = F with the SNES KSP."""
    ksp = snes.getKSP()
    ksp.setOperators(J, P)
    b = Vec.from_array(F_np, comm=snes.comm)
    y = b.duplicate()
    ksp.error_if_not_converged = False
    ksp.solve(b, y)
    if ksp.getConvergedReason().value < 0:
        return None
    return np.asarray(y.getArray())


def _finish(snes, x, x_np, it, fnorm, reason):
    snes._its = it
    snes._fnorm = fnorm
    snes._reason = reason
    x.setArray(x_np)


def solve_newtonls(snes: SNES, x_np, x):
    """Newton with line search (ls.c:125)."""
    F = snes._func_np(x_np)
    fnorm = float(np.linalg.norm(F))
    snes._fnorm0 = fnorm
    snes._ttol = snes.rtol * fnorm
    snes._monitor(0, fnorm)
    reason = snes._converged(0, 0.0, 0.0, fnorm)
    it = 0
    fnorm_old = fnorm
    while reason == SR.ITERATING and it < snes.max_it:
        if snes.use_ew and it > 0:
            snes.getKSP().setTolerances(
                rtol=snes._ew_rtol(fnorm, fnorm_old))
        J, P = snes.computeJacobian(x_np)
        y = _ksp_solve_newton(snes, F, J, P)
        if y is None:
            reason = SR.DIVERGED_LINEAR_SOLVE
            break
        xn, Fn, gnorm, lam, ok = snes.linesearch.apply(x_np, y, F, fnorm)
        if not ok and gnorm >= fnorm:
            reason = SR.DIVERGED_LINE_SEARCH
            x_np = xn
            break
        snorm = lam * float(np.linalg.norm(y))
        fnorm_old = fnorm
        x_np, F, fnorm = xn, Fn, gnorm
        it += 1
        snes._monitor(it, fnorm)
        reason = snes._converged(it, float(np.linalg.norm(x_np)), snorm, fnorm)
    if reason == SR.ITERATING:
        reason = SR.DIVERGED_MAX_IT
    _finish(snes, x, x_np, it, fnorm, reason)


def solve_ksponly(snes: SNES, x_np, x):
    """One Newton step, no line search (impls/ksponly)."""
    F = snes._func_np(x_np)
    fnorm = float(np.linalg.norm(F))
    snes._fnorm0 = fnorm
    snes._ttol = snes.rtol * fnorm
    snes._monitor(0, fnorm)
    J, P = snes.computeJacobian(x_np)
    y = _ksp_solve_newton(snes, F, J, P)
    if y is None:
        _finish(snes, x, x_np, 0, fnorm, SR.DIVERGED_LINEAR_SOLVE)
        return
    x_np = x_np - y
    _finish(snes, x, x_np, 1, fnorm, SR.CONVERGED_ITS)


def solve_newtontr(snes: SNES, x_np, x):
    """Newton trust region with dogleg step (impls/tr/tr.c behavior:
    rho-based radius update, delta0=0.2*max(xnorm,1))."""
    F = snes._func_np(x_np)
    fnorm = float(np.linalg.norm(F))
    snes._fnorm0 = fnorm
    snes._ttol = snes.rtol * fnorm
    snes._monitor(0, fnorm)
    delta = 0.2 * max(float(np.linalg.norm(x_np)), 1.0)
    reason = snes._converged(0, 0.0, 0.0, fnorm)
    it = 0
    while reason == SR.ITERATING and it < snes.max_it:
        J, P = snes.computeJacobian(x_np)
        yN = _ksp_solve_newton(snes, F, J, P)     # newton: J yN = F
        if yN is None:
            reason = SR.DIVERGED_LINEAR_SOLVE
            break
        Jop = J.op()
        g = np.asarray(Jop.mult_t(jnp.asarray(F))) if Jop.mult_t else F
        accepted = False
        for _ in range(30):
            nrmN = float(np.linalg.norm(yN))
            if nrmN <= delta:
                step = yN
            else:
                # dogleg between Cauchy point and scaled Newton
                gnorm2 = float(np.dot(g, g))
                Jg = np.asarray(Jop.mult(jnp.asarray(g)))
                denom = float(np.dot(Jg, Jg))
                tau = gnorm2 / denom if denom > 0 else 1.0
                yC = tau * g
                nrmC = float(np.linalg.norm(yC))
                if nrmC >= delta:
                    step = (delta / nrmC) * yC
                else:
                    d = yN - yC
                    a = float(np.dot(d, d))
                    bq = 2.0 * float(np.dot(yC, d))
                    c = float(np.dot(yC, yC)) - delta * delta
                    t = (-bq + np.sqrt(max(bq * bq - 4 * a * c, 0.0))) / (2 * a) \
                        if a > 0 else 0.0
                    step = yC + t * d
            xn = x_np - step
            Fn = snes._func_np(xn)
            gn = float(np.linalg.norm(Fn))
            ared = 0.5 * (fnorm ** 2 - gn ** 2)
            Js = np.asarray(Jop.mult(jnp.asarray(step)))
            pred = 0.5 * (fnorm ** 2 - float(np.linalg.norm(F - Js)) ** 2)
            rho = ared / pred if pred > 0 else -1.0
            if rho < 0.25:
                delta *= 0.25
            elif rho > 0.75:
                delta = min(2.0 * delta, 1e10)
            if rho > 1e-4:
                accepted = True
                snorm = float(np.linalg.norm(step))
                x_np, F, fnorm = xn, Fn, gn
                break
            if delta < 1e-30:
                break
        if not accepted:
            reason = SR.DIVERGED_TR_DELTA
            break
        it += 1
        snes._monitor(it, fnorm)
        reason = snes._converged(it, float(np.linalg.norm(x_np)), snorm, fnorm)
    if reason == SR.ITERATING:
        reason = SR.DIVERGED_MAX_IT
    _finish(snes, x, x_np, it, fnorm, reason)


def solve_nrichardson(snes: SNES, x_np, x):
    """Nonlinear Richardson: x <- x + damping*F... (impls/nrichardson,
    direction = -F with linesearch l2 default)."""
    ls = snes.linesearch
    old_kind = ls.kind
    if ls.kind == "bt":
        ls.kind = "l2"
    F = snes._func_np(x_np)
    fnorm = float(np.linalg.norm(F))
    snes._fnorm0 = fnorm
    snes._ttol = snes.rtol * fnorm
    snes._monitor(0, fnorm)
    reason = snes._converged(0, 0.0, 0.0, fnorm)
    it = 0
    while reason == SR.ITERATING and it < snes.max_it:
        xn, Fn, gnorm, lam, ok = ls.apply(x_np, F, F, fnorm)
        snorm = lam * fnorm
        x_np, F, fnorm = xn, Fn, gnorm
        it += 1
        snes._monitor(it, fnorm)
        reason = snes._converged(it, float(np.linalg.norm(x_np)), snorm, fnorm)
    ls.kind = old_kind
    if reason == SR.ITERATING:
        reason = SR.DIVERGED_MAX_IT
    _finish(snes, x, x_np, it, fnorm, reason)


def solve_qn(snes: SNES, x_np, x):
    """L-BFGS quasi-Newton on F (impls/qn/qn.c, LBFGS variant, m=10,
    scale-type shanno)."""
    m = 10
    S, Y = [], []
    F = snes._func_np(x_np)
    fnorm = float(np.linalg.norm(F))
    snes._fnorm0 = fnorm
    snes._ttol = snes.rtol * fnorm
    snes._monitor(0, fnorm)
    reason = snes._converged(0, 0.0, 0.0, fnorm)
    it = 0
    ls = snes.linesearch
    old_kind = ls.kind
    if ls.kind == "bt":
        ls.kind = "l2"
    while reason == SR.ITERATING and it < snes.max_it:
        # two-loop recursion: d = H F
        q = F.copy()
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
            b_ = rho * float(np.dot(yv, q))
            q += (a - b_) * s
        d = q
        xn, Fn, gnorm, lam, ok = ls.apply(x_np, d, F, fnorm)
        if not ok and gnorm >= fnorm:
            # restart from steepest descent
            S.clear(); Y.clear()
            xn, Fn, gnorm, lam, ok = ls.apply(x_np, F, F, fnorm)
            if not ok and gnorm >= fnorm:
                reason = SR.DIVERGED_LINE_SEARCH
                break
            d = F
        s_new = xn - x_np
        y_new = Fn - F
        if float(np.dot(y_new, s_new)) > 1e-14:
            S.append(s_new); Y.append(y_new)
            if len(S) > m:
                S.pop(0); Y.pop(0)
        snorm = float(np.linalg.norm(s_new))
        x_np, F, fnorm = xn, Fn, gnorm
        it += 1
        snes._monitor(it, fnorm)
        reason = snes._converged(it, float(np.linalg.norm(x_np)), snorm, fnorm)
    ls.kind = old_kind
    if reason == SR.ITERATING:
        reason = SR.DIVERGED_MAX_IT
    _finish(snes, x, x_np, it, fnorm, reason)


def solve_anderson(snes: SNES, x_np, x):
    """Anderson mixing / NGMRES family (impls/ngmres): least-squares
    combination of the last m residuals, beta=1 mixing."""
    m = 10
    beta = 1.0
    Xh, Fh = [], []
    F = snes._func_np(x_np)
    fnorm = float(np.linalg.norm(F))
    snes._fnorm0 = fnorm
    snes._ttol = snes.rtol * fnorm
    snes._monitor(0, fnorm)
    reason = snes._converged(0, 0.0, 0.0, fnorm)
    it = 0
    while reason == SR.ITERATING and it < snes.max_it:
        Xh.append(x_np.copy()); Fh.append(F.copy())
        if len(Xh) > m:
            Xh.pop(0); Fh.pop(0)
        k = len(Xh)
        if k == 1:
            xn = x_np - beta * F
        else:
            dF = np.stack([Fh[i] - Fh[-1] for i in range(k - 1)], axis=1)
            coef, *_ = np.linalg.lstsq(dF, -Fh[-1], rcond=None)
            dX = np.stack([Xh[i] - Xh[-1] for i in range(k - 1)], axis=1)
            xn = Xh[-1] + dX @ coef - beta * (Fh[-1] + dF @ coef)
        Fn = snes._func_np(xn)
        gnorm = float(np.linalg.norm(Fn))
        snorm = float(np.linalg.norm(xn - x_np))
        x_np, F, fnorm = xn, Fn, gnorm
        it += 1
        snes._monitor(it, fnorm)
        reason = snes._converged(it, float(np.linalg.norm(x_np)), snorm, fnorm)
    if reason == SR.ITERATING:
        reason = SR.DIVERGED_MAX_IT
    _finish(snes, x, x_np, it, fnorm, reason)


SNES._impls.update({
    "newtonls": solve_newtonls,
    "newtontr": solve_newtontr,
    "ksponly": solve_ksponly,
    "ksptransposeonly": solve_ksponly,
    "nrichardson": solve_nrichardson,
    "qn": solve_qn,
    "anderson": solve_anderson,
    "ngmres": solve_anderson,
})
