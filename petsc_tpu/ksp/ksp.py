"""KSP: Krylov solver context.

Reference: KSP interface (src/ksp/ksp/interface/itfunc.c — KSPSolve :1104,
KSPSolve_Private :824, KSPSetUp :330) and the options/monitor/convergence
surface of iterativ.c. TPU redesign: KSPSolve jit-compiles the whole
iteration (solver loop + SpMV + PC apply fused into one XLA program),
cached by (ksp_type, operator meta, pc meta, static config). Residual
history is recorded in-loop into a fixed buffer; monitors print post-hoc
from the history — output-identical to PETSc's in-loop monitors.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..ops import operator
from ..sys.error import (Error, KSPConvergedReason as KR, NotConvergedError,
                         ksp_reason_string)
from ..sys.object import PObject
from ..pc.pc import PC
from ..vec.vec import Vec
from . import common
from .common import KSPConfig

# solver registry: name -> (solve_fn, default_normtype, specific-extras builder)
_IMPLS: dict[str, dict] = {}


def register_ksp(name, fn, default_norm=common.PRECONDITIONED,
                 extras=None, supports_right=False, host_driven=False):
    _IMPLS[name] = {"fn": fn, "norm": default_norm, "extras": extras,
                    "right": supports_right, "host_driven": host_driven}


_jit_cache: dict = {}


@jax.jit
def _pack_stats(its, rnorm, rnorm0, reason, history):
    """Stack the solve statistics into ONE device buffer so the host
    needs a single round trip (per-leaf fetches cost seconds each
    through a tunneled device)."""
    head = jnp.stack([its.astype(history.dtype),
                      rnorm.astype(history.dtype),
                      rnorm0.astype(history.dtype),
                      reason.astype(history.dtype)])
    return jnp.concatenate([head, history])


def _compiled_solver(name, mat_meta, pc_meta, cfg: KSPConfig,
                     donate_rhs=False):
    key = (name, mat_meta, pc_meta, cfg, donate_rhs)
    if key in _jit_cache:
        return _jit_cache[key]
    fn = _IMPLS[name]["fn"]

    def run(mat_data, pc_data, b, x0, rtol, abstol, divtol):
        A = operator.bind(mat_meta, mat_data)
        B = operator.bind(pc_meta, pc_data)
        return fn(A, B, b, x0, rtol, abstol, divtol, cfg)

    # x0 is donated: solve() always passes a fresh zeros buffer or the
    # caller's x whose .array is reassigned from the result afterwards —
    # at 512^3 the donation hands a 1.07 GB buffer to the solver state.
    # -ksp_donate_rhs (opt-in TPU-ism): the caller promises not to reuse
    # b.array after the solve, freeing another fine-vector buffer — at
    # 512^3 CG+GAMG the program otherwise sits exactly at the 15.75 GB
    # HBM line (chip-measured memory_analysis: args 4.04 + temp 12.71 -
    # alias 1.0 GiB)
    jitted = jax.jit(run, donate_argnums=(2, 3) if donate_rhs else (3,))
    _jit_cache[key] = jitted
    return jitted


class KSP(PObject):
    _class_name = "KSP"

    def __init__(self, comm=None, **kw):
        super().__init__(**kw)
        self.comm = comm
        self.mat = None
        self.pmat = None
        self.pc: PC | None = None
        self._type = None
        self.rtol, self.abstol, self.divtol, self.max_it = 1e-5, 1e-50, 1e4, 10000
        self.normtype = None          # None -> solver default
        self.guess_nonzero = False
        self.converged_maxits = False
        self.error_if_not_converged = False
        self._its = 0
        self._rnorm = 0.0
        self._rnorm0 = 0.0
        self._reason = KR.ITERATING
        self._history = np.zeros(0)
        self._params = {}             # solver-specific (restart, scale, ...)
        self._monitors = []

    # ---------------- lifecycle ----------------

    def create(self, comm=None):
        self.comm = comm or self.comm
        return self

    def setOperators(self, A, P=None):
        self.mat = A
        self.pmat = P if P is not None else A
        if self.comm is None:
            self.comm = A.comm
        self.getPC().setOperators(self.mat, self.pmat)
        return self

    # ---------------- DM integration (dmksp.c) ----------------

    def setDM(self, dm):
        self.dm = dm
        return self

    def getDM(self):
        return getattr(self, "dm", None)

    def setComputeOperators(self, fn):
        """KSPSetComputeOperators (itfunc.c:3054): fn(ksp, A, B) assembles
        the operator into the DM-created matrix A."""
        self.getDM().setKSPComputeOperators(fn)
        return self

    def setComputeRHS(self, fn):
        self.getDM().setKSPComputeRHS(fn)
        return self

    def setComputeInitialGuess(self, fn):
        """KSPSetComputeInitialGuess: fn(ksp, x) fills the starting vector
        when solve() builds it from the DM."""
        self.getDM()._compute_initial_guess = fn
        return self

    def _assemble_from_dm(self):
        dm = self.getDM()
        A = dm.createMatrix()
        dm._compute_operators(self, A, A)
        if not A._assembled:
            A.assemble()
        self.setOperators(A)

    def getOperators(self):
        return self.mat, self.pmat

    def getPC(self) -> PC:
        if self.pc is None:
            self.pc = PC(options=self._options, prefix=self._prefix)
            if self.mat is not None:
                self.pc.setOperators(self.mat, self.pmat)
        return self.pc

    def setPC(self, pc):
        self.pc = pc

    def setType(self, name):
        if name not in _IMPLS:
            raise KeyError(f"Unknown KSP type '{name}'. Registered: "
                           f"{', '.join(sorted(_IMPLS))}")
        self._type = name
        return self

    def getType(self):
        return self._type

    def setTolerances(self, rtol=None, atol=None, divtol=None, max_it=None):
        if rtol is not None:
            self.rtol = float(rtol)
        if atol is not None:
            self.abstol = float(atol)
        if divtol is not None:
            self.divtol = float(divtol)
        if max_it is not None:
            self.max_it = int(max_it)
        return self

    def getTolerances(self):
        return self.rtol, self.abstol, self.divtol, self.max_it

    def setNormType(self, nt):
        self.normtype = nt

    def setPCSide(self, side):
        self.getPC().side = side

    def setInitialGuessNonzero(self, flag=True):
        self.guess_nonzero = bool(flag)

    def setErrorIfNotConverged(self, flag=True):
        self.error_if_not_converged = bool(flag)

    def setParam(self, key, value):
        """Solver-specific static parameter (restart, richardson scale...)."""
        self._params[key] = value
        return self

    def setGMRESRestart(self, r):
        return self.setParam("restart", int(r))

    def setRadius(self, delta):
        """KSPCGSetRadius (stcg/nash/gltr trust-region bound)."""
        return self.setParam("radius", float(delta))

    def setMixedPrecision(self, flag=True, inner_rtol=1e-6, max_outer=30):
        """f32 inner Krylov + f64 outer iterative refinement (ksp/ir.py):
        f64-accurate answers at f32 TPU rates."""
        self._mixed = (bool(flag), float(inner_rtol), int(max_outer))
        return self

    def setGuessType(self, kind="fischer", size=10):
        """Attach a KSPGuess (petscksp.h:1120 Fischer/POD) predicting x0
        from previous solves of the same operator."""
        from .guess import KSPGuess
        self._guess = KSPGuess(self, kind, size)
        return self._guess

    def setMonitor(self, fn):
        self._monitors.append(fn)

    def setFromOptions(self):
        o = self.opt
        t = o("get_string", "ksp_type", None)
        if t:
            self.setType(t)
        if self._type is None:
            self.setType("gmres")
        self.rtol = o("get_real", "ksp_rtol", self.rtol)
        self.abstol = o("get_real", "ksp_atol", self.abstol)
        self.divtol = o("get_real", "ksp_divtol", self.divtol)
        self.max_it = o("get_int", "ksp_max_it", self.max_it)
        nt = o("get_string", "ksp_norm_type", None)
        if nt:
            self.normtype = nt
        if o("get_bool", "ksp_initial_guess_nonzero", False):
            self.guess_nonzero = True
        if o("get_bool", "ksp_converged_maxits", False):
            self.converged_maxits = True
        if o("get_bool", "ksp_error_if_not_converged", False):
            self.error_if_not_converged = True
        r = o("get_int", "ksp_gmres_restart", None)
        if r:
            self._params["restart"] = r
        s = o("get_real", "ksp_richardson_scale", None)
        if s:
            self._params["scale"] = s
        side = o("get_string", "ksp_pc_side", None)
        if side:
            self.getPC().side = side
        self.getPC().setFromOptions()
        return self

    def setUp(self):
        if self._type is None:
            self.setFromOptions()
        # -ksp_pc_side right with gmres: route to the flexible (right-
        # preconditioned) implementation — identical to right-PC GMRES for
        # a constant preconditioner (KSPSetPCSide semantics)
        if (self.getPC().side == "right" and self._type == "gmres"):
            self._type = "fgmres"
        if self.normtype is None:
            self.normtype = _IMPLS[self._type]["norm"]
        self.getPC().setUp()
        from ..sys.info import info
        info(self, f"setUp: type={self._type} norm={self.normtype} "
                   f"rtol={self.rtol:g}")
        self._setup_called = True
        return self

    # ---------------- solve ----------------

    def _static_cfg(self) -> KSPConfig:
        extras = ()
        builder = _IMPLS[self._type]["extras"]
        if builder is not None:
            extras = builder(self)
        return KSPConfig(max_it=self.max_it, normtype=self.normtype,
                         guess_nonzero=self.guess_nonzero,
                         converged_maxits=self.converged_maxits,
                         extra=extras)

    def _compiled_ir(self, cfg, mixed):
        """Jitted mixed-precision refinement solver (ksp/ir.py)."""
        from .ir import solve_ir
        _, inner_rtol, max_outer = mixed
        key = ("ir", self._type, self.mat.meta, self.pc.meta, cfg,
               inner_rtol, max_outer)
        if key in _jit_cache:
            return _jit_cache[key]
        inner_fn = _IMPLS[self._type]["fn"]
        inner_cfg = KSPConfig(max_it=min(cfg.max_it, 1000),
                              normtype=cfg.normtype,
                              converged_maxits=True, extra=cfg.extra)
        outer_cfg = KSPConfig(max_it=max_outer, normtype=cfg.normtype,
                              guess_nonzero=cfg.guess_nonzero,
                              extra=(max_outer, inner_rtol))
        mat_meta, pc_meta = self.mat.meta, self.pc.meta

        def run(d64, d32, p32, b, x0, rtol, abstol, divtol):
            A64 = operator.bind(mat_meta, d64)
            A32 = operator.bind(mat_meta, d32)
            B32 = operator.bind(pc_meta, p32)
            return solve_ir(inner_fn, inner_cfg, A64, A32, B32, b, x0,
                            rtol, abstol, divtol, outer_cfg)

        jitted = jax.jit(run)
        _jit_cache[key] = jitted
        return jitted

    def solve(self, b: Vec | None = None, x: Vec | None = None):
        """KSPSolve (itfunc.c:1104): setup, dispatch the jitted loop, record
        history/reason, run monitors and option-driven reporting. With a DM
        attached and b/x omitted, the rhs/operator callbacks build them."""
        dm = self.getDM()
        if self.mat is None and dm is not None:
            self._assemble_from_dm()
        if b is None and dm is not None:
            b = dm.createGlobalVector()
            dm._compute_rhs(self, b)
        if x is None:
            x = self.mat.createVecRight()
            ig = getattr(dm, "_compute_initial_guess", None) if dm else None
            if ig is not None:
                ig(self, x)
                self.guess_nonzero = True
        self._solution = x
        self.setUp()
        guess = getattr(self, "_guess", None)
        saved_nonzero = self.guess_nonzero
        if guess is not None and not self.guess_nonzero:
            g = guess.formGuess(np.asarray(b.array))
            if g is not None:
                x.setArray(g[: self.mat.row_layout.N])
                self.guess_nonzero = True
        cfg = self._static_cfg()
        mixed = getattr(self, "_mixed", None)
        if mixed is None and self.opt("get_bool", "ksp_mixed_precision",
                                      False):
            mixed = (True, 1e-6, 30)
            self._mixed = mixed
        x0 = x.array if self.guess_nonzero else jnp.zeros_like(b.array)
        t0 = time.perf_counter()
        if _IMPLS[self._type].get("host_driven"):
            # host-orchestrated methods (deflation eig etc.): device
            # matvecs through bound ops, control flow on host
            xh, its, rnorm, reason, histl, rnorm0 = \
                _IMPLS[self._type]["fn"](self, np.asarray(b.array),
                                         np.asarray(x0))
            x.setArray(xh)
            self.guess_nonzero = saved_nonzero
            self._its = int(its)
            self._rnorm = float(rnorm)
            self._rnorm0 = float(rnorm0)
            self._reason = KR(int(reason))
            self._history = np.asarray(histl)
            config.log().log_event("KSPSolve",
                                   time.perf_counter() - t0)
            self._report(b)
            if self.error_if_not_converged and self._reason.diverged:
                raise NotConvergedError(
                    f"KSPSolve has not converged, reason "
                    f"{ksp_reason_string(self._reason)}")
            return x
        if mixed and mixed[0]:
            fn = self._compiled_ir(cfg, mixed)
            from .ir import _to_f32
            res = fn(self.mat.device_data(),
                     _to_f32(self.mat.device_data()),
                     _to_f32(self.pc.device_data()),
                     b.array, x0, self.rtol, self.abstol, self.divtol)
        elif hasattr(self.pc._impl, "presolve"):
            # PCPreSolve/PCPostSolve pattern (Eisenstat trick): iterate on
            # the transformed operator, recover afterwards
            om, od = self.pc._impl.operator_meta_data()
            bt = jnp.asarray(self.pc._impl.presolve(np.asarray(b.array)))
            fn = _compiled_solver(self._type, om, self.pc.meta, cfg)
            res = fn(od, self.pc.device_data(), bt, x0,
                     self.rtol, self.abstol, self.divtol)
            res = jax.block_until_ready(res)
            res = res._replace(x=jnp.asarray(
                self.pc._impl.postsolve(np.asarray(res.x))))
        else:
            donate_rhs = self.opt("get_bool", "ksp_donate_rhs", False)
            fn = _compiled_solver(self._type, self.mat.meta, self.pc.meta,
                                  cfg, donate_rhs=donate_rhs)
            res = fn(self.mat.device_data(), self.pc.device_data(),
                     b.array, x0, self.rtol, self.abstol, self.divtol)
        # do NOT block_until_ready the result tree: through a remote
        # (tunneled) device that waits on — and can FETCH — the full
        # solution vector (1.07 GB at 512^3, chip-measured ~1.45 s of
        # pure overhead at 256^3, round 5). The batched SCALAR stats
        # fetch below forces execution completion; x stays on device.
        self.guess_nonzero = saved_nonzero
        x.array = res.x
        if (guess is not None and int(res.reason) > 0
                and not self.opt("get_bool", "ksp_donate_rhs", False)):
            # -ksp_donate_rhs hands b's buffer to the solver: it cannot
            # feed the Fischer/POD guess history afterwards
            guess.update(np.asarray(res.x)[: self.mat.row_layout.N],
                         np.asarray(b.array)[: self.mat.row_layout.N])
        # ONE batched device->host fetch for all solve statistics: each
        # separate int()/float()/np.asarray() coercion is its own
        # synchronous transfer, and on a remote/tunneled device five
        # sequential round-trips dominate the whole warm solve
        # (iter_profile.py measured ~1.3 s fixed overhead per call at
        # 256^3; x stays on device)
        # ONE device array, ONE fetch: jax.device_get of a pytree fetches
        # every leaf as a SEPARATE round trip, and through a tunneled
        # device each round trip costs 0.3-1.8 s (round-5 profile: the
        # 5-leaf "batched" fetch was 5 x 1.8 s of a 9 s warm solve). The
        # stats pack into the history buffer's dtype on device first.
        packed = np.asarray(_pack_stats(res.its, res.rnorm, res.rnorm0,
                                        res.reason, res.history))
        dt = time.perf_counter() - t0        # stats fetch = completion
        self._its = int(packed[0])
        self._rnorm = float(packed[1])
        self._rnorm0 = float(packed[2])
        self._reason = KR(int(packed[3]))
        hist = packed[4:]
        self._history = hist[~np.isnan(hist)]
        nnz = self.mat.nnz() if hasattr(self.mat, "nnz") else 0
        config.log().log_event("KSPSolve", dt,
                               flops=2.0 * nnz * max(self._its, 1))
        self._report(b)
        if self.error_if_not_converged and self._reason.diverged:
            raise NotConvergedError(
                f"KSPSolve has not converged, reason "
                f"{ksp_reason_string(self._reason)}")
        return x

    def _report(self, b):
        o = self.opt
        mon = o("get_bool", "ksp_monitor", False)
        mon_short = o("get_bool", "ksp_monitor_short", False)
        if mon or mon_short:
            for i, r in enumerate(self._history):
                if mon:
                    print(f"{i:3d} KSP Residual norm {r:14.12e}")
                else:
                    print(_short_fmt(i, r))
        for fn in self._monitors:
            for i, r in enumerate(self._history):
                fn(self, i, r)
        if o("get_bool", "ksp_converged_reason", False):
            rs = ksp_reason_string(self._reason)
            if self._reason.converged:
                print(f"Linear solve converged due to {rs} iterations {self._its}")
            else:
                print(f"Linear solve did not converge due to {rs} iterations {self._its}")
        if o("get_bool", "ksp_view", False):
            self.view()
        vs = o("get_string", "ksp_view_solution", None)
        if vs:
            # -ksp_view_solution vtk:sol.vtu|sol.vtk (PETSCVIEWERVTK
            # role, plexvtu.c) or binary:path / npz path
            kind, _, path = vs.partition(":")
            if not path:
                kind, path = ("vtk", kind) if kind.endswith(
                    (".vtu", ".vtk", ".vti")) else ("binary", kind)
            x = self._solution
            if kind == "vtk":
                from ..sys.vtk import write_vtk, write_vtu
                dm = self.getDM() or getattr(self.mat, "_dm", None) \
                    or getattr(self.mat, "_grid_shape", None)
                if dm is None:
                    raise Error("-ksp_view_solution vtk: needs a DM or "
                                "grid shape on the operator")
                n = self.mat.getSize()[0]
                w = write_vtk if path.endswith(".vtk") else write_vtu
                w(dm, path, point_data={"solution": np.asarray(
                    x.getArray())[:n]})
            else:
                from ..sys.viewer import vec_save
                vec_save(path, x)

    def matSolve(self, B, X=None):
        """Multi-RHS solve (KSPMatSolve itfunc.c): ONE jitted solver vmapped
        over the RHS columns — all SpMVs become SpMM on the MXU, the
        batched-solve TPU win. B, X: MatDense or (n, k) arrays."""
        self.setUp()
        cfg = self._static_cfg()
        fn = _IMPLS[self._type]["fn"]
        mat_meta, pc_meta = self.mat.meta, self.pc.meta

        def run_one(mat_data, pc_data, b, rtol, abstol, divtol):
            A = operator.bind(mat_meta, mat_data)
            Bop = operator.bind(pc_meta, pc_data)
            return fn(A, Bop, b, jnp.zeros_like(b), rtol, abstol, divtol,
                      cfg)

        vrun = jax.jit(jax.vmap(run_one,
                                in_axes=(None, None, 1, None, None, None)))
        barr = B.getDenseArray() if hasattr(B, "getDenseArray") else B
        barr = jnp.asarray(np.asarray(barr), dtype=config.real_dtype())
        t0 = time.perf_counter()
        res = vrun(self.mat.device_data(), self.pc.device_data(), barr,
                   self.rtol, self.abstol, self.divtol)
        jax.block_until_ready(res.x)
        dt = time.perf_counter() - t0
        Xarr = np.asarray(res.x).T
        self._its = int(np.max(res.its))
        self._reason = KR(int(np.min(res.reason)))
        nnz = self.mat.nnz() if hasattr(self.mat, "nnz") else 0
        config.log().log_event(
            "KSPMatSolve", dt,
            flops=2.0 * nnz * max(self._its, 1) * barr.shape[1])
        if X is None:
            from ..mat.mat import MatDense
            X = MatDense(self.comm)
            X.setSizes((Xarr.shape[0], Xarr.shape[1]))
        if hasattr(X, "setDenseArray"):
            X.setDenseArray(Xarr)
            return X
        return Xarr

    # ---------------- results ----------------

    def getSolution(self):
        return getattr(self, "_solution", None)

    def getIterationNumber(self):
        return self._its

    def getResidualNorm(self):
        return self._rnorm

    def getConvergedReason(self):
        return self._reason

    def getConvergenceHistory(self):
        return self._history.copy()

    def view(self, viewer=None):
        print(f"KSP Object: ({self._prefix})")
        print(f"  type: {self._type}")
        print(f"  maximum iterations={self.max_it}, "
              f"{'nonzero' if self.guess_nonzero else 'initial guess is zero'}")
        print(f"  tolerances: relative={self.rtol:g}, absolute={self.abstol:g},"
              f" divergence={self.divtol:g}")
        print(f"  {self.normtype.upper()} norm type for convergence test")
        if self.pc is not None:
            self.pc.view()


def _short_fmt(i, r):
    """-ksp_monitor_short format (iterativ.c:286-288)."""
    if r > 1e-9:
        return f"{i:3d} KSP Residual norm {r:g}"
    if r > 1e-11:
        return f"{i:3d} KSP Residual norm {r:5.3e}"
    return f"{i:3d} KSP Residual norm < 1.e-11"


# ---------------- registration ----------------

from . import impls_basic as _b  # noqa: E402
from .gmres import solve_gmres as _gmres, solve_fgmres as _fgmres  # noqa: E402
from .bcgs import solve_bcgs as _bcgs  # noqa: E402


def _rich_extras(ksp):
    return (float(ksp._params.get("scale", 1.0)),)


_REFINE = {"refine_never": 0, "refine_ifneeded": 1, "refine_always": 2}


def _gmres_extras(ksp):
    restart = int(ksp._params.get("restart", 30))
    ref = ksp.opt("get_string", "ksp_gmres_cgs_refinement_type", None)
    refine = _REFINE.get(ref, int(ksp._params.get("refine", 0)))
    return (restart, refine)


def _cheby_extras(ksp):
    """Eigenvalue bounds for Chebyshev: user-provided
    (-ksp_chebyshev_eigenvalues emin,emax) or estimated from D^-1 A with the
    default multigrid transform (0,0.1; 0,1.1) (cheby.c:203)."""
    ev = ksp._params.get("eigenvalues")
    if ev is None:
        s = ksp.opt("get_string", "ksp_chebyshev_eigenvalues", None)
        if s:
            ev = tuple(float(t) for t in s.split(","))
    tform = (0.0, 0.1, 0.0, 1.1)   # default MG transform (cheby.c:203)
    s = ksp.opt("get_string", "ksp_chebyshev_esteig", None)
    if s:
        vals = [float(t) for t in s.split(",")]
        tform = tuple(vals + [0.0] * (4 - len(vals)))[:4]
    if ev is None:
        # one compiled device program for the whole Arnoldi sweep — no
        # per-matvec host round trips (cheby.c:74-115 esteig on-device)
        from ..ops.esteig import eig_bounds_device
        A = ksp.mat
        emin, emax = eig_bounds_device(A.meta, A.device_data(),
                                       A.row_layout.Npad)
        ev = (tform[0] * emin + tform[1] * emax,
              tform[2] * emin + tform[3] * emax)
    return (float(ev[0]), float(ev[1]))


register_ksp("preonly", _b.solve_preonly, default_norm=common.NONE)
register_ksp("none", _b.solve_preonly, default_norm=common.NONE)
register_ksp("richardson", _b.solve_richardson, extras=_rich_extras)
register_ksp("cg", _b.solve_cg)
register_ksp("minres", _b.solve_minres)
register_ksp("gmres", _gmres, extras=_gmres_extras)
register_ksp("fgmres", _fgmres, default_norm=common.UNPRECONDITIONED,
             extras=_gmres_extras, supports_right=True)
register_ksp("bcgs", _bcgs)

from .cheby import solve_chebyshev as _cheby  # noqa: E402

register_ksp("chebyshev", _cheby, extras=_cheby_extras)

from . import impls_more as _m  # noqa: E402

register_ksp("cgs", _m.solve_cgs)
register_ksp("tfqmr", _m.solve_tfqmr)
register_ksp("cr", _m.solve_cr)
# pipegcr (impls/gcr/pipegcr): pipelined flexible GCR — the pipelining
# again restructures MPI reduction latency (deeper asynchronous depth than
# pgmres); the direction-recurrence and flexibility semantics are GCR's.
# Served by the gcr kernel for the same reason as the pipecg family: XLA
# fuses the iteration's dots into one overlapped collective (documented
# alias, exact-arithmetic-equivalent trajectory).
register_ksp("pipegcr", _m.solve_gcr,
             default_norm=common.UNPRECONDITIONED, supports_right=True)
register_ksp("gcr", _m.solve_gcr, default_norm=common.UNPRECONDITIONED,
             extras=_gmres_extras, supports_right=True)
register_ksp("lsqr", _m.solve_lsqr, default_norm=common.UNPRECONDITIONED)
register_ksp("pipecg", _m.solve_pipecg)
# deeper-pipeline CG variants (pipecg2/pipecgrr/pipelcg/pipeprcg) trade
# extra vectors for latency depth on MPI; single fused psum per
# iteration is already the XLA floor — served by the same kernel.
register_ksp("pipecg2", _m.solve_pipecg)
register_ksp("pipecgrr", _m.solve_pipecg)
register_ksp("pipelcg", _m.solve_pipecg)
register_ksp("pipeprcg", _m.solve_pipecg)
register_ksp("symmlq", _m.solve_symmlq)
# Aliases with intact semantics on TPU: XLA already fuses the per-iteration
# reductions into one collective, which is precisely the hand-restructuring
# ibcgs/fbcgs (single-reduction BiCGStab variants, ibcgs.c/fbcgs.c) and
# lgmres's cheaper restarts (lgmres.c) buy on MPI. The base implementations
# deliver the same communication profile under this compiler.
from . import impls_tr as _tr  # noqa: E402


def _stcg_extras(ksp):
    return (("radius", float(ksp._params.get("radius", 0.0))),)


def _bcgsl_extras(ksp):
    ell = ksp.opt("get_int", "ksp_bcgsl_ell", None) \
        or int(ksp._params.get("ell", 2))
    return (("ell", int(ell)),)


from .idr import solve_idr as _idr  # noqa: E402


def _idr_extras(ksp):
    sv = ksp.opt("get_int", "ksp_idr_s", None) \
        or int(ksp._params.get("s", 4))
    return (("s", int(sv)),)


register_ksp("idr", _idr, extras=_idr_extras)


def _lcd_extras(ksp):
    return (("restart", int(ksp._params.get("restart", 30))),)


register_ksp("lcd", _tr.solve_lcd, extras=_lcd_extras)

from .tcqmr import solve_tcqmr as _tcqmr  # noqa: E402

register_ksp("tcqmr", _tcqmr)


def _tsirm(A, B, b, x0, rtol, abstol, divtol, cfg):
    """TSIRM (tsirm.c, Couturier/Khodja two-stage iteration with
    least-squares restarting): inner GMRES(m) cycles produce iterates
    collected as columns of S; every cycle the update is replaced by the
    least-squares minimizer of ||b - A S a|| over span(S). Expressed as a
    lax.while_loop over cycles with a FIXED subspace size (static s=12),
    the LS solve is a tiny lstsq on the MXU."""
    import jax.numpy as jnp
    from jax import lax
    from . import gmres as _gm
    from .common import (SolveResult, check_converged, empty_history,
                         finalize_reason, norm2)
    size_ls = 12
    inner_cfg = KSPConfig(max_it=min(30, cfg.max_it),
                          normtype=cfg.normtype, guess_nonzero=True,
                          converged_maxits=True,
                          extra=(30, 0))
    r0 = b - A.mult(x0) if cfg.guess_nonzero else b
    dp0 = norm2(B.mult(r0))
    hist = empty_history(cfg, b.dtype).at[0].set(dp0)
    ttol = jnp.maximum(rtol * dp0, abstol)
    dtol = divtol * dp0
    n = b.shape[0]
    S = jnp.zeros((size_ls, n), b.dtype)

    def cycle(st):
        x, S, k, rnorm, its, reason = st
        res = _gm.solve_gmres(A, B, b, x, rtol, abstol, divtol, inner_cfg)
        x1 = res.x
        S = S.at[k % size_ls].set(x1)
        # least-squares minimization over the stored iterates
        AS = jax.vmap(A.mult)(S)
        G = AS @ AS.T
        rhs = AS @ b
        a = jnp.linalg.solve(G + 1e-30 * jnp.eye(size_ls, dtype=b.dtype),
                             rhs)
        x_ls = a @ S
        r_ls = norm2(B.mult(b - A.mult(x_ls)))
        r_in = norm2(B.mult(b - A.mult(x1)))
        better = (r_ls < r_in) & (k + 1 >= size_ls)
        x2 = jnp.where(better, x_ls, x1)
        rn = jnp.where(better, r_ls, r_in)
        its = its + res.its
        conv = check_converged(rn, ttol, abstol, dtol)
        return (x2, S, k + 1, rn, its,
                jnp.asarray(conv, jnp.int32))

    import jax

    def cond(st):
        return (st[-1] == 0) & (st[-2] < cfg.max_it)

    x, S, k, rnorm, its, reason = lax.while_loop(
        cond, cycle, (x0 if cfg.guess_nonzero else jnp.zeros_like(b),
                      S, jnp.array(0), dp0, jnp.array(0),
                      jnp.zeros((), jnp.int32)))
    reason = finalize_reason(reason, its, cfg)
    hist = hist.at[jnp.minimum(its, hist.shape[0] - 1)].set(rnorm) \
        if hist.shape[0] else hist
    return SolveResult(x, its, rnorm, reason, hist, dp0)


register_ksp("tsirm", _tsirm)

from .dgmres import solve_dgmres_host as _dgmres  # noqa: E402

register_ksp("dgmres", _dgmres, host_driven=True)
# agmres (augmented GMRES) is the same deflated-restart family with the
# Ritz vectors ADDED to the search space rather than preconditioned out;
# served by the dgmres driver (documented substitution)
register_ksp("agmres", _dgmres, host_driven=True)

from .fetidp import solve_fetidp_host as _fetidp  # noqa: E402

register_ksp("fetidp", _fetidp, host_driven=True)
register_ksp("stcg", _tr.solve_stcg, extras=_stcg_extras)
# nash/qcg: documented aliases of stcg (same Steihaug-Toint family; the
# nash.c/qcg.c variants differ in step-acceptance bookkeeping only)
register_ksp("nash", _tr.solve_stcg, extras=_stcg_extras)
register_ksp("qcg", _tr.solve_stcg, extras=_stcg_extras)

from .gltr import solve_gltr as _gltr  # noqa: E402

register_ksp("gltr", _gltr, extras=_stcg_extras)
register_ksp("bcgsl", _tr.solve_bcgsl, extras=_bcgsl_extras)
# pipelined-restart GMRES family: pgmres/pipefgmres hide the
# orthogonalization reduction latency behind the matvec with split-phase
# MPI; XLA's scheduler already overlaps the fused dot batch with the
# SpMV inside one compiled program, so the classical kernels ARE the
# pipelined ones here (same convergence trajectory).
register_ksp("pgmres", _gmres, extras=_gmres_extras)
register_ksp("pipefgmres", _fgmres, default_norm=common.UNPRECONDITIONED,
             extras=_gmres_extras, supports_right=True)

from .bcgs import solve_ibcgs as _ibcgs  # noqa: E402

register_ksp("ibcgs", _ibcgs)
# fbcgs/fbcgsr: flexible BCGS == BCGS when the preconditioner is a fixed
# linear operator (ours are); documented aliases
register_ksp("fbcgs", _bcgs)
register_ksp("fbcgsr", _bcgs)

from .lgmres import solve_lgmres as _lgmres  # noqa: E402


def _lgmres_extras(ksp):
    restart, refine = _gmres_extras(ksp)
    aug = ksp.opt("get_int", "ksp_lgmres_augment", None)
    if aug is None:
        aug = int(ksp._params.get("aug_dim", 2))
    return (restart, refine, int(aug))


register_ksp("lgmres", _lgmres, extras=_lgmres_extras)
register_ksp("cgne", _m.solve_cgne)
register_ksp("fcg", _m.solve_fcg, extras=_gmres_extras)
register_ksp("groppcg", _m.solve_pipecg)

from .impls_r3 import (solve_bicg as _bicg, solve_cgls as _cgls,  # noqa: E402
                       solve_qmrcgs as _qmrcgs)

register_ksp("bicg", _bicg)
register_ksp("cgls", _cgls, default_norm=common.UNPRECONDITIONED)
register_ksp("qmrcgs", _qmrcgs)
# Remaining pipelined variants, documented aliases (same standard as the
# pipecg family above): the pipelined restructurings exist to overlap the
# MPI reduction latency with the matvec (pipecr.c, pipefcg.c, pipebcgs.c);
# under XLA the per-iteration dots already fuse into one collective that
# the scheduler overlaps with the SpMV inside a single compiled program,
# so the base kernels carry the identical communication profile and the
# exact-arithmetic-equivalent trajectory.
register_ksp("pipecr", _m.solve_cr)          # pipelined CR -> cr
register_ksp("pipefcg", _m.solve_fcg,        # pipelined flexible CG -> fcg
             extras=_gmres_extras)
register_ksp("pipebcgs", _bcgs)              # pipelined BiCGStab -> bcgs
