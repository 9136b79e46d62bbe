"""PCMG: multigrid preconditioner machinery (V/W cycles).

Behavioral reference: src/ksp/pc/impls/mg/mg.c (PCMGMCycle_Private :14 —
recursive cycle: pre-smooth, residual, restrict, recurse, interpolate-add,
post-smooth; PCApply_MG :648) and the PCMG API surface (PCMGSetLevels,
PCMGSetInterpolation, PCMGSetCycleType).

TPU redesign: the whole cycle is ONE pure function built at bind time by
unrolling the (static) level structure — every level's smoother, restrict,
and interpolate trace into a single XLA program with zero host round-trips
and, with norm-free Chebyshev/Jacobi smoothers, zero cross-chip sync points
besides those inside the operators themselves. Eigenvalue bounds and all
numeric factors live in `data` (traced), so re-setup with a new matrix of
the same structure does not recompile.

Level ordering here: index 0 = FINEST (PETSc numbers 0 = coarsest; the
view() output converts).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import config
from ..ksp.cheby import cheby_smooth, cheby_smooth4
from ..ops import operator
from ..sys.error import Error
from .pc import PC


# ---------------------------------------------------------------------
# hierarchy containers (host side)
# ---------------------------------------------------------------------

class MGLevelSpec:
    """One level of the hierarchy (host-side plan)."""

    def __init__(self, A, P=None, R=None, emax=None, emin=None):
        self.A = A          # Mat (level operator)
        self.P = P          # Mat interpolation: coarse -> this level (None on coarsest)
        self.R = R          # Mat restriction (default P^T)
        self.emax = emax    # cheby smoother eigenvalue bounds (floats)
        self.emin = emin


def _host_emax(A_sp, dinv, iters=10, seed=7):
    """Largest Ritz value of D^-1 A from a 10-step Arnoldi with a noisy
    start vector (host, numpy) — the role of the reference's 10-iteration
    esteig KSP + KSPComputeExtremeSingularValues (agg.c:1855-1899,
    cheby.c noisy-RHS estimation). Arnoldi Ritz values converge to the
    extreme eigenvalue far faster than power iteration, which matters:
    underestimating emax makes Chebyshev smoothing divergent above the
    bound."""
    rng = np.random.default_rng(seed)
    n = A_sp.shape[0]
    m = min(iters, n)
    V = np.zeros((n, m + 1))
    H = np.zeros((m + 1, m))
    v = rng.random(n) - 0.5
    V[:, 0] = v / np.linalg.norm(v)
    for j in range(m):
        w = dinv * (A_sp @ V[:, j])
        for i in range(j + 1):              # modified Gram-Schmidt
            H[i, j] = np.dot(V[:, i], w)
            w -= H[i, j] * V[:, i]
        H[j + 1, j] = np.linalg.norm(w)
        if H[j + 1, j] < 1e-14:
            m = j + 1
            break
        V[:, j + 1] = w / H[j + 1, j]
    ritz = np.linalg.eigvals(H[:m, :m])
    return max(float(np.max(np.abs(ritz))), 1e-12)


def _host_eig_bounds(A_sp_mult, dinv, n, iters=10, seed=7):
    """(emin, emax) Ritz estimates of D^-1 A from an Arnoldi sweep; the
    KSPComputeExtremeSingularValues role for esteig transforms."""
    rng = np.random.default_rng(seed)
    m = min(iters, n)
    V = np.zeros((n, m + 1))
    H = np.zeros((m + 1, m))
    v = rng.random(n) - 0.5
    V[:, 0] = v / np.linalg.norm(v)
    for j in range(m):
        w = dinv * A_sp_mult(V[:, j])
        for i in range(j + 1):
            H[i, j] = np.dot(V[:, i], w)
            w -= H[i, j] * V[:, i]
        H[j + 1, j] = np.linalg.norm(w)
        if H[j + 1, j] < 1e-14:
            m = j + 1
            break
        V[:, j + 1] = w / H[j + 1, j]
    ritz = np.linalg.eigvals(H[:m, :m]).real
    ritz = ritz[ritz > 0] if (ritz > 0).any() else np.abs(ritz)
    return max(float(ritz.min()), 1e-12), max(float(ritz.max()), 1e-12)


def _dense_lu_factor(A_sp):
    import scipy.linalg as sla
    lu, piv = sla.lu_factor(A_sp.toarray())
    return lu, piv


class _PCMG:
    """PCMG impl: hierarchy provided through the PCMG API (geometric MG) or
    built by a subclass (PCGAMG)."""

    def __init__(self, pc):
        self.pc = pc
        self.levels: list[MGLevelSpec] | None = None
        self.cycle = "v"
        self.smooth_pre = 2
        self.smooth_post = 2
        self.smoother = "chebyshev"   # chebyshev | richardson (w/ jacobi PC)
        self.coarse_solver = "lu"

    def set_from_options(self):
        o = self.pc.opt
        c = o("get_string", "pc_mg_cycle_type", None)
        if c:
            self.cycle = c
        t = o("get_string", "pc_mg_type", None)
        if t in ("full", "kaskade", "kascade"):
            self.cycle = "full" if t == "full" else "kaskade"
        n = o("get_int", "mg_levels_ksp_max_it", None)
        if n:
            self.smooth_pre = self.smooth_post = n
        t = o("get_string", "mg_levels_ksp_type", None)
        if t:
            self.smoother = t

    # ---- PCMG API (geometric path) ----

    def setLevels(self, n):
        self.levels = [MGLevelSpec(None) for _ in range(n)]

    def setInterpolation(self, finest_first_idx, P):
        self.levels[finest_first_idx].P = P

    def setOperator(self, finest_first_idx, A):
        self.levels[finest_first_idx].A = A

    def build_hierarchy(self):
        """Fill in level operators by Galerkin RAP where missing; with a DM
        attached to the operator, construct the full geometric hierarchy by
        DMCoarsen + DMCreateInterpolation (the PCSetUp_MG + DM path)."""
        if self.levels is None:
            dm = getattr(self.pc.pmat, "_dm", None)
            if dm is None:
                raise Error("PCMG: call setLevels/setInterpolation, attach "
                            "a DM, or use -pc_type gamg")
            self._build_from_dm(dm)
        self.levels[0].A = self.levels[0].A or self.pc.pmat
        for l in range(1, len(self.levels)):
            if self.levels[l].A is None:
                Pl = self.levels[l - 1].P  # interpolation held by finer level
                if Pl is None:
                    raise Error(f"PCMG: no interpolation onto level {l - 1}")
                self.levels[l].A = self.levels[l - 1].A.ptap(Pl)
        # Chebyshev smoother bounds where not provided (SA provides its own)
        for lev in self.levels[:-1]:
            if lev.emax is None and self.smoother == "chebyshev":
                A_sp = lev.A.to_scipy()
                d = A_sp.diagonal()
                dinv = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 1.0)
                emax = _host_emax(A_sp, dinv)
                lev.emax, lev.emin = 1.1 * emax, 0.1 * emax

    def _build_from_dm(self, dm):
        nlev_opt = self.pc.opt("get_int", "pc_mg_levels", None)
        das = [dm]
        while True:
            if nlev_opt is not None and len(das) >= nlev_opt:
                break
            if nlev_opt is None and (len(das) >= 10 or das[-1].N <= 50):
                break
            try:
                das.append(das[-1].coarsen())
            except Error:
                break
        self.levels = [MGLevelSpec(None) for _ in das]
        rediscretize = dm._compute_operators is not None
        for l, da in enumerate(das):
            if l > 0 and rediscretize:
                A = da.createMatrix()
                dm._compute_operators(None, A, A)
                if not A._assembled:
                    A.assemble()
                self.levels[l].A = A
            if l < len(das) - 1:
                self.levels[l].P = da.createInterpolation(das[l + 1])

    def setup(self):
        self.build_hierarchy()
        return build_mg_meta_data(
            self.levels, cycle=self.cycle, smoother=self.smoother,
            pre=self.smooth_pre, post=self.smooth_post)

    def view(self):
        if self.levels is None:
            return
        n = len(self.levels)
        print(f"    MG: type is MULTIPLICATIVE, levels={n} cycles={self.cycle}")
        for l, lev in enumerate(self.levels):
            m = lev.A.getSize()[0] if lev.A is not None else 0
            nnz = lev.A.nnz() if lev.A is not None else 0
            print(f"      level {n - 1 - l}: rows={m}, nnz={nnz}" +
                  (f", cheby eig [{lev.emin:.4g}, {lev.emax:.4g}]"
                   if lev.emax else ""))


def build_mg_meta_data(levels, cycle="v", smoother="chebyshev", pre=2, post=2):
    """Compile the hierarchy into the (meta, data) jit-composability pair."""
    rd = config.real_dtype()
    lev_metas = []
    lev_datas = []
    nlev = len(levels)
    for l, lev in enumerate(levels):
        A = lev.A
        if l == nlev - 1:
            # coarsest: dense LU (reference coarse default bjacobi+lu,
            # gamg.c:887-907)
            lu, piv = _dense_lu_factor(A.to_scipy())
            lev_metas.append(("coarse_lu", A.getSize()[0]))
            lev_datas.append({"lu": jnp.asarray(lu, dtype=rd),
                              "piv": jnp.asarray(piv, dtype=jnp.int32)})
            continue
        d = np.asarray(A.op().diag())
        dinv = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 1.0)
        P = lev.P
        R = lev.R
        if R is None:
            # restriction = P^T; use P's own transpose-apply when the
            # operator provides one (gather-free interp_q1 path)
            Pop = operator.bind(P.meta, P.device_data())
            R = None if Pop.mult_t is not None else P.transpose()
        emax = lev.emax if lev.emax is not None else 2.0
        emin = lev.emin if lev.emin is not None else 0.2
        lev_metas.append((A.meta, P.meta,
                          None if R is None else R.meta, smoother, pre, post))
        ld = {
            "A": A.device_data(), "P": P.device_data(),
            "dinv": jnp.asarray(dinv, dtype=rd),
            "eig": jnp.asarray([emin, emax], dtype=rd),
        }
        ld["R"] = {} if R is None else R.device_data()
        lev_datas.append(ld)
    meta = ("pc_mg", cycle, nlev, tuple(lev_metas))
    data = {"levels": tuple(lev_datas)}
    return meta, data


# ---------------------------------------------------------------------
# binder: the whole cycle as one pure function
# ---------------------------------------------------------------------

def _smooth(kind, Aop, dinv, eig, b, x, its):
    pcmult = lambda v: dinv * v
    if kind == "chebyshev":
        return cheby_smooth(Aop.mult, pcmult, b, x, its, eig[0], eig[1])
    if kind in ("chebyshev4", "fourth"):
        return cheby_smooth4(Aop.mult, pcmult, b, x, its, eig[1])
    if kind in ("opt_fourth", "chebyshev4opt"):
        return cheby_smooth4(Aop.mult, pcmult, b, x, its, eig[1],
                             optimized=True)
    if kind == "richardson":
        for _ in range(its):
            x = x + pcmult(b - Aop.mult(x))
        return x
    raise Error(f"PCMG: unknown smoother {kind}")


def _bind_pc_mg(meta, data):
    """Cycle types (PCMGSetType/PCMGSetCycleType, mg.c): multiplicative
    V (default) and W cycles, KASKADE (coarse solve + prolongate +
    post-smooth only), and FULL (F-cycle: nested full solves from the
    coarsest level up, a V-cycle at each stage)."""
    _, cycle, nlev, lev_metas = meta
    levels = data["levels"]
    ncycles = 2 if cycle == "w" else 1

    def coarse_solve(b):
        cm, cd = lev_metas[-1], levels[-1]
        sol = jax.scipy.linalg.lu_solve((cd["lu"], cd["piv"]), b[: cm[1]])
        if b.shape[0] > cm[1]:
            sol = jnp.pad(sol, (0, b.shape[0] - cm[1]))
        return sol

    def bind_level(l):
        A_meta, P_meta, R_meta, kind, pre, post = lev_metas[l]
        ld = levels[l]
        Aop = operator.bind(A_meta, ld["A"])
        Pop = operator.bind(P_meta, ld["P"])
        restrict = Pop.mult_t if R_meta is None \
            else operator.bind(R_meta, ld["R"]).mult
        return Aop, Pop, restrict, ld, kind, pre, post

    def level_apply(l, b, x0=None):
        if l == nlev - 1:
            return coarse_solve(b)
        Aop, Pop, restrict, ld, kind, pre, post = bind_level(l)
        if cycle == "kaskade":
            xc = level_apply(l + 1, restrict(b))
            x = Pop.mult(xc)
            return _smooth(kind, Aop, ld["dinv"], ld["eig"], b, x, post)
        x = _smooth(kind, Aop, ld["dinv"], ld["eig"], b,
                    jnp.zeros_like(b) if x0 is None else x0,
                    pre)
        for c in range(ncycles):
            r = b - Aop.mult(x)
            xc = level_apply(l + 1, restrict(r))
            x = x + Pop.mult(xc)
            if c < ncycles - 1 or post:
                x = _smooth(kind, Aop, ld["dinv"], ld["eig"], b, x, post)
        return x

    def full_apply(b):
        # F-cycle: restrict b all the way down, then work upward with a
        # V-cycle per level seeded by the prolongated coarser solution
        bs = [b]
        for l in range(nlev - 1):
            _, _, restrict, _, _, _, _ = bind_level(l)
            bs.append(restrict(bs[-1]))
        x = coarse_solve(bs[-1])
        for l in range(nlev - 2, -1, -1):
            _, Pop, _, _, _, _, _ = bind_level(l)
            x = Pop.mult(x)
            x = level_apply(l, bs[l], x0=x)
        return x

    if cycle == "full":
        return operator.Op(mult=full_apply)
    return operator.Op(mult=lambda b: level_apply(0, b))


operator.register_binder("pc_mg", _bind_pc_mg)
PC.register_impl("mg", _PCMG)
