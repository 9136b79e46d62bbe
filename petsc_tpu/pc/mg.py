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

from ..ops.reduce import fdot

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
        self.agg = None     # nodal aggregates that coarsened this level
        self.agg_bs = 1     # (for -pc_gamg_asm_use_agg smoother blocks)


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
    # basis vectors as ROWS (contiguous) — column slices of a C-order
    # (n, m) array are strided and dominated the 128^3 setup profile
    V = np.zeros((m + 1, n))
    H = np.zeros((m + 1, m))
    v = rng.random(n) - 0.5
    V[0] = v / np.linalg.norm(v)
    from .. import native
    _mv = native.csr_matvec_op(A_sp.tocsr())  # row-parallel native SpMV
    if _mv is None:
        _mv = lambda x: A_sp @ x  # noqa: E731
    for j in range(m):
        w = dinv * _mv(V[j])
        # classical Gram-Schmidt with one reorthogonalization pass: one
        # BLAS-2 product per pass instead of j strided dots (same Ritz
        # values to fp accuracy as the MGS loop this replaces)
        for _ in range(2):
            c = V[:j + 1] @ w
            H[:j + 1, j] += c
            w -= c @ V[:j + 1]
        H[j + 1, j] = np.linalg.norm(w)
        if H[j + 1, j] < 1e-14:
            m = j + 1
            break
        V[j + 1] = w / H[j + 1, j]
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


def _agg_block_tables(A_sp, agg, bs):
    """Aggregate-block-Jacobi smoother tables (-pc_gamg_asm_use_agg with
    -mg_levels_sub_pc_type lu -mg_levels_pc_asm_overlap 0,
    PCGAMGASMCreateSubdomains gamg.c + asm.c exact sub-solves): the
    diagonal block over each aggregate's dof set is dense-inverted;
    blocks are padded to the max size so the apply is one gather →
    batched GEMV (MXU) → scatter.  Dofs outside every aggregate
    (removed singleton nodes) become 1x1 diagonal blocks.  Returns
    (idx, mask, inv) with shapes (nb, bmax) / (nb, bmax) /
    (nb, bmax, bmax)."""
    n = A_sp.shape[0]
    nagg = int(agg.max()) + 1 if len(agg) else 0
    dofs = [[] for _ in range(nagg)]
    for v, a in enumerate(np.asarray(agg)):
        if a >= 0:
            dofs[int(a)].extend(range(v * bs, (v + 1) * bs))
    assigned = np.zeros(n, dtype=bool)
    for dl in dofs:
        assigned[dl] = True
    dofs.extend([int(i)] for i in np.nonzero(~assigned)[0])
    dofs = [dl for dl in dofs if dl]
    nb = len(dofs)
    bmax = max(len(dl) for dl in dofs)
    idx = np.zeros((nb, bmax), dtype=np.int32)
    mask = np.zeros((nb, bmax))
    inv = np.zeros((nb, bmax, bmax))
    Ac = A_sp.tocsc()
    for a, dl in enumerate(dofs):
        k = len(dl)
        idx[a, :k] = dl
        mask[a, :k] = 1.0
        blk = Ac[:, dl][dl, :].toarray()
        try:
            inv[a, :k, :k] = np.linalg.inv(blk)
        except np.linalg.LinAlgError:
            # degenerate subdomain (e.g. decoupled/zero rows): the
            # pseudo-inverse keeps the smoother well-defined
            inv[a, :k, :k] = np.linalg.pinv(blk)
    return idx, mask, inv


def _agg_pc_apply_np(idx, mask, inv, v):
    """Host-side reference apply of the aggregate-block PC (for esteig)."""
    g = mask * v[idx]
    y = np.einsum("abc,ac->ab", inv, g)
    out = np.zeros_like(v)
    np.add.at(out, idx.reshape(-1), (mask * y).reshape(-1))
    return out


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
        self.levels_pc = "jacobi"     # jacobi | asm_agg (smoother inner PC)
        self.coarse_solver = "lu"     # lu | cg_jacobi (parallel coarse)
        # esteig transform (a,b,c,d): emin_used = a*emin + b*emax,
        # emax_used = c*emin + d*emax (cheby.c:203 MG default 0,0.1,0,1.1)
        self.esteig_tform = (0.0, 0.1, 0.0, 1.1)
        # -pc_mg_dtype single: run the whole V-cycle in f32 around an f64
        # Krylov (TPU mixed-precision policy; no reference equivalent —
        # CPUs have native f64, TPUs emulate it ~10x slower). A V-cycle
        # is a ~1-digit-per-application preconditioner, far below f32
        # rounding, so the f64 outer iteration count is unaffected.
        self.dtype = None

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
        t = o("get_string", "mg_levels_ksp_chebyshev_esteig", None)
        if t:
            vals = [float(x) for x in t.split(",")]
            self.esteig_tform = tuple(vals + [0.0] * (4 - len(vals)))[:4]
        if o("get_bool", "pc_gamg_asm_use_agg", False):
            self.levels_pc = "asm_agg"
        # reference ex56 parity knobs: -pc_gamg_parallel_coarse_grid_solver
        # -mg_coarse_ksp_type cg -mg_coarse_pc_type jacobi
        ct = o("get_string", "mg_coarse_ksp_type", None)
        cp = o("get_string", "mg_coarse_pc_type", None)
        if ct == "cg" and (cp in (None, "jacobi")):
            self.coarse_solver = "cg_jacobi"
        t = o("get_string", "pc_mg_dtype", None)
        if t in ("single", "float32", "f32"):
            self.dtype = "f32"
        elif t in ("double", "float64", "f64"):
            self.dtype = None

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
        # level 0 normally builds AND applies from the Pmat (mg.c builds
        # smoother data from Pmat); ONLY when the Pmat is an explicit
        # host_only twin (contract: numerically identical, exists to
        # avoid the device upload) does the device Amat stand in
        use_amat = (getattr(self.pc.pmat, "host_only", False)
                    and self.pc.mat is not None)
        self.levels[0].A = self.levels[0].A or (
            self.pc.mat if use_amat else self.pc.pmat)
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
                lev.emin, lev.emax = self.eig_bounds(emax)

    def eig_bounds(self, emax_est, emin_est=0.0):
        """Apply the esteig transform to estimated D^-1 A bounds."""
        a, b, c, d = self.esteig_tform
        return (a * emin_est + b * emax_est, c * emin_est + d * emax_est)

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
            pre=self.smooth_pre, post=self.smooth_post,
            coarse=self.coarse_solver, levels_pc=self.levels_pc,
            esteig_tform=self.esteig_tform, dtype=self.dtype)

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


def build_mg_meta_data(levels, cycle="v", smoother="chebyshev", pre=2, post=2,
                       coarse="lu", levels_pc="jacobi",
                       esteig_tform=(0.0, 0.1, 0.0, 1.1), dtype=None):
    """Compile the hierarchy into the (meta, data) jit-composability pair.

    dtype="f32": every level's numeric data is cast to float32 and the
    bound cycle converts at its boundary — the whole V-cycle runs at f32
    rates (MXU/VPU native) inside an f64 outer Krylov (-pc_mg_dtype
    single; the TPU analog of the ksp/ir.py mixed-precision policy)."""
    rd = config.real_dtype()
    lev_metas = []
    lev_datas = []
    nlev = len(levels)
    for l, lev in enumerate(levels):
        A = lev.A
        if l == nlev - 1:
            if coarse == "cg_jacobi":
                # iterative parallel-style coarse solve (ex56 parity:
                # -pc_gamg_parallel_coarse_grid_solver -mg_coarse_ksp_type
                # cg -mg_coarse_pc_type jacobi)
                d = A.op().diag()
                dinv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d),
                                 1.0).astype(rd)
                lev_metas.append(("coarse_cg", A.meta, A.getSize()[0]))
                lev_datas.append({"A": A.device_data(), "dinv": dinv})
                continue
            # coarsest: dense LU (reference coarse default bjacobi+lu,
            # gamg.c:887-907)
            lu, piv = _dense_lu_factor(A.to_scipy())
            lev_metas.append(("coarse_lu", A.getSize()[0]))
            lev_datas.append({"lu": jnp.asarray(lu, dtype=rd),
                              "piv": jnp.asarray(piv, dtype=jnp.int32)})
            continue
        # diagonal stays ON DEVICE: at 512^3 a host round-trip of the
        # 1 GB diagonal through the tunnel would dominate the whole setup
        d = A.op().diag()
        dinv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d),
                         1.0).astype(rd)
        P = lev.P
        R = lev.R
        if R is None:
            # restriction = P^T; use P's own transpose-apply when the
            # operator provides one (gather-free interp_q1 path)
            Pop = operator.bind(P.meta, P.device_data())
            R = None if Pop.mult_t is not None else P.transpose()
        pc_kind = "jacobi"
        ld = {"A": A.device_data(), "P": P.device_data(), "dinv": dinv}
        if levels_pc == "asm_agg" and lev.agg is not None:
            pc_kind = "asm_agg"
            A_sp = A.to_scipy()
            idx, mask, inv = _agg_block_tables(A_sp, lev.agg, lev.agg_bs)
            ld["agg_idx"] = jnp.asarray(idx)
            ld["agg_mask"] = jnp.asarray(mask, dtype=rd)
            ld["agg_inv"] = jnp.asarray(inv, dtype=rd)
            # Chebyshev bounds must be of M^-1 A for THIS smoother PC,
            # not D^-1 A (the esteig KSP runs preconditioned, cheby.c)
            npad = A.row_layout.Npad

            def mpc_mult(v, A_sp=A_sp, idx=idx, mask=mask, inv=inv):
                return _agg_pc_apply_np(idx, mask, inv,
                                        A_sp @ v[: A_sp.shape[0]])

            emn, emx = _host_eig_bounds(
                lambda v: np.pad(mpc_mult(v),
                                 (0, npad - A_sp.shape[0])),
                np.ones(npad), npad)
            a, b, c, dd_ = esteig_tform
            emin = a * emn + b * emx
            emax = c * emn + dd_ * emx
        else:
            emax = lev.emax if lev.emax is not None else 2.0
            emin = lev.emin if lev.emin is not None else 0.2
        # padded-length bookkeeping: a sharded fine level is padded to
        # Npad while a serial P covers exactly (nf, nc) — the binder
        # slices/pads around the transfer applications so mixed layouts
        # compose (the telescope fine-sharded/coarse-replicated pattern).
        # p_in/r_in: the lengths the transfer op expects; npad_f/npad_c:
        # the fine/coarse level vector lengths the cycle carries.
        nf_P, nc_P = P.getSize()
        npad_f = A.row_layout.Npad if hasattr(A, "row_layout") else nf_P
        nxt = levels[l + 1].A
        npad_c = nxt.row_layout.Npad if hasattr(nxt, "row_layout") \
            else nc_P
        p_in = P.col_layout.Npad if hasattr(P, "col_layout") else nc_P
        r_in = P.row_layout.Npad if hasattr(P, "row_layout") else nf_P
        lev_metas.append((A.meta, P.meta,
                          None if R is None else R.meta, smoother, pre, post,
                          pc_kind, (p_in, r_in, npad_f, npad_c)))
        ld["eig"] = jnp.asarray([emin, emax], dtype=rd)
        ld["R"] = {} if R is None else R.device_data()
        lev_datas.append(ld)
    if dtype == "f32":
        import jax

        def _f32(x):
            if hasattr(x, "dtype") and x.dtype == jnp.float64:
                return x.astype(jnp.float32)
            return x

        lev_datas = [jax.tree_util.tree_map(_f32, ld) for ld in lev_datas]
    meta = ("pc_mg", cycle, nlev, tuple(lev_metas), dtype)
    data = {"levels": tuple(lev_datas)}
    return meta, data


# ---------------------------------------------------------------------
# binder: the whole cycle as one pure function
# ---------------------------------------------------------------------

def _smooth(kind, Aop, pcmult, eig, b, x, its):
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
    _, cycle, nlev, lev_metas = meta[:4]
    dtype = meta[4] if len(meta) > 4 else None
    levels = data["levels"]
    ncycles = 2 if cycle == "w" else 1

    def coarse_solve(b):
        cm, cd = lev_metas[-1], levels[-1]
        if cm[0] == "coarse_cg":
            # Jacobi-preconditioned CG to rtol 1e-5 (the reference's
            # -mg_coarse_ksp_type cg -mg_coarse_pc_type jacobi parallel
            # coarse solve), fixed-shape lax.while_loop so the whole MG
            # apply stays one compiled program
            Aop = operator.bind(cm[1], cd["A"])
            dinv = cd["dinv"]
            r0 = b
            z0 = dinv * r0
            rz0 = fdot(r0, z0)
            atol2 = 1e-10 * jnp.abs(rz0)

            def cond(s):
                x, r, z, p, rz, it = s
                return (jnp.abs(rz) > atol2) & (it < 200)

            def body(s):
                x, r, z, p, rz, it = s
                Ap = Aop.mult(p)
                alpha = rz / fdot(p, Ap)
                x = x + alpha * p
                r = r - alpha * Ap
                z = dinv * r
                rz2 = fdot(r, z)
                p = z + (rz2 / rz) * p
                return x, r, z, p, rz2, it + 1

            x, *_ = jax.lax.while_loop(
                cond, body, (jnp.zeros_like(b), r0, z0, z0, rz0,
                             jnp.int32(0)))
            return x
        sol = jax.scipy.linalg.lu_solve((cd["lu"], cd["piv"]), b[: cm[1]])
        if b.shape[0] > cm[1]:
            sol = jnp.pad(sol, (0, b.shape[0] - cm[1]))
        return sol

    def bind_level(l):
        A_meta, P_meta, R_meta, kind, pre, post = lev_metas[l][:6]
        pc_kind = lev_metas[l][6] if len(lev_metas[l]) > 6 else "jacobi"
        sizes = lev_metas[l][7] if len(lev_metas[l]) > 7 else None
        ld = levels[l]
        Aop = operator.bind(A_meta, ld["A"])
        Pop0 = operator.bind(P_meta, ld["P"])
        restrict0 = Pop0.mult_t if R_meta is None \
            else operator.bind(R_meta, ld["R"]).mult
        if sizes is not None:
            p_in, r_in, npad_f, npad_c = sizes

            def _fit(v, want):
                if v.shape[0] == want:
                    return v
                if v.shape[0] > want:
                    return v[:want]
                return jnp.pad(v, (0, want - v.shape[0]))

            Pop = operator.Op(
                mult=lambda xc: _fit(Pop0.mult(_fit(xc, p_in)), npad_f),
                mult_t=Pop0.mult_t)
            restrict = lambda r: _fit(restrict0(_fit(r, r_in)), npad_c)  # noqa: E731
        else:
            Pop, restrict = Pop0, restrict0
        if pc_kind == "asm_agg":
            idx, mask, inv = ld["agg_idx"], ld["agg_mask"], ld["agg_inv"]

            def pcmult(v):
                # gather -> batched block GEMV (MXU) -> scatter:
                # exact sub-solves over the aggregate subdomains
                g = mask * v[idx]
                y = jnp.einsum("abc,ac->ab", inv, g)
                return jnp.zeros_like(v).at[idx.reshape(-1)] \
                    .add((mask * y).reshape(-1))
        else:
            dinv = ld["dinv"]
            pcmult = lambda v: dinv * v
        return Aop, Pop, restrict, pcmult, ld, kind, pre, post

    def level_apply(l, b, x0=None):
        if l == nlev - 1:
            return coarse_solve(b)
        Aop, Pop, restrict, pcmult, ld, kind, pre, post = bind_level(l)
        if cycle == "kaskade":
            xc = level_apply(l + 1, restrict(b))
            x = Pop.mult(xc)
            return _smooth(kind, Aop, pcmult, ld["eig"], b, x, post)
        x = _smooth(kind, Aop, pcmult, ld["eig"], b,
                    jnp.zeros_like(b) if x0 is None else x0,
                    pre)
        for c in range(ncycles):
            r = b - Aop.mult(x)
            xc = level_apply(l + 1, restrict(r))
            x = x + Pop.mult(xc)
            if c < ncycles - 1 or post:
                x = _smooth(kind, Aop, pcmult, ld["eig"], b, x, post)
        return x

    def full_apply(b):
        # F-cycle: restrict b all the way down, then work upward with a
        # V-cycle per level seeded by the prolongated coarser solution
        bs = [b]
        for l in range(nlev - 1):
            restrict = bind_level(l)[2]
            bs.append(restrict(bs[-1]))
        x = coarse_solve(bs[-1])
        for l in range(nlev - 2, -1, -1):
            Pop = bind_level(l)[1]
            x = Pop.mult(x)
            x = level_apply(l, bs[l], x0=x)
        return x

    inner = full_apply if cycle == "full" else (lambda b: level_apply(0, b))
    if dtype == "f32":
        # boundary casts: f64 residual in, f32 cycle, f64 correction out
        base = inner
        inner = lambda b: base(b.astype(jnp.float32)).astype(b.dtype)  # noqa: E731
    # PCApplyTranspose_MG role: the standard V/W cycle with equal
    # pre/post smoothing and symmetric smoothers is self-transpose —
    # expose mult_t so transpose-needing solvers (ibcgs, lsqr on the
    # preconditioned operator) accept MG/GAMG
    return operator.Op(mult=inner, mult_t=inner)


operator.register_binder("pc_mg", _bind_pc_mg)
PC.register_impl("mg", _PCMG)
