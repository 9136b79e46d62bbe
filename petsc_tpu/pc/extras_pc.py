"""More preconditioners: eisenstat, kaczmarz, deflation, galerkin, mat,
redundant, vpbjacobi.

Behavioral references: src/ksp/pc/impls/{eisens (Eisenstat-trick SSOR),
kaczmarz, deflation (PCDeflation: coarse correction from a deflation
space), galerkin (PCGALERKIN user P/R coarse solve), mat (PCMAT: apply a
given matrix), redundant (full solve on every rank — in the single-program
model simply a direct solve), vpbjacobi (variable-size point-block Jacobi
with batched inverses, vpbjacobi_cuda.cu role)}.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.reduce import fdot

from .. import config
from ..ops import operator
from ..sys.error import Error
from .pc import PC
from .more_pc import _PCSOR


class _PCEisenstat(_PCSOR):
    """Eisenstat-trick SSOR (eisens.c): the KSP iterates on the
    TRANSFORMED system

        (E+L)^{-1} A (E+U)^{-1}  xhat = (E+L)^{-1} b,   E = D/omega,

    with PCApply = diagonal scaling by D and the solution recovered as
    x = (E+U)^{-1} xhat (PCPreSolve/PCPostSolve_Eisenstat). The shell
    operator uses Eisenstat's identity so ONE apply costs two triangular
    sweeps + a diagonal — half the work of SSOR-preconditioned iteration.
    The triangular sweeps reuse the SOR unit-solve level schedules."""

    def __init__(self, pc):
        super().__init__(pc)
        self.usediag = True

    def set_from_options(self):
        o = self.pc.opt
        w = o("get_real", "pc_eisenstat_omega", None) \
            or o("get_real", "pc_sor_omega", None)
        if w:
            self.omega = w
        if o("get_bool", "pc_eisenstat_no_diagonal_scaling", False):
            self.usediag = False

    def setup(self):
        sor_meta, sor_data = super().setup()
        A = self.pc.pmat
        m = A.row_layout.N
        d = 1.0 / np.asarray(sor_data["dinv"])[:m]
        self._shell = (("mat_eisenstat",) + sor_meta[1:5]
                       + (float(self.omega),), dict(sor_data))
        self._sor_data = sor_data
        self._m = m
        self._npad = A.row_layout.Npad
        diag = np.pad(d, (0, A.row_layout.pad)) if self.usediag \
            else np.ones(A.row_layout.Npad)
        return ("pc_jacobi",), {"inv": jnp.asarray(diag,
                                                   config.real_dtype())}

    # ---- PCPreSolve/PCPostSolve (KSP calls these around the solve) ----

    def operator_meta_data(self):
        return self._shell

    def presolve(self, b):
        meta, data = self._shell
        _, m, nlevL, nlevU, npad, w = meta
        from ..ops import trisolve as _t
        bj = jnp.asarray(b)
        return np.asarray(_t.unit_lower_solve(
            data["Ld"], data["Lx"], data["tabL"],
            data["winv"] * bj, m, nlevL))

    def postsolve(self, x):
        meta, data = self._shell
        _, m, nlevL, nlevU, npad, w = meta
        from ..ops import trisolve as _t
        xj = jnp.asarray(x)
        return np.asarray(_t.unit_upper_solve(
            data["Ud"], data["Ux"], data["tabU"],
            data["winv"] * xj, m, nlevU))


def _bind_mat_eisenstat(meta, data):
    from ..ops import trisolve as _t
    _, m, nlevL, nlevU, npad, w = meta
    scale = 2.0 / w - 1.0
    dinv = data["dinv"]
    d = jnp.where(dinv == 0, 0.0, 1.0 / jnp.where(dinv == 0, 1.0, dinv))

    def mult(v):
        x = _t.unit_upper_solve(data["Ud"], data["Ux"], data["tabU"],
                                data["winv"] * v, m, nlevU)
        t = v - scale * d * x
        t = _t.unit_lower_solve(data["Ld"], data["Lx"], data["tabL"],
                                data["winv"] * t, m, nlevL)
        return x + t

    return operator.Op(mult=mult)


operator.register_binder("mat_eisenstat", _bind_mat_eisenstat)


class _PCKaczmarz:
    """Sequential Kaczmarz sweep (kaczmarz.c): successive row projections
    x += a_i (b_i - <a_i, x>)/||a_i||^2 — algebraically a forward SOR
    sweep on G = A A^T followed by A^T, which the TPU runs as a
    level-scheduled unit-triangular solve on G."""

    def __init__(self, pc):
        self.pc = pc
        self.lmbda = 1.0

    def set_from_options(self):
        v = self.pc.opt("get_real", "pc_kaczmarz_lambda", None)
        if v:
            self.lmbda = v

    def setup(self):
        from ..ops import trisolve
        A = self.pc.pmat
        A_sp = A.to_scipy()
        G = (A_sp @ A_sp.T).tocsr()
        m = G.shape[0]
        w = self.lmbda
        rows = np.repeat(np.arange(m), np.diff(G.indptr))
        dmask = G.indices == rows
        d = np.zeros(m)
        np.add.at(d, rows[dmask], G.data[dmask])
        d = np.where(d == 0, 1.0, d)
        lo = G.indices < rows
        cnt = np.zeros(m + 1, dtype=np.int64)
        np.add.at(cnt, rows[lo] + 1, 1)
        Li = np.cumsum(cnt)
        Lv = G.data[lo] * (w / d)[rows[lo]]
        levL, nlevL = trisolve.levels_from_csr(Li, G.indices[lo], lower=True)
        tabL = trisolve.build_level_table(levL, nlevL, m)
        Ld, Lx = trisolve.ell_of_csr(Li, G.indices[lo], Lv, m)
        rd = config.real_dtype()
        return (("pc_kaczmarz", A.meta, m, nlevL, A.row_layout.Npad), {
            "A": A.device_data(),
            "Ld": jnp.asarray(Ld, rd), "Lx": jnp.asarray(Lx),
            "tabL": jnp.asarray(tabL),
            "winv": jnp.asarray(np.pad(w / d, (0, A.row_layout.pad)), rd),
        })


def _bind_kaczmarz(meta, data):
    from ..ops import trisolve
    _, ameta, m, nlevL, npad = meta
    Aop = operator.bind(ameta, data["A"])
    if Aop.mult_t is None:
        raise Error("kaczmarz: operator needs mult_t")

    def mult(x):
        z = trisolve.unit_lower_solve(data["Ld"], data["Lx"], data["tabL"],
                                      data["winv"] * x, m, nlevL)
        return Aop.mult_t(z)

    return operator.Op(mult=mult)


class _PCDeflation:
    """PCDeflation: additive coarse correction from a deflation space W
    (n, k): y = B x + W (W^T A W)^-1 W^T x, with B the sub-PC (default
    jacobi). Set W via pc._impl.setSpace(W) or the near-nullspace."""

    def __init__(self, pc):
        self.pc = pc
        self.W = None
        self.sub_type = "jacobi"

    def setSpace(self, W):
        self.W = np.asarray(W, dtype=np.float64)

    def set_from_options(self):
        t = self.pc.opt("get_string", "pc_deflation_sub_type", None)
        if t:
            self.sub_type = t

    def setup(self):
        A = self.pc.pmat
        W = self.W
        if W is None:
            W = getattr(A, "near_nullspace", None)
            if W is None:
                raise Error("PCDeflation: setSpace(W) first")
            W = np.asarray(W.vectors if hasattr(W, "vectors") else W)
        A_sp = A.to_scipy()
        E = W.T @ (A_sp @ W)
        import scipy.linalg as sla
        lu, piv = sla.lu_factor(E)
        sub = PC(options=self.pc._options)
        sub.setOperators(self.pc.mat, self.pc.pmat)
        sub.setType(self.sub_type)
        rd = config.real_dtype()
        Wp = np.pad(W, ((0, A.row_layout.pad), (0, 0)))
        return (("pc_deflation", sub.meta, W.shape[1]),
                {"W": jnp.asarray(Wp, rd), "lu": jnp.asarray(lu, rd),
                 "piv": jnp.asarray(piv, jnp.int32),
                 "sub": sub.device_data()})


def _bind_deflation(meta, data):
    import jax
    _, sub_meta, k = meta
    sub = operator.bind(sub_meta, data["sub"])
    W = data["W"]

    def mult(x):
        c = jax.scipy.linalg.lu_solve((data["lu"], data["piv"]), W.T @ x)
        return sub.mult(x) + W @ c

    return operator.Op(mult=mult)


class _PCGalerkin:
    """PCGALERKIN: y = P (R A P)^-1 R x with user transfer operators
    (galerkin.c); coarse problem solved directly."""

    def __init__(self, pc):
        self.pc = pc
        self.P = None
        self.R = None

    def setInterpolation(self, P):
        self.P = P

    def setRestriction(self, R):
        self.R = R

    def setup(self):
        if self.P is None:
            raise Error("PCGalerkin: setInterpolation first")
        Ps = self.P.to_scipy()
        Rs = self.R.to_scipy() if self.R is not None else Ps.T
        A_sp = self.pc.pmat.to_scipy()
        C = (Rs @ A_sp @ Ps).toarray()
        import scipy.linalg as sla
        lu, piv = sla.lu_factor(C)
        rd = config.real_dtype()
        pad = self.pc.pmat.row_layout.pad
        Pd = np.pad(Ps.toarray(), ((0, pad), (0, 0)))
        Rd = np.pad(Rs.toarray(), ((0, 0), (0, pad)))
        return (("pc_galerkin", C.shape[0]),
                {"P": jnp.asarray(Pd, rd), "R": jnp.asarray(Rd, rd),
                 "lu": jnp.asarray(lu, rd),
                 "piv": jnp.asarray(piv, jnp.int32)})


def _bind_galerkin(meta, data):
    import jax

    def mult(x):
        c = jax.scipy.linalg.lu_solve((data["lu"], data["piv"]),
                                      data["R"] @ x)
        return data["P"] @ c

    return operator.Op(mult=mult)


class _PCMat:
    """PCMAT: the preconditioner IS a user matrix apply (pcmat.c)."""

    def __init__(self, pc):
        self.pc = pc
        self.M = None

    def setMat(self, M):
        self.M = M

    def setup(self):
        M = self.M if self.M is not None else self.pc.pmat
        return ("pc_mat", M.meta), {"M": M.device_data()}


def _bind_pcmat(meta, data):
    op = operator.bind(meta[1], data["M"])
    return operator.Op(mult=op.mult, mult_t=op.mult_t)


class _PCVPBJacobi:
    """Variable-size point-block Jacobi: diagonal blocks given by a sizes
    list (default: bs blocks); batched inverses grouped by size
    (vpbjacobi.c + vpbjacobi_cuda.cu role)."""

    def __init__(self, pc):
        self.pc = pc
        self.sizes = None

    def setBlockSizes(self, sizes):
        self.sizes = np.asarray(sizes, dtype=np.int64)

    def setup(self):
        A = self.pc.pmat
        m = A.row_layout.N
        if self.sizes is None:
            bs = A.row_layout.bs or 1
            self.sizes = np.full(m // bs, bs, dtype=np.int64)
        starts = np.concatenate([[0], np.cumsum(self.sizes)])
        A_sp = A.to_scipy()
        dense = np.zeros((m, int(self.sizes.max())))
        # dense block-diagonal inverse assembled into a padded row form
        inv_flat = np.zeros((m, int(self.sizes.max())))
        col0 = np.zeros(m, dtype=np.int64)
        for b, (lo, hi) in enumerate(zip(starts[:-1], starts[1:])):
            blk = A_sp[lo:hi, lo:hi].toarray()
            try:
                binv = np.linalg.inv(blk)
            except np.linalg.LinAlgError:
                binv = np.linalg.pinv(blk)
            inv_flat[lo:hi, : hi - lo] = binv
            col0[lo:hi] = lo
        rd = config.real_dtype()
        K = int(self.sizes.max())
        idx = (col0[:, None] + np.arange(K)[None, :]).clip(0, m - 1)
        pad = A.row_layout.pad
        return (("pc_vpbjacobi", m, K, A.row_layout.Npad),
                {"inv": jnp.asarray(np.pad(inv_flat, ((0, pad), (0, 0))), rd),
                 "idx": jnp.asarray(np.pad(idx, ((0, pad), (0, 0))))})


def _bind_vpbjacobi(meta, data):
    _, m, K, npad = meta

    def mult(x):
        return jnp.sum(data["inv"] * x[data["idx"]], axis=1)

    return operator.Op(mult=mult)


PC.register_impl("eisenstat", _PCEisenstat)
PC.register_impl("kaczmarz", _PCKaczmarz)
PC.register_impl("deflation", _PCDeflation)
PC.register_impl("galerkin", _PCGalerkin)
PC.register_impl("mat", _PCMat)
PC.register_impl("vpbjacobi", _PCVPBJacobi)
operator.register_binder("pc_kaczmarz", _bind_kaczmarz)
operator.register_binder("pc_deflation", _bind_deflation)
operator.register_binder("pc_galerkin", _bind_galerkin)
operator.register_binder("pc_mat", _bind_pcmat)
operator.register_binder("pc_vpbjacobi", _bind_vpbjacobi)


class _PCRedundant:
    """PCREDUNDANT: every rank solves the full system (redundant.c); in
    the single-program model this is a direct LU apply."""

    def __init__(self, pc):
        from .factor_pc import _PCLU
        self._inner = _PCLU(pc)
        self.pc = pc

    def setup(self):
        return self._inner.setup()


PC.register_impl("redundant", _PCRedundant)


class _PCSVD:
    """PCSVD (impls/svd): pseudo-inverse via dense SVD with a zero-singular
    -value threshold — the bombproof small-system preconditioner."""

    def __init__(self, pc):
        self.pc = pc
        self.zero_sing = 1e-12

    def setup(self):
        A = self.pc.pmat.to_scipy().toarray() \
            if hasattr(self.pc.pmat, "to_scipy") \
            else self.pc.pmat.getDenseArray()
        U, s, Vt = np.linalg.svd(A)
        sinv = np.where(s > self.zero_sing * s.max(), 1.0 / np.where(
            s == 0, 1.0, s), 0.0)
        pinv = (Vt.T * sinv) @ U.T
        rd = config.real_dtype()
        pad = self.pc.pmat.row_layout.pad
        pinv = np.pad(pinv, ((0, pad), (0, pad)))
        return ("pc_svd", pinv.shape[0]), {"pinv": jnp.asarray(pinv, rd)}


def _bind_svd(meta, data):
    return operator.Op(mult=lambda x: data["pinv"] @ x,
                       mult_t=lambda x: data["pinv"].T @ x)


PC.register_impl("svd", _PCSVD)
operator.register_binder("pc_svd", _bind_svd)


class _PCTelescope:
    """PCTelescope (telescope.c): repartition the problem onto a smaller
    communicator and solve there. In the single-program model the
    'sub-communicator' is a replicated (single-shard) copy of the operator;
    configure the inner solve with the `telescope_` option prefix. The
    coarse-grid process-reduction this implements for MPI is what the
    framework's replicated GAMG coarse levels do natively."""

    def __init__(self, pc):
        self.pc = pc
        self.ksp = None

    def getKSP(self):
        if self.ksp is None:
            from ..ksp.ksp import KSP
            self.ksp = KSP(options=self.pc._options,
                           prefix=(self.pc.get_options_prefix() or "")
                           + "telescope_")
        return self.ksp

    def setup(self):
        from ..ksp.ksp import _IMPLS
        from ..mat.aij import MatAIJ
        from ..parallel.mesh import comm_self
        A_rep = MatAIJ.from_scipy(self.pc.pmat.to_scipy(),
                                  comm=comm_self())
        ksp = self.getKSP()
        ksp.setOperators(A_rep, A_rep)
        if ksp._type is None:
            ksp.setFromOptions()
        if ksp.max_it > 1000:
            ksp.max_it = 50
        ksp.setUp()
        cfg = ksp._static_cfg()
        meta = ("pc_ksp", ksp._type, A_rep.meta, ksp.pc.meta, cfg,
                float(ksp.rtol), float(ksp.abstol), float(ksp.divtol))
        return meta, {"A": A_rep.device_data(), "B": ksp.pc.device_data()}


PC.register_impl("telescope", _PCTelescope)


class _PCLSC:
    """Least-squares commutator for Schur complements (lsc.c, Elman-
    Howle-Shadid-Shuttleworth-Tuminaro). For S = A11 - A10 A00^{-1} A01
    (B = A10, F = A00), approximates

        S^{-1} ~= (B B^T)^{-1} (B F B^T) (B B^T)^{-1}

    i.e. two "pressure Laplacian" solves around one momentum-block sweep.
    TPU realization: L = B B^T is factored ONCE on the host (SuperLU) and
    applied as level-scheduled device trisolves; the middle B F B^T is
    three fused SpMVs — the whole apply is one XLA program with no inner
    Krylov iteration (PETSc's inner lsc_ksp default preonly+factorization
    behaves the same). Use inside PCFieldSplit schur:
    -fieldsplit_1_pc_type lsc."""

    def __init__(self, pc):
        self.pc = pc

    def set_from_options(self):
        pass

    def setup(self):
        from ..mat import factor
        from ..mat.aij import MatAIJ
        from ..ops import trisolve
        ctx = getattr(self.pc, "_schur_ctx", None)
        if ctx is None:
            raise Error("PCLSC: operator is not a Schur complement "
                        "(use inside PCFieldSplit type schur)")
        A00, A01, A10, A11 = ctx          # scipy CSR blocks
        L = (A10 @ A01).tocsr()
        d = L.diagonal()
        if np.any(d == 0):                # singular pressure Laplacian
            import scipy.sparse as sp
            L = (L + 1e-10 * sp.eye(L.shape[0])).tocsr()
        Lf, Uf, dinv, pr, pcm = factor.splu_factors(L)
        tail, data = trisolve.make_trisolve_plan(Lf, Uf, dinv)
        data["scatter_r"] = jnp.asarray(pr)
        data["gather_c"] = jnp.asarray(pcm)
        B = MatAIJ.from_scipy(A10.tocsr(), comm=self.pc.pmat.comm)
        F = MatAIJ.from_scipy(A00.tocsr(), comm=self.pc.pmat.comm)
        Bt = MatAIJ.from_scipy(A01.tocsr(), comm=self.pc.pmat.comm)
        data["B"] = B.device_data()
        data["F"] = F.device_data()
        data["Bt"] = Bt.device_data()
        meta = ("pc_lsc",) + tail + (B.meta, F.meta, Bt.meta,
                                     self.pc.pmat.row_layout.Npad)
        return meta, data


def _bind_lsc(meta, data):
    from ..ops import trisolve
    _, m, nlevL, nlevU, Bmeta, Fmeta, Btmeta, npad = meta
    Bop = operator.bind(Bmeta, data["B"])
    Fop = operator.bind(Fmeta, data["F"])
    Btop = operator.bind(Btmeta, data["Bt"])
    pr, pcm = data["scatter_r"], data["gather_c"]

    def linv(x):
        bp = jnp.zeros(m, x.dtype).at[pr].set(x[:m])
        y = trisolve.trisolve_apply(data, bp, m, nlevL, nlevU)
        return y[pcm]

    def mult(x):
        y = linv(x[:m])
        y = Bop.mult(Fop.mult(Btop.mult(y)))
        y = linv(y[:m])
        return jnp.zeros(npad, x.dtype).at[:m].set(-y[:m])

    return operator.Op(mult=mult)


operator.register_binder("pc_lsc", _bind_lsc)
PC.register_impl("lsc", _PCLSC)


class _PCGASM(__import__("petsc_tpu.pc.more_pc", fromlist=["_PCASM"])._PCASM):
    """Generalized ASM (gasm.c): additive Schwarz with USER-defined inner
    (non-overlapping ownership) and outer (overlapped) subdomains —
    PCGASMSetSubdomains. The reference's gasm/asm split is about subdomains
    spanning multiple MPI ranks; in the SPMD single-program model that
    distinction is an execution detail, so gasm here is ASM with arbitrary
    index-set subdomains (which seq asm cannot do in the reference)."""

    def __init__(self, pc):
        super().__init__(pc)
        self.user_doms = None

    def set_from_options(self):
        o = self.pc.opt
        n = o("get_int", "pc_gasm_total_subdomains", None)
        if n:
            self.nblocks = n
        v = o("get_int", "pc_gasm_overlap", None)
        if v is not None:
            self.overlap = v
        t = o("get_string", "pc_gasm_type", None)
        if t:
            self.asm_type = t

    def setSubdomains(self, inner, outer=None):
        """inner: list of index arrays (disjoint ownership); outer: matching
        overlapped sets (defaults to inner, then extended by `overlap`)."""
        inner = [np.asarray(ix, dtype=np.int64) for ix in inner]
        outer = ([np.asarray(ix, dtype=np.int64) for ix in outer]
                 if outer is not None else [ix.copy() for ix in inner])
        self.user_doms = list(zip(inner, outer))
        return self

    def _default_domains(self, S, m):
        if self.user_doms is None:
            return super()._default_domains(S, m)
        doms = []
        for own, dom in self.user_doms:
            for _ in range(self.overlap if dom is not own else 0):
                nbr = np.unique(S.indices[np.concatenate(
                    [np.arange(S.indptr[i], S.indptr[i + 1]) for i in dom])]) \
                    if len(dom) else dom
                dom = np.union1d(dom, nbr)
            doms.append((own, np.asarray(dom, dtype=np.int64)))
        return doms


PC.register_impl("gasm", _PCGASM)


class _PCLMVM:
    """PCLMVM (lmvmpc.c): apply a limited-memory quasi-Newton inverse-
    Hessian approximation (MatLMVM two-loop recursion) as the
    preconditioner. Pairs (s, y) are fed by the outer nonlinear solver via
    update(); with no pairs the apply is gamma*I. The two-loop unrolls over
    the STATIC pair count inside one XLA program — 2k fused dot+axpy
    pairs, no host round trips."""

    def __init__(self, pc):
        self.pc = pc
        self.max_pairs = 5
        self._S: list = []
        self._Y: list = []

    def set_from_options(self):
        n = self.pc.opt("get_int", "pc_lmvm_num_vecs", None)
        if n:
            self.max_pairs = n

    def update(self, s, y):
        """MatLMVMUpdate: append a correction pair (curvature-guarded)."""
        s = np.asarray(s, dtype=np.float64).reshape(-1)
        y = np.asarray(y, dtype=np.float64).reshape(-1)
        if float(np.dot(s, y)) > 1e-30 * float(np.linalg.norm(s)
                                               * np.linalg.norm(y) + 1e-300):
            self._S.append(s)
            self._Y.append(y)
            if len(self._S) > self.max_pairs:
                self._S.pop(0)
                self._Y.pop(0)
        self.pc._setup_called = False   # re-bind with new pairs
        return self

    def reset(self):
        self._S.clear()
        self._Y.clear()
        self.pc._setup_called = False

    def setup(self):
        npad = self.pc.pmat.row_layout.Npad if self.pc.pmat is not None \
            else len(self._S[0])
        k = len(self._S)
        rd = config.real_dtype()
        if k == 0:
            return ("pc_lmvm", 0, npad), {
                "S": jnp.zeros((0, npad), rd), "Y": jnp.zeros((0, npad), rd),
                "rho": jnp.zeros((0,), rd), "gamma": jnp.ones((), rd)}
        n = len(self._S[0])
        S = np.zeros((k, npad))
        Y = np.zeros((k, npad))
        S[:, :n] = np.stack(self._S)
        Y[:, :n] = np.stack(self._Y)
        rho = 1.0 / np.einsum("ij,ij->i", S, Y)
        gamma = float(np.dot(self._S[-1], self._Y[-1])
                      / np.dot(self._Y[-1], self._Y[-1]))
        return ("pc_lmvm", k, npad), {
            "S": jnp.asarray(S, rd), "Y": jnp.asarray(Y, rd),
            "rho": jnp.asarray(rho, rd), "gamma": jnp.asarray(gamma, rd)}


def _bind_lmvm(meta, data):
    _, k, npad = meta
    S, Y, rho, gamma = data["S"], data["Y"], data["rho"], data["gamma"]

    def mult(g):
        q = g
        alphas = []
        for i in range(k - 1, -1, -1):
            a = rho[i] * fdot(S[i], q)
            alphas.append((i, a))
            q = q - a * Y[i]
        q = gamma * q
        for i, a in reversed(alphas):
            b = rho[i] * fdot(Y[i], q)
            q = q + (a - b) * S[i]
        return q

    return operator.Op(mult=mult)


operator.register_binder("pc_lmvm", _bind_lmvm)
PC.register_impl("lmvm", _PCLMVM)


class _PCRedistribute:
    """PCREDISTRIBUTE (redistribute.c): strip rows that are decoupled
    (only a diagonal entry — typical eliminated Dirichlet rows), solve the
    reduced system with an inner KSP, and re-insert the stripped values
    x_i = b_i / a_ii. The reference also rebalances rows across ranks;
    under SPMD the re-balance is the array resharding, so the TPU version
    is the row-stripping transform. Off-diagonal couplings TO stripped
    rows are moved to the rhs inside the apply."""

    def __init__(self, pc):
        self.pc = pc

    def set_from_options(self):
        pass

    def setup(self):
        import scipy.sparse as sp
        from ..ksp.ksp import KSP
        from ..mat.aij import MatAIJ
        A = self.pc.pmat
        S = A.to_scipy().tocsr()
        n = S.shape[0]
        nnz_per_row = np.diff(S.indptr)
        diag = S.diagonal()
        dec = (nnz_per_row == 1) & (diag != 0)
        # a 1-nnz row must BE the diagonal to count as decoupled
        only = np.where(dec)[0]
        for r in only.copy():
            if S.indices[S.indptr[r]] != r:
                dec[r] = False
        keep = ~dec
        kidx = np.where(keep)[0]
        didx = np.where(dec)[0]
        Ak = S[kidx][:, kidx].tocsr()
        Adk = S[kidx][:, didx].tocsr()       # coupling kept <- stripped
        inner = KSP(options=self.pc._options,
                    prefix=(self.pc.get_options_prefix() or "")
                    + "redistribute_")
        Am = MatAIJ.from_scipy(Ak, comm=A.comm)
        inner.setOperators(Am, Am)
        inner.setFromOptions()
        if inner._type is None:
            inner.setType("gmres")
        inner.setUp()
        cfg = inner._static_cfg()
        rd = config.real_dtype()
        data = {
            "A": Am.device_data(), "B": inner.pc.device_data(),
            "Adk": MatAIJ.from_scipy(Adk, comm=A.comm).device_data(),
            "kidx": jnp.asarray(kidx), "didx": jnp.asarray(didx),
            "dinv": jnp.asarray(1.0 / diag[didx] if len(didx) else
                                np.zeros(0), rd),
        }
        meta = ("pc_redistribute", inner._type, Am.meta, inner.pc.meta,
                cfg, float(inner.rtol), float(inner.abstol),
                float(inner.divtol),
                MatAIJ.from_scipy(Adk, comm=A.comm).meta,
                A.row_layout.Npad, len(kidx), len(didx),
                Am.row_layout.Npad)
        return meta, data


def _bind_redistribute(meta, data):
    from ..ksp.ksp import _IMPLS
    (_, ktype, ameta, bmeta, cfg, rtol, abstol, divtol, adkmeta,
     npad, nk, nd, npad_k) = meta
    fn = _IMPLS[ktype]["fn"]
    Aop = operator.bind(ameta, data["A"])
    Bop = operator.bind(bmeta, data["B"])
    Adk = operator.bind(adkmeta, data["Adk"])

    def mult(b):
        xd = b[data["didx"]] * data["dinv"]          # stripped rows
        bk = b[data["kidx"]]                         # (nk,)
        if nd:
            # move kept<-stripped couplings to the rhs
            xd_pad = jnp.zeros(max(nd, 1), b.dtype).at[:nd].set(xd)
            bk = bk - Adk.mult(xd_pad)[:nk]
        rhs = jnp.zeros(npad_k, b.dtype).at[:nk].set(bk)
        res = fn(Aop, Bop, rhs, jnp.zeros_like(rhs),
                 rtol, abstol, divtol, cfg)
        y = jnp.zeros(npad, b.dtype)
        y = y.at[data["kidx"]].set(res.x[:nk])
        if nd:
            y = y.at[data["didx"]].set(xd)
        return y

    return operator.Op(mult=mult)


operator.register_binder("pc_redistribute", _bind_redistribute)
PC.register_impl("redistribute", _PCRedistribute)


class _PCCP:
    """PCCP (cp.c): one sweep of sequential column-projection minimization
    — for each column j, x_j += (r, a_j)/||a_j||^2. Sequential column
    updates are EXACTLY forward Gauss-Seidel on the normal equations
    A^T A x = A^T b, so the device apply is the level-scheduled SOR sweep
    on A^T A (the same machinery as sequential Kaczmarz, which is its
    row-space dual)."""

    def __init__(self, pc):
        self.pc = pc

    def set_from_options(self):
        pass

    def setup(self):
        import scipy.sparse as sp
        from ..mat import factor as _f
        from ..ops import trisolve
        A = self.pc.pmat
        S = A.to_scipy().tocsr()
        N = (S.T @ S).tocsr()                 # normal equations operator
        d = N.diagonal()
        d = np.where(d == 0, 1.0, d)
        # forward GS sweep: (D + L) z = A^T b  with N = L + D + U
        L = sp.tril(N, k=-1).tocsr()
        Ls = (sp.diags(1.0 / d) @ L).tocsr()  # unit-lower solve form
        tail, data = trisolve.make_trisolve_plan(
            (Ls.indptr, Ls.indices, Ls.data),
            (np.zeros(N.shape[0] + 1, np.int64), np.zeros(0, np.int64),
             np.zeros(0)),
            np.ones(N.shape[0]))
        data["dinv"] = jnp.asarray(1.0 / d)
        data["At"] = __import__("petsc_tpu.mat.aij",
                                fromlist=["MatAIJ"]).MatAIJ.from_scipy(
            sp.csr_matrix(S.T), comm=A.comm).device_data()
        At_meta = __import__("petsc_tpu.mat.aij",
                             fromlist=["MatAIJ"]).MatAIJ.from_scipy(
            sp.csr_matrix(S.T), comm=A.comm).meta
        return (("pc_cp",) + tail
                + (At_meta, A.col_layout.Npad, N.shape[0])), data


def _bind_cp(meta, data):
    from ..ops import trisolve
    _, m, nlevL, nlevU, at_meta, npad, n = meta
    At = operator.bind(at_meta, data["At"])

    def mult(b):
        rhs = At.mult(b)                      # A^T b
        # (D + L) z = rhs  =>  z = (I + D^-1 L)^-1 D^-1 rhs; the plan's
        # unit-lower table holds D^-1 L
        z = trisolve.trisolve_apply(
            {**data, "dinv": jnp.ones(m, b.dtype)},
            (data["dinv"] * rhs[:m]), m, nlevL, nlevU)
        return jnp.zeros(npad, b.dtype).at[:n].set(z[:n])

    return operator.Op(mult=mult)


operator.register_binder("pc_cp", _bind_cp)
PC.register_impl("cp", _PCCP)


class _PCPatch(__import__("petsc_tpu.pc.more_pc",
                          fromlist=["_PCASM"])._PCASM):
    """PCPATCH (impls/patch, Farrell-Knepley-Mitchell-Wechsung): additive
    relaxation over VERTEX-STAR patches — one tiny subdomain per dof
    consisting of the dof and its matrix-graph neighbors (the algebraic
    star; with a DMDA attached this IS the stencil star). The reference
    builds patches from the mesh topology + FEM discretisation; here the
    operator pattern supplies the same stars for the assembled case.

    TPU shape: thousands of tiny patches become ONE block-diagonal
    level-scheduled solve (the ASM machinery) — patch independence is
    exactly batch parallelism."""

    def __init__(self, pc):
        super().__init__(pc)
        self.overlap = 0
        # full additive scatter: sum R_i^T K_i^{-1} R_i is SYMMETRIC, so
        # the patch smoother is CG-safe (restricted ASM is not)
        self.asm_type = "basic"
        self.sub_kind = "star"

    def set_from_options(self):
        t = self.pc.opt("get_string", "pc_patch_construct_type", None)
        if t:
            self.sub_kind = t

    def _default_domains(self, S, m):
        doms = []
        for i in range(m):
            nbrs = S.indices[S.indptr[i]: S.indptr[i + 1]]
            leaves = np.setdiff1d(nbrs, [i]).astype(np.int64)
            # center LAST: the star's arrow pattern then factors exactly
            # under ILU(0) (leaf elimination fills only the center row)
            dom = np.concatenate([leaves, [i]])
            doms.append((np.asarray([i], dtype=np.int64), dom))
        return doms

    def setup(self):
        meta, data = super().setup()
        # partition-of-unity scaling D = mult^{-1/2} applied on BOTH
        # sides of the patch solves: sum R^T D K^-1 D R stays symmetric
        # and cancels the overlap over-counting of plain additive patches
        gat = np.asarray(data["gather"])
        m = meta[-1]
        cnt = np.zeros(m)
        np.add.at(cnt, gat, 1.0)
        w = 1.0 / np.sqrt(np.maximum(cnt, 1.0))
        data["pou_w"] = jnp.asarray(w, config.real_dtype())
        return ("pc_patch",) + meta[1:], data


def _bind_patch(meta, data):
    from ..ops import trisolve
    _, mbig, nlevL, nlevU, npad = meta
    core = {k: data[k] for k in ("Ld", "Lx", "Ud", "Ux", "tabL", "tabU",
                                 "dinv")}
    w = data["pou_w"]

    def mult(x):
        xg = (x * w)[data["gather"]]
        sol = trisolve.trisolve_apply(core, xg, mbig, nlevL, nlevU)
        y = jnp.zeros_like(x)
        y = y.at[data["sel_dst"]].add(sol[data["sel_src"]])
        return y * w

    return operator.Op(mult=mult)


operator.register_binder("pc_patch", _bind_patch)
PC.register_impl("patch", _PCPatch)
