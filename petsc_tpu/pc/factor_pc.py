"""Factorization-based preconditioners: ilu, icc, lu, cholesky, bjacobi.

Behavioral reference: PCILU/PCLU (src/ksp/pc/impls/factor), PCBJacobi
(src/ksp/pc/impls/bjacobi/bjacobi.c — one block per rank by default, inner
solver ILU(0)/preonly). TPU design:

* ilu/icc: host ILU(0) numeric factorization (mat.factor), level-scheduled
  device triangular solves (ops.trisolve).
* lu/cholesky: SuperLU factors with fill (host), permutation-aware device
  trisolve — the MatGetFactor external-direct-solver pattern.
* bjacobi: dropping all entries outside the diagonal blocks and ILU(0)-ing
  the result gives exactly PETSc's bjacobi+ilu; the level schedule then
  automatically parallelizes across blocks (level = max over blocks, rows of
  different blocks solve together in one vectorized step). With
  -sub_pc_type lu, blocks are factored densely, batched on the MXU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import config
from ..mat import factor
from ..ops import operator, trisolve
from ..sys.error import Error
from .pc import PC


class _PCFactorBase:
    def __init__(self, pc):
        self.pc = pc

    def _csr(self):
        A = self.pc.pmat
        if A.comm.nshards > 1:
            raise Error(f"PC {type(self).__name__}: use bjacobi/asm for "
                        "distributed operators")
        return A.getValuesCSR(), A.row_layout


class _PCILU(_PCFactorBase):
    def __init__(self, pc):
        super().__init__(pc)
        self.levels = 0
        self.drop_tol = None       # -> ILUdt via SuperLU incomplete LU
        self.fill_factor = 10.0

    def set_from_options(self):
        n = self.pc.opt("get_int", "pc_factor_levels", None)
        if n is not None:
            self.levels = n
        dt = self.pc.opt("get_real", "pc_factor_drop_tolerance", None)
        if dt is not None:
            self.drop_tol = dt
        ff = self.pc.opt("get_real", "pc_factor_fill", None)
        if ff is not None:
            self.fill_factor = ff

    def _want_transpose(self):
        return bool(self.pc.opt("get_bool", "pc_factor_transpose_solve",
                                default=False))

    def setup(self):
        (indptr, indices, vals), layout = self._csr()
        if self.drop_tol is not None:
            A = self.pc.pmat.to_scipy()
            L, U, dinv, perm_r, perm_c = factor.spilu_factors(
                A, self.drop_tol, self.fill_factor)
            tail, data = trisolve.make_trisolve_plan(L, U, dinv)
            if self._want_transpose():
                data.update(trisolve.make_transpose_tables(L, U, dinv))
            data["scatter_r"] = jnp.asarray(perm_r)
            data["gather_c"] = jnp.asarray(perm_c)
            return ("pc_trisolve_perm",) + tail + (layout.Npad,), data
        L, U, dinv = factor.iluk(indptr, indices, vals, self.levels)
        mode = self.pc.opt("get_string", "pc_factor_trisolve",
                           default="levels")
        if mode == "neumann":
            return _neumann_plan(self.pc, L, U, dinv, layout)
        tail, data = trisolve.make_trisolve_plan(L, U, dinv)
        if self._want_transpose():
            data.update(trisolve.make_transpose_tables(L, U, dinv))
        return ("pc_trisolve",) + tail + (layout.Npad,), data


class _PCLU(_PCFactorBase):
    def _want_transpose(self):
        return bool(self.pc.opt("get_bool", "pc_factor_transpose_solve",
                                default=False))

    def setup(self):
        _, layout = self._csr()
        A = self.pc.pmat.to_scipy()
        L, U, dinv, perm_r, perm_c = factor.splu_factors(A)
        tail, data = trisolve.make_trisolve_plan(L, U, dinv)
        if self._want_transpose():
            data.update(trisolve.make_transpose_tables(L, U, dinv))
        # scatter b into perm_r, gather result with perm_c (A = Pr^T LU Pc^T)
        data["scatter_r"] = jnp.asarray(perm_r)
        data["gather_c"] = jnp.asarray(perm_c)
        return ("pc_trisolve_perm",) + tail + (layout.Npad,), data


class _PCBJacobi:
    def __init__(self, pc):
        self.pc = pc
        self.nblocks = None
        self.sub_type = "ilu"

    def set_from_options(self):
        nb = self.pc.opt("get_int", "pc_bjacobi_blocks", None)
        if nb:
            self.nblocks = nb
        st = self.pc.options.get_string("sub_pc_type",
                                        prefix=self.pc.get_options_prefix(),
                                        default=None)
        if st:
            self.sub_type = st
        kt = self.pc.options.get_string("sub_ksp_type",
                                        prefix=self.pc.get_options_prefix(),
                                        default=None)
        if kt and kt != "preonly":
            self.sub_ksp_type = kt

    def setup(self):
        A = self.pc.pmat
        nsh = getattr(A.comm, "nshards", 1)
        if (nsh > 1 and self.nblocks in (None, nsh)
                and self.sub_type in ("ilu", "icc")
                and not getattr(self, "sub_ksp_type", None)
                and hasattr(A, "shardcsr")):
            return self._setup_dist(A)
        m = A.row_layout.N
        nb = self.nblocks or max(A.comm.nshards, 1)
        # contiguous near-equal blocks (PetscLayout-style split)
        sizes = np.full(nb, m // nb)
        sizes[: m % nb] += 1
        starts = np.concatenate([[0], np.cumsum(sizes)])
        indptr, indices, vals = A.getValuesCSR()
        rows = np.repeat(np.arange(m), np.diff(indptr))
        blk_of = np.searchsorted(starts, rows, side="right") - 1
        keep = (indices >= starts[blk_of]) & (indices < starts[blk_of + 1])
        # block-diagonal CSR
        bi = np.zeros(m + 1, dtype=np.int64)
        np.add.at(bi, rows[keep] + 1, 1)
        bi = np.cumsum(bi)
        bj, bv = indices[keep], vals[keep]
        if self.sub_type in ("ilu", "icc"):
            L, U, dinv = factor.ilu0(bi, bj, bv)
            tail, data = trisolve.make_trisolve_plan(L, U, dinv)
            return ("pc_trisolve",) + tail + (A.row_layout.Npad,), data
        if self.sub_type in ("lu", "cholesky"):
            import scipy.sparse as sp
            Ablk = sp.csr_matrix((bv, bj, bi), shape=(m, m))
            L, U, dinv, pr, pc_ = factor.splu_factors(Ablk)
            tail, data = trisolve.make_trisolve_plan(L, U, dinv)
            data["scatter_r"] = jnp.asarray(pr)
            data["gather_c"] = jnp.asarray(pc_)
            return ("pc_trisolve_perm",) + tail + (A.row_layout.Npad,), data
        if getattr(self, "sub_ksp_type", None):
            # iterative inner solves per block (PCBJacobiGetSubKSP path):
            # inner KSP over the block-diagonal operator, jitted into the
            # outer program like PCKSP
            import scipy.sparse as sp
            from ..ksp.ksp import KSP
            from ..mat.aij import MatAIJ
            from ..parallel.mesh import comm_self
            Abd = MatAIJ.from_scipy(
                sp.csr_matrix((bv, bj, bi), shape=(m, m)), comm=comm_self())
            inner = KSP(options=self.pc._options,
                        prefix=(self.pc.get_options_prefix() or "") + "sub_")
            inner.create(self.pc.comm)
            inner.setOperators(Abd, Abd)
            inner.setType(self.sub_ksp_type)
            inner.getPC().setType(self.sub_type)
            inner.setFromOptions()
            if inner.max_it > 1000:
                inner.max_it = 50
            inner.setUp()
            cfg = inner._static_cfg()
            meta = ("pc_ksp", inner._type, Abd.meta, inner.pc.meta, cfg,
                    float(inner.rtol), float(inner.abstol),
                    float(inner.divtol))
            return meta, {"A": Abd.device_data(),
                          "B": inner.pc.device_data()}
        if self.sub_type == "jacobi":
            d = np.zeros(m)
            hit = bj == rows[keep]
            np.add.at(d, rows[keep][hit], bv[hit])
            inv = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 1.0)
            inv = np.pad(inv, (0, A.row_layout.pad))
            return ("pc_jacobi",), {"inv": jnp.asarray(inv, config.real_dtype())}
        raise Error(f"bjacobi: unsupported sub_pc_type {self.sub_type}")

    def _setup_dist(self, A):
        """Distributed bjacobi: one block per SHARD, factored from the
        shard's OWN diagonal block of the ShardedCSR (no global-CSR
        gather; the per-rank data path of bjacobi.c), with the per-shard
        level-scheduled trisolves running inside shard_map — block solves
        are embarrassingly parallel across the mesh axis."""
        import scipy.sparse as sp
        S = A.shardcsr()
        rl = S.row_layout
        blk, nsh = rl.block, rl.nshards
        plans = []
        for s in range(nsh):
            lo = s * blk
            sub = S.blocks[s][:, lo:lo + blk].tocsr()
            nvalid = rl.local_size(s)
            if nvalid < blk:       # identity on layout-padding rows
                padd = np.zeros(blk)
                padd[nvalid:] = 1.0
                sub = (sub + sp.diags(padd)).tocsr()
            L, U, dinv = factor.ilu0(sub.indptr.astype(np.int64),
                                     sub.indices.astype(np.int64),
                                     sub.data)
            plans.append(trisolve.make_trisolve_plan(L, U, dinv))
        nlevL = max(t[1] for t, _ in plans)
        nlevU = max(t[2] for t, _ in plans)
        data = _stack_trisolve_plans([d for _, d in plans], blk,
                                     nlevL, nlevU, A.comm)
        return ("pc_bjacobi_dist", blk, nlevL, nlevU,
                A.comm.axis, A.comm.mesh), data


def _stack_trisolve_plans(datas, m, nlevL, nlevU, comm):
    """Pad per-shard trisolve tables to common shapes and stack to a
    leading mesh-axis dim, sharded so each device holds only its own
    block's factor."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    def pad_to(a, shape, fill):
        a = np.asarray(a)
        out = np.full(shape, fill, dtype=a.dtype)
        out[tuple(slice(0, n) for n in a.shape)] = a
        return out

    targets = {}
    for k in datas[0]:
        shp = np.max([np.asarray(d[k]).shape for d in datas], axis=0)
        # level tables must cover the static loop trip count
        if k == "tabL":
            shp[0] = nlevL
        elif k == "tabU":
            shp[0] = nlevU
        targets[k] = tuple(int(n) for n in shp)
    out = {}
    for k in datas[0]:
        fill = m if k.startswith("tab") else 0
        arr = np.stack([pad_to(d[k], targets[k], fill) for d in datas])
        sh = NamedSharding(comm.mesh,
                           Pspec(comm.axis, *([None] * (arr.ndim - 1))))
        out[k] = jax.device_put(jnp.asarray(arr), sh)
    return out


def _bind_pc_bjacobi_dist(meta, data):
    from jax import shard_map
    from jax.sharding import PartitionSpec as Pspec
    _, blk, nlevL, nlevU, axis, mesh = meta
    keys = ("Ld", "Lx", "Ud", "Ux", "tabL", "tabU", "dinv")

    def local(tabs, xl):
        core = {k: tabs[k][0] for k in keys}
        return trisolve.trisolve_apply(core, xl.reshape(-1),
                                       blk, nlevL, nlevU)

    smap = shard_map(
        local, mesh=mesh,
        in_specs=({k: Pspec(axis, *([None] * (data[k].ndim - 1)))
                   for k in keys}, Pspec(axis)),
        out_specs=Pspec(axis))

    def mult(x):
        return smap({k: data[k] for k in keys}, x)

    return operator.Op(mult=mult)


operator.register_binder("pc_bjacobi_dist", _bind_pc_bjacobi_dist)


def _neumann_plan(pc, L, U, dinv, layout):
    """Truncated-Neumann triangular solves (TPU redesign of the
    aijcusparse.cu csrsv role; the Ginkgo/cuSPARSE 'iterative trisolve'
    idea taken to its stencil conclusion): strict-triangular factors are
    NILPOTENT, so L^-1 b = sum_j (-Ls)^j b terminates exactly at the
    level depth and truncating at s sweeps gives a fixed linear
    preconditioner whose apply is s stencil SpMVs instead of ~3n
    gather-bound level steps. On grid operators the factors inherit the
    grid stencil pattern, so each sweep rides the dnd/dia fast path —
    chip-measured 23x on the 1.26M-row GMRES+ILU0 BASELINE config
    (PERF.md round-5). -pc_factor_trisolve_sweeps s (default 6)."""
    import scipy.sparse as sp
    from ..mat.aij import MatAIJ
    s = pc.opt("get_int", "pc_factor_trisolve_sweeps", default=6)
    m = len(dinv)
    Li, Lj, Lv = L
    Ui, Uj, Uv = U
    mats = []
    for (ip, ix, v) in ((Li, Lj, Lv), (Ui, Uj, Uv)):
        M = MatAIJ.from_scipy(
            sp.csr_matrix((v, ix, ip), shape=(m, m)))
        gs = getattr(pc.pmat, "_grid_shape", None)
        if gs is not None and int(np.prod(gs)) == m:
            M.setStencilGrid(gs)
        mats.append(M)
    mL, mU = mats
    meta = ("pc_trisolve_neumann", mL.meta, mU.meta, int(s), m,
            layout.Npad)
    data = {"L": mL.device_data(), "U": mU.device_data(),
            "dinv": jnp.asarray(dinv)}
    return meta, data


def _bind_trisolve_neumann(meta, data):
    _, metaL, metaU, s, m, npad = meta

    def mult(x):
        Lop = operator.bind(metaL, data["L"])
        Uop = operator.bind(metaU, data["U"])
        dinv = data["dinv"]
        b = x[:m]
        # y = (I + Ls)^-1 b  by  y <- b - Ls y   (exact at s >= depth)
        y = b
        for _ in range(s):
            y = b - Lop.mult(y)[:m]
        # z = (D + Us)^-1 y  by  z <- dinv*(y - Us z)
        z = dinv * y
        for _ in range(s):
            z = dinv * (y - Uop.mult(z)[:m])
        if x.shape[0] > m:
            z = jnp.pad(z, (0, x.shape[0] - m))
        return z

    def mult_t(x):
        Lop = operator.bind(metaL, data["L"])
        Uop = operator.bind(metaU, data["U"])
        dinv = data["dinv"]
        b = x[:m]
        # (U^-1 L^-1)^T = L^-T U^-T: (D + Us)^-T = (D + Us^T)^-1
        y = dinv * b
        for _ in range(s):
            y = dinv * (b - Uop.mult_t(y)[:m])
        z = y
        for _ in range(s):
            z = y - Lop.mult_t(z)[:m]
        if x.shape[0] > m:
            z = jnp.pad(z, (0, x.shape[0] - m))
        return z

    LT = operator.bind(metaL, data["L"]).mult_t
    UT = operator.bind(metaU, data["U"]).mult_t
    return operator.Op(mult=mult,
                       mult_t=mult_t if (LT and UT) else None)


def _bind_trisolve(meta, data):
    _, m, nlevL, nlevU, npad = meta

    def mult(x):
        return trisolve.trisolve_apply(data, x, m, nlevL, nlevU)

    mult_t = None
    if "Utd" in data:       # transpose tables present (static at bind time)
        def mult_t(x):
            return trisolve.trisolve_transpose_apply(data, x, m, nlevL, nlevU)

    return operator.Op(mult=mult, mult_t=mult_t)


def _bind_trisolve_perm(meta, data):
    _, m, nlevL, nlevU, npad = meta
    pr, pc_ = data["scatter_r"], data["gather_c"]

    def mult(x):
        w = jnp.zeros((m,), x.dtype).at[pr].set(x[:m])
        core = {k: data[k] for k in ("Ld", "Lx", "Ud", "Ux", "tabL", "tabU", "dinv")}
        u = trisolve.trisolve_apply(core, w, m, nlevL, nlevU)
        y = u[pc_]
        if x.shape[0] > m:
            y = jnp.pad(y, (0, x.shape[0] - m))
        return y

    mult_t = None
    if "Utd" in data:
        # A^{-1} = Pc' (LU)^{-1} Pr'  =>  A^{-T} = Pr'^T (LU)^{-T} Pc'^T
        def mult_t(x):
            w = jnp.zeros((m,), x.dtype).at[pc_].set(x[:m])
            u = trisolve.trisolve_transpose_apply(data, w, m, nlevL, nlevU)
            y = u[pr]
            if x.shape[0] > m:
                y = jnp.pad(y, (0, x.shape[0] - m))
            return y

    return operator.Op(mult=mult, mult_t=mult_t)


PC.register_impl("ilu", _PCILU)
PC.register_impl("icc", _PCILU)
PC.register_impl("lu", _PCLU)
PC.register_impl("cholesky", _PCLU)
PC.register_impl("bjacobi", _PCBJacobi)
operator.register_binder("pc_trisolve", _bind_trisolve)
operator.register_binder("pc_trisolve_perm", _bind_trisolve_perm)
operator.register_binder("pc_trisolve_neumann", _bind_trisolve_neumann)
