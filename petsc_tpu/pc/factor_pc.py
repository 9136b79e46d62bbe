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
