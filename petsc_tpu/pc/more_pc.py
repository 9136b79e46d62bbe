"""Additional preconditioners: sor, asm, composite, ksp, fieldsplit.

Behavioral references:
  sor        src/ksp/pc/impls/sor/sor.c (SSOR apply, omega, local sweeps)
  asm        src/ksp/pc/impls/asm/asm.c (restricted additive Schwarz
             default, overlap via MatIncreaseOverlap mpiov.c)
  composite  src/ksp/pc/impls/composite/composite.c (additive /
             multiplicative combinations)
  ksp        src/ksp/pc/impls/ksp/pcksp.c (full inner KSP as a PC)
  fieldsplit src/ksp/pc/impls/fieldsplit/fieldsplit.c (additive /
             multiplicative / Schur with diag/lower/upper/full factorization)

All of them compose through the (meta, data) contract, so a fieldsplit of
a composite of an inner-KSP-over-GAMG still jits into ONE XLA program.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import config
from ..mat import factor
from ..ops import operator, trisolve
from ..sys.error import Error
from .pc import PC


# ---------------------------------------------------------------------
# PCSOR
# ---------------------------------------------------------------------

class _PCSOR:
    """SSOR: z = w(2-w) (D/w + U)^-1 D (D/w + L)^-1 x (symmetric sweep,
    sor.c); forward/backward variants via -pc_sor_forward/backward. The
    triangular sweeps run as level-scheduled device solves."""

    def __init__(self, pc):
        self.pc = pc
        self.omega = 1.0
        self.sweep = "symmetric"   # symmetric | forward | backward
        self.its = 1

    def set_from_options(self):
        o = self.pc.opt
        w = o("get_real", "pc_sor_omega", None)
        if w:
            self.omega = w
        if o("get_bool", "pc_sor_forward", False):
            self.sweep = "forward"
        if o("get_bool", "pc_sor_backward", False):
            self.sweep = "backward"
        n = o("get_int", "pc_sor_its", None)
        if n:
            self.its = n

    def setup(self):
        A = self.pc.pmat
        indptr, indices, vals = A.getValuesCSR()
        m = A.row_layout.N
        w = self.omega
        rows = np.repeat(np.arange(m), np.diff(indptr))
        d = np.zeros(m)
        np.add.at(d, rows[indices == rows], vals[indices == rows])
        d = np.where(d == 0, 1.0, d)
        # M^-1_SSOR = w(2-w) (D+wU)^-1 D (D+wL)^-1; with L' = w D^-1 L and
        # U' = w D^-1 U both solves reduce to UNIT strict-triangular solves:
        # (D+wL)^-1 x = (I+L')^-1 (D^-1 x), (D+wU)^-1 (D y) = (I+U')^-1 y.
        lo = indices < rows
        up = indices > rows
        scale_rows = w / d
        Li = _recount(rows[lo], m)
        Ui = _recount(rows[up], m)
        Lv = vals[lo] * scale_rows[rows[lo]]
        Uv = vals[up] * scale_rows[rows[up]]
        levL, nlevL = trisolve.levels_from_csr(Li, indices[lo], lower=True)
        levU, nlevU = trisolve.levels_from_csr(Ui, indices[up], lower=False)
        tabL = trisolve.build_level_table(levL, nlevL, m)
        tabU = trisolve.build_level_table(levU, nlevU, m)
        Ld, Lx = trisolve.ell_of_csr(Li, indices[lo], Lv, m)
        Ud, Ux = trisolve.ell_of_csr(Ui, indices[up], Uv, m)
        rd = config.real_dtype()
        data = {
            "Ld": jnp.asarray(Ld, rd), "Lx": jnp.asarray(Lx),
            "Ud": jnp.asarray(Ud, rd), "Ux": jnp.asarray(Ux),
            "tabL": jnp.asarray(tabL), "tabU": jnp.asarray(tabU),
            "dinv": jnp.asarray(np.pad(1.0 / d, (0, A.row_layout.pad)), rd),
            "winv": jnp.asarray(np.pad(w / d, (0, A.row_layout.pad)), rd),
        }
        sc = w * (2.0 - w)
        return ("pc_sor", m, nlevL, nlevU, A.row_layout.Npad, self.sweep,
                float(sc)), data


def _recount(rows, m):
    cnt = np.zeros(m + 1, dtype=np.int64)
    np.add.at(cnt, rows + 1, 1)
    return np.cumsum(cnt)


def _bind_pc_sor(meta, data):
    _, m, nlevL, nlevU, npad, sweep, sc = meta

    def lsolve(b):
        return trisolve.unit_lower_solve(data["Ld"], data["Lx"],
                                         data["tabL"], b, m, nlevL)

    def usolve(b):
        return trisolve.unit_upper_solve(data["Ud"], data["Ux"],
                                         data["tabU"], b, m, nlevU)

    def mult(x):
        if sweep == "forward":
            return lsolve(data["winv"] * x)
        if sweep == "backward":
            return usolve(data["winv"] * x)
        y = lsolve(data["dinv"] * x)
        z = usolve(y)
        return sc * z

    return operator.Op(mult=mult)


# ---------------------------------------------------------------------
# PCASM (restricted additive Schwarz)
# ---------------------------------------------------------------------

class _PCASM:
    """Overlapping block ILU0: blocks = contiguous row ranges extended by
    `overlap` rounds of pattern adjacency (MatIncreaseOverlap model); apply
    gathers each subdomain, solves, and scatter-adds only the OWNED part
    (restricted ASM, the PETSc default PC_ASM_RESTRICT)."""

    def __init__(self, pc):
        self.pc = pc
        self.nblocks = None
        self.overlap = 1
        self.asm_type = "restrict"

    def set_from_options(self):
        o = self.pc.opt
        n = o("get_int", "pc_asm_blocks", None)
        if n:
            self.nblocks = n
        v = o("get_int", "pc_asm_overlap", None)
        if v is not None:
            self.overlap = v
        t = o("get_string", "pc_asm_type", None)
        if t:
            self.asm_type = t

    def _default_domains(self, S, m):
        nb = self.nblocks or max(getattr(self.pc.pmat.comm, "nshards", 1), 2)
        sizes = np.full(nb, m // nb)
        sizes[: m % nb] += 1
        starts = np.concatenate([[0], np.cumsum(sizes)])
        doms = []
        for b in range(nb):
            own = np.arange(starts[b], starts[b + 1])
            dom = own
            for _ in range(self.overlap):
                nbr = np.unique(S.indices[np.concatenate(
                    [np.arange(S.indptr[i], S.indptr[i + 1]) for i in dom])]) \
                    if len(dom) else dom
                dom = np.union1d(dom, nbr)
            doms.append((own, np.asarray(dom, dtype=np.int64)))
        return doms

    def setup(self):
        import scipy.sparse as sp
        A = self.pc.pmat
        nsh = getattr(A.comm, "nshards", 1)
        if (nsh > 1 and self.nblocks in (None, nsh)
                and hasattr(A, "shardcsr")):
            return self._setup_dist(A)
        from ..sys.info import warn_full_gather
        warn_full_gather(A, "PCASM(nblocks != nshards)")
        m = A.row_layout.N
        S = A.to_scipy()
        doms = self._default_domains(S, m)
        # big block-diagonal system over concatenated (overlapped) domains
        gat, scat_dst, blocks = [], [], []
        off = 0
        for own, dom in doms:
            gat.append(dom)
            g2l = {int(g): i for i, g in enumerate(dom)}
            sub = S[dom][:, dom].tocsr()
            blocks.append(sub)
            if self.asm_type == "restrict":
                local_of_own = np.asarray([g2l[int(i)] for i in own])
                scat_dst.append((own, off + local_of_own))
            else:
                scat_dst.append((dom, off + np.arange(len(dom))))
            off += len(dom)
        big = sp.block_diag(blocks, format="csr")
        L, U, dinv = factor.ilu0(big.indptr.astype(np.int64),
                                 big.indices.astype(np.int64), big.data)
        tail, data = trisolve.make_trisolve_plan(L, U, dinv)
        data["gather"] = jnp.asarray(np.concatenate(gat))
        dsts = np.concatenate([d for _, d in scat_dst])
        srcs = np.concatenate([o for o, _ in scat_dst])
        data["sel_src"] = jnp.asarray(dsts)   # position in big solution
        data["sel_dst"] = jnp.asarray(srcs)   # global row it lands in
        return ("pc_asm",) + tail + (A.row_layout.Npad,), data


    def _setup_dist(self, A):
        """Distributed restricted ASM: one subdomain per SHARD — own rows
        extended by `overlap` rounds of pattern adjacency, with the
        overlap rows fetched owner-by-owner (ShardedCSR.fetch_rows — the
        MatIncreaseOverlap/mpiov.c role; no global CSR gather). The apply
        runs per shard inside shard_map: halo-bcast the ghost x values,
        solve the subdomain ILU0, keep the OWNED part (PC_ASM_RESTRICT;
        'basic' additionally reduce-adds the overlap part back)."""
        import scipy.sparse as sp
        from ..mat import factor
        from ..parallel.sf import ExchangePlan
        from .factor_pc import _stack_trisolve_plans
        S = A.shardcsr()
        rl = S.row_layout
        blk, nsh = rl.block, rl.nshards
        doms, ghosts = [], []
        for s in range(nsh):
            lo, hi = rl.range(s)
            dom = np.arange(lo, hi)
            for _ in range(self.overlap):
                R = S.fetch_rows(dom)
                cols = np.unique(R.indices)
                dom = np.union1d(dom, cols[cols < rl.N])
            doms.append(dom)
            ghosts.append(dom[(dom < lo) | (dom >= hi)])
        plan = ExchangePlan(rl, ghosts, axis=A.comm.axis)
        Dm = max(max(len(d) for d in doms), 1)
        plans, gidx, own_pos, ghost_pos, vmask = [], [], [], [], []
        for s in range(nsh):
            lo, hi = rl.range(s)
            dom, gh = doms[s], ghosts[s]
            ms = len(dom)
            sub = S.fetch_rows(dom)[:, dom].tocsr()
            if ms < Dm:            # identity tail so every shard solves Dm
                sub = sp.block_diag([sub, sp.eye(Dm - ms)]).tocsr()
            L, U, dinv = factor.ilu0(sub.indptr.astype(np.int64),
                                     sub.indices.astype(np.int64),
                                     sub.data)
            plans.append(trisolve.make_trisolve_plan(L, U, dinv))
            # rhs gather: dom position -> [x_local | halo | 0] index
            gi = np.full(Dm, blk + plan.H, dtype=np.int64)   # sentinel -> 0
            own = (dom >= lo) & (dom < hi)
            gi[:ms][own] = dom[own] - lo
            gpos = {int(g): i for i, g in enumerate(gh)}
            gi[:ms][~own] = blk + np.asarray(
                [gpos[int(g)] for g in dom[~own]], dtype=np.int64)
            gidx.append(gi)
            # owned-part scatter: position in dom of each local row
            op_ = np.searchsorted(dom, np.arange(lo, hi))
            own_pos.append(np.pad(op_, (0, blk - len(op_))))
            # overlap-part positions (for asm_type == 'basic')
            gp = np.searchsorted(dom, gh)
            ghost_pos.append(np.pad(gp, (0, plan.H - len(gp))))
            vm = np.zeros(blk)
            vm[: hi - lo] = 1.0
            vmask.append(vm)
        nlevL = max(t[1] for t, _ in plans)
        nlevU = max(t[2] for t, _ in plans)
        data = _stack_trisolve_plans([d for _, d in plans], Dm,
                                     nlevL, nlevU, A.comm)
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as Pt
        sh2 = NamedSharding(A.comm.mesh, Pt(A.comm.axis, None))
        data["gidx"] = jax.device_put(jnp.asarray(np.stack(gidx)), sh2)
        data["own_pos"] = jax.device_put(jnp.asarray(np.stack(own_pos)), sh2)
        data["ghost_pos"] = jax.device_put(
            jnp.asarray(np.stack(ghost_pos)), sh2)
        data["vmask"] = jax.device_put(jnp.asarray(np.stack(vmask)), sh2)
        data["sf"] = plan.device_tables(A.comm.mesh)
        return ("pc_asm_dist", blk, Dm, nlevL, nlevU, plan.H, plan.meta(),
                self.asm_type, A.comm.axis, A.comm.mesh), data


def _bind_pc_asm_dist(meta, data):
    from jax import shard_map
    from jax.sharding import PartitionSpec as Pt
    from ..parallel.sf import ExchangePlan
    _, blk, Dm, nlevL, nlevU, H, sf_meta, asm_type, axis, mesh = meta
    keys = ("Ld", "Lx", "Ud", "Ux", "tabL", "tabU", "dinv")
    tkeys = keys + ("gidx", "own_pos", "ghost_pos", "vmask")

    def local(tabs, sf, xl):
        core = {k: tabs[k][0] for k in keys}
        xl = xl.reshape(-1)
        halo = ExchangePlan.bcast(sf_meta, sf, xl, axis)
        buf = jnp.concatenate([xl, halo, jnp.zeros((1,), xl.dtype)])
        sol = trisolve.trisolve_apply(core, buf[tabs["gidx"][0]],
                                      Dm, nlevL, nlevU)
        y = sol[tabs["own_pos"][0]] * tabs["vmask"][0]
        if asm_type == "basic":
            back = ExchangePlan.reduce_add(
                sf_meta, sf, sol[tabs["ghost_pos"][0]], blk, axis)
            y = y + back * tabs["vmask"][0]
        return y

    smap = shard_map(
        local, mesh=mesh,
        in_specs=({k: Pt(axis, *([None] * (data[k].ndim - 1)))
                   for k in tkeys},
                  {k: Pt(axis, None) for k in data["sf"]}, Pt(axis)),
        out_specs=Pt(axis))

    def mult(x):
        return smap({k: data[k] for k in tkeys}, data["sf"], x)

    return operator.Op(mult=mult)


operator.register_binder("pc_asm_dist", _bind_pc_asm_dist)


def _bind_pc_asm(meta, data):
    _, mbig, nlevL, nlevU, npad = meta
    core = {k: data[k] for k in ("Ld", "Lx", "Ud", "Ux", "tabL", "tabU",
                                 "dinv")}

    def mult(x):
        xg = x[data["gather"]]
        sol = trisolve.trisolve_apply(core, xg, mbig, nlevL, nlevU)
        y = jnp.zeros_like(x)
        return y.at[data["sel_dst"]].add(sol[data["sel_src"]])

    return operator.Op(mult=mult)


# ---------------------------------------------------------------------
# PCComposite
# ---------------------------------------------------------------------

class _PCComposite:
    """PCCOMPOSITE: additive  y = sum B_i x, or multiplicative
    y <- y + B_i (x - A y) sequentially (composite.c)."""

    def __init__(self, pc):
        self.pc = pc
        self.ctype = "additive"
        self.sub_pcs: list[PC] = []

    def set_from_options(self):
        o = self.pc.opt
        t = o("get_string", "pc_composite_type", None)
        if t:
            self.ctype = t
        s = o("get_string", "pc_composite_pcs", None)
        if s:
            for name in s.split(","):
                self.addPC(name)

    def addPC(self, name_or_pc):
        if isinstance(name_or_pc, PC):
            p = name_or_pc
        else:
            p = PC(options=self.pc._options)
            p.setOperators(self.pc.mat, self.pc.pmat)
            p.setType(name_or_pc)
        self.sub_pcs.append(p)
        return p

    def setup(self):
        if not self.sub_pcs:
            raise Error("PCComposite: no sub-PCs (use -pc_composite_pcs)")
        metas, datas = [], []
        for p in self.sub_pcs:
            p.setOperators(self.pc.mat, self.pc.pmat)
            metas.append(p.meta)
            datas.append(p.device_data())
        amata = self.pc.pmat.meta
        return (("pc_composite", self.ctype, tuple(metas), amata),
                {"subs": tuple(datas), "A": self.pc.pmat.device_data()})


def _bind_pc_composite(meta, data):
    _, ctype, metas, amata = meta
    subs = [operator.bind(mi, di) for mi, di in zip(metas, data["subs"])]
    Aop = operator.bind(amata, data["A"])

    def mult(x):
        if ctype == "additive":
            y = subs[0].mult(x)
            for s in subs[1:]:
                y = y + s.mult(x)
            return y
        y = subs[0].mult(x)
        for s in subs[1:]:
            y = y + s.mult(x - Aop.mult(y))
        return y

    return operator.Op(mult=mult)


# ---------------------------------------------------------------------
# PCKSP (full inner Krylov solve as preconditioner)
# ---------------------------------------------------------------------

class _PCKSP:
    """PCKSP (pcksp.c): apply = run an inner KSP on the pmat to its own
    tolerances. The inner solve is the same pure solver function the
    outer KSP uses, so the whole nested solve jits as one program.
    Configure with the `ksp_` prefix options of this PC's prefix."""

    def __init__(self, pc):
        self.pc = pc
        self.ksp = None

    def getKSP(self):
        if self.ksp is None:
            from ..ksp.ksp import KSP
            self.ksp = KSP(options=self.pc._options,
                           prefix=(self.pc.get_options_prefix() or "") + "ksp_")
            if self.pc.pmat is not None:
                self.ksp.setOperators(self.pc.pmat, self.pc.pmat)
        return self.ksp

    def set_from_options(self):
        self.getKSP()

    def setup(self):
        from ..ksp.ksp import _IMPLS
        ksp = self.getKSP()
        ksp.setOperators(self.pc.pmat, self.pc.pmat)
        if ksp._type is None:
            ksp.setFromOptions()
        if ksp.max_it > 1000:
            ksp.max_it = 20   # a bounded inner sweep (history buffer size)
        ksp.setUp()
        cfg = ksp._static_cfg()
        meta = ("pc_ksp", ksp._type, ksp.mat.meta, ksp.pc.meta, cfg,
                float(ksp.rtol), float(ksp.abstol), float(ksp.divtol))
        data = {"A": ksp.mat.device_data(), "B": ksp.pc.device_data()}
        return meta, data


def _bind_pc_ksp(meta, data):
    from ..ksp.ksp import _IMPLS
    _, ktype, amata, bmeta, cfg, rtol, abstol, divtol = meta
    fn = _IMPLS[ktype]["fn"]

    def mult(x):
        A = operator.bind(amata, data["A"])
        B = operator.bind(bmeta, data["B"])
        res = fn(A, B, x, jnp.zeros_like(x), rtol, abstol, divtol, cfg)
        return res.x

    return operator.Op(mult=mult)


# ---------------------------------------------------------------------
# PCFieldSplit
# ---------------------------------------------------------------------

class _PCFieldSplit:
    """PCFIELDSPLIT (fieldsplit.c): splits from ISes or strided fields
    (-pc_fieldsplit_detect_saddle_point / bs-strided default); types
    additive, multiplicative, symmetric_multiplicative, schur with
    factorization diag/lower/upper/full and Schur preconditioning from
    A11 (default) or selfp (S_p = A11 - A10 inv(diag(A00)) A01)."""

    def __init__(self, pc):
        self.pc = pc
        self.ftype = "multiplicative"
        self.schur_fact = "full"
        self.schur_pre = "a11"
        self.fields: list = []       # list of (name, np index array)
        self.sub_types: dict = {}

    def set_from_options(self):
        o = self.pc.opt
        t = o("get_string", "pc_fieldsplit_type", None)
        if t:
            self.ftype = t
        t = o("get_string", "pc_fieldsplit_schur_fact_type", None)
        if t:
            self.schur_fact = t
        t = o("get_string", "pc_fieldsplit_schur_precondition", None)
        if t:
            self.schur_pre = t

    def setIS(self, name, iset):
        self.fields.append((name, np.asarray(iset, dtype=np.int64)))

    def setFields(self, bs, *fields):
        n = self.pc.pmat.row_layout.N
        for f in fields:
            comps = np.atleast_1d(np.asarray(f, dtype=np.int64))
            idx = np.concatenate([np.arange(c, n, bs) for c in comps])
            self.fields.append((str(len(self.fields)), np.sort(idx)))

    def _default_fields(self):
        bs = self.pc.pmat.row_layout.bs or 1
        if bs > 1:
            self.setFields(bs, *[[c] for c in range(bs)])
        else:
            raise Error("PCFieldSplit: call setIS/setFields (no bs to "
                        "split by)")

    def setup(self):
        from ..mat.aij import MatAIJ
        if not self.fields:
            self._default_fields()
        A = self.pc.pmat
        isets = [idx for _, idx in self.fields]
        nf = len(isets)
        nsh = getattr(A.comm, "nshards", 1)
        dist = nsh > 1 and hasattr(A, "shardcsr")
        if dist:
            # distributed split (round-2 contract): every sub-block is
            # extracted per destination shard from the ShardedCSR
            # (fetch_rows — MatCreateSubMatrix_MPIAIJ/mpiov.c role) and
            # bound via from_sharded; no full-operator gather
            Ssh = A.shardcsr()
            bsh = [[Ssh.submatrix(isets[i], isets[j]) for j in range(nf)]
                   for i in range(nf)]
            Ms = [[MatAIJ.from_sharded(bsh[i][j], A.comm)
                   for j in range(nf)] for i in range(nf)]
        else:
            from ..sys.info import warn_full_gather
            warn_full_gather(A, "PCFieldSplit(serial split path)")
            S = A.to_scipy()
            blocks = [[S[isets[i]][:, isets[j]].tocsr() for j in range(nf)]
                      for i in range(nf)]
            Ms = [[MatAIJ.from_scipy(blocks[i][j], comm=A.comm)
                   for j in range(nf)] for i in range(nf)]
        sub_pcs = []
        for i in range(nf):
            p = PC(options=self.pc._options,
                   prefix=(self.pc.get_options_prefix() or "")
                   + f"fieldsplit_{self.fields[i][0]}_")
            Mi = Ms[i][i]
            if self.ftype == "schur" and i == 1:
                if dist:
                    # LSC-style consumers factor on host; hand them the
                    # (small) sub-blocks, not the full operator
                    p._schur_ctx = tuple(
                        bsh[a][b].to_global_csr()
                        [: len(isets[a]), : len(isets[b])].tocsr()
                        for a, b in ((0, 0), (0, 1), (1, 0), (1, 1)))
                    if self.schur_pre == "selfp":
                        # Sp = A11 - A10 D0^-1 A01, per-shard algebra
                        # (the mpiptap.c-style distributed product)
                        rl0 = bsh[0][0].row_layout
                        d0 = np.concatenate(bsh[0][0].diag_shards())
                        d0 = np.where(d0 == 0, 1.0, d0)
                        vals = [1.0 / d0[s * rl0.block:(s + 1) * rl0.block]
                                for s in range(nsh)]
                        A01s = bsh[0][1].scale_rows(vals)
                        Sp_sh = bsh[1][1].add(bsh[1][0].spmm(A01s) * -1.0)
                        Mi = MatAIJ.from_sharded(Sp_sh, A.comm)
                else:
                    p._schur_ctx = (blocks[0][0], blocks[0][1],
                                    blocks[1][0], blocks[1][1])
                    if self.schur_pre == "selfp":
                        d0 = blocks[0][0].diagonal()
                        d0 = np.where(d0 == 0, 1.0, d0)
                        import scipy.sparse as sp
                        Sp = (blocks[1][1] - blocks[1][0]
                              @ sp.diags(1.0 / d0) @ blocks[0][1]).tocsr()
                        Mi = MatAIJ.from_scipy(Sp, comm=A.comm)
            p.setOperators(Mi, Mi)
            if self.fields[i][0] in self.sub_types:
                p.setType(self.sub_types[self.fields[i][0]])
            p.setFromOptions()
            sub_pcs.append(p)
        self.sub_pcs = sub_pcs
        data = {
            "isets": tuple(jnp.asarray(ix) for ix in isets),
            "subs": tuple(p.device_data() for p in sub_pcs),
            "blocks": tuple(tuple(
                Ms[i][j].device_data()
                if i != j else None for j in range(nf)) for i in range(nf)),
        }
        bmetas = tuple(tuple(
            Ms[i][j].meta
            if i != j else None for j in range(nf)) for i in range(nf))
        pads = tuple(Ms[i][i].row_layout.Npad for i in range(nf))
        meta = ("pc_fieldsplit", self.ftype, self.schur_fact,
                A.row_layout.Npad, tuple(p.meta for p in sub_pcs), bmetas,
                tuple(len(ix) for ix in isets), pads)
        return meta, data


def _bind_pc_fieldsplit(meta, data):
    _, ftype, sfact, npad, sub_metas, bmetas, sizes, pads = meta
    nf = len(sizes)
    isets = data["isets"]
    subs = [operator.bind(m_, d_) for m_, d_ in zip(sub_metas, data["subs"])]
    Bop = [[operator.bind(bmetas[i][j], data["blocks"][i][j])
            if i != j else None for j in range(nf)] for i in range(nf)]

    def scatter(y, idx, vals):
        return y.at[idx].set(vals[: idx.shape[0]])

    def mult(x):
        # sub-vectors padded to each field's distributed layout
        xs = [jnp.pad(x[ix], (0, pads[i] - ix.shape[0]))
              for i, ix in enumerate(isets)]
        y = jnp.zeros_like(x)
        if ftype == "additive":
            for i in range(nf):
                y = scatter(y, isets[i], subs[i].mult(xs[i]))
            return y
        if ftype in ("multiplicative", "symmetric_multiplicative"):
            ys = [jnp.zeros_like(v) for v in xs]
            order = list(range(nf))
            if ftype == "symmetric_multiplicative":
                order = order + order[-2::-1]
            for i in order:
                ri = xs[i]
                for j in range(nf):
                    if j != i:
                        ri = ri - Bop[i][j].mult(ys[j])
                ys[i] = subs[i].mult(ri)
            for i in range(nf):
                y = scatter(y, isets[i], ys[i])
            return y
        if ftype == "schur":
            x0, x1 = xs[0], xs[1]
            B0, B1 = subs[0], subs[1]
            A01, A10 = Bop[0][1], Bop[1][0]
            if sfact == "diag":
                y0 = B0.mult(x0)
                y1 = -B1.mult(x1)
            elif sfact == "lower":
                y0 = B0.mult(x0)
                y1 = B1.mult(x1 - A10.mult(y0))
            elif sfact == "upper":
                y1 = B1.mult(x1)
                y0 = B0.mult(x0 - A01.mult(y1))
            else:  # full
                t0 = B0.mult(x0)
                y1 = B1.mult(x1 - A10.mult(t0))
                y0 = B0.mult(x0 - A01.mult(y1))
            y = scatter(y, isets[0], y0)
            y = scatter(y, isets[1], y1)
            return y
        raise Error(f"fieldsplit type {ftype}")

    return operator.Op(mult=mult)


PC.register_impl("sor", _PCSOR)
PC.register_impl("asm", _PCASM)
PC.register_impl("composite", _PCComposite)
PC.register_impl("ksp", _PCKSP)
PC.register_impl("fieldsplit", _PCFieldSplit)
operator.register_binder("pc_sor", _bind_pc_sor)
operator.register_binder("pc_asm", _bind_pc_asm)
operator.register_binder("pc_composite", _bind_pc_composite)
operator.register_binder("pc_ksp", _bind_pc_ksp)
operator.register_binder("pc_fieldsplit", _bind_pc_fieldsplit)
