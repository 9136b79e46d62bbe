"""PCGAMG: smoothed-aggregation algebraic multigrid (the flagship PC).

Behavioral reference: src/ksp/pc/impls/gamg/gamg.c (PCSetUp_GAMG :538 level
loop, coarse_eq_limit=50, Chebyshev+Jacobi smoothers with SA eigenvalue
reuse :934-941) and agg.c (strength graph :752, MIS aggregation via
mat/graphops/coarsen/impls/mis/mis.c with randomized/min-degree greedy
order, square-graph aggressive coarsening on the first level :1311,
tentative prolongator by per-aggregate QR of the near-nullspace :592,
prolongator smoothing P <- (I - 1.4/emax D^-1 A) P0 :1912-1922).

TPU split: the ENTIRE setup (graph, aggregation, QR, SpGEMM/PtAP) is
host-side numpy/scipy — it runs once per operator, exactly like PETSc's
symbolic phase runs on CPU. The solve-phase V-cycle is the pure jitted
function from pc/mg.py with all numeric data in HBM.
"""

from __future__ import annotations

import numpy as np

from ..ksp.cheby import estimate_emax
from ..sys.error import Error
from .mg import MGLevelSpec, _PCMG, _host_emax
from .pc import PC


# ---------------------------------------------------------------------
# host-side setup pieces
# ---------------------------------------------------------------------

def strength_graph(A_sp, bs=1, threshold=-1.0, index=None):
    """Nodal strength-of-connection graph (agg.c:752 PCGAMGCreateGraph_AGG):
    |A| symmetrized; bs>1 collapses dof blocks to one node (sum of |values|);
    entries with |a_ij| <= threshold * sqrt(|a_ii a_jj|) dropped
    (threshold < 0 keeps everything).  index: restrict the collapse to
    these dof components within each block
    (-pc_gamg_mat_coarsen_strength_index, MatCoarsenSetStrengthIndex)."""
    import scipy.sparse as sp
    if bs == 1 and index is None:
        # hot scalar path: fused |A|+|A|^T + filter in native C++
        # (the reference's graph phase is compiled C, agg.c:752)
        from .. import native
        G = native.strength_sym(A_sp.tocsr(), threshold)
        if G is not None:
            return G
    G = abs(A_sp).tocsr()
    if bs > 1:
        n = A_sp.shape[0] // bs
        if index is not None:
            sel = np.isin(np.arange(A_sp.shape[0]) % bs,
                          np.asarray(index)).astype(np.float64)
            G = (sp.diags(sel) @ G @ sp.diags(sel)).tocsr()
        # collapse: S = C^T |A| C with C the bs-block indicator
        C = sp.csr_matrix((np.ones(A_sp.shape[0]),
                           (np.arange(A_sp.shape[0]),
                            np.arange(A_sp.shape[0]) // bs)),
                          shape=(A_sp.shape[0], n))
        G = (C.T @ G @ C).tocsr()
    G = (G + G.T).tocsr()
    if threshold >= 0:
        d = np.sqrt(np.abs(G.diagonal()))
        d[d == 0] = 1.0
        rows = np.repeat(np.arange(G.shape[0]), np.diff(G.indptr))
        keep = np.abs(G.data) > threshold * d[rows] * d[G.indices]
        keep |= G.indices == rows  # never drop the diagonal
        G = sp.csr_matrix((G.data[keep], G.indices[keep],
                           np.concatenate([[0], np.cumsum(
                               np.bincount(rows[keep], minlength=G.shape[0]))])),
                          shape=G.shape)
    return G


def mis_aggregate(G, perm=None):
    """Greedy MIS aggregation (mis.c:89-207, strict_aggs serial semantics):
    visit vertices in `perm` order; an undecided vertex becomes an aggregate
    root and captures its undecided neighbors; isolated vertices (only a
    diagonal entry) are removed (no aggregate — zero row in P).

    Returns agg: (n,) int array, aggregate id per vertex, -1 for removed."""
    n = G.shape[0]
    indptr, indices = G.indptr, G.indices
    if perm is None:
        # reference default: random visit order (PCGAMGCoarsen_AGG
        # agg.c:1279-1303 shuffle); deterministic seed for reproducible runs
        perm = np.random.default_rng(2026).permutation(n)
    from .. import native
    out = native.mis_aggregate(indptr.astype(np.int64),
                               indices.astype(np.int64),
                               np.asarray(perm, dtype=np.int64))
    if out is not None:
        return out
    agg = np.full(n, -2, dtype=np.int64)   # -2 undecided
    roots = []
    for v in perm:
        if agg[v] != -2:
            continue
        nbrs = indices[indptr[v]:indptr[v + 1]]
        if len(nbrs) < 2:            # singleton: remove (mis.c:117-128)
            agg[v] = -1
            continue
        agg[v] = len(roots)
        und = nbrs[agg[nbrs] == -2]
        agg[und] = agg[v]
        roots.append(v)
    agg[agg == -2] = -1
    return agg, len(roots), np.asarray(roots, dtype=np.int64)


def fix_aggregates_with_square(G1, agg, roots):
    """Post-MIS(G^2) fixup (agg.c:913 fixAggregatesWithSquare): every root
    steals its DIRECT (unsquared-graph) neighbors into its own aggregate —
    turning distance-2 MIS roots into G1-connected balls and absorbing
    removed singletons. Roots processed in index order; later roots win
    (reference lid-order semantics)."""
    from .. import native
    out = native.fix_aggregates(G1.indptr.astype(np.int64),
                                G1.indices.astype(np.int64),
                                np.asarray(roots, dtype=np.int64), agg)
    if out is not None:
        return out
    indptr, indices = G1.indptr, G1.indices
    n = G1.shape[0]
    is_root = np.zeros(n, dtype=bool)
    is_root[roots] = True
    for a, r in enumerate(roots):
        nbrs = indices[indptr[r]:indptr[r + 1]]
        steal = nbrs[~is_root[nbrs]]
        agg[steal] = a
    agg[roots] = np.arange(len(roots))
    return agg


def square_graph(G):
    """Aggressive coarsening graph: boolean G^2 (distance-2 adjacency,
    PCGAMGSquareGraph_GAMG)."""
    import scipy.sparse as sp
    B = G.copy()
    B.data = np.ones_like(B.data)
    G2 = (B @ B).tocsr()
    G2.data = np.ones_like(G2.data)
    return G2


def mis_aggregate_squared(G, perm=None):
    """MIS aggregation on the IMPLICIT squared graph — identical greedy
    semantics to mis_aggregate(square_graph(G), perm), but G^2 (~5x the
    nnz at 27-point) is never materialized; the distance-2 expansion runs
    only for vertices still undecided at visit time. This was the single
    largest cost of the host setup (35 s of a 48 s 128^3 setup)."""
    n = G.shape[0]
    if perm is None:
        perm = np.random.default_rng(2026).permutation(n)
    from .. import native
    out = native.mis2_aggregate(G.indptr.astype(np.int64),
                                G.indices.astype(np.int64),
                                np.asarray(perm, dtype=np.int64))
    if out is not None:
        return out
    return mis_aggregate(square_graph(G), perm=perm)


def _spgemm(A, B):
    """C = A @ B, native Gustavson (OpenMP) with scipy fallback."""
    from .. import native
    C = native.spgemm(A.tocsr(), B.tocsr())
    return C if C is not None else (A @ B).tocsr()


def _galerkin(cur, P):
    """Ac = P^T cur P (the MatPtAP numeric phase, mpiptap.c:215 role) via
    the native transpose + two SpGEMMs."""
    from .. import native
    Pc = P.tocsr()
    Pt = native.csr_transpose(Pc)
    Ac = (Pc.T @ cur @ Pc).tocsr() if Pt is None \
        else _spgemm(Pt, _spgemm(cur, Pc))
    Ac.eliminate_zeros()
    return Ac


def _smooth_prol(cur, P, dinv, omega):
    """P <- (I - omega D^-1 cur) P (agg.c:1811 numeric) with the SpGEMM
    native and the row scaling done directly on the CSR data."""
    W = _spgemm(cur, P)
    W.data *= np.repeat(-omega * dinv, np.diff(W.indptr))
    out = (P + W).tocsr()
    out.sort_indices()
    return out


def tentative_prolongator(agg, nagg, Bn, bs=1):
    """P0 and the coarse near-nullspace by per-aggregate QR (formProl0
    agg.c:592: LAPACK geqrf/orgqr per aggregate; here batched by aggregate
    size). Bn: (n_fine_dofs, nvec) near-nullspace. agg is NODAL (length
    n/bs); each node carries bs dofs."""
    import scipy.sparse as sp
    nnode = len(agg)
    nf = nnode * bs
    nvec = Bn.shape[1]
    nc = nagg * nvec
    rows_l, cols_l, vals_l = [], [], []
    Bc = np.zeros((nc, nvec))
    order = np.argsort(agg, kind="stable")
    order = order[agg[order] >= 0]
    bounds = np.searchsorted(agg[order], np.arange(nagg + 1))
    sizes = np.diff(bounds)
    for sz in np.unique(sizes):
        which = np.nonzero(sizes == sz)[0]
        # (len(which), sz) node ids per aggregate of this size
        nodes = order[bounds[which][:, None] + np.arange(sz)[None, :]]
        dofs = (nodes[:, :, None] * bs + np.arange(bs)[None, None, :]) \
            .reshape(len(which), sz * bs)
        blocks = Bn[dofs]                       # (na, sz*bs, nvec)
        if sz * bs < nvec:                      # undersized aggregate: pad
            blocks = np.concatenate(
                [blocks, np.zeros((len(which), nvec - sz * bs, nvec))], axis=1)
        q, r = np.linalg.qr(blocks)             # batched thin QR
        q = q[:, :sz * bs, :]
        # sign-fix: make R diagonals positive (deterministic, LAPACK-like)
        sgn = np.sign(np.einsum("aii->ai", r))
        sgn[sgn == 0] = 1.0
        q = q * sgn[:, None, :]
        r = r * sgn[:, :, None]
        ii = np.broadcast_to(dofs[:, :, None], q.shape)
        jj = (which[:, None, None] * nvec
              + np.broadcast_to(np.arange(nvec)[None, None, :], q.shape))
        rows_l.append(ii.ravel()); cols_l.append(jj.ravel())
        vals_l.append(q.ravel())
        Bc[(which[:, None] * nvec + np.arange(nvec)[None, :]).ravel()] = \
            r.reshape(-1, nvec)
    P0 = sp.csr_matrix((np.concatenate(vals_l),
                        (np.concatenate(rows_l), np.concatenate(cols_l))),
                       shape=(nf, nc))
    P0.eliminate_zeros()
    return P0, Bc


class MatSmoothedProl:
    """Factored smoothed prolongator P = (I - omega D^-1 A) P0 kept
    UNASSEMBLED for scalar problems (nvec=1): P0 x_c = w * x_c[agg] (small
    gather), so P rides the level operator's fast SpMV instead of an
    unstructured 8-entries-per-row gather — on TPU (no hardware gather)
    this is ~the difference between the dnd stencil path and the ELL path.
    Presents the standard Mat (meta, data) contract; to_scipy() returns the
    assembled form for host RAP."""

    def __init__(self, A_level, agg, w, dinv, omega, P_scipy, comm):
        import jax.numpy as jnp
        from .. import config as _cfg
        rd = _cfg.real_dtype()
        self.comm = comm
        self._P_scipy = P_scipy
        self._A = A_level
        nf, nc = P_scipy.shape
        self._shape = (nf, nc)
        npad = getattr(A_level, "row_layout", None)
        npad = npad.Npad if npad is not None else nf
        self._meta_v = ("prol_sa", A_level.meta, nf, nc, int(npad))
        self._data_v = {
            "A": A_level.device_data(),
            "agg": jnp.asarray(np.where(agg >= 0, agg, nc)),
            "w": jnp.asarray(np.where(agg >= 0, w, 0.0), dtype=rd),
            "dinv": jnp.asarray(dinv, dtype=rd),
            "omega": jnp.asarray(omega, dtype=rd),
        }

    @property
    def meta(self):
        return self._meta_v

    def device_data(self):
        return self._data_v

    def getSize(self):
        return self._shape

    def to_scipy(self):
        return self._P_scipy

    def transpose(self):
        from ..mat.aij import MatAIJ
        return MatAIJ.from_scipy(self._P_scipy.T.tocsr(), comm=self.comm)


def _bind_prol_sa(meta, data):
    import jax.numpy as jnp
    from ..ops import operator as _op
    # npad: the fine operator's padded length — a sharded fine level
    # requires exactly (npad,) inputs (shard_map divisibility), so the
    # factored apply pads before A and slices after (round-2 fix for
    # N % nshards != 0 meshes reaching the serial continuation)
    _, A_meta, nf, nc = meta[:4]
    npad = meta[4] if len(meta) > 4 else nf
    Aop = _op.bind(A_meta, data["A"])
    agg, w, dinv, omega = data["agg"], data["w"], data["dinv"], data["omega"]

    def p0(xc):
        xc_ext = jnp.concatenate([xc, jnp.zeros((1,), xc.dtype)])
        return w * xc_ext[agg]

    def p0t(y):
        import jax
        return jax.ops.segment_sum(w * y, agg, num_segments=nc + 1)[:nc]

    def _pad(v):
        return v if npad == nf else jnp.pad(v, (0, npad - nf))

    def mult(xc):
        y = p0(xc[:nc])
        out = y - omega * (dinv * Aop.mult(_pad(y))[:nf])
        return _pad(out)

    def mult_t(r):
        rr = r[:nf]
        az = (Aop.mult_t(_pad(dinv * rr)) if Aop.mult_t is not None
              else Aop.mult(_pad(dinv * rr)))  # A symmetric in SA
        z = rr - omega * az[:nf]
        return p0t(z)

    return _op.Op(mult=mult, mult_t=mult_t)


from ..ops import operator as _operator_mod  # noqa: E402

_operator_mod.register_binder("prol_sa", _bind_prol_sa)


class _PCGAMG(_PCMG):
    """Smoothed-aggregation AMG setup driving the shared MG machinery."""

    def __init__(self, pc):
        super().__init__(pc)
        self.coarse_eq_limit = 50
        self.max_levels = 10
        self.threshold = [-1.0]
        self.nsmooths = 1
        self.aggressive_levels = 1
        self.square_aggressive = True
        self.coarsen_type = "mis"      # mis | hem
        self.hem_rounds = 3
        self.strength_index = None
        self.gamg_type = "agg"         # agg | classical (classical.c)
        self.classical_type = "direct"  # direct | standard
        self.classical_nsmooths = 0
        # TPU redesign (no reference equivalent — gamg.c always
        # aggregates): operators that declare a structured grid get
        # gather-free geometric first levels; see _structured_head
        self.structured = True
        self.structured_limit = 3000
        # device Galerkin RAP by stencil probing (gamg_device.py): the
        # hierarchy above the aggregation tail never leaves HBM
        self.structured_device = True

    def set_from_options(self):
        super().set_from_options()
        o = self.pc.opt
        n = o("get_int", "pc_gamg_coarse_eq_limit", None)
        if n:
            self.coarse_eq_limit = n
        n = o("get_int", "pc_gamg_aggressive_coarsening", None)
        if n is not None:
            self.aggressive_levels = n
        n = o("get_int", "pc_gamg_agg_nsmooths", None)
        if n is not None:
            self.nsmooths = n
        t = o("get_string", "pc_gamg_threshold", None)
        if t:
            self.threshold = [float(x) for x in t.split(",")]
        n = o("get_int", "pc_mg_levels", None)
        if n:
            self.max_levels = n
        t = o("get_string", "pc_gamg_mat_coarsen_type", None)
        if t:
            self.coarsen_type = t
        n = o("get_int", "pc_gamg_mat_coarsen_max_it", None)
        if n:
            self.hem_rounds = n
        t = o("get_string", "pc_gamg_mat_coarsen_strength_index", None)
        if t:
            self.strength_index = [int(x) for x in t.split(",")]
        t = o("get_string", "pc_gamg_type", None)
        if t:
            self.gamg_type = t
        t = o("get_string", "pc_gamg_classical_type", None)
        if t:
            self.classical_type = t
        n = o("get_int", "pc_gamg_classical_nsmooths", None)
        if n is not None:
            self.classical_nsmooths = n
        b = o("get_bool", "pc_gamg_structured_coarsening", None)
        if b is not None:
            self.structured = b
        n = o("get_int", "pc_gamg_structured_limit", None)
        if n:
            self.structured_limit = n
        b = o("get_bool", "pc_gamg_structured_device", None)
        if b is not None:
            self.structured_device = b

    def _threshold(self, level):
        if level < len(self.threshold):
            return self.threshold[level]
        return self.threshold[-1]

    def _dist_levels(self, A, levels):
        """Distributed setup for sharded scalar operators: every phase runs
        on per-shard row blocks (ShardedCSR) with explicit owner-keyed
        exchanges — no global matrix is ever formed while the level is
        distributed (the round-1 to_scipy() full gather is gone; matches
        the reference's parallel setup, mpiptap.c:215 + mis.c:89). Once the
        level is small the operator is collapsed to one replicated matrix
        (the telescope / process-reduction pattern, gamg.c:155-201) and the
        serial loop continues from there. Returns (tail CSR, tail near-
        nullspace, level index reached)."""
        import scipy.sparse as sp
        from ..mat.aij import MatAIJ
        from ..parallel.mesh import comm_self
        from .gamg_dist import build_level

        S = A.shardcsr()
        Bn = getattr(A, "near_nullspace", None)
        if Bn is None:
            bvec = S.row_layout.valid_mask_np.astype(np.float64)
        else:
            v = np.asarray(Bn.vectors if hasattr(Bn, "vectors") else Bn)
            bvec = np.zeros(S.row_layout.Npad)
            bvec[:A.row_layout.N] = v.reshape(-1)[:A.row_layout.N]
        collapse = max(self.coarse_eq_limit,
                       self.pc.opt("get_int", "pc_gamg_dist_coarse_limit",
                                   None) or 2000)
        nreal = A.row_layout.N
        cur, level = S, 0
        while nreal > collapse and level < self.max_levels - 1:
            aggressive = (level < self.aggressive_levels
                          and self.square_aggressive)
            P, Ac, Bc, emax, nagg = build_level(
                cur, bvec, threshold=self._threshold(level),
                aggressive=aggressive, nsmooths=self.nsmooths)
            if nagg == 0 or nagg >= nreal:
                break
            levels[-1].emin, levels[-1].emax = self.eig_bounds(emax)
            levels[-1].P = MatAIJ.from_sharded(P, A.comm)
            levels.append(MGLevelSpec(MatAIJ.from_sharded(Ac, A.comm)))
            cur, bvec, nreal = Ac, Bc, nagg
            level += 1
        # collapse to the replicated tail: gap rows (empty, padded coarse
        # numbering raggedness) become identity rows so the serial
        # continuation and the coarse LU stay nonsingular
        Ag = cur.to_global_csr().tocsr()
        n = Ag.shape[0]
        if Ag.shape[1] != n:
            Ag = sp.csr_matrix(Ag[:, :n])
        gaps = np.diff(Ag.indptr) == 0
        if gaps.any():
            Ag = (Ag + sp.diags(gaps.astype(np.float64))).tocsr()
        if level > 0:
            levels[-1].A = MatAIJ.from_scipy(Ag, comm=comm_self())
        return Ag, bvec.reshape(-1, 1), level

    def _structured_head(self, A_sp, shape, levels, coarse_comm, level):
        """Gather-free structured first levels (TPU redesign; no reference
        equivalent — gamg.c always aggregates). On TPU the V-cycle's
        unstructured P0 gather dominated the apply (261 ms/cycle at 128^3
        vs 0.41 ms/CG-iteration, PERF.md), so fine operators that declare
        a grid (`Mat.setStencilGrid` / DMDA matrices) coarsen their first
        levels geometrically: factor-2 linear interpolation applied as
        pure slicing (dm/interp.py MatInterpQ1, even and odd sizes),
        Galerkin RAP on the host CSR via the native SpGEMM, and coarse
        operators re-bound as dnd grid stencils (27-point, staying on the
        fused-stencil SpMV path). Smoothed aggregation takes over once
        the grid is below -pc_gamg_structured_limit. Disable with
        -pc_gamg_structured_coarsening 0 for reference-faithful behavior.
        Returns (tail host CSR, level index reached)."""
        from ..dm.interp import MatInterpQ1
        from ..mat.aij import MatAIJ
        cur, cur_shape = A_sp.tocsr(), shape
        limit = max(self.coarse_eq_limit, self.structured_limit)
        while (int(np.prod(cur_shape)) > limit and min(cur_shape) >= 4
               and level < self.max_levels - 1):
            cshape = tuple((s + 1) // 2 for s in cur_shape)
            Pm = MatInterpQ1(cur_shape, cshape, comm=coarse_comm)
            Ac = _galerkin(cur, Pm.to_scipy())
            d = cur.diagonal()
            dinv = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 1.0)
            emax = _host_emax(cur, dinv)
            levels[-1].emin, levels[-1].emax = self.eig_bounds(emax)
            levels[-1].P = Pm
            Am = MatAIJ.from_scipy(Ac, comm=coarse_comm)
            Am.setStencilGrid(cshape)
            levels.append(MGLevelSpec(Am))
            cur, cur_shape = Ac, cshape
            level += 1
        return cur, level

    def _structured_head_device(self, Afine, levels):
        """Device-resident geometric first levels: Galerkin RAP by
        period-3 stencil probing + device Arnoldi eig bounds
        (gamg_device.py). Nothing crosses host<->device until the small
        aggregation tail is downloaded once as CSR. Returns
        (tail host CSR, level index reached)."""
        from ..dm.interp import MatInterpQ1
        from ..ops import stencil_build
        from ..parallel.mesh import comm_self
        from . import gamg_device as gd
        import jax.numpy as jnp
        meta, data = Afine.meta, Afine.device_data()
        cur_shape = tuple(int(s) for s in meta[1])
        level = len(levels) - 1
        limit = max(self.coarse_eq_limit, self.structured_limit)
        # -pc_mg_dtype single: probe, bound, and STORE the head in f32 —
        # the hierarchy only ever feeds the f32 cycle, and the f64 twin
        # of the level-1 planes alone is 3.6 GB at 512^3 (OOMs the chip)
        hd = jnp.float32 if self.dtype == "f32" else None
        # defer every Lanczos fetch: the eig bounds feed the SMOOTHER
        # setup (build_mg_meta_data), not the probing chain, so all
        # levels' (alphas, betas) stay device futures and come back in
        # ONE round trip at the end (a tunneled fetch costs 0.3-2 s
        # EACH; this was 2 x nlevels trips — round-5 profiling)
        pend = []
        while (int(np.prod(cur_shape)) > limit and min(cur_shape) >= 4
               and level < self.max_levels - 1):
            cshape = tuple((s + 1) // 2 for s in cur_shape)
            pend.append((levels[-1],
                         gd.lanczos_futures(meta, data, dtype=hd)))
            levels[-1].P = MatInterpQ1(cur_shape, cshape,
                                       comm=comm_self())
            meta, data = gd.device_rap_dnd(meta, data, cshape, dtype=hd)
            Am = stencil_build.as_mat(meta, data, comm=comm_self())
            levels.append(MGLevelSpec(Am))
            cur_shape = cshape
            level += 1
        for lev, emax in zip((l for l, _ in pend),
                             gd.emax_batch([ab for _, ab in pend])):
            lev.emin, lev.emax = self.eig_bounds(emax)
        return gd.dnd_to_csr(meta, data), level

    def _structured_head_mpi(self, Afine, levels):
        """Sharded geometric first levels (round-3 VERDICT item 8): the
        512^3-class multi-chip configuration keeps gather-free dnd
        levels. Same period-3 probing as the serial device head, but the
        probe rides the dnd_mpi shard_map operator (boundary-plane
        ppermutes) and the Q1 transfers are global-array slicing that
        GSPMD partitions (telescope pattern ref: telescope.c +
        gamg.c:155-201). Coarsening stops when the slab divisibility or
        the structured limit breaks; the tail is gathered once as host
        CSR for the serial aggregation continuation. Returns
        (tail CSR, level index)."""
        from ..dm.interp import MatInterpQ1MPI
        from . import gamg_device as gd
        import jax.numpy as jnp
        meta, data = Afine.meta, Afine.device_data()
        cur_shape = tuple(int(s) for s in meta[3])
        Pn = int(meta[1])
        level = len(levels) - 1
        limit = max(self.coarse_eq_limit, self.structured_limit)
        hd = jnp.float32 if self.dtype == "f32" else None
        while (int(np.prod(cur_shape)) > limit and min(cur_shape) >= 4
               and level < self.max_levels - 1):
            cshape = tuple((s + 1) // 2 for s in cur_shape)
            # slab contract: coarse planes still divide evenly over the
            # shards and each shard keeps >= the halo depth (1)
            if (cshape[0] % Pn != 0 or cshape[0] // Pn < 1
                    or cur_shape[0] != 2 * cshape[0]):
                break
            emax = gd.device_emax(meta, data, dtype=hd)
            levels[-1].emin, levels[-1].emax = self.eig_bounds(emax)
            levels[-1].P = MatInterpQ1MPI(cur_shape, cshape,
                                          comm=Afine.comm)
            meta, data = gd.device_rap_dnd_mpi(meta, data, cshape,
                                               Afine.comm, dtype=hd)
            Am = gd.as_mat_mpi(meta, data, Afine.comm)
            levels.append(MGLevelSpec(Am))
            cur_shape = cshape
            level += 1
        return gd.mpi_to_csr(meta, data), level

    def build_hierarchy(self):
        import scipy.sparse as sp
        from ..mat.aij import MatAIJ
        from .gamg_device import supports_device_rap

        A = self.pc.pmat
        # multi-shard: the fine level keeps its sharded operator; every
        # coarse level is REPLICATED on one shard (the PCTelescope /
        # GAMG process-reduction pattern, gamg.c:155-201 — coarse grids
        # are latency-bound, so collapsing them beats distributing them).
        # GSPMD inserts the gather/scatter at the fine/coarse boundary.
        from ..parallel.mesh import comm_self
        coarse_comm = A.comm if A.comm.nshards == 1 else comm_self()
        bs = A.row_layout.bs or 1
        Bn = getattr(A, "near_nullspace", None)
        # level 0 uses the Pmat (smoother data and the factored
        # prolongator must match the Galerkin hierarchy built from it);
        # ONLY an explicit host_only Pmat — whose contract is "numerically
        # identical twin of the Amat, exists to avoid the device upload" —
        # lets the device Amat stand in on the finest level
        Afine = (self.pc.mat
                 if getattr(A, "host_only", False)
                 and self.pc.mat is not None else A)
        levels = [MGLevelSpec(Afine)]
        level = 0
        nvec = 1 if Bn is None else \
            (np.asarray(Bn.vectors if hasattr(Bn, "vectors") else Bn)
             .reshape(A.row_layout.N, -1).shape[1])
        dev_head = False
        if (A.comm.nshards > 1 and bs == 1 and nvec == 1
                and self.structured and self.gamg_type == "agg"
                and supports_device_rap(getattr(Afine, "meta", None)
                                        or (), kinds=("dnd_mpi",))):
            # sharded structured head: gather-free geometric dnd_mpi
            # levels on slab-sharded grid operators (the 512^3
            # multi-chip configuration), aggregation tail serial
            A_sp, level = self._structured_head_mpi(Afine, levels)
            dev_head = True
        elif (A.comm.nshards > 1 and bs == 1 and nvec == 1
                and self.coarsen_type == "mis"
                and self.gamg_type == "agg"):
            A_sp, Bn, level = self._dist_levels(A, levels)
            # continue serially on the replicated tail
        elif (self.structured and self.structured_device
                and self.gamg_type == "agg" and bs == 1 and nvec == 1
                and A.comm.nshards == 1):
            from .gamg_device import supports_device_rap
            fm = getattr(Afine, "meta", None)
            if (supports_device_rap(fm)
                    and int(np.prod(fm[1])) == A.getSize()[0]):
                # device head FIRST: the fine operator is never gathered
                # (a 512^3 to_scipy() is a 15 GB download)
                A_sp, level = self._structured_head_device(Afine, levels)
                dev_head = True
            else:
                A_sp = A.to_scipy()
        else:
            if A.comm.nshards > 1:
                from ..sys.info import warn_full_gather
                warn_full_gather(A, "PCGAMG(serial setup on sharded "
                                    "operator: bs>1/nullspace/non-MIS)")
            A_sp = A.to_scipy()
        if Bn is None:
            Bn = np.ones((A_sp.shape[0], 1))
        elif hasattr(Bn, "vectors"):
            Bn = np.asarray(Bn.vectors)
        else:
            Bn = np.asarray(Bn)
        cur = A_sp
        cur_bs = bs
        if (self.structured and self.gamg_type == "agg" and bs == 1
                and Bn.shape[1] == 1 and A.comm.nshards == 1
                and level == 0):
            shape = (getattr(A, "_grid_shape", None)
                     or getattr(Afine, "_grid_shape", None))
            if (shape is not None and len(shape) >= 2
                    and int(np.prod(shape)) == cur.shape[0]):
                cur, level = self._structured_head(cur, tuple(shape),
                                                   levels, coarse_comm,
                                                   level)
                Bn = np.ones((cur.shape[0], 1))
        while (cur.shape[0] > self.coarse_eq_limit
               and level < self.max_levels - 1):
            if self.gamg_type in ("classical", "geo"):
                # Ruge-Stüben path (classical.c): classical strength, MIS
                # coarse points, ±-split direct/standard interpolation,
                # unsmoothed by default (cls->nsmooths = 0). The "geo"
                # variant (geo.c) swaps in linearly-exact geometric
                # interpolation from PCSetCoordinates, coarsening the
                # coordinates by injection at the coarse points.
                from .gamg_classical import (classical_strength,
                                             classical_direct_prolongator,
                                             classical_standard_prolongator,
                                             geometric_prolongator)
                if self.gamg_type == "geo" and level == 0:
                    self._geo_coords = getattr(self.pc, "_coords", None)
                    if self._geo_coords is None:
                        raise Error("gamg geo needs PCSetCoordinates "
                                    "(PCGAMGGeo contract, geo.c)")
                theta = max(self._threshold(level), 0.0)
                G = classical_strength(cur, theta)
                agg, nagg, roots = mis_aggregate(G)
                if nagg == 0 or len(roots) >= cur.shape[0]:
                    break
                if self.gamg_type == "geo":
                    P = geometric_prolongator(cur, roots,
                                              self._geo_coords, theta)
                    self._geo_coords = self._geo_coords[roots]
                else:
                    mk = (classical_standard_prolongator
                          if self.classical_type == "standard"
                          else classical_direct_prolongator)
                    P = mk(cur, roots, theta)
                d = cur.diagonal()
                dinv = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 1.0)
                emax = _host_emax(cur, dinv)
                for _ in range(self.classical_nsmooths):
                    # OptProlongator_Classical_Jacobi (classical.c:794)
                    P = _smooth_prol(cur, P, dinv, 1.4 / emax)
                levels[-1].emin, levels[-1].emax = self.eig_bounds(emax)
                levels[-1].agg = np.asarray(agg)
                levels[-1].agg_bs = 1
                levels[-1].P = MatAIJ.from_scipy(P, comm=coarse_comm)
                Ac = _galerkin(cur, P)
                levels.append(MGLevelSpec(
                    MatAIJ.from_scipy(Ac, comm=coarse_comm)))
                cur = Ac
                level += 1
                continue
            G = strength_graph(cur, bs=cur_bs,
                               threshold=self._threshold(level),
                               index=self.strength_index)
            if self.coarsen_type == "hem":
                from .. import native
                # HEM consumes the SCALED graph (MatCreateGraph with
                # scale=TRUE, mpiaij.c:8070: D^-1/2 (|A|+|A|^T) D^-1/2 so
                # diag == 1) filtered by the ABSOLUTE threshold
                # (MatFilter), then matches with hem.c's exact serial
                # semantics (edge sort + max-edge gating + contraction)
                G0 = strength_graph(cur, bs=cur_bs, threshold=-1.0,
                                    index=self.strength_index)
                dg = G0.diagonal()
                s = np.where(dg != 0,
                             1.0 / np.sqrt(np.abs(np.where(dg == 0, 1.0,
                                                           dg))), 1.0)
                Gs = G0.tocsr().copy()
                rows = np.repeat(np.arange(Gs.shape[0]),
                                 np.diff(Gs.indptr))
                Gs.data = Gs.data * s[rows] * s[Gs.indices]
                thr = max(self._threshold(level), 0.0)
                keep = (np.abs(Gs.data) > thr) | (Gs.indices == rows)
                if not keep.all():
                    import scipy.sparse as _sp
                    Gs = _sp.csr_matrix(
                        (Gs.data[keep], Gs.indices[keep],
                         np.concatenate([[0], np.cumsum(np.bincount(
                             rows[keep], minlength=Gs.shape[0]))])),
                        shape=Gs.shape)
                out = native.hem_match(
                    Gs.indptr.astype(np.int64),
                    Gs.indices.astype(np.int64), Gs.data,
                    self.hem_rounds, thr)
                if out is None:
                    raise Error("hem coarsening needs the native library")
                agg, nagg = out
            else:
                aggressive = (level < self.aggressive_levels
                              and self.square_aggressive)
                if aggressive:
                    agg, nagg, roots = mis_aggregate_squared(G)
                    agg = fix_aggregates_with_square(G, agg, roots)
                else:
                    agg, nagg, roots = mis_aggregate(G)
            if nagg == 0 or nagg * Bn.shape[1] >= cur.shape[0]:
                break  # coarsening stalled
            # keep the aggregates on the level they coarsen: they define
            # the -pc_gamg_asm_use_agg smoother subdomains (gamg.c
            # PCGAMGASMCreateSubdomains)
            levels[-1].agg = np.asarray(agg)
            levels[-1].agg_bs = cur_bs
            P0, Bc = tentative_prolongator(agg, nagg, Bn, bs=cur_bs)
            d = cur.diagonal()
            dinv = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 1.0)
            emax = _host_emax(cur, dinv)
            P = P0
            for _ in range(self.nsmooths):
                P = _smooth_prol(cur, P, dinv, 1.4 / emax)
            # SA eigenvalue reuse for the level smoother (gamg.c:934)
            levels[-1].emin, levels[-1].emax = self.eig_bounds(emax)
            Ac = _galerkin(cur, P)
            if Bn.shape[1] == 1 and cur_bs == 1 and self.nsmooths <= 1:
                # scalar path: keep P factored so its apply reuses the
                # level operator's fast SpMV (no big unstructured gather)
                nf = P0.shape[0]
                rows0 = np.repeat(np.arange(nf), np.diff(P0.indptr))
                w = np.zeros(nf)
                w[rows0] = P0.data
                omega = (1.4 / emax) if self.nsmooths == 1 else 0.0
                Pm = MatSmoothedProl(levels[-1].A, agg, w, dinv, omega,
                                     P, A.comm)
            else:
                Pm = MatAIJ.from_scipy(P, comm=coarse_comm)
            levels[-1].P = Pm
            levels.append(MGLevelSpec(MatAIJ.from_scipy(Ac, comm=coarse_comm)))
            cur = Ac
            Bn = Bc
            cur_bs = Bc.shape[1] if Bc.shape[1] > 1 else 1
            # after the tentative/smoothed P the coarse problem is nodal with
            # nvec dofs per aggregate: block size = nvec
            level += 1
        self.levels = levels




PC.register_impl("gamg", _PCGAMG)


class _PCHMG(_PCGAMG):
    """PCHMG (hmg/hmg.c): hybrid multigrid — reuse the coarsening of ONE
    field component to precondition a multi-component (interlaced, block
    size bs) system. The inner GAMG runs on the component-0 submatrix
    (PCHMGExtractSubMatrix), each scalar prolongator is expanded blockwise
    P ⊗ I_bs (PCHMGExpandInterpolation), and the outer hierarchy is the
    Galerkin RAP of the FULL operator through the expanded interpolations
    — one aggregation pass amortized over all components."""

    def __init__(self, pc):
        super().__init__(pc)
        self.component = 0
        self.use_subspace_coarsening = True

    def set_from_options(self):
        super().set_from_options()
        c = self.pc.opt("get_int", "pc_hmg_component", None)
        if c is not None:
            self.component = c

    def build_hierarchy(self):
        import scipy.sparse as sp
        from ..mat.aij import MatAIJ
        from .pc import PC as _PC
        A = self.pc.pmat
        bs = A.row_layout.bs or 1
        if bs <= 1:
            return super().build_hierarchy()   # scalar: plain GAMG
        S = A.to_scipy().tocsr()
        comp = np.arange(self.component, S.shape[0], bs)
        A0 = S[comp][:, comp].tocsr()
        inner_pc = _PC(options=self.pc._options,
                       prefix=(self.pc.get_options_prefix() or "")
                       + "hmg_inner_")
        A0m = MatAIJ.from_scipy(A0, comm=A.comm)
        inner_pc.setOperators(A0m, A0m)
        inner_pc.setType("gamg")
        inner_pc.setFromOptions()
        inner_pc._impl.build_hierarchy()
        sub_levels = inner_pc._impl.levels
        levels = [MGLevelSpec(A)]
        cur = S
        for l, sl in enumerate(sub_levels[:-1]):
            Psub = sl.P.to_scipy()
            P = sp.kron(Psub, sp.eye(bs), format="csr")  # expand blockwise
            d = cur.diagonal()
            dinv = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 1.0)
            emax = _host_emax(cur, dinv)
            levels[-1].emax = 1.1 * emax
            levels[-1].emin = 0.1 * emax
            Ac = _galerkin(cur, P)
            levels[-1].P = MatAIJ.from_scipy(P, comm=A.comm)
            levels.append(MGLevelSpec(MatAIJ.from_scipy(Ac, comm=A.comm)))
            cur = Ac
        self.levels = levels


PC.register_impl("hmg", _PCHMG)
