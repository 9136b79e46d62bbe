"""DMDA: structured-grid manager (1/2/3-D, dof per node, stencil ghosts).

Behavioral reference: src/dm/impls/da (DMDACreate2d da2.c:810 — box/star
stencil, width s, dof, boundary types; DMCreateMatrix_DA fdda.c stencil
preallocation + MatSetValuesStencil; Q1 interpolation dainterp.c:39-605
used by PCMG; DMDAGetCorners).

TPU-first redesign: a DMDA vector IS a jnp array over the natural ordering
(x fastest: idx = ((k*ny + j)*nx + i)*dof + c), so stencil application maps
to shifted slices (the DIA fast path in mat/aij.py) and a "local/ghosted
form" is only materialized per shard for the multi-chip slab decomposition.
Grid-aware assembly is vectorized COO over index arrays, not a per-point
MatSetValues loop.
"""

from __future__ import annotations

import numpy as np

from ..mat.aij import MatAIJ
from ..sys.error import Error
from ..vec.vec import Vec
from .dm import DM


class DMDA(DM):
    def __init__(self, comm=None, **kw):
        super().__init__(comm, **kw)
        self.dim = None
        self.sizes = None            # (nx,) / (nx,ny) / (nx,ny,nz)
        self.dof = 1
        self.stencil_width = 1
        self.stencil_type = "star"   # star | box
        self.boundary = ("none",) * 3
        self._refine_factor = 2

    # ---- creation (da1.c/da2.c/da3.c) ----

    @classmethod
    def create(cls, dim=None, sizes=None, dof=1, stencil_width=1,
               stencil_type="star", boundary_type=None, comm=None,
               setup=True):
        da = cls(comm)
        sizes = tuple(int(s) for s in np.atleast_1d(sizes))
        da.dim = dim if dim is not None else len(sizes)
        da.sizes = sizes
        da.dof = dof
        da.stencil_width = stencil_width
        da.stencil_type = stencil_type
        if boundary_type is not None:
            bt = tuple(boundary_type) if isinstance(boundary_type, (list, tuple)) \
                else (boundary_type,) * da.dim
            da.boundary = tuple(bt) + ("none",) * (3 - len(bt))
        if setup:
            da.setUp()
        return da

    def setUp(self):
        if len(self.sizes) != self.dim:
            raise Error(f"DMDA: {len(self.sizes)} sizes for dim {self.dim}")
        return self

    def setFromOptions(self):
        for ax, name in zip(range(self.dim), ("x", "y", "z")):
            v = self.opt("get_int", f"da_grid_{name}", None)
            if v:
                s = list(self.sizes)
                s[ax] = v
                self.sizes = tuple(s)
        n = self.opt("get_int", "da_refine", None)
        if n:
            da = self
            for _ in range(n):
                da = da.refine()
            self.sizes = da.sizes
        return self

    # ---- geometry ----

    @property
    def N(self):
        return int(np.prod(self.sizes)) * self.dof

    def getCorners(self):
        """(starts, sizes) of the owned region — whole domain in the
        single-program model (sharding is an execution detail)."""
        return (0,) * self.dim, self.sizes

    def getGhostCorners(self):
        return (0,) * self.dim, self.sizes

    def getInfo(self):
        return {"dim": self.dim, "sizes": self.sizes, "dof": self.dof,
                "stencil_width": self.stencil_width,
                "stencil_type": self.stencil_type, "boundary": self.boundary}

    def dof_index(self, i, j=None, k=None, c=0):
        """Flat dof index of node (i,j,k), component c."""
        i = np.asarray(i)
        idx = i
        if self.dim >= 2:
            idx = idx + np.asarray(j) * self.sizes[0]
        if self.dim >= 3:
            idx = idx + np.asarray(k) * self.sizes[0] * self.sizes[1]
        return idx * self.dof + c

    # ---- vectors ----

    def createGlobalVector(self) -> Vec:
        v = Vec(self.comm)
        v.setSizes(self.N)
        v.setUp()
        v._dm = self
        return v

    createLocalVector = createGlobalVector  # single-program: same object

    def getVecArray(self, vec: Vec):
        """Host numpy view shaped (nz,ny,nx[,dof]) for grid-indexed setup
        (DMDAVecGetArray model). Returns a writable copy; call
        setVecArray to store it back."""
        shape = tuple(self.sizes[::-1])
        if self.dof > 1:
            shape = shape + (self.dof,)
        return np.asarray(vec.getArray()).reshape(shape).copy()

    def setVecArray(self, vec: Vec, arr):
        vec.setArray(np.asarray(arr).reshape(-1))

    def globalToLocal(self, g, l=None, **kw):
        if l is not None:
            l.array = g.array
            return l
        return g

    def localToGlobal(self, l, g=None, **kw):
        if g is not None:
            g.array = l.array
            return g
        return l

    # ---- matrix (fdda.c) ----

    def createMatrix(self, preallocate_pattern=False) -> MatAIJ:
        A = MatAIJ(self.comm)
        A.setSizes((self.N, self.N))
        if self.dof > 1:
            from ..parallel.layout import Layout
            A.row_layout = Layout(self.N, bs=self.dof)
            A.col_layout = Layout(self.N, bs=self.dof)
        A._dm = self
        if preallocate_pattern:
            self.preallocateStencilPattern(A)
        return A

    def preallocateStencilPattern(self, A: MatAIJ):
        """Fill A with the explicit stencil nonzero PATTERN (zeros), the
        DMCreateMatrix_DA preallocation (fdda.c) — enables FD-coloring
        Jacobians without a user-assembled matrix."""
        xyz = self.node_coords()
        cols_all, rows_all = [], []
        n_ax = self.sizes
        for off in self.stencil_offsets():
            shifted = xyz[:, : self.dim] + np.asarray(off)
            ok = np.ones(len(xyz), dtype=bool)
            for ax in range(self.dim):
                if self.boundary[ax] == "periodic":
                    shifted[:, ax] %= n_ax[ax]
                else:
                    ok &= (shifted[:, ax] >= 0) & (shifted[:, ax] < n_ax[ax])
            src = self.dof_index(*(xyz[ok, ax] for ax in range(self.dim)))
            dst = self.dof_index(*(shifted[ok, ax] for ax in range(self.dim)))
            for cs in range(self.dof):
                for cd in range(self.dof):
                    rows_all.append(src * 1 + cs if self.dof > 1 else src)
                    cols_all.append(dst * 1 + cd if self.dof > 1 else dst)
        rows = np.concatenate(rows_all)
        cols = np.concatenate(cols_all)
        import scipy.sparse as sp
        S = sp.csr_matrix((np.ones(len(rows)), (rows, cols)),
                          shape=(self.N, self.N))
        S.sum_duplicates()
        A.setValuesCSR(S.indptr, S.indices, np.zeros(S.nnz))
        A.assemble()
        return A

    def stencil_offsets(self):
        """Node-offset list of the stencil (dim-tuples)."""
        s = self.stencil_width
        rng = range(-s, s + 1)
        offs = []
        if self.dim == 1:
            offs = [(dx,) for dx in rng]
        elif self.dim == 2:
            offs = [(dx, dy) for dy in rng for dx in rng]
        else:
            offs = [(dx, dy, dz) for dz in rng for dy in rng for dx in rng]
        if self.stencil_type == "star":
            offs = [o for o in offs if sum(v != 0 for v in o) <= 1]
        return offs

    def interior_mask(self, width=1):
        """Boolean (flat node) mask of nodes at least `width` from every
        non-periodic boundary."""
        grids = np.meshgrid(*[np.arange(s) for s in self.sizes],
                            indexing="ij")  # x, y, z order
        m = np.ones(self.sizes[::-1], dtype=bool).reshape(-1)
        flat = np.ones(int(np.prod(self.sizes)), dtype=bool)
        for ax, g in enumerate(grids):
            if self.boundary[ax] == "periodic":
                continue
            gi = g.transpose(*range(self.dim - 1, -1, -1)).reshape(-1)
            flat &= (gi >= width) & (gi < self.sizes[ax] - width)
        return flat

    def node_coords(self):
        """(nnode, dim) integer node coordinates in x,y,z columns."""
        grids = np.meshgrid(*[np.arange(s) for s in self.sizes],
                            indexing="ij")
        cols = [g.transpose(*range(self.dim - 1, -1, -1)).reshape(-1)
                for g in grids]
        return np.stack(cols, axis=1)

    # ---- hierarchy (dainterp.c / DMCoarsen) ----

    def coarsen(self):
        cs = []
        for ax, s in enumerate(self.sizes):
            if self.boundary[ax] == "periodic":
                if s % self._refine_factor:
                    raise Error(f"DMDA: cannot coarsen periodic size {s}")
                cs.append(s // self._refine_factor)
            else:
                if (s - 1) % self._refine_factor:
                    raise Error(f"DMDA: cannot coarsen size {s} "
                                f"(need s = {self._refine_factor}*sc - 1)")
                cs.append((s - 1) // self._refine_factor + 1)
        da = DMDA.create(self.dim, tuple(cs), self.dof, self.stencil_width,
                         self.stencil_type, comm=self.comm)
        da.boundary = self.boundary
        da._compute_operators = self._compute_operators
        da._compute_rhs = self._compute_rhs
        da.app_ctx = self.app_ctx
        return da

    def refine(self):
        rs = []
        for ax, s in enumerate(self.sizes):
            if self.boundary[ax] == "periodic":
                rs.append(s * self._refine_factor)
            else:
                rs.append(self._refine_factor * (s - 1) + 1)
        da = DMDA.create(self.dim, tuple(rs), self.dof, self.stencil_width,
                         self.stencil_type, comm=self.comm)
        da.boundary = self.boundary
        da._compute_operators = self._compute_operators
        da._compute_rhs = self._compute_rhs
        da.app_ctx = self.app_ctx
        return da

    def _interp_1d(self, nf, nc, periodic):
        """1-D vertex-centered Q1 prolongation (dainterp.c:39 DA_Q1)."""
        import scipy.sparse as sp
        rows, cols, vals = [], [], []
        if periodic:
            ratio = nf // nc
            for fi in range(nf):
                x = fi / ratio
                j0 = int(np.floor(x))
                w1 = x - j0
                if w1 == 0:
                    rows.append(fi); cols.append(j0 % nc); vals.append(1.0)
                else:
                    rows += [fi, fi]
                    cols += [j0 % nc, (j0 + 1) % nc]
                    vals += [1 - w1, w1]
        else:
            for fi in range(nf):
                x = fi * (nc - 1) / (nf - 1)
                j0 = min(int(np.floor(x)), nc - 2)
                w1 = x - j0
                if w1 < 1e-14:
                    rows.append(fi); cols.append(j0); vals.append(1.0)
                elif w1 > 1 - 1e-14:
                    rows.append(fi); cols.append(j0 + 1); vals.append(1.0)
                else:
                    rows += [fi, fi]
                    cols += [j0, j0 + 1]
                    vals += [1 - w1, w1]
        return sp.csr_matrix((vals, (rows, cols)), shape=(nf, nc))

    def createInjection(self, coarse: "DMDA"):
        """State injection fine -> coarse (DMCreateInjection): coarse node
        (i,j,k) takes the value at fine node (2i,2j,2k). Returns a callable
        over flat arrays (and its numpy form via .np)."""
        import jax.numpy as jnp
        fshape = tuple(self.sizes[::-1])
        cshape = tuple(coarse.sizes[::-1])
        sl = tuple(slice(0, None, 2) for _ in fshape)

        def inject(xf):
            return jnp.asarray(xf)[: int(np.prod(fshape))] \
                .reshape(fshape)[sl].reshape(-1)

        def inject_np(xf):
            return np.asarray(xf)[: int(np.prod(fshape))] \
                .reshape(fshape)[sl].reshape(-1)

        inject.np = inject_np
        return inject

    def createInterpolation(self, coarse: "DMDA"):
        """Q1 tensor-product prolongation coarse -> self. Factor-2
        vertex-centered scalar grids get the gather-free slicing operator
        (dm/interp.py); everything else the assembled matrix."""
        if (all(b == "none" for b in self.boundary[: self.dim])
                and all(self.sizes[ax] == 2 * coarse.sizes[ax] - 1
                        for ax in range(self.dim))):
            from .interp import MatInterpQ1
            return MatInterpQ1(tuple(self.sizes[::-1]),
                               tuple(coarse.sizes[::-1]), comm=self.comm,
                               dof=self.dof)
        import scipy.sparse as sp
        P = None
        # kron order: slowest axis first => z, y, x
        for ax in range(self.dim - 1, -1, -1):
            p1 = self._interp_1d(self.sizes[ax], coarse.sizes[ax],
                                 self.boundary[ax] == "periodic")
            P = p1 if P is None else sp.kron(P, p1, format="csr")
        if self.dof > 1:
            P = sp.kron(P, sp.eye(self.dof), format="csr")
        M = MatAIJ.from_scipy(P.tocsr(), comm=self.comm)
        return M

    def view(self, viewer=None):
        names = "MNP"
        dims = " ".join(f"{names[i]}={self.sizes[i]}" for i in range(self.dim))
        print(f"DMDA Object: dim={self.dim} {dims} dof={self.dof} "
              f"stencil width={self.stencil_width} type={self.stencil_type}")
