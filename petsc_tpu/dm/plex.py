"""DMPlex (lite): unstructured meshes as a stratified point DAG + P1 FEM.

Behavioral reference: src/dm/impls/plex (plex.c cone/support/closure on the
CW-complex DAG; plexcreate.c DMPlexCreateFromCellList / box meshes;
plexfem.c FEM assembly) and src/vec/is/section (PetscSection dof layout).
This is the round-1 slice of the Plex stack: simplicial/tensor cells in
2-D/3-D, cone/support queries, boundary detection, a Section mapping
points -> dofs, and vectorized P1 (linear simplex) stiffness/mass assembly
feeding the framework's solvers. Parallel distribution and higher-order
FE spaces remain deferred (SURVEY §2.9).
"""

from __future__ import annotations

import numpy as np

from ..sys.error import Error
from ..vec.vec import Vec
from .dm import DM


class Section:
    """PetscSection: dofs per point + prefix-sum offsets, with named
    FIELDS (sub-layouts) and per-point constrained dofs
    (src/vec/is/section/interface/section.c: PetscSectionSetDof/
    SetFieldDof/SetConstraintDof/GetOffset/GetFieldOffset/Chart)."""

    def setNumFields(self, nf):
        self._fields = [np.zeros(len(self.ndof), dtype=np.int64)
                        for _ in range(nf)]
        return self

    def getNumFields(self):
        return len(getattr(self, "_fields", []))

    def setFieldDof(self, point, field, n):
        self._fields[field][np.asarray(point)] = n
        self._off = None

    def getFieldDof(self, point, field):
        return int(self._fields[field][point])

    def getFieldOffset(self, point, field):
        """Offset of a field's dofs within the point's block (fields are
        laid out consecutively per point, the reference default)."""
        base = self.getOffset(point)
        return base + int(sum(self._fields[f][point]
                              for f in range(field)))

    def setConstraintDof(self, point, n):
        if not hasattr(self, "_cdof"):
            self._cdof = np.zeros(len(self.ndof), dtype=np.int64)
        self._cdof[np.asarray(point)] = n

    def getConstraintDof(self, point):
        return int(getattr(self, "_cdof",
                           np.zeros(len(self.ndof)))[point])

    def getChart(self):
        return 0, len(self.ndof)

    def getConstrainedStorageSize(self):
        return self.getStorageSize() - int(
            getattr(self, "_cdof", np.zeros(1)).sum())

    def __init__(self, npoints):
        self.ndof = np.zeros(npoints, dtype=np.int64)
        self._off = None

    def setDof(self, point, n):
        self.ndof[np.asarray(point)] = n
        self._off = None

    def setUp(self):
        self._off = np.concatenate([[0], np.cumsum(self.ndof)])
        return self

    def getOffset(self, point):
        if self._off is None:
            self.setUp()
        return self._off[point]

    def getStorageSize(self):
        if self._off is None:
            self.setUp()
        return int(self._off[-1])


class DMPlex(DM):
    """Points are numbered cells first, then vertices (interpolated edges/
    faces omitted in the lite version — P1 needs only cells+vertices)."""

    def __init__(self, comm=None, **kw):
        super().__init__(comm, **kw)
        self.dim = 0
        self.cells = None        # (ncell, nverts_per_cell) vertex ids
        self.coords = None       # (nvert, dim)
        self.section = None

    # ---- creation (plexcreate.c) ----

    @classmethod
    def createFromCellList(cls, dim, cells, coords, comm=None):
        p = cls(comm)
        p.dim = int(dim)
        p.cells = np.asarray(cells, dtype=np.int64)
        p.coords = np.asarray(coords, dtype=np.float64)
        return p

    @classmethod
    def createBoxMesh(cls, faces, simplex=True, comm=None):
        """Unit box mesh: `faces` cells per axis; 2-D tri/quad or 3-D
        tet/hex (DMPlexCreateBoxMesh)."""
        faces = tuple(int(f) for f in np.atleast_1d(faces))
        dim = len(faces)
        if dim == 2:
            nx, ny = faces
            xs = np.linspace(0, 1, nx + 1)
            ys = np.linspace(0, 1, ny + 1)
            X, Y = np.meshgrid(xs, ys, indexing="ij")
            coords = np.stack([X.ravel(), Y.ravel()], axis=1)
            vid = np.arange((nx + 1) * (ny + 1)).reshape(nx + 1, ny + 1)
            q00 = vid[:-1, :-1].ravel()
            q10 = vid[1:, :-1].ravel()
            q11 = vid[1:, 1:].ravel()
            q01 = vid[:-1, 1:].ravel()
            if simplex:
                cells = np.concatenate([
                    np.stack([q00, q10, q11], axis=1),
                    np.stack([q00, q11, q01], axis=1)])
            else:
                cells = np.stack([q00, q10, q11, q01], axis=1)
            return cls.createFromCellList(2, cells, coords, comm)
        if dim == 3:
            nx, ny, nz = faces
            xs = [np.linspace(0, 1, n + 1) for n in faces]
            X, Y, Z = np.meshgrid(*xs, indexing="ij")
            coords = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)
            vid = np.arange((nx + 1) * (ny + 1) * (nz + 1)) \
                .reshape(nx + 1, ny + 1, nz + 1)
            c = {}
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        c[(dx, dy, dz)] = vid[dx:nx + dx, dy:ny + dy,
                                              dz:nz + dz].ravel()
            hexes = np.stack([c[(0, 0, 0)], c[(1, 0, 0)], c[(1, 1, 0)],
                              c[(0, 1, 0)], c[(0, 0, 1)], c[(1, 0, 1)],
                              c[(1, 1, 1)], c[(0, 1, 1)]], axis=1)
            if not simplex:
                return cls.createFromCellList(3, hexes, coords, comm)
            # split each hex into 6 tets (standard Kuhn triangulation)
            t = [[0, 1, 2, 6], [0, 2, 3, 6], [0, 3, 7, 6],
                 [0, 7, 4, 6], [0, 4, 5, 6], [0, 5, 1, 6]]
            cells = np.concatenate([hexes[:, tt] for tt in t])
            return cls.createFromCellList(3, cells, coords, comm)
        raise Error(f"createBoxMesh: dim {dim}")

    @classmethod
    def createFromGmsh(cls, path, comm=None):
        """Read a Gmsh ASCII v2.2 .msh file (DMPlexCreateGmsh role,
        plexgmsh.c): highest-dimensional elements become cells; physical
        tags are kept as labels (DMLabel-lite dict name -> cell ids)."""
        nodes = {}
        elems = []           # (etype, tag, [verts])
        with open(path) as f:
            lines = iter(f.read().splitlines())
            for line in lines:
                if line.startswith("$Nodes"):
                    nn = int(next(lines))
                    for _ in range(nn):
                        parts = next(lines).split()
                        nodes[int(parts[0])] = [float(v)
                                                for v in parts[1:4]]
                elif line.startswith("$Elements"):
                    ne = int(next(lines))
                    for _ in range(ne):
                        parts = [int(v) for v in next(lines).split()]
                        etype = parts[1]
                        ntags = parts[2]
                        tag = parts[3] if ntags else 0
                        verts = parts[3 + ntags:]
                        elems.append((etype, tag, verts))
        # element types: 2 tri, 3 quad, 4 tet, 5 hex (gmsh numbering)
        dim_of = {2: 2, 3: 2, 4: 3, 5: 3}
        present = [e for e in elems if e[0] in dim_of]
        if not present:
            raise Error("gmsh file has no 2-D/3-D elements")
        dim = max(dim_of[e[0]] for e in present)
        cell_types = {t for t, d in dim_of.items() if d == dim}
        cells_raw = [e for e in present if e[0] in cell_types]
        # renumber vertices contiguously
        used = sorted({v for _, _, vs in cells_raw for v in vs})
        remap = {g: i for i, g in enumerate(used)}
        coords = np.asarray([nodes[g][:dim] for g in used])
        cells = np.asarray([[remap[v] for v in vs]
                            for _, _, vs in cells_raw], dtype=np.int64)
        p = cls.createFromCellList(dim, cells, coords, comm)
        p.labels = {}
        for ci, (_, tag, _) in enumerate(cells_raw):
            p.labels.setdefault(f"physical_{tag}", []).append(ci)
        p.labels = {k: np.asarray(v) for k, v in p.labels.items()}
        return p

    # ---- DAG queries (plex.c) ----

    @property
    def ncells(self):
        return len(self.cells)

    @property
    def nvertices(self):
        return len(self.coords)

    def getChart(self):
        """(pStart, pEnd): cells [0, ncells), vertices [ncells, ncells+nv)."""
        return 0, self.ncells + self.nvertices

    def getHeightStratum(self, h):
        if h == 0:
            return 0, self.ncells
        if h == self.dim:
            return self.ncells, self.ncells + self.nvertices
        raise Error("lite plex: only cells (h=0) and vertices (h=dim)")

    getDepthStratum = None  # overridden below

    def getCone(self, cell):
        """Vertex points of a cell (closure in the uninterpolated DAG)."""
        return self.cells[cell] + self.ncells

    def getSupport(self, vertex_point):
        v = vertex_point - self.ncells
        return np.nonzero((self.cells == v).any(axis=1))[0]

    def getConeClosure(self, cell):
        return np.concatenate([[cell], self.getCone(cell)])

    def interpolate(self):
        """DMPlexInterpolate (plexinterpolate.c): generate the EDGE
        stratum (2-D simplex meshes) so the chart becomes
        cells -> edges -> vertices with cones through edges. Returns self;
        edge data lands in .edges (ne, 2 vertex ids), .cell2edge
        (ncell, 3), and cone/support queries see the new points (edge
        point ids start at ncells + nvertices)."""
        from .fe import build_edges
        self.edges, self.cell2edge = build_edges(self.cells)
        self._interpolated = True
        return self

    def getDepth(self):
        return 2 if getattr(self, "_interpolated", False) else 1

    def getConeInterpolated(self, cell):
        """Cone of a cell AFTER interpolate(): its three edge points."""
        if not getattr(self, "_interpolated", False):
            raise Error("call interpolate() first")
        base = self.ncells + self.nvertices
        return self.cell2edge[cell] + base

    def getEdgeCone(self, edge_point):
        """Cone of an edge point: its two vertex points."""
        base = self.ncells + self.nvertices
        return self.edges[edge_point - base] + self.ncells

    def distribute(self, overlap=0):
        """DMPlexDistribute: in the SPMD single-program model the mesh is
        not re-owned per rank — cell partitioning (PetscPartitioner) maps
        cells to shards and array sharding does the rest. Returns self."""
        return self

    def markBoundaryVertices(self):
        """Vertex ids on the domain boundary (facets shared by one cell —
        DMPlexMarkBoundaryFaces role)."""
        nv = self.cells.shape[1]
        if self.dim == 2 and nv == 3:
            fac = [[0, 1], [1, 2], [2, 0]]
        elif self.dim == 2 and nv == 4:
            fac = [[0, 1], [1, 2], [2, 3], [3, 0]]
        elif self.dim == 3 and nv == 4:
            fac = [[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]]
        elif self.dim == 3 and nv == 8:
            fac = [[0, 1, 2, 3], [4, 5, 6, 7], [0, 1, 5, 4],
                   [2, 3, 7, 6], [0, 3, 7, 4], [1, 2, 6, 5]]
        else:
            raise Error("unknown cell shape")
        faces = np.concatenate([np.sort(self.cells[:, f], axis=1)
                                for f in fac])
        uniq, counts = np.unique(faces, axis=0, return_counts=True)
        bnd_faces = uniq[counts == 1]
        return np.unique(bnd_faces.ravel())

    # ---- section / vectors ----

    def createSection(self, dof_per_vertex=1):
        pS, pE = self.getChart()
        s = Section(pE - pS)
        s.setDof(np.arange(self.ncells, pE), dof_per_vertex)
        s.setUp()
        self.section = s
        return s

    @property
    def N(self):
        if self.section is None:
            self.createSection()
        return self.section.getStorageSize()

    def createGlobalVector(self):
        v = Vec(self.comm)
        v.setSizes(self.N)
        v.setUp()
        v._dm = self
        return v

    def createMatrix(self):
        from ..mat.aij import MatAIJ
        A = MatAIJ(self.comm)
        A.setSizes((self.N, self.N))
        A._dm = self
        return A

    # ---- P1 FEM assembly (plexfem.c role, vectorized) ----

    def p1_gradients(self):
        """Per-cell P1 basis gradients and volumes (affine simplices)."""
        if self.cells.shape[1] != self.dim + 1:
            raise Error("P1 assembly needs simplicial cells")
        import math
        v = self.coords[self.cells]                  # (nc, d+1, d)
        J = v[:, 1:, :] - v[:, :1, :]                # (nc, d, d)
        detJ = np.linalg.det(J)
        vol = np.abs(detJ) / math.factorial(self.dim)
        Jinv = np.linalg.inv(J)                      # (nc, d, d)
        # reference gradients: phi_0 = 1-sum(xi) -> -1s; phi_i = xi_i
        gref = np.concatenate([-np.ones((1, self.dim)),
                               np.eye(self.dim)], axis=0)  # (d+1, d)
        # d/dx_e phi_v = sum_d gref[v,d] * (J^{-T})[d,e] = gref @ Jinv^T
        g = np.einsum("vd,ced->cve", gref, Jinv)     # (nc, d+1, d)
        return g, vol

    def assemblePoissonP1(self, f=1.0, dirichlet_value=0.0):
        """(A, b): P1 stiffness for -Lap u = f with Dirichlet boundary rows
        replaced by identity (the ex45-style BC convention)."""
        import scipy.sparse as sp
        g, vol = self.p1_gradients()
        nvl = self.cells.shape[1]
        Ke = np.einsum("cve,cwe,c->cvw", g, g, vol)  # (nc, d+1, d+1)
        rows = np.repeat(self.cells, nvl, axis=1).reshape(-1)
        cols = np.tile(self.cells, (1, nvl)).reshape(-1)
        A = sp.csr_matrix((Ke.reshape(-1), (rows, cols)),
                          shape=(self.nvertices, self.nvertices))
        b = np.zeros(self.nvertices)
        np.add.at(b, self.cells.reshape(-1),
                  np.repeat(f * vol / nvl, nvl))
        bnd = self.markBoundaryVertices()
        # Dirichlet: zero rows/cols, unit diagonal, bc value in rhs
        A = A.tolil()
        for bv in bnd:
            A.rows[bv] = [bv]
            A.data[bv] = [1.0]
        A = A.tocsr()
        keep_mask = np.ones(self.nvertices, dtype=bool)
        keep_mask[bnd] = False
        # also zero the bc columns from interior rows (keep symmetry)
        Ad = A.tocoo()
        sel = keep_mask[Ad.row] & ~keep_mask[Ad.col]
        data = Ad.data.copy()
        data[sel] = 0.0
        A = sp.csr_matrix((data, (Ad.row, Ad.col)), shape=A.shape)
        b[bnd] = dirichlet_value
        from ..mat.aij import MatAIJ
        M = MatAIJ.from_scipy(A, comm=self.comm)
        M._dm = self
        return M, Vec.from_array(b, comm=self.comm)

    def view(self, viewer=None):
        print(f"DMPlex Object (lite): dim={self.dim} cells={self.ncells} "
              f"vertices={self.nvertices}")


class PetscPartitioner:
    """PetscPartitioner (dm/partitioner): partition a DMPlex's cells.
    Types: 'simple' (contiguous chunks, partitioner impls/simple) and
    'bisection' (recursive graph bisection over the cell adjacency — the
    in-tree replacement for the metis bridge)."""

    def __init__(self, ptype="bisection"):
        self.ptype = ptype

    def setType(self, t):
        self.ptype = t
        return self

    def partition(self, plex, nparts):
        ncell = len(plex.cells)
        if self.ptype == "simple":
            sizes = np.full(nparts, ncell // nparts)
            sizes[: ncell % nparts] += 1
            return np.repeat(np.arange(nparts), sizes)
        # cell adjacency: cells sharing >= dim vertices (face neighbors)
        import scipy.sparse as sp
        nv = len(plex.coords)
        rows = np.repeat(np.arange(ncell), plex.cells.shape[1])
        cols = np.asarray(plex.cells).reshape(-1)
        C = sp.csr_matrix((np.ones(len(rows)), (rows, cols)),
                          shape=(ncell, nv))
        CC = (C @ C.T).tocsr()
        dim = plex.coords.shape[1]
        CC.data = (CC.data >= dim).astype(np.float64)
        CC.eliminate_zeros()
        CC.setdiag(0)
        CC.eliminate_zeros()
        from ..mat.partition import MatPartitioning
        from ..mat.aij import MatAIJ
        mp = MatPartitioning.create()
        mp.setAdjacency(MatAIJ.from_scipy(CC))
        mp.setNParts(nparts)
        mp.setType("rb")
        return np.asarray(mp.apply())
