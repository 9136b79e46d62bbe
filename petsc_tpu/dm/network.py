"""DMNetwork: DM over a graph of vertices and edges with per-point
components (circuits, power grids, river/pipe networks).

Behavioral reference: src/dm/impls/network (DMNetworkAddSubnetwork,
DMNetworkRegisterComponent, DMNetworkAddComponent, DMNetworkGetEdgeRange/
GetVertexRange, DMNetworkGetVariableOffset, DMNetworkDistribute). The
reference distributes the graph with a partitioner and builds PetscSection
offsets.

TPU-first redesign: the network is host-side metadata (edge list +
component registry + prefix-sum offsets — exactly a Section); the SOLVE
side is arrays: a network vector is one flat device array over the global
dof layout, and the incidence structure is exported as COO index arrays so
residual assembly is vectorized scatter-add (e.g. Kirchhoff laws as one
segment-sum over edges), not a per-vertex loop.
"""

from __future__ import annotations

import numpy as np

from ..mat.aij import MatAIJ
from ..sys.error import Error
from ..vec.vec import Vec
from .dm import DM


class DMNetwork(DM):
    def __init__(self, comm=None, **kw):
        super().__init__(comm, **kw)
        self._components: dict[str, int] = {}   # name -> registered key
        self._edges = None                      # (ne, 2) vertex ids
        self._nv = 0
        self._vcomps: list[list] = []           # per-vertex [(key, ndof)]
        self._ecomps: list[list] = []           # per-edge   [(key, ndof)]
        self._voff = None
        self._eoff = None
        self._ndof = 0

    # ---- topology (networkcreate.c) ----

    @classmethod
    def create(cls, comm=None):
        return cls(comm)

    def registerComponent(self, name, size=0):
        """DMNetworkRegisterComponent: returns the component key."""
        key = len(self._components)
        self._components[name] = key
        return key

    def addSubnetwork(self, name, edges):
        """DMNetworkAddSubnetwork: edge list as (ne, 2) vertex indices."""
        edges = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
        if self._edges is None:
            self._edges = edges
        else:
            self._edges = np.vstack([self._edges, edges])
        self._nv = max(self._nv, int(edges.max()) + 1)
        return self

    def layoutSetUp(self):
        self._vcomps = [[] for _ in range(self._nv)]
        self._ecomps = [[] for _ in range(len(self._edges))]
        return self

    # ---- components / dof layout ----

    def getEdgeRange(self):
        return 0, len(self._edges)

    def getVertexRange(self):
        return 0, self._nv

    def getNumVertices(self):
        return self._nv

    def getNumEdges(self):
        return len(self._edges)

    def addComponent(self, point, key, ndof, is_edge=False):
        """DMNetworkAddComponent: attach (component, ndof) to a point.
        Points are vertex or edge indices (is_edge selects the stratum —
        the reference uses a single plex point numbering; two explicit
        strata keep the API simple)."""
        (self._ecomps if is_edge else self._vcomps)[point].append(
            (key, int(ndof)))
        return self

    def setUp(self):
        """Prefix-sum dof offsets: vertices first, then edges (the
        reference's Section layout)."""
        self._voff = np.zeros(self._nv + 1, dtype=np.int64)
        for v in range(self._nv):
            self._voff[v + 1] = self._voff[v] + sum(
                nd for _, nd in self._vcomps[v])
        ne = len(self._edges)
        self._eoff = np.zeros(ne + 1, dtype=np.int64)
        base = self._voff[-1]
        for e in range(ne):
            self._eoff[e + 1] = self._eoff[e] + sum(
                nd for _, nd in self._ecomps[e])
        self._eoff += base
        self._ndof = int(self._eoff[-1])
        return self

    def getVariableOffset(self, point, is_edge=False):
        return int((self._eoff if is_edge else self._voff)[point])

    def getComponent(self, point, is_edge=False):
        return (self._ecomps if is_edge else self._vcomps)[point]

    # ---- vectors / matrices ----

    def createGlobalVector(self) -> Vec:
        v = Vec(self.comm)
        v.setSizes(self._ndof)
        v.setUp()
        v._dm = self
        return v

    createLocalVector = createGlobalVector

    def createMatrix(self) -> MatAIJ:
        """Matrix with the network coupling pattern: vertex dofs couple to
        themselves and across each incident edge (plus edge dofs to their
        endpoints) — the DMCreateMatrix_Network preallocation."""
        rows, cols = [], []

        def block(r0, rn, c0, cn):
            rr = np.repeat(np.arange(r0, rn), cn - c0)
            cc = np.tile(np.arange(c0, cn), rn - r0)
            rows.append(rr)
            cols.append(cc)

        for e, (va, vb) in enumerate(self._edges):
            for p, q in ((va, va), (va, vb), (vb, va), (vb, vb)):
                block(self._voff[p], self._voff[p + 1],
                      self._voff[q], self._voff[q + 1])
            for p in (va, vb):
                block(self._eoff[e], self._eoff[e + 1],
                      self._voff[p], self._voff[p + 1])
                block(self._voff[p], self._voff[p + 1],
                      self._eoff[e], self._eoff[e + 1])
            block(self._eoff[e], self._eoff[e + 1],
                  self._eoff[e], self._eoff[e + 1])
        A = MatAIJ(self.comm)
        A.setSizes((self._ndof, self._ndof))
        if rows:
            import scipy.sparse as sp
            r = np.concatenate(rows)
            c = np.concatenate(cols)
            S = sp.csr_matrix((np.ones(len(r)), (r, c)),
                              shape=(self._ndof, self._ndof))
            S.sum_duplicates()
            A.setValuesCSR(S.indptr, S.indices, np.zeros(S.nnz))
            A.assemble()
        A._dm = self
        return A

    # ---- vectorized assembly helpers (the TPU-native part) ----

    def incidence(self):
        """(src_off, dst_off) first-dof offsets of each edge's endpoints —
        feed to vectorized KCL/flow residuals (segment-sum over edges
        replaces the reference's per-vertex FormFunction loops)."""
        va = self._edges[:, 0]
        vb = self._edges[:, 1]
        return self._voff[va], self._voff[vb]

    def distribute(self, overlap=0):
        """DMNetworkDistribute: a no-op in the single-program model — the
        flat dof array is sharded by the execution layout, not by
        repartitioning host metadata."""
        return self
