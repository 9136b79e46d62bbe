"""DMStag: staggered structured grids (MAC-scheme layouts).

Behavioral reference: src/dm/impls/stag (DMStagCreate1d/2d/3d — dof per
stratum: vertex/element in 1-D, vertex/face/element in 2-D, vertex/edge/
face/element in 3-D; DMStagVecGetArray with location-based indexing;
compatible DMDA extraction via DMStagVecSplitToDMDA).

TPU representation: one flat vector ordered element-major with all dofs of
an element's "lower-left" closure packed together (the reference's
interleaved layout), plus location index helpers; stencil applications
slice per-stratum subarrays which are themselves regular grids, so the
dnd fast path applies per stratum.
"""

from __future__ import annotations

import numpy as np

from ..sys.error import Error
from ..vec.vec import Vec
from .dm import DM


# strata per dimension (reference petscdmstag.h DMStagStencilLocation)
_STRATA = {
    1: ("vertex", "element"),
    2: ("vertex", "down_face", "left_face", "element"),
    3: ("vertex", "back_edge", "down_edge", "left_edge",
        "back_face", "down_face", "left_face", "element"),
}


class DMStag(DM):
    def __init__(self, comm=None, **kw):
        super().__init__(comm, **kw)
        self.dim = None
        self.sizes = None       # elements per axis
        self.dof = None         # dofs per stratum, len = dim+1 groups

    @classmethod
    def create(cls, sizes, dof, comm=None):
        """sizes: elements per axis; dof: per-stratum counts, e.g. 2-D
        (dof_vertex, dof_face, dof_element) (DMStagCreate2d)."""
        st = cls(comm)
        st.sizes = tuple(int(s) for s in np.atleast_1d(sizes))
        st.dim = len(st.sizes)
        dof = tuple(int(d) for d in np.atleast_1d(dof))
        if len(dof) != st.dim + 1:
            raise Error(f"DMStag: need {st.dim + 1} stratum dof counts")
        st.dof = dof
        return st

    def _stratum_shapes(self):
        """(name, shape, dof) per stratum with nonzero dof. Vertex grids
        have n+1 points per axis; a face normal to axis a has n+1 on a,
        n elsewhere; elements have n per axis."""
        d = self.dim
        out = []
        if d == 1:
            specs = [("vertex", (1,), self.dof[0]),
                     ("element", (0,), self.dof[1])]
        elif d == 2:
            specs = [("vertex", (1, 1), self.dof[0]),
                     ("left_face", (0, 1), self.dof[1]),
                     ("down_face", (1, 0), self.dof[1]),
                     ("element", (0, 0), self.dof[2])]
        else:
            specs = [("vertex", (1, 1, 1), self.dof[0]),
                     ("left_edge", (0, 1, 1), self.dof[1]),
                     ("down_edge", (1, 0, 1), self.dof[1]),
                     ("back_edge", (1, 1, 0), self.dof[1]),
                     ("left_face", (1, 0, 0), self.dof[2]),
                     ("down_face", (0, 1, 0), self.dof[2]),
                     ("back_face", (0, 0, 1), self.dof[2]),
                     ("element", (0, 0, 0), self.dof[3])]
        for name, plus, nd in specs:
            if nd > 0:
                shape = tuple(self.sizes[ax] + plus[ax]
                              for ax in range(d))[::-1]
                out.append((name, shape, nd))
        return out

    @property
    def N(self):
        return sum(int(np.prod(sh)) * nd
                   for _, sh, nd in self._stratum_shapes())

    def createGlobalVector(self):
        v = Vec(self.comm)
        v.setSizes(self.N)
        v.setUp()
        v._dm = self
        return v

    def getStratumOffsets(self):
        """dict name -> (offset, shape, dof) into the flat vector."""
        out = {}
        off = 0
        for name, sh, nd in self._stratum_shapes():
            out[name] = (off, sh, nd)
            off += int(np.prod(sh)) * nd
        return out

    def getVecArray(self, vec, location):
        """Numpy array (shape + (dof,)) view of one stratum."""
        off, sh, nd = self.getStratumOffsets()[location]
        arr = np.array(vec.getArray())   # writable copy (DMDA model)
        n = int(np.prod(sh)) * nd
        return arr[off:off + n].reshape(sh + ((nd,) if nd > 1 else ()))

    def setVecArray(self, vec, location, data):
        off, sh, nd = self.getStratumOffsets()[location]
        arr = np.asarray(vec.getArray()).copy()
        n = int(np.prod(sh)) * nd
        arr[off:off + n] = np.asarray(data).reshape(-1)
        vec.setArray(arr)

    def splitToDMDA(self, vec, location):
        """(DMDA, Vec) for one stratum (DMStagVecSplitToDMDA)."""
        from .da import DMDA
        off, sh, nd = self.getStratumOffsets()[location]
        da = DMDA.create(self.dim, tuple(sh[::-1]), dof=max(nd, 1))
        v = da.createGlobalVector()
        v.setArray(self.getVecArray(vec, location).reshape(-1))
        return da, v

    def createMatrix(self):
        from ..mat.aij import MatAIJ
        A = MatAIJ(self.comm)
        A.setSizes((self.N, self.N))
        A._dm = self
        return A
