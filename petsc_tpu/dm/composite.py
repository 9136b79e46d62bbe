"""DMComposite / DMShell / DMRedundant: multi-physics glue DMs.

Behavioral references: src/dm/impls/composite (DMCompositeCreate/AddDM,
global vector = packed concatenation, Scatter/Gather to sub-vectors,
DMCreateFieldIS for fieldsplit), impls/shell (user-hook DM), impls/
redundant (n dofs present on every rank — in the single-program model a
plain n-vector).
"""

from __future__ import annotations

import numpy as np

from ..sys.error import Error
from ..vec.vec import Vec
from .dm import DM


class DMComposite(DM):
    def __init__(self, comm=None, **kw):
        super().__init__(comm, **kw)
        self.dms: list[DM] = []

    @classmethod
    def create(cls, dms=(), comm=None):
        dmc = cls(comm)
        for d in dms:
            dmc.addDM(d)
        return dmc

    def addDM(self, dm):
        self.dms.append(dm)
        return self

    def getNumberDM(self):
        return len(self.dms)

    @property
    def N(self):
        return sum(d.N for d in self.dms)

    def _offsets(self):
        sizes = [d.N for d in self.dms]
        return np.concatenate([[0], np.cumsum(sizes)]), sizes

    def createGlobalVector(self):
        v = Vec(self.comm)
        v.setSizes(self.N)
        v.setUp()
        v._dm = self
        return v

    def getAccess(self, vec):
        """Sub-vectors viewing the packed global vector (copy-out;
        restoreAccess writes back)."""
        offs, sizes = self._offsets()
        arr = np.asarray(vec.getArray())
        return [Vec.from_array(arr[offs[i]:offs[i + 1]], comm=self.comm)
                for i in range(len(self.dms))]

    def restoreAccess(self, vec, subvecs):
        offs, _ = self._offsets()
        arr = np.asarray(vec.getArray()).copy()
        for i, sv in enumerate(subvecs):
            arr[offs[i]:offs[i + 1]] = np.asarray(sv.getArray())
        vec.setArray(arr)

    def getFieldIS(self):
        """Index sets of each packed field (DMCreateFieldDecomposition) —
        feed these to PCFieldSplit.setIS."""
        from ..parallel.index import IS
        offs, sizes = self._offsets()
        return [IS(np.arange(offs[i], offs[i + 1]), self.comm)
                for i in range(len(self.dms))]

    def createMatrix(self):
        from ..mat.aij import MatAIJ
        A = MatAIJ(self.comm)
        A.setSizes((self.N, self.N))
        A._dm = self
        return A


class DMShell(DM):
    """User-hook DM (impls/shell): supply vector/matrix constructors."""

    def __init__(self, comm=None, **kw):
        super().__init__(comm, **kw)
        self._create_global = None
        self._create_matrix = None

    def setCreateGlobalVector(self, fn):
        self._create_global = fn

    def setCreateMatrix(self, fn):
        self._create_matrix = fn

    def createGlobalVector(self):
        if self._create_global is None:
            raise Error("DMShell: setCreateGlobalVector first")
        v = self._create_global(self)
        v._dm = self
        return v

    def createMatrix(self):
        if self._create_matrix is None:
            raise Error("DMShell: setCreateMatrix first")
        A = self._create_matrix(self)
        A._dm = self
        return A


class DMRedundant(DM):
    """n dofs 'replicated on every rank' (impls/redundant) — a plain
    n-vector in the single-program model."""

    def __init__(self, n=0, comm=None, **kw):
        super().__init__(comm, **kw)
        self.n = int(n)

    @classmethod
    def create(cls, n, comm=None):
        return cls(n, comm)

    @property
    def N(self):
        return self.n

    def createGlobalVector(self):
        v = Vec(self.comm)
        v.setSizes(self.n)
        v.setUp()
        v._dm = self
        return v

    def createMatrix(self):
        from ..mat.aij import MatAIJ
        A = MatAIJ(self.comm)
        A.setSizes((self.n, self.n))
        A._dm = self
        return A
