"""DM base: mesh/discretization manager glue between grids and solvers.

Behavioral reference: src/dm/interface/dm.c (DMCreateGlobalVector,
DMGlobalToLocal, DMCreateMatrix, DMCreateInterpolation, DMCoarsen/DMRefine,
KSP attach via KSPSetDM / src/ksp/ksp/interface/dmksp.c). The TPU redesign
keeps the callback contract (compute_operators/compute_rhs attached to the
DM, invoked by KSP/SNES setup) and the coarsen/refine hierarchy used by
PCMG.
"""

from __future__ import annotations

from ..sys.object import PObject
from ..sys.error import Error


class DM(PObject):
    _class_name = "DM"

    def __init__(self, comm=None, **kw):
        super().__init__(**kw)
        self.comm = comm
        self.app_ctx = None
        self._compute_operators = None
        self._compute_rhs = None
        self._compute_initial_guess = None

    def setAppCtx(self, ctx):
        self.app_ctx = ctx

    def getAppCtx(self):
        return self.app_ctx

    # ---- KSP/SNES callback attach (dmksp.c model) ----

    def setKSPComputeOperators(self, fn):
        self._compute_operators = fn

    def setKSPComputeRHS(self, fn):
        self._compute_rhs = fn

    def createGlobalVector(self):
        raise Error("DM subclass must implement createGlobalVector")

    def createMatrix(self):
        raise Error("DM subclass must implement createMatrix")

    def coarsen(self):
        raise Error("DM subclass must implement coarsen")

    def refine(self):
        raise Error("DM subclass must implement refine")

    def createInterpolation(self, coarse):
        raise Error("DM subclass must implement createInterpolation")
