"""petsc_tpu — a TPU-native sparse linear-algebra and solver framework.

Brand-new design with the capabilities of PETSc (reference: petsc/petsc
v3.25.3), built on JAX/XLA/Pallas: sharded jax.Arrays for vectors, padded-ELL
CSR in HBM for matrices, jitted lax.while_loop Krylov solvers with typed
convergence reasons, host-side numpy/scipy "symbolic" setup phases, and
domain decomposition over jax.sharding meshes.

Quick start (petsc4py users will recognize the shapes)::

    import petsc_tpu as pt
    pt.init()
    A = pt.Mat.createAIJ((n, n), csr=(indptr, indices, vals))
    b = A.createVecLeft(); b.set(1.0)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType('cg'); ksp.getPC().setType('jacobi')
    ksp.setTolerances(rtol=1e-8)
    x = A.createVecRight()
    ksp.solve(b, x)
"""

from . import config
from .config import init, finalize, options, log, real_dtype, set_real_dtype
from .sys.error import (Error, KSPConvergedReason, SNESConvergedReason,
                        TSConvergedReason, TaoConvergedReason, PCFailedReason,
                        NotConvergedError)
from .parallel.layout import Layout
from .parallel.mesh import Comm, comm_self, comm_world, make_comm
from .vec.vec import Vec, NormType, InsertMode, fused_reductions
from .mat.mat import Mat, MatShell, MatDense, MatNullSpace, MatStructure
from .mat.aij import MatAIJ
from .mat.sbaij import MatSBAIJ
from .dm.swarm import DMSwarm
from .dm.network import DMNetwork
from .mat.utility import (MatComposite, MatDiagonal, MatIS, MatLRC,
                          MatMAIJ, MatNormal, MatSchurComplement,
                          MatTranspose)

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports to keep `import petsc_tpu` light and avoid cycles.
    if name == "KSP":
        from .ksp.ksp import KSP
        return KSP
    if name == "MatColoring":
        from .mat.coloring import MatColoring
        return MatColoring
    if name == "MatFDColoring":
        from .mat.fdcoloring import MatFDColoring
        return MatFDColoring
    if name == "PC":
        from .pc.pc import PC
        return PC
    if name == "SNES":
        from .snes.snes import SNES
        return SNES
    if name == "TS":
        from .ts.ts import TS
        return TS
    if name == "Tao":
        from .tao.tao import Tao
        return Tao
    if name == "DMDA":
        from .dm.da import DMDA
        return DMDA
    if name == "DM":
        from .dm.dm import DM
        return DM
    if name == "IS":
        from .parallel.index import IS
        return IS
    if name == "DMStag":
        from .dm.stag import DMStag
        return DMStag
    if name == "DMPlex":
        from .dm.plex import DMPlex
        return DMPlex
    if name == "DMComposite":
        from .dm.composite import DMComposite
        return DMComposite
    if name == "Regressor":
        from .ml.regressor import Regressor
        return Regressor
    if name == "AO":
        from .parallel.ao import AO
        return AO
    if name == "Random":
        from .sys.random import Random
        return Random
    if name == "VecGhost":
        from .vec.ghost import VecGhost
        return VecGhost
    if name == "VecNest":
        from .vec.nest import VecNest
        return VecNest
    if name == "viewer":
        from .sys import viewer
        return viewer
    raise AttributeError(name)
