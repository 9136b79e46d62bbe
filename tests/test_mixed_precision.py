"""Mixed-precision iterative refinement (ksp/ir.py): f64 accuracy from f32
inner solves."""

import numpy as np
import pytest

import petsc_tpu as pt
from tests.test_mg_gamg import poisson2d, poisson3d


@pytest.mark.parametrize("ktype", ["cg", "gmres", "bcgs"])
def test_ir_accuracy(ktype):
    A_sp = poisson2d(24)
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType(ktype)
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-12, max_it=3000)
    ksp.setMixedPrecision(True)
    u = A.createVecRight()
    u.setArray(np.random.default_rng(0).random(A_sp.shape[0]))
    b = A.createVecLeft(); A.mult(u, b)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    x.axpy(-1.0, u)
    # f64-level accuracy, far below the f32 epsilon floor
    assert float(x.norm()) / float(u.norm()) < 1e-9


def test_ir_option():
    pt.init(args=["-ksp_mixed_precision"])
    A = pt.MatAIJ.from_scipy(poisson2d(16))
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-10)
    b = A.createVecLeft(); b.set(1.0)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
