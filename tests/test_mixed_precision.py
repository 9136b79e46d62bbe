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


def test_mg_f32_cycle_f64_krylov():
    """-pc_mg_dtype single: the whole GAMG V-cycle runs in f32 inside an
    f64 CG without changing the iteration count (round-3 VERDICT item 9;
    the PC analog of the ksp/ir.py policy)."""
    import scipy.sparse as sp
    import petsc_tpu as pt
    from petsc_tpu.parallel.mesh import comm_self
    import jax.tree_util as jtu
    import numpy as np

    ex = np.ones(16)
    T1 = sp.diags([-ex[:-1], 2 * ex, -ex[:-1]], [-1, 0, 1], format="csr")
    I1 = sp.identity(16, format="csr")
    A_sp = (sp.kron(sp.kron(T1, I1), I1) + sp.kron(sp.kron(I1, T1), I1)
            + sp.kron(sp.kron(I1, I1), T1)).tocsr()
    its = {}
    for dt in ("double", "single"):
        pt.init(args=["-pc_mg_dtype", dt])
        A = pt.MatAIJ.from_scipy(A_sp, comm=comm_self())
        ksp = pt.KSP().create()
        ksp.setOperators(A)
        ksp.setType("cg")
        ksp.getPC().setType("gamg")
        ksp.getPC().setFromOptions()
        ksp.setTolerances(rtol=1e-10, max_it=60)
        b = A.createVecLeft(); b.set(1.0)
        x = A.createVecRight()
        ksp.solve(b, x)
        assert ksp.getConvergedReason().converged
        its[dt] = ksp.getIterationNumber()
        res = np.linalg.norm(
            A_sp @ np.asarray(x.getArray())[:A_sp.shape[0]] - 1.0)
        assert res < 1e-6
        if dt == "single":
            meta, data = ksp.getPC()._impl.setup()
            dts = {str(v.dtype) for v in jtu.tree_leaves(data)
                   if hasattr(v, "dtype")}
            assert "float32" in dts and "float64" not in dts
    assert abs(its["single"] - its["double"]) <= 2, its
