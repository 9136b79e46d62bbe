"""petsc4py-compat namespace + PetscRandom tests."""

import numpy as np

from petsc_tpu.petsc4py_compat import PETSc
from petsc_tpu.sys.random import Random
from tests.test_mg_gamg import poisson2d


def test_petsc4py_style_solve():
    A_sp = poisson2d(12)
    A = PETSc.Mat().createAIJ(A_sp.shape,
                              csr=(A_sp.indptr, A_sp.indices, A_sp.data))
    b = PETSc.Vec().createWithArray(np.ones(A_sp.shape[0]))
    x = b.duplicate()
    ksp = PETSc.KSP().create()
    ksp.setOperators(A)
    ksp.setType(PETSc.KSP.Type.CG)
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-10)
    ksp.solve(b, x)
    assert ksp.getConvergedReason() > 0
    r = np.asarray(A.to_scipy() @ np.asarray(x.getArray()) - 1.0)
    assert np.linalg.norm(r) < 1e-7


def test_petsc4py_viewer(tmp_path):
    A_sp = poisson2d(5)
    A = PETSc.Mat().createAIJ(A_sp.shape,
                              csr=(A_sp.indptr, A_sp.indices, A_sp.data))
    vw = PETSc.Viewer.createBinary(str(tmp_path / "a.dat"), "w")
    vw.view(A)
    B = PETSc.Viewer.createBinary(str(tmp_path / "a.dat"), "r").load()
    assert (A.to_scipy() != B.to_scipy()).nnz == 0


def test_petsc4py_options():
    import petsc_tpu as pt
    pt.init(args=["-foo", "42", "-bar", "2.5"])
    o = PETSc.Options()
    assert o.getInt("foo") == 42
    assert o.getReal("bar") == 2.5


def test_random():
    r = Random.create()
    r.setInterval((2.0, 4.0))
    vals = np.asarray(r.getValues(1000))
    assert (vals >= 2.0).all() and (vals <= 4.0).all()
    assert abs(vals.mean() - 3.0) < 0.1
    # deterministic restart
    r2 = Random.create()
    r2.setInterval((2.0, 4.0))
    r2.seed(); r.seed()
    assert r.getValue() == r2.getValue()


def test_compat_extended_namespace():
    from petsc_tpu.petsc4py_compat import PETSc
    import petsc_tpu as pt
    pt.init(args=[])
    ao = PETSc.AO.createBasic([3, 1, 0, 2])
    assert PETSc.DMNetwork() is not None
    assert PETSc.DMStag() is not None
    assert PETSc.DMSwarm() is not None
    with PETSc.Log.Stage("CompatStage"):
        ev = PETSc.Log.Event("CompatEvent")
        ev.begin()
        ev.end()
    from petsc_tpu import config as cfg
    assert cfg.log().get_event("CompatEvent", "CompatStage") is not None
