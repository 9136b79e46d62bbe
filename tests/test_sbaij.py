"""MatSBAIJ symmetric-storage tests (sbaij.c semantics)."""

import numpy as np
import scipy.sparse as sp

import petsc_tpu as pt
from tests.test_mg_gamg import poisson2d


def test_sbaij_from_scipy_mult():
    A0 = poisson2d(8)
    A = pt.MatSBAIJ.from_scipy(A0)
    x = np.random.default_rng(0).random(A0.shape[0])
    y = pt.Vec.from_array(np.zeros(A0.shape[0]))
    A.mult(pt.Vec.from_array(x), y)
    assert np.allclose(np.asarray(y.getArray())[: A0.shape[0]], A0 @ x)
    # host storage is upper-triangular only
    iu, ju, vu = A.upper_csr()
    assert len(vu) < A0.nnz
    assert A.isSymmetric()


def test_sbaij_setvalues_lower_folded():
    """Lower-triangle INSERTs are folded to the upper triangle."""
    A = pt.MatSBAIJ.create(4)
    A.setValues([0], [0], [[2.0]])
    A.setValues([2], [1], [[-1.0]])   # lower -> stored at (1,2)
    A.assemble()
    D = A.to_scipy().toarray()
    assert D[1, 2] == -1.0 and D[2, 1] == -1.0 and D[0, 0] == 2.0


def test_sbaij_add_values_element_loop():
    """Symmetric element assembly (both (i,j) and (j,i) staged with ADD)
    yields the exact symmetric matrix, diagonal counted once."""
    ref = np.zeros((3, 3))
    A = pt.MatSBAIJ.create(3)
    ke = np.array([[2.0, -1.0], [-1.0, 2.0]])
    from petsc_tpu.mat.mat import InsertMode
    for e in ((0, 1), (1, 2)):
        idx = np.array(e)
        A.setValues(idx, idx, ke, addv=InsertMode.ADD_VALUES)
        ref[np.ix_(idx, idx)] += ke
    A.assemble()
    assert np.allclose(A.to_scipy().toarray(), ref)


def test_sbaij_in_ksp():
    A0 = poisson2d(10)
    A = pt.MatSBAIJ.from_scipy(A0)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-10)
    b = pt.Vec.from_array(np.ones(A0.shape[0]))
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    r = A0 @ np.asarray(x.getArray())[: A0.shape[0]] - 1.0
    assert np.linalg.norm(r) < 1e-7
