"""Mat tests (reference model: src/mat/tests)."""
import numpy as np
import pytest
import scipy.sparse as sp

import petsc_tpu as pt


@pytest.fixture(scope="module", autouse=True)
def _init():
    pt.init()


def lap1d(n):
    return sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n)).tocsr()


def rand_csr(m, n, density=0.3, seed=0):
    rng = np.random.RandomState(seed)
    A = sp.random(m, n, density=density, random_state=rng, format="csr")
    return A


def test_csr_mult():
    A = lap1d(10)
    M = pt.Mat.createAIJ((10, 10), csr=(A.indptr, A.indices, A.data))
    x = pt.Vec.from_array(np.arange(10.0))
    y = M.createVecLeft()
    M.mult(x, y)
    np.testing.assert_allclose(y.getArray(), A @ np.arange(10.0))


def test_mult_transpose_and_rect():
    A = rand_csr(7, 5)
    M = pt.MatAIJ.from_scipy(A)
    x = np.arange(5.0)
    yt = np.arange(7.0)
    vx = pt.Vec.from_array(x)
    vy = M.createVecLeft()
    M.mult(vx, vy)
    np.testing.assert_allclose(vy.getArray(), A @ x, atol=1e-14)
    vyt = pt.Vec.from_array(yt)
    vxt = M.createVecRight()
    M.multTranspose(vyt, vxt)
    np.testing.assert_allclose(vxt.getArray(), A.T @ yt, atol=1e-14)


def test_setvalues_assembly():
    """ex2-style stencil assembly via setValues with ADD_VALUES."""
    m, n = 4, 3
    M = pt.MatAIJ()
    M.setSizes((m * n, m * n))
    for Ii in range(m * n):
        i, j = Ii // n, Ii % n
        if i > 0:
            M.setValue(Ii, Ii - n, -1.0, pt.InsertMode.ADD_VALUES)
        if i < m - 1:
            M.setValue(Ii, Ii + n, -1.0, pt.InsertMode.ADD_VALUES)
        if j > 0:
            M.setValue(Ii, Ii - 1, -1.0, pt.InsertMode.ADD_VALUES)
        if j < n - 1:
            M.setValue(Ii, Ii + 1, -1.0, pt.InsertMode.ADD_VALUES)
        M.setValue(Ii, Ii, 4.0, pt.InsertMode.ADD_VALUES)
    M.assemble()
    ref = sp.kron(sp.eye(m), lap1d(n)) + sp.kron(lap1d(m), sp.eye(n))
    ref = (ref + 4.0 * sp.eye(m * n) - ref.multiply(0)).tocsr()
    # build reference directly: 5-point with 4 on diag
    D = sp.lil_matrix((m * n, m * n))
    for Ii in range(m * n):
        i, j = Ii // n, Ii % n
        D[Ii, Ii] = 4.0
        if i > 0: D[Ii, Ii - n] = -1.0
        if i < m - 1: D[Ii, Ii + n] = -1.0
        if j > 0: D[Ii, Ii - 1] = -1.0
        if j < n - 1: D[Ii, Ii + 1] = -1.0
    assert (M.to_scipy() != D.tocsr()).nnz == 0


def test_coo_numeric_update():
    A = lap1d(8).tocoo()
    M = pt.MatAIJ()
    M.setSizes((8, 8))
    M.setPreallocationCOO(A.row, A.col)
    M.setValuesCOO(A.data)
    x = np.ones(8)
    y = M.createVecLeft()
    M.mult(pt.Vec.from_array(x), y)
    np.testing.assert_allclose(y.getArray(), lap1d(8) @ x)
    # numeric refresh with same pattern, new values
    M.setValuesCOO(3.0 * A.data)
    M.mult(pt.Vec.from_array(x), y)
    np.testing.assert_allclose(y.getArray(), 3.0 * (lap1d(8) @ x))


def test_coo_duplicates_sum():
    i = np.array([0, 0, 1, 1, 1])
    j = np.array([0, 0, 1, 1, 0])
    v = np.array([1.0, 2.0, 5.0, 7.0, 4.0])
    M = pt.MatAIJ()
    M.setSizes((2, 2))
    M.setPreallocationCOO(i, j)
    M.setValuesCOO(v)
    np.testing.assert_allclose(M.to_scipy().toarray(), [[3.0, 0.0], [4.0, 12.0]])


def test_diag_norms_transpose():
    A = rand_csr(6, 6, 0.4, seed=3) + sp.eye(6)
    M = pt.MatAIJ.from_scipy(A.tocsr())
    np.testing.assert_allclose(M.getDiagonal().getArray(), A.diagonal(), atol=1e-14)
    assert M.norm() == pytest.approx(np.linalg.norm(A.toarray()))
    assert M.norm(pt.NormType.NORM_1) == pytest.approx(np.abs(A.toarray()).sum(0).max())
    assert M.norm(pt.NormType.NORM_INFINITY) == pytest.approx(np.abs(A.toarray()).sum(1).max())
    T = M.transpose()
    assert (T.to_scipy() != A.T.tocsr()).nnz == 0


def test_zero_rows():
    A = lap1d(6)
    M = pt.MatAIJ.from_scipy(A)
    M.zeroRows([0, 5], diag=1.0)
    out = M.to_scipy().toarray()
    np.testing.assert_allclose(out[0], np.eye(6)[0])
    np.testing.assert_allclose(out[5], np.eye(6)[5])
    np.testing.assert_allclose(out[1:5], A.toarray()[1:5])


def test_shell():
    n = 8
    M = pt.Mat.createShell((n, n), mult=lambda x: 2.0 * x)
    x = pt.Vec.from_array(np.arange(float(n)))
    y = M.createVecLeft()
    M.mult(x, y)
    np.testing.assert_allclose(y.getArray(), 2.0 * np.arange(float(n)))


def test_dense():
    A = np.arange(12.0).reshape(3, 4)
    M = pt.Mat.createDense((3, 4), array=A)
    x = pt.Vec.from_array(np.ones(4))
    y = M.createVecLeft()
    M.mult(x, y)
    np.testing.assert_allclose(y.getArray(), A.sum(1))


def test_ptap_matmult():
    A = lap1d(9)
    P = sp.csr_matrix((np.ones(9), (np.arange(9), np.arange(9) // 3)), shape=(9, 3))
    MA = pt.MatAIJ.from_scipy(A)
    MP = pt.MatAIJ.from_scipy(P)
    C = MA.ptap(MP)
    np.testing.assert_allclose(C.to_scipy().toarray(), (P.T @ A @ P).toarray())


@pytest.mark.parametrize("nshards", [2, 8])
def test_mpiaij_mult(nshards):
    """Distributed SpMV equals sequential (nsize-parameterized, like the
    reference's nsize: {{1 2 3}} test matrices)."""
    comm = pt.make_comm(nshards)
    n = 37  # uneven: exercises padding
    A = lap1d(n) + sp.random(n, n, density=0.05, random_state=np.random.RandomState(1))
    A = A.tocsr()
    M = pt.MatAIJ(comm)
    M.setSizes((n, n))
    M.setValuesCSR(A.indptr, A.indices, A.data)
    M.assemble()
    x = np.arange(float(n))
    vx = pt.Vec(comm).setLayout(M.col_layout)
    vx.setUp(); vx.setArray(x)
    vy = M.createVecLeft()
    M.mult(vx, vy)
    np.testing.assert_allclose(vy.getArray(), A @ x, atol=1e-12)
