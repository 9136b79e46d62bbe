"""KSP core tests: CG/Richardson/preonly semantics vs an independent
numpy oracle implementing the documented PETSc algorithms."""
import numpy as np
import pytest
import scipy.sparse as sp

import petsc_tpu as pt


@pytest.fixture(scope="module", autouse=True)
def _init():
    pt.init()


def poisson2d(m, n):
    """ex2's 5-point Laplacian (natural ordering)."""
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n))
    S = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    return (sp.kron(sp.eye(m), T) + sp.kron(S, sp.eye(n))).tocsr()


def pcg_oracle(A, minv, b, rtol=1e-5, atol=1e-50, maxit=10000):
    """Textbook left-preconditioned CG with PETSc's preconditioned-norm
    convergence convention (rnorm0 = ||B r0||, no test at it 0)."""
    x = np.zeros_like(b)
    r = b.copy()
    z = minv * r
    dp = np.linalg.norm(z)
    hist = [dp]
    ttol = max(rtol * dp, atol)
    beta = z @ r
    betaold = 1.0
    its = 0
    for i in range(maxit):
        if beta == 0.0:
            break
        p = z.copy() if i == 0 else z + (beta / betaold) * p  # noqa: F821
        w = A @ p
        a = beta / (p @ w)
        x += a * p
        r -= a * w
        z = minv * r
        betaold, beta = beta, z @ r
        dp = np.linalg.norm(z)
        its = i + 1
        hist.append(dp)
        if dp <= ttol:
            break
    return x, np.array(hist), its


def make_ksp(A, ktype="cg", ptype="jacobi", **tols):
    M = pt.MatAIJ.from_scipy(A)
    ksp = pt.KSP().create()
    ksp.setOperators(M)
    ksp.setType(ktype)
    ksp.getPC().setType(ptype)
    ksp.setTolerances(**tols)
    return M, ksp


def test_cg_jacobi_matches_oracle():
    A = poisson2d(10, 10)
    bvec = np.ones(100)
    M, ksp = make_ksp(A, "cg", "jacobi", rtol=1e-8)
    b = pt.Vec.from_array(bvec)
    x = M.createVecRight()
    ksp.solve(b, x)
    minv = 1.0 / A.diagonal()
    xo, hist, its = pcg_oracle(A, minv, bvec, rtol=1e-8)
    assert ksp.getConvergedReason() == pt.KSPConvergedReason.CONVERGED_RTOL
    assert ksp.getIterationNumber() == its
    got = ksp.getConvergenceHistory()
    np.testing.assert_allclose(got, hist, rtol=1e-9, atol=1e-13 * hist[0])
    np.testing.assert_allclose(x.getArray(), xo, rtol=1e-8, atol=1e-10)
    # solution actually solves the system
    np.testing.assert_allclose(A @ x.getArray(), bvec, atol=1e-6)


def test_cg_unpreconditioned_norm():
    A = poisson2d(8, 8)
    bvec = np.arange(64.0)
    M, ksp = make_ksp(A, "cg", "none", rtol=1e-10)
    ksp.setNormType("unpreconditioned")
    x = M.createVecRight()
    ksp.solve(pt.Vec.from_array(bvec), x)
    r = bvec - A @ x.getArray()
    assert np.linalg.norm(r) <= 1e-10 * np.linalg.norm(bvec) * 1.01
    assert ksp.getConvergedReason().converged


def test_preonly():
    A = sp.diags(np.arange(1.0, 9.0)).tocsr()
    M, ksp = make_ksp(A, "preonly", "jacobi")
    b = pt.Vec.from_array(np.ones(8))
    x = M.createVecRight()
    ksp.solve(b, x)
    assert ksp.getIterationNumber() == 1
    assert ksp.getConvergedReason() == pt.KSPConvergedReason.CONVERGED_ITS
    np.testing.assert_allclose(x.getArray(), 1.0 / np.arange(1.0, 9.0))


def test_richardson_converges():
    A = poisson2d(6, 6)
    M, ksp = make_ksp(A, "richardson", "jacobi", rtol=1e-6, max_it=5000)
    b = pt.Vec.from_array(np.ones(36))
    x = M.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    np.testing.assert_allclose(A @ x.getArray(), np.ones(36), atol=1e-4)


def test_cg_indefinite_mat():
    A = sp.diags([1.0, -1.0, 2.0, 3.0]).tocsr()
    M, ksp = make_ksp(A, "cg", "none")
    x = M.createVecRight()
    ksp.solve(pt.Vec.from_array(np.ones(4)), x)
    assert ksp.getConvergedReason() == pt.KSPConvergedReason.DIVERGED_INDEFINITE_MAT


def test_diverged_its():
    A = poisson2d(12, 12)
    M, ksp = make_ksp(A, "cg", "none", rtol=1e-14, max_it=3)
    x = M.createVecRight()
    ksp.solve(pt.Vec.from_array(np.ones(144)), x)
    assert ksp.getConvergedReason() == pt.KSPConvergedReason.DIVERGED_ITS
    assert ksp.getIterationNumber() == 3


def test_zero_rhs():
    A = poisson2d(5, 5)
    M, ksp = make_ksp(A, "cg", "jacobi")
    x = M.createVecRight()
    ksp.solve(pt.Vec.from_array(np.zeros(25)), x)
    assert ksp.getConvergedReason().converged
    np.testing.assert_allclose(x.getArray(), 0.0)


def test_minres_indefinite():
    n = 40
    rng = np.random.RandomState(5)
    Q = np.linalg.qr(rng.randn(n, n))[0]
    evals = np.concatenate([np.linspace(-5, -1, n // 2), np.linspace(1, 5, n - n // 2)])
    Ad = (Q * evals) @ Q.T
    A = sp.csr_matrix(Ad)
    M, ksp = make_ksp(A, "minres", "none", rtol=1e-10, max_it=500)
    bvec = rng.randn(n)
    x = M.createVecRight()
    ksp.solve(pt.Vec.from_array(bvec), x)
    assert ksp.getConvergedReason().converged
    np.testing.assert_allclose(Ad @ x.getArray(), bvec, atol=1e-7)


def test_cg_nonzero_initial_guess():
    A = poisson2d(7, 7)
    bvec = np.ones(49)
    M, ksp = make_ksp(A, "cg", "jacobi", rtol=1e-9)
    ksp.setInitialGuessNonzero(True)
    x = M.createVecRight()
    x.setArray(np.linalg.solve(A.toarray(), bvec) + 0.01)
    ksp.solve(pt.Vec.from_array(bvec), x)
    assert ksp.getConvergedReason().converged
    # warm start should need few iterations
    assert ksp.getIterationNumber() < 15
    np.testing.assert_allclose(A @ x.getArray(), bvec, atol=1e-6)


@pytest.mark.parametrize("nshards", [8])
def test_cg_mpiaij_matches_seq(nshards):
    A = poisson2d(9, 9)  # 81 rows over 8 shards: uneven padding
    bvec = np.ones(81)
    M, ksp = make_ksp(A, "cg", "jacobi", rtol=1e-8)
    x = M.createVecRight()
    ksp.solve(pt.Vec.from_array(bvec), x)
    seq_its = ksp.getIterationNumber()
    seq_hist = ksp.getConvergenceHistory()

    comm = pt.make_comm(nshards)
    Mp = pt.MatAIJ(comm)
    Mp.setSizes((81, 81))
    Mp.setValuesCSR(A.indptr, A.indices, A.data)
    Mp.assemble()
    kspp = pt.KSP().create()
    kspp.setOperators(Mp)
    kspp.setType("cg")
    kspp.getPC().setType("jacobi")
    kspp.setTolerances(rtol=1e-8)
    bp = pt.Vec(comm).setLayout(Mp.col_layout)
    bp.setUp(); bp.setArray(bvec)
    xp = Mp.createVecRight()
    kspp.solve(bp, xp)
    assert kspp.getIterationNumber() == seq_its
    np.testing.assert_allclose(kspp.getConvergenceHistory(), seq_hist,
                               rtol=1e-9, atol=1e-13 * seq_hist[0])
    np.testing.assert_allclose(xp.getArray(), x.getArray(), rtol=1e-7, atol=1e-10)


@pytest.mark.parametrize("nt", ["preconditioned", "unpreconditioned",
                                "natural"])
def test_cg_norm_types(nt):
    """KSPSetNormType variants drive convergence consistently
    (iterativ.c norm-type semantics)."""
    from tests.test_mg_gamg import poisson2d
    A_sp = poisson2d(10)
    n = A_sp.shape[0]
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    ksp.setNormType(nt)
    ksp.setTolerances(rtol=1e-10)
    b = pt.Vec.from_array(np.ones(n))
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged, nt
    r = A_sp @ np.asarray(x.getArray())[:n] - 1.0
    assert np.linalg.norm(r) < 1e-6, nt


def test_norm_none_runs_to_max_it():
    """norm type NONE: no convergence checks, runs exactly max_it
    (smoother mode — zero reductions in the loop)."""
    from tests.test_mg_gamg import poisson2d
    A = pt.MatAIJ.from_scipy(poisson2d(8))
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("chebyshev")
    ksp.getPC().setType("jacobi")
    ksp.setNormType("none")
    ksp.max_it = 7
    from petsc_tpu.ksp import common
    ksp.converged_maxits = True
    b = pt.Vec.from_array(np.ones(64))
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getIterationNumber() == 7
