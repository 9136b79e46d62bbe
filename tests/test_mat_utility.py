"""Wrapper-format tests (MATTRANSPOSE/NORMAL/DIAGONAL/COMPOSITE/LRC/NEST/
CENTERING analogs)."""

import numpy as np
import jax.numpy as jnp
import pytest

import petsc_tpu as pt
from petsc_tpu.mat.utility import (MatCentering, MatComposite, MatDiagonal,
                                   MatLRC, MatNest, MatNormal, MatTranspose)
from tests.test_mg_gamg import poisson2d


def _nonsym():
    A = poisson2d(6).tolil()
    A[0, 5] = -2.5
    return A.tocsr()


def _apply(M, x):
    y = M.createVecLeft()
    M.mult(pt.Vec.from_array(x), y)
    return np.asarray(y.getArray())


def test_transpose():
    A_sp = _nonsym()
    A = pt.MatAIJ.from_scipy(A_sp)
    T = MatTranspose.create(A)
    x = np.random.default_rng(0).random(36)
    assert np.allclose(_apply(T, x), A_sp.T @ x)


def test_normal():
    A_sp = _nonsym()
    A = pt.MatAIJ.from_scipy(A_sp)
    N = MatNormal.create(A)
    x = np.random.default_rng(1).random(36)
    assert np.allclose(_apply(N, x), A_sp.T @ (A_sp @ x))


def test_diagonal():
    d = np.arange(1.0, 11.0)
    D = MatDiagonal.create(d)
    x = np.ones(10)
    assert np.allclose(_apply(D, x), d)


def test_composite_additive_and_multiplicative():
    A_sp, B_sp = poisson2d(5), poisson2d(5) * 0.5
    A, B = pt.MatAIJ.from_scipy(A_sp), pt.MatAIJ.from_scipy(B_sp)
    x = np.random.default_rng(2).random(25)
    Cs = MatComposite.create([A, B], "additive")
    assert np.allclose(_apply(Cs, x), (A_sp + B_sp) @ x)
    Cp = MatComposite.create([A, B], "multiplicative")
    assert np.allclose(_apply(Cp, x), B_sp @ (A_sp @ x))


def test_lrc():
    A_sp = poisson2d(5)
    A = pt.MatAIJ.from_scipy(A_sp)
    rng = np.random.default_rng(3)
    U = rng.random((25, 3)); V = rng.random((25, 3)); C = rng.random((3, 3))
    M = MatLRC.create(A, U, C, V)
    x = rng.random(25)
    assert np.allclose(_apply(M, x), A_sp @ x + U @ (C @ (V.T @ x)))


def test_centering():
    M = MatCentering.create(9)
    x = np.arange(9.0)
    assert np.allclose(_apply(M, x), x - x.mean())


def test_nest():
    A_sp = poisson2d(4)
    rng = np.random.default_rng(4)
    import scipy.sparse as sp
    B_sp = sp.random(16, 8, density=0.4, random_state=5, format="csr")
    D_sp = sp.eye(8, format="csr") * 2.0
    A = pt.MatAIJ.from_scipy(A_sp)
    B = pt.MatAIJ.from_scipy(B_sp)
    D = pt.MatAIJ.from_scipy(D_sp)
    N = MatNest.create([[A, B], [None, D]])
    x = rng.random(24)
    full = np.block([[A_sp.toarray(), B_sp.toarray()],
                     [np.zeros((8, 16)), D_sp.toarray()]])
    assert np.allclose(_apply(N, x), full @ x)


def test_wrapper_in_ksp():
    """A wrapper operator drives a KSP solve (normal equations)."""
    A_sp = _nonsym()
    A = pt.MatAIJ.from_scipy(A_sp)
    N = MatNormal.create(A)
    ksp = pt.KSP().create()
    ksp.setOperators(N)
    ksp.setType("cg")
    ksp.getPC().setType("none")
    ksp.setTolerances(rtol=1e-12, max_it=500)
    rng = np.random.default_rng(6)
    xstar = rng.random(36)
    b = pt.Vec.from_array(A_sp.T @ (A_sp @ xstar))
    x = N.createVecRight()
    ksp.solve(b, x)
    assert np.allclose(np.asarray(x.getArray()), xstar, atol=1e-6)


def test_create_submatrix():
    import scipy.sparse as sp
    rng = np.random.default_rng(3)
    A0 = sp.random(8, 8, density=0.5, random_state=3, format="csr")
    A = pt.MatAIJ.from_scipy(A0)
    rows = np.array([1, 3, 5])
    cols = np.array([0, 2, 4, 6])
    S = A.createSubMatrix(rows, cols)
    assert np.allclose(S.to_scipy().toarray(), A0.toarray()[rows][:, cols])


def test_zero_rows_columns():
    """Symmetric Dirichlet elimination keeps the solution of the reduced
    system and preserves symmetry (MatZeroRowsColumns semantics)."""
    import scipy.sparse as sp
    n = 10
    A0 = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n)).tocsr()
    A = pt.MatAIJ.from_scipy(A0)
    xex = np.linspace(0.0, 1.0, n)
    b = pt.Vec.from_array(A0 @ xex)
    x = pt.Vec.from_array(xex)       # boundary values live here
    A.zeroRowsColumns([0, n - 1], diag=1.0, x=x, b=b)
    Anew = A.to_scipy().toarray()
    assert np.allclose(Anew, Anew.T)          # symmetry preserved
    assert Anew[0, 1] == 0 and Anew[1, 0] == 0
    sol = np.linalg.solve(Anew, np.asarray(b.getArray())[:n])
    assert np.allclose(sol, xex, atol=1e-12)


def test_mat_schur_complement():
    """MatSchurComplement: implicit S x == dense Schur complement
    (schurm.c), inner CG solve nested inside the operator; and it works
    as the operator of an OUTER KSP."""
    import scipy.sparse as sp
    from petsc_tpu.mat.utility import MatSchurComplement
    from petsc_tpu.ops import operator
    rng = np.random.default_rng(5)
    n0, n1 = 14, 6
    F = sp.diags([4.0] * n0) + sp.random(n0, n0, density=0.2,
                                         random_state=1) * 0.1
    F = ((F + F.T) * 0.5).tocsr()          # SPD-ish
    Bt = sp.random(n0, n1, density=0.4, random_state=2, format="csr")
    Bm = sp.csr_matrix(Bt.T)
    C = sp.eye(n1, format="csr") * 0.3
    A00 = pt.MatAIJ.from_scipy(F)
    A01 = pt.MatAIJ.from_scipy(Bt)
    A10 = pt.MatAIJ.from_scipy(Bm)
    A11 = pt.MatAIJ.from_scipy(C)
    S = MatSchurComplement.create(A00, A01, A10, A11)
    S.getKSP().setType("cg")
    S.getKSP().setTolerances(rtol=1e-12)
    op = operator.bind(S.meta, S.device_data())
    x = rng.random(n1)
    xpad = np.zeros(A01.col_layout.Npad)
    xpad[:n1] = x
    y = np.asarray(op.mult(jnp.asarray(xpad)))[:n1]
    Sd = C.toarray() - Bm.toarray() @ np.linalg.solve(F.toarray(),
                                                     Bt.toarray())
    assert np.allclose(y, Sd @ x, atol=1e-8)
    # as operator of an outer gmres
    ksp = pt.KSP().create()
    ksp.setOperators(S)
    ksp.setType("gmres")
    ksp.getPC().setType("none")
    ksp.setTolerances(rtol=1e-10)
    b = pt.Vec.from_array(np.ones(n1))
    xs = pt.Vec.from_array(np.zeros(n1))
    ksp.solve(b, xs)
    assert ksp.getConvergedReason().converged
    assert np.allclose(Sd @ np.asarray(xs.getArray())[:n1], 1.0, atol=1e-7)


def test_mat_is_unassembled():
    """MATIS: 1-D Poisson from two subdomain Neumann matrices; the
    batched-apply equals the assembled operator, and a KSP solves
    through the unassembled form directly."""
    import scipy.sparse as sp
    from petsc_tpu.mat.utility import MatIS
    n = 9                       # global dofs 0..8, interface at 4
    k_loc = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(5, 5)).tolil()
    # Neumann local matrices: half-stiffness at subdomain ends
    for A_l in (k_loc,):
        pass
    kl = k_loc.toarray()
    kl[0, 0] = kl[-1, -1] = 1.0     # free (Neumann) ends
    A1 = kl.copy()
    A2 = kl.copy()
    M = MatIS.create(n, [A1, A2], [np.arange(0, 5), np.arange(4, 9)])
    S = M.assemble_global().to_scipy().toarray()
    # interior rows are the standard (-1, 2, -1); interface row sums halves
    assert S[4, 4] == 2.0 and S[3, 3] == 2.0
    from petsc_tpu.ops import operator
    op = operator.bind(M.meta, M.device_data())
    x = np.random.default_rng(0).random(n)
    xp = np.zeros(M.row_layout.Npad)
    xp[:n] = x
    assert np.allclose(np.asarray(op.mult(jnp.asarray(xp)))[:n], S @ x,
                       atol=1e-12)
    assert M.interface_multiplicity()[4] == 2.0
    # solve through the unassembled operator (pinned ends via shift)
    Mshift = MatIS.create(n, [A1 + np.eye(5), A2 + np.eye(5)],
                          [np.arange(0, 5), np.arange(4, 9)])
    ksp = pt.KSP().create()
    ksp.setOperators(Mshift)
    ksp.setType("cg")
    ksp.getPC().setType("none")
    ksp.setTolerances(rtol=1e-10)
    b = pt.Vec.from_array(np.ones(n))
    xs = pt.Vec.from_array(np.zeros(n))
    ksp.solve(b, xs)
    assert ksp.getConvergedReason().converged
    Sg = Mshift.assemble_global().to_scipy().toarray()
    assert np.allclose(Sg @ np.asarray(xs.getArray())[:n], 1.0, atol=1e-7)
