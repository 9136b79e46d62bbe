"""Blocked (BAIJ/BELL) format tests — reference src/mat/impls/baij."""

import numpy as np
import pytest
import scipy.sparse as sp

import petsc_tpu as pt
from tests.test_mg_gamg import poisson2d


def block_matrix(n=10, bs=3, seed=0):
    """Random block matrix with a stencil block pattern + dominant diag."""
    rng = np.random.default_rng(seed)
    base = poisson2d(n)  # pattern source (n^2 x n^2 blocks)
    rows, cols = base.nonzero()
    nb = base.shape[0]
    data = rng.standard_normal((len(rows), bs, bs)) * 0.1
    diag = rows == cols
    data[diag] += 4.0 * np.eye(bs)
    A = sp.bsr_matrix((data, cols, base.indptr), shape=(nb * bs, nb * bs))
    return A.tocsr()


@pytest.mark.parametrize("bs", [2, 3, 4, 6])
def test_bell_spmv_matches(bs):
    A_sp = block_matrix(bs=bs)
    A = pt.MatAIJ.from_scipy(A_sp)
    A.setBlockSize(bs)
    assert A.meta[0] == "aij_bell"
    x = np.random.default_rng(1).random(A_sp.shape[0])
    y = A.createVecLeft()
    A.mult(pt.Vec.from_array(x), y)
    assert np.allclose(np.asarray(y.getArray()), A_sp @ x)
    # transpose
    yt = A.createVecRight()
    A.multTranspose(pt.Vec.from_array(x), yt)
    assert np.allclose(np.asarray(yt.getArray()), A_sp.T @ x)


def test_bell_solve_pbjacobi():
    bs = 3
    A_sp = block_matrix(bs=bs)
    A_sym = (A_sp + A_sp.T) * 0.5
    A = pt.MatAIJ.from_scipy(A_sym.tocsr())
    A.setBlockSize(bs)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("pbjacobi")
    ksp.setTolerances(rtol=1e-10, max_it=300)
    u = A.createVecRight(); u.set(1.0)
    b = A.createVecLeft(); A.mult(u, b)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    x.axpy(-1.0, u)
    assert float(x.norm()) < 1e-7


def test_bell_coo_numeric_update():
    bs = 2
    A_sp = block_matrix(n=6, bs=bs)
    A = pt.MatAIJ(None)
    A.setSizes(A_sp.shape)
    coo = A_sp.tocoo()
    A.setPreallocationCOO(coo.row, coo.col)
    A.setBlockSize(bs)
    A.setValuesCOO(coo.data)
    x = np.random.default_rng(2).random(A_sp.shape[0])
    y = A.createVecLeft()
    A.mult(pt.Vec.from_array(x), y)
    assert np.allclose(np.asarray(y.getArray()), A_sp @ x)
    # update values on device
    A.setValuesCOO(2.0 * coo.data)
    A.mult(pt.Vec.from_array(x), y)
    assert np.allclose(np.asarray(y.getArray()), 2.0 * (A_sp @ x))


def test_dndb_block_stencil_kind():
    """bs>1 on a declared grid takes the fused block-stencil layout."""
    import scipy.sparse as sp
    n, bs = 10, 3
    base = poisson2d(n)
    rows, cols = base.nonzero()
    rng = np.random.default_rng(0)
    data = rng.standard_normal((len(rows), bs, bs))
    A_sp = sp.bsr_matrix((data, cols, base.indptr),
                         shape=(n * n * bs, n * n * bs)).tocsr()
    A = pt.MatAIJ.from_scipy(A_sp)
    A.setBlockSize(bs)
    A.setStencilGrid((n, n))
    assert A.meta[0] == "aij_dndb"
    x = rng.random(n * n * bs)
    y = A.createVecLeft(); A.mult(pt.Vec.from_array(x), y)
    assert np.allclose(np.asarray(y.getArray()), A_sp @ x)
    yt = A.createVecRight(); A.multTranspose(pt.Vec.from_array(x), yt)
    assert np.allclose(np.asarray(yt.getArray()), A_sp.T @ x)
    # solve path
    A_sym = pt.MatAIJ.from_scipy(((A_sp + A_sp.T) * 0.5
                                  + 20 * sp.eye(n * n * bs)).tocsr())
    A_sym.setBlockSize(bs)
    A_sym.setStencilGrid((n, n))
    ksp = pt.KSP().create()
    ksp.setOperators(A_sym)
    ksp.setType("cg")
    ksp.getPC().setType("pbjacobi")
    ksp.setTolerances(rtol=1e-10)
    b = A_sym.createVecLeft(); b.set(1.0)
    xs = A_sym.createVecRight()
    ksp.solve(b, xs)
    assert ksp.getConvergedReason().converged
