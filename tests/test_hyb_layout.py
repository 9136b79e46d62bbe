"""HYB layout (high-occupancy DIA + gather-ELL spill) — the TPU answer to
near-stencil unstructured matrices (SuiteSparse atmosmodd-class, BASELINE
config 2). Reference role models: cuSPARSE HYB and MATSELL
(src/mat/impls/sell/seq/sell.c)."""
import numpy as np
import pytest
import scipy.sparse as sp

import petsc_tpu as pt
from petsc_tpu.mat.aij import MatAIJ


def near_stencil(n1d=40, seed=0, extra_per_row=1):
    """7-pt-ish stencil on an n1d^2 grid plus a few random off-band
    entries per row — DIA alone can't represent it, HYB should."""
    n = n1d * n1d
    A = sp.diags(
        [6.5 + np.arange(n) % 7 / 7, -1.0 * np.ones(n - 1),
         -1.0 * np.ones(n - 1), -1.1 * np.ones(n - n1d),
         -1.1 * np.ones(n - n1d)],
        [0, 1, -1, n1d, -n1d], format="lil")
    rng = np.random.default_rng(seed)
    for i in range(0, n, 3):
        for _ in range(extra_per_row):
            j = int(rng.integers(0, n))
            A[i, j] = 0.01 * (1 + (i + j) % 5)
    return A.tocsr()


@pytest.fixture(scope="module")
def ctx():
    pt.init(args=[])
    yield


def test_auto_selects_hyb(ctx):
    A = near_stencil()
    M = MatAIJ.from_scipy(A)
    assert M.meta[0] == "aij_hyb", M.meta[0]
    offs = M.meta[3]
    assert set(offs) >= {-40, -1, 0, 1, 40}


def test_hyb_mult_matches_scipy(ctx):
    A = near_stencil()
    M = MatAIJ.from_scipy(A)
    x = np.cos(np.arange(A.shape[0]) * 0.37)
    xv = pt.Vec.from_array(x)
    yv = M.createVecLeft()
    M.mult(xv, yv)
    np.testing.assert_allclose(np.asarray(yv.array)[:A.shape[0]], A @ x,
                               rtol=1e-12, atol=1e-12)


def test_hyb_mult_transpose(ctx):
    A = near_stencil()
    M = MatAIJ.from_scipy(A)
    x = np.sin(np.arange(A.shape[0]) * 0.11 + 0.3)
    xv = pt.Vec.from_array(x)
    yv = M.createVecRight()
    M.multTranspose(xv, yv)
    np.testing.assert_allclose(np.asarray(yv.array)[:A.shape[0]], A.T @ x,
                               rtol=1e-12, atol=1e-12)


def test_hyb_numeric_update(ctx):
    """Same pattern, new values through the device COO numeric path."""
    A = near_stencil()
    M = MatAIJ.from_scipy(A)
    A2 = A.copy()
    A2.data = A2.data * 1.7 + 0.01
    M.setValuesCSR(A2.indptr, A2.indices, A2.data)
    M.assemble()
    x = np.cos(np.arange(A.shape[0]) * 0.5)
    xv = pt.Vec.from_array(x)
    yv = M.createVecLeft()
    M.mult(xv, yv)
    np.testing.assert_allclose(np.asarray(yv.array)[:A.shape[0]], A2 @ x,
                               rtol=1e-12, atol=1e-12)


def test_hyb_diag_and_solve(ctx):
    """CG+Jacobi through the HYB operator converges to the true solution."""
    A = near_stencil(extra_per_row=1)
    A = (A + A.T) * 0.5 + sp.eye(A.shape[0]) * 5.0   # SPD-ish
    M = MatAIJ.from_scipy(A.tocsr())
    assert M.meta[0] == "aij_hyb"
    n = A.shape[0]
    xs = np.linspace(-1, 1, n)
    b = A @ xs
    ksp = pt.KSP()
    ksp.setOperators(M)
    ksp.setType("cg")
    ksp.pc.setType("jacobi")
    ksp.setTolerances(rtol=1e-10, max_it=2000)
    x = pt.Vec.from_array(np.zeros(n))
    bv = pt.Vec.from_array(b)
    ksp.solve(bv, x)
    np.testing.assert_allclose(np.asarray(x.array)[:n], xs, atol=1e-6)


def test_pure_stencil_still_routes_dia_or_dnd(ctx):
    """No regression: an exactly-banded matrix must not pick hyb."""
    n = 1200
    A = sp.diags([4.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    M = MatAIJ.from_scipy(A)
    assert M.meta[0] in ("aij_dia", "aij_dnd"), M.meta[0]
