"""eisenstat/kaczmarz/deflation/galerkin/mat/vpbjacobi/redundant tests."""

import numpy as np
import pytest

import petsc_tpu as pt
from tests.test_more_pc import run
from tests.test_mg_gamg import poisson2d


def test_eisenstat():
    ksp, err = run("eisenstat", ksp_type="cg")
    assert ksp.getConvergedReason().converged and err < 1e-6


def test_kaczmarz():
    ksp, err = run("kaczmarz", ksp_type="gmres", max_it=2000)
    assert ksp.getConvergedReason().converged and err < 1e-3


def test_redundant():
    ksp, err = run("redundant", ksp_type="gmres")
    assert ksp.getConvergedReason().converged
    assert ksp.getIterationNumber() <= 2
    assert err < 1e-8


def test_pcmat():
    def setup(pc):
        from petsc_tpu.mat.utility import MatDiagonal
        d = 1.0 / pc.pmat.to_scipy().diagonal()
        pc._impl.setMat(MatDiagonal.create(d))
    ksp, err = run("mat", ksp_type="cg", setup=setup)
    assert ksp.getConvergedReason().converged and err < 1e-6


def test_deflation_helps():
    A_sp = poisson2d(24)

    def setup(pc):
        # deflation space: low-frequency bilinear patch modes
        n = 24
        xs = np.arange(n) / (n - 1)
        X, Y = np.meshgrid(xs, xs, indexing="ij")
        W = np.stack([np.ones(n * n), X.ravel(), Y.ravel(),
                      (X * Y).ravel()], axis=1)
        pc._impl.setSpace(W)
    k_defl, err = run("deflation", A_sp=A_sp, ksp_type="cg", setup=setup)
    k_jac, _ = run("jacobi", A_sp=A_sp, ksp_type="cg")
    assert k_defl.getConvergedReason().converged and err < 1e-6
    assert k_defl.getIterationNumber() < k_jac.getIterationNumber()


def test_galerkin_coarse_correction():
    A_sp = poisson2d(16)

    def setup(pc):
        import scipy.sparse as sp
        # P: piecewise-constant aggregation onto 4x4 patches
        n, c = 16, 4
        rows = np.arange(n * n)
        ii, jj = rows // n, rows % n
        cols = (ii // c) * (n // c) + (jj // c)
        P = sp.csr_matrix((np.ones(n * n), (rows, cols)),
                          shape=(n * n, (n // c) ** 2))
        pc._impl.setInterpolation(pt.MatAIJ.from_scipy(P))
    # galerkin alone is singular on fine modes: combine with sor
    def setup_comp(pc):
        pc._impl.ctype = "additive"
        sub = pc._impl.addPC("sor")
        g = pc._impl.addPC("galerkin")
        setup(g)
    ksp, err = run("composite", ksp_type="cg", setup=setup_comp,
                   A_sp=A_sp)
    assert ksp.getConvergedReason().converged and err < 1e-6


def test_vpbjacobi():
    from tests.test_baij import block_matrix
    A_sp = block_matrix(n=8, bs=3)
    A_sym = ((A_sp + A_sp.T) * 0.5).tocsr()

    def setup(pc):
        pc._impl.setBlockSizes(np.full(A_sym.shape[0] // 3, 3))
    ksp, err = run("vpbjacobi", A_sp=A_sym, ksp_type="cg", setup=setup)
    assert ksp.getConvergedReason().converged and err < 1e-6
