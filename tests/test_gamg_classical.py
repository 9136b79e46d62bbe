"""Classical (Ruge-Stüben) AMG (-pc_gamg_type classical).

Reference: src/ksp/pc/impls/gamg/classical.c — classical strength graph,
MIS coarse points, direct/standard ±-split interpolation, optional
Jacobi-smoothed prolongator (-pc_gamg_classical_nsmooths)."""

import numpy as np
import pytest

import petsc_tpu as pt
from petsc_tpu.pc.gamg_classical import (classical_direct_prolongator,
                                         classical_strength)
from tests.test_mg_gamg import poisson2d, poisson3d


def _solve(A_sp, args, rtol=1e-8):
    pt.init(args=args)
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setTolerances(rtol=rtol)
    ksp.setFromOptions()
    b = A.createVecLeft()
    b.set(1.0)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason() > 0
    return ksp, np.asarray(x.getArray())[: A_sp.shape[0]]


def test_classical_strength_keeps_negative_couplings():
    A = poisson2d(8)
    G = classical_strength(A, 0.0)
    # 5-point Laplacian: all off-diagonals are strong at theta=0
    assert G.nnz == A.nnz - A.shape[0]
    G5 = classical_strength(A, 0.5)
    assert G5.nnz == G.nnz        # uniform stencil: all equal to the max


def test_classical_direct_rows_sum_reasonably():
    """F-rows of direct interpolation reproduce constants approximately
    for an M-matrix interior (P*1 == 1 exactly where all neighbors are
    strong C or accounted F-weak)."""
    A = poisson2d(12)
    from petsc_tpu.pc.gamg import mis_aggregate
    G = classical_strength(A, 0.0)
    agg, nagg, roots = mis_aggregate(G)
    P = classical_direct_prolongator(A, roots, 0.0)
    assert P.shape == (A.shape[0], len(roots))
    ones = P @ np.ones(P.shape[1])
    # C-rows are exactly 1; F rows bounded (diagonally dominant weights)
    assert np.all(ones[roots] == 1.0)
    assert ones.max() <= 1.5 + 1e-12 and ones.min() >= -0.1


@pytest.mark.parametrize("ctype,maxits", [("direct", 25), ("standard", 15)])
def test_classical_amg_poisson2d(ctype, maxits):
    A_sp = poisson2d(48)
    ksp, x = _solve(A_sp, ["-pc_type", "gamg", "-pc_gamg_type", "classical",
                           "-pc_gamg_classical_type", ctype,
                           "-ksp_type", "cg"])
    assert ksp.getIterationNumber() <= maxits
    assert len(ksp.getPC()._impl.levels) >= 3
    r = A_sp @ x - 1.0
    assert np.linalg.norm(r) / np.linalg.norm(np.ones(len(x))) < 1e-6


def test_classical_amg_poisson3d_smoothed():
    A_sp = poisson3d(14)
    ksp, x = _solve(A_sp, ["-pc_type", "gamg", "-pc_gamg_type", "classical",
                           "-pc_gamg_classical_nsmooths", "1",
                           "-ksp_type", "cg"])
    assert ksp.getIterationNumber() <= 20
    r = A_sp @ x - 1.0
    assert np.linalg.norm(r) / np.linalg.norm(np.ones(len(x))) < 1e-6


def test_geometric_prolongator_linear_exactness():
    """geo.c's defining property: P reproduces linear functions at fine
    points that got geometric weights."""
    from petsc_tpu.pc.gamg import mis_aggregate
    from petsc_tpu.pc.gamg_classical import geometric_prolongator
    n = 16
    A = poisson2d(n)
    xy = np.stack(np.meshgrid(np.arange(n), np.arange(n),
                              indexing="ij"), axis=-1).reshape(-1, 2) * 1.0
    G = classical_strength(A, 0.0)
    agg, nagg, roots = mis_aggregate(G)
    P = geometric_prolongator(A, roots, xy, 0.0)
    lin = 2.0 * xy[:, 0] - 3.0 * xy[:, 1] + 1.0
    interp = P @ lin[roots]
    # rows that achieved the geometric weights are exact; direct-fallback
    # rows (boundary-degenerate) are not counted
    ok = np.abs(interp - lin) < 1e-9
    assert ok[roots].all()
    assert ok.mean() > 0.5          # most fine points get exact rows


def test_geo_amg_poisson2d_converges():
    n = 32
    A_sp = poisson2d(n)
    xy = np.stack(np.meshgrid(np.arange(n), np.arange(n),
                              indexing="ij"), axis=-1).reshape(-1, 2) * 1.0
    pt.init(args=["-pc_type", "gamg", "-pc_gamg_type", "geo",
                  "-ksp_type", "cg"])
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setTolerances(rtol=1e-8)
    ksp.getPC().setCoordinates(xy)
    ksp.setFromOptions()
    b = A.createVecLeft()
    b.set(1.0)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason() > 0
    assert ksp.getIterationNumber() <= 25
    r = A_sp @ np.asarray(x.getArray())[: A_sp.shape[0]] - 1.0
    assert np.linalg.norm(r) / n < 1e-6
