"""Round-3 inventory fills: KSP bicg/cgls/qmrcgs (+ pipelined aliases)
and PC qr/spai/nn."""

import numpy as np
import pytest
import scipy.sparse as sp

import petsc_tpu as pt
from petsc_tpu.parallel.mesh import comm_self


def _nonsym(n=300, seed=1):
    rng = np.random.default_rng(seed)
    A = (sp.diags(2.0 + rng.random(n))
         + 0.3 * sp.random(n, n, density=0.03, format="csr",
                           random_state=seed)).tocsr()
    b = rng.random(n)
    return A, b, sp.linalg.spsolve(A.tocsc(), b)


def _spd(n=40):
    ex = np.ones(n)
    T = sp.diags([-ex[:-1], 2 * ex, -ex[:-1]], [-1, 0, 1], format="csr")
    A = (sp.kron(T, sp.identity(n)) + sp.kron(sp.identity(n), T)).tocsr()
    rng = np.random.default_rng(2)
    b = rng.random(A.shape[0])
    return A, b, sp.linalg.spsolve(A.tocsc(), b)


def _solve(A_sp, b_np, ktype, pctype, rtol=1e-10, max_it=800):
    A = pt.MatAIJ.from_scipy(A_sp, comm=comm_self())
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType(ktype)
    ksp.getPC().setType(pctype)
    ksp.setTolerances(rtol=rtol, max_it=max_it)
    b = A.createVecLeft(); b.setArray(b_np)
    x = A.createVecRight()
    ksp.solve(b, x)
    return ksp, np.asarray(x.getArray())[:A_sp.shape[0]]


@pytest.mark.parametrize("ktype", ["bicg", "qmrcgs", "pipebcgs"])
def test_nonsymmetric_solvers(ktype):
    A, b, xr = _nonsym()
    ksp, x = _solve(A, b, ktype, "jacobi")
    assert ksp.getConvergedReason().converged
    assert np.abs(x - xr).max() < 1e-6


def test_cgls_least_squares():
    A, b, xr = _nonsym()
    ksp, x = _solve(A, b, "cgls", "none")
    assert ksp.getConvergedReason().converged
    assert np.abs(x - xr).max() < 1e-6


def test_bicg_matches_cg_on_spd():
    """On SPD operators BiCG reduces to CG — same trajectory length."""
    A, b, xr = _spd()
    k1, x1 = _solve(A, b, "bicg", "jacobi", rtol=1e-8)
    k2, x2 = _solve(A, b, "cg", "jacobi", rtol=1e-8)
    assert k1.getConvergedReason().converged
    assert abs(k1.getIterationNumber() - k2.getIterationNumber()) <= 2
    assert np.abs(x1 - xr).max() < 1e-5


@pytest.mark.parametrize("ktype", ["pipecr", "pipefcg"])
def test_pipelined_aliases_spd(ktype):
    A, b, xr = _spd()
    ksp, x = _solve(A, b, ktype, "jacobi", rtol=1e-9)
    assert ksp.getConvergedReason().converged
    assert np.abs(x - xr).max() < 1e-5


def test_pc_qr_direct():
    A, b, xr = _nonsym(150)
    ksp, x = _solve(A, b, "preonly", "qr")
    assert np.abs(x - xr).max() < 1e-9


def test_pc_qr_singular_pinv():
    A, b, xr = _nonsym(100)
    As = A.tolil(); As[:, 0] = 0; As[0, :] = 0
    ksp, x = _solve(As.tocsr(), b, "preonly", "qr")
    assert np.all(np.isfinite(x))


@pytest.mark.parametrize("pat", ["same", "power2"])
def test_pc_spai(pat):
    A, b, xr = _nonsym(200)
    pt.init(args=["-pc_spai_pattern", pat])
    Am = pt.MatAIJ.from_scipy(A, comm=comm_self())
    ksp = pt.KSP().create(); ksp.setOperators(Am)
    ksp.setType("gmres"); ksp.getPC().setType("spai")
    ksp.setFromOptions()
    ksp.setTolerances(rtol=1e-10, max_it=300)
    bv = Am.createVecLeft(); bv.setArray(b)
    x = Am.createVecRight(); ksp.solve(bv, x)
    assert ksp.getConvergedReason().converged
    assert ksp.getIterationNumber() <= 20
    assert np.abs(np.asarray(x.getArray())[:200] - xr).max() < 1e-6


def test_pc_nn_matis():
    from test_bddc import build_matis_poisson
    M, n = build_matis_poisson(ne=16, nsub=4)
    ksp = pt.KSP().create(); ksp.setOperators(M)
    ksp.setType("cg"); ksp.getPC().setType("nn")
    ksp.setTolerances(rtol=1e-8, max_it=500)
    b = pt.Vec.from_array(np.ones(n)); x = pt.Vec.from_array(np.zeros(n))
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    assert ksp.getIterationNumber() < 20
    S = M.assemble_global().to_scipy()
    assert np.linalg.norm(S @ np.asarray(x.getArray())[:n] - 1.0) \
        < 1e-6 * np.sqrt(n)
