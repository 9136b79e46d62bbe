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


def test_spai_batched_matches_loop():
    """The vectorized group solve must reproduce the per-column lstsq
    loop (spai.c / Grote-Huckle column semantics) exactly."""
    import time
    from petsc_tpu.pc.r3_pc import _PCSPAI
    A, _, _ = _nonsym(400, seed=3)
    Ac = A.tocsc()
    sizes = np.diff(Ac.indptr)
    rows_ref, cols_ref, vals_ref = [], [], []
    for j in range(A.shape[0]):
        Jj = Ac.indices[Ac.indptr[j]:Ac.indptr[j + 1]]
        if len(Jj) == 0:
            continue
        sub = Ac[:, Jj]
        I = np.unique(sub.indices)
        m, *_ = np.linalg.lstsq(sub[I].toarray(),
                                (I == j).astype(np.float64), rcond=None)
        rows_ref.append(Jj); cols_ref.append(np.full(len(Jj), j))
        vals_ref.append(m)
    import scipy.sparse as sp2
    Mref = sp2.csr_matrix((np.concatenate(vals_ref),
                           (np.concatenate(rows_ref),
                            np.concatenate(cols_ref))), shape=A.shape)
    for sz in np.unique(sizes):
        if sz == 0:
            continue
        cols = np.nonzero(sizes == sz)[0]
        J = Ac.indices[Ac.indptr[cols][:, None] + np.arange(sz)]
        r, c, v = _PCSPAI._solve_group(Ac, cols, J)
        Mb = sp2.csr_matrix((v, (r, c)), shape=A.shape)
        sub = sp2.csr_matrix(
            (Mref.toarray() * np.isin(np.arange(A.shape[0]),
                                      cols)[None, :]))
        assert np.abs((Mb - sub).toarray()).max() < 1e-10


def test_spai_setup_scales():
    """100k-row banded matrix SPAI setup in seconds, not O(n) Python
    iterations (VERDICT r3 item 10)."""
    import time
    n = 100_000
    A = sp.diags([np.full(n - 1, -1.0), np.full(n, 4.0),
                  np.full(n - 1, -1.0), np.full(n - 64, -0.5)],
                 [-1, 0, 1, 64], format="csr")
    Am = pt.MatAIJ.from_scipy(A.tocsr(), comm=comm_self())
    pc = pt.PC().create(); pc.setOperators(Am); pc.setType("spai")
    t0 = time.perf_counter()
    pc.setUp()
    dt = time.perf_counter() - t0
    assert dt < 60.0, f"SPAI setup took {dt:.1f}s on 100k rows"


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
