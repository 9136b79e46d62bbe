"""Tests for the extended KSP set (cgs/tfqmr/cr/gcr/lsqr/pipecg/fgmres)."""

import numpy as np
import pytest
import scipy.sparse as sp

import petsc_tpu as pt
from tests.test_mg_gamg import poisson2d


def nonsym(n=20):
    A = poisson2d(n).tolil()
    A[0, 1] = -0.5  # break symmetry
    A[5, 3] = -1.7
    return A.tocsr()


def run(ksp_type, A_sp, pc="jacobi", rtol=1e-8, max_it=500):
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType(ksp_type)
    ksp.getPC().setType(pc)
    ksp.setTolerances(rtol=rtol, max_it=max_it)
    u = A.createVecRight()
    u.setArray(np.random.default_rng(7).random(A_sp.shape[0]))
    b = A.createVecLeft()
    A.mult(u, b)
    x = A.createVecRight()
    ksp.solve(b, x)
    x.axpy(-1.0, u)
    return ksp, float(x.norm()) / float(u.norm())


@pytest.mark.parametrize("kt", ["cgs", "tfqmr", "gcr", "fgmres", "lsqr"])
def test_nonsymmetric(kt):
    ksp, err = run(kt, nonsym(), max_it=2000 if kt == "lsqr" else 500)
    assert ksp.getConvergedReason().converged, (kt, ksp.getConvergedReason())
    assert err < 1e-5, (kt, err)


@pytest.mark.parametrize("kt", ["cr", "pipecg"])
def test_spd(kt):
    ksp, err = run(kt, poisson2d(24))
    assert ksp.getConvergedReason().converged, (kt, ksp.getConvergedReason())
    assert err < 1e-6, (kt, err)


def test_pipecg_matches_cg():
    k1, _ = run("pipecg", poisson2d(20))
    k2, _ = run("cg", poisson2d(20))
    assert abs(k1.getIterationNumber() - k2.getIterationNumber()) <= 2


def test_lsqr_rectangular_normal():
    """LSQR on an overdetermined least-squares via MatShell."""
    rng = np.random.default_rng(0)
    M = rng.random((40, 12))
    xstar = rng.random(12)
    b = M @ xstar
    import jax.numpy as jnp
    A = pt.MatShell()
    A.setSizes((40, 12))
    Mj = jnp.asarray(M)
    A.setShellOperations(mult=lambda v: Mj @ v,
                         mult_transpose=lambda v: Mj.T @ v)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("lsqr")
    ksp.getPC().setType("none")
    ksp.setTolerances(rtol=1e-12, max_it=300)
    bx = pt.Vec.from_array(b)
    x = pt.Vec.from_array(np.zeros(12))
    ksp.solve(bx, x)
    assert np.allclose(np.asarray(x.getArray()), xstar, atol=1e-8)


def test_symmlq_indefinite():
    """Symmetric indefinite system (shifted Poisson)."""
    import scipy.sparse as sp
    A_sp = (poisson2d(16) - 0.7 * sp.eye(256)).tocsr()
    ksp, err = run("symmlq", A_sp, pc="none", max_it=2000)
    assert ksp.getConvergedReason().converged
    assert err < 1e-5


def test_cgne_nonsymmetric():
    ksp, err = run("cgne", nonsym(), pc="none", rtol=1e-10, max_it=3000)
    assert ksp.getConvergedReason().converged
    assert err < 1e-4


def test_fcg_variable_pc():
    """FCG with an inner-KSP (variable) preconditioner."""
    A_sp = poisson2d(20)
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("fcg")
    pc = ksp.getPC()
    pc.setType("ksp")
    inner = pc._impl.getKSP()
    inner.setType("cg")
    inner.setTolerances(rtol=1e-2, max_it=10)
    inner.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-8, max_it=300)
    u = A.createVecRight(); u.set(1.0)
    b = A.createVecLeft(); A.mult(u, b)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    x.axpy(-1.0, u)
    assert float(x.norm()) < 1e-5

def test_bcgsl():
    """BiCGstab(2) on a nonsymmetric system (bcgsl.c model)."""
    ksp, err = run("bcgsl", nonsym())
    assert ksp.getConvergedReason().converged
    assert err < 1e-5


def test_bcgsl_ell4():
    A_sp = nonsym()
    n = A_sp.shape[0]
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("bcgsl")
    ksp.setParam("ell", 4)
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-10)
    b = pt.Vec.from_array(np.random.default_rng(1).random(n))
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    r = A_sp @ np.asarray(x.getArray())[:n] - np.asarray(b.getArray())[:n]
    assert np.linalg.norm(r) < 1e-8 * np.linalg.norm(np.asarray(b.getArray()))


def test_stcg_unconstrained_matches_cg():
    """Radius 0 (default): stcg == plain CG on an SPD system."""
    ksp, err = run("stcg", poisson2d(20))
    assert ksp.getConvergedReason().converged
    assert err < 1e-6


def test_stcg_trust_region_boundary():
    """A small radius lands the iterate ON the boundary with reason
    CONVERGED_STEP_LENGTH (stcg.c); pc=none so the M-norm is Euclidean."""
    A_sp = poisson2d(20)
    xex = np.linalg.solve(A_sp.toarray(),
                          np.ones(A_sp.shape[0]))
    full = np.linalg.norm(xex)
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("stcg")
    ksp.getPC().setType("none")
    ksp.setRadius(0.25 * full)
    b = pt.Vec.from_array(np.ones(A_sp.shape[0]))
    x = A.createVecRight()
    ksp.solve(b, x)
    from petsc_tpu.sys.error import KSPConvergedReason as KR
    assert ksp.getConvergedReason() == KR.CONVERGED_STEP_LENGTH
    nx = np.linalg.norm(np.asarray(x.getArray())[: A_sp.shape[0]])
    assert abs(nx - 0.25 * full) < 1e-6 * full


def test_iludt():
    """-pc_factor_drop_tolerance routes ILU to the drop-tolerance variant;
    stronger than ILU(0) on a 2-D Poisson."""
    A_sp = poisson2d(24)
    A = pt.MatAIJ.from_scipy(A_sp)
    its = {}
    for name, opts in (("ilu0", []),
                       ("iludt", ["-pc_factor_drop_tolerance", "1e-4"])):
        pt.init(args=opts)
        ksp = pt.KSP().create()
        ksp.setOperators(A)
        ksp.setType("gmres")
        ksp.getPC().setType("ilu")
        ksp.setTolerances(rtol=1e-8)
        ksp.setFromOptions()
        b = pt.Vec.from_array(np.ones(A_sp.shape[0]))
        x = A.createVecRight()
        ksp.solve(b, x)
        assert ksp.getConvergedReason().converged
        its[name] = ksp.getIterationNumber()
    assert its["iludt"] < its["ilu0"]


@pytest.mark.parametrize("sval", [1, 2, 4])
def test_idr_s(sval):
    """IDR(s) on a nonsymmetric system; works across shadow-space sizes."""
    A_sp = nonsym()
    n = A_sp.shape[0]
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("idr")
    ksp.setParam("s", sval)
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-9, max_it=400)
    b = pt.Vec.from_array(np.ones(n))
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged, (sval,
                                                ksp.getConvergedReason())
    r = A_sp @ np.asarray(x.getArray())[:n] - 1.0
    assert np.linalg.norm(r) < 1e-6


def test_idr_faster_than_bcgs_matvecs():
    """IDR(4) should need no more outer iterations than BiCGStab on a
    tougher nonsymmetric problem (the method's selling point)."""
    A_sp = nonsym(24)
    A = pt.MatAIJ.from_scipy(A_sp)

    def its(kt, s=None):
        ksp = pt.KSP().create()
        ksp.setOperators(A)
        ksp.setType(kt)
        if s:
            ksp.setParam("s", s)
        ksp.getPC().setType("jacobi")
        ksp.setTolerances(rtol=1e-8, max_it=500)
        b = pt.Vec.from_array(np.ones(A_sp.shape[0]))
        x = A.createVecRight()
        ksp.solve(b, x)
        assert ksp.getConvergedReason().converged
        return ksp.getIterationNumber()

    # each idr iteration does s+1 matvecs vs bcgs's 2
    assert its("idr", s=4) * 5 <= its("bcgs") * 2 * 3


def test_lcd():
    """LCD (left conjugate directions, lcd.c) on a nonsymmetric system."""
    ksp, err = run("lcd", nonsym())
    assert ksp.getConvergedReason().converged
    assert err < 1e-5


def test_tcqmr():
    """TCQMR (Chan's transpose-free QMR, tcqmr.c): nonsymmetric solve;
    the reported norm is the QMR upper bound, so verify the TRUE residual
    of the returned iterate."""
    A_sp = nonsym()
    n = A_sp.shape[0]
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("tcqmr")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-10, max_it=600)
    b = pt.Vec.from_array(np.ones(n))
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged, ksp.getConvergedReason()
    r = A_sp @ np.asarray(x.getArray())[:n] - 1.0
    assert np.linalg.norm(r) < 1e-6


def test_tsirm():
    """TSIRM (two-stage + LS restarting, tsirm.c): converges on a tough
    nonsymmetric system; final TRUE residual small."""
    A_sp = nonsym(20)
    n = A_sp.shape[0]
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("tsirm")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-9, max_it=2000)
    b = pt.Vec.from_array(np.ones(n))
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged, ksp.getConvergedReason()
    r = A_sp @ np.asarray(x.getArray())[:n] - 1.0
    assert np.linalg.norm(r) < 1e-5


def test_dgmres_deflation_beats_restarted_gmres():
    """DGMRES (dgmres.c): on a system with a few isolated small
    eigenvalues, deflated restarts converge where plain GMRES(m)
    stagnates or needs far more iterations."""
    import scipy.sparse as sp
    rng = np.random.default_rng(3)
    n = 120
    # spectrum: bulk near 1..2, plus 4 tiny isolated eigenvalues
    d = np.concatenate([np.array([1e-3, 2e-3, 5e-3, 1e-2]),
                        1.0 + rng.random(n - 4)])
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    A_d = sp.csr_matrix(Q @ np.diag(d) @ Q.T)
    A = pt.MatAIJ.from_scipy(A_d)

    def its_of(kt, **params):
        ksp = pt.KSP().create()
        ksp.setOperators(A)
        ksp.setType(kt)
        for k, v in params.items():
            ksp.setParam(k, v)
        ksp.getPC().setType("none")
        ksp.setTolerances(rtol=1e-8, max_it=600)
        b = pt.Vec.from_array(np.ones(n))
        x = A.createVecRight()
        ksp.solve(b, x)
        r = A_d @ np.asarray(x.getArray())[:n] - 1.0
        return (ksp.getIterationNumber(), ksp.getConvergedReason(),
                np.linalg.norm(r))

    itd, rd, resd = its_of("dgmres", restart=20, max_eigen=6)
    assert rd.converged, rd
    assert resd < 1e-5
    itg, rg, _ = its_of("gmres", restart=20)
    assert itd < itg or not rg.converged, (itd, itg)
