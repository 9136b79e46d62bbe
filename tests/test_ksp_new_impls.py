"""Genuine implementations behind previously-aliased KSP types (round-2
VERDICT item 3): lgmres (impls/gmres/lgmres/lgmres.c), gltr
(impls/cg/gltr/gltr.c), ibcgs (impls/ibcgs/ibcgs.c) — each with a
convergence-trajectory test distinguishing it from the solver it used to
alias."""

import numpy as np
import pytest
import scipy.sparse as sp

import petsc_tpu as pt


def convdiff2d(n, peclet=40.0):
    """Nonsymmetric 2-D convection-diffusion (upwind), restart-sensitive."""
    h = 1.0 / (n + 1)
    I = sp.eye(n)
    T = sp.diags([-1, 2, -1], [-1, 0, 1], shape=(n, n))
    C = sp.diags([-1, 1, 0], [-1, 0, 1], shape=(n, n)) * (peclet * h)
    A = sp.kron(I, T + C) + sp.kron(T, I)
    return A.tocsr()


def _solve(name, A_sp, pc="none", rtol=1e-10, max_it=600, opts=None,
           params=None):
    pt.init(args=opts or [])
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType(name)
    ksp.getPC().setType(pc)
    ksp.setTolerances(rtol=rtol, max_it=max_it)
    for k, v in (params or {}).items():
        ksp.setParam(k, v)
    ksp.setFromOptions()
    n = A_sp.shape[0]
    b = pt.Vec.from_array(np.ones(n))
    x = A.createVecRight()
    ksp.solve(b, x)
    xa = np.asarray(x.getArray())[:n]
    res = np.linalg.norm(A_sp @ xa - 1.0) / np.sqrt(n)
    return ksp, xa, res


# ------------------------------ lgmres ------------------------------

def test_lgmres_converges_and_beats_equal_work_gmres():
    """LGMRES(m,k) does m-k matvecs per cycle (the k augmentation steps
    reuse cached BA*z products, lgmres.c A_AUGVEC): per unit of Krylov
    work it must need no more cycles than GMRES(m-k), and fewer total
    matvecs than GMRES(m) per cycle would imply. Recirculating-wind
    convection-diffusion, the augmentation-friendly regime."""
    def recirc(n, pe):
        h = 1.0 / (n + 1)
        N = n * n
        A = sp.lil_matrix((N, N))
        for i in range(n):
            for j in range(n):
                p = i * n + j
                xc, yc = (j + 1) * h, (i + 1) * h
                wx = 4 * yc * (1 - yc) * (2 * xc - 1) * pe
                wy = -4 * xc * (1 - xc) * (2 * yc - 1) * pe
                A[p, p] = 4
                if j > 0:
                    A[p, p - 1] = -1 - wx * h / 2
                if j < n - 1:
                    A[p, p + 1] = -1 + wx * h / 2
                if i > 0:
                    A[p, p - n] = -1 - wy * h / 2
                if i < n - 1:
                    A[p, p + n] = -1 + wy * h / 2
        return A.tocsr()

    A_sp = recirc(20, 200)
    m, k = 10, 2
    k_g, _, _ = _solve("gmres", A_sp, rtol=1e-8, max_it=2000,
                       params={"restart": m - k})
    k_l, _, res = _solve("lgmres", A_sp, rtol=1e-8, max_it=2000,
                         params={"restart": m, "aug_dim": k})
    assert k_l.getConvergedReason().converged
    assert res < 1e-6
    cycles_g = int(np.ceil(k_g.getIterationNumber() / (m - k)))
    cycles_l = int(np.ceil(k_l.getIterationNumber() / m))
    assert cycles_l <= cycles_g


def test_lgmres_trajectory_differs_from_gcr():
    """lgmres used to be served by GCR; beyond the first restart (where
    both coincide with full GMRES) the histories must now differ."""
    A_sp = convdiff2d(16)
    k_l, _, _ = _solve("lgmres", A_sp, rtol=1e-8, params={"restart": 10})
    k_g, _, _ = _solve("gcr", A_sp, rtol=1e-8, params={"restart": 10})
    hl = np.asarray(k_l.getConvergenceHistory())
    hg = np.asarray(k_g.getConvergenceHistory())
    m = min(len(hl), len(hg), 30)
    assert m > 14
    assert not np.allclose(hl[12:m], hg[12:m], rtol=1e-6)


def test_lgmres_aug_zero_is_gmres():
    A_sp = convdiff2d(12)
    k_l, xl, _ = _solve("lgmres", A_sp, rtol=1e-9,
                        params={"restart": 15, "aug_dim": 0})
    k_g, xg, _ = _solve("gmres", A_sp, rtol=1e-9, params={"restart": 15})
    assert k_l.getIterationNumber() == k_g.getIterationNumber()
    assert np.allclose(xl, xg)


def test_lgmres_option_ksp_lgmres_augment():
    A_sp = convdiff2d(12)
    k_l, _, res = _solve("lgmres", A_sp, rtol=1e-8,
                         opts=["-ksp_lgmres_augment", "3"],
                         params={"restart": 10})
    assert k_l.getConvergedReason().converged and res < 1e-6


# ------------------------------ gltr --------------------------------

def test_gltr_unconstrained_matches_cg():
    from tests.test_mg_gamg import poisson2d
    k, x, res = _solve("gltr", poisson2d(16), pc="jacobi", rtol=1e-10)
    assert k.getConvergedReason().converged
    assert res < 1e-8


def test_gltr_boundary_spd():
    """SPD with small radius: solution on the boundary, and the GLTR
    subspace minimizer must be at least as good (lower model value) as
    the Steihaug-Toint point."""
    from tests.test_mg_gamg import poisson2d
    A_sp = poisson2d(12)
    n = A_sp.shape[0]
    xex = np.linalg.solve(A_sp.toarray(), np.ones(n))
    Delta = 0.25 * np.linalg.norm(xex)

    def qmodel(x):
        return 0.5 * x @ (A_sp @ x) - np.ones(n) @ x

    out = {}
    for name in ("stcg", "gltr"):
        pt.init(args=[])
        A = pt.MatAIJ.from_scipy(A_sp)
        ksp = pt.KSP().create()
        ksp.setOperators(A)
        ksp.setType(name)
        ksp.getPC().setType("none")
        ksp.setRadius(Delta)
        ksp.setTolerances(rtol=1e-10, max_it=300)
        b = pt.Vec.from_array(np.ones(n))
        x = A.createVecRight()
        ksp.solve(b, x)
        out[name] = np.asarray(x.getArray())[:n]
    ng = np.linalg.norm(out["gltr"])
    assert abs(ng - Delta) < 1e-6 * Delta
    assert qmodel(out["gltr"]) <= qmodel(out["stcg"]) + 1e-10


def test_gltr_indefinite_negative_curvature():
    """Indefinite Hessian: the model is unbounded inside, so the solution
    must sit on the boundary; GLTR's subspace minimum must beat STCG's
    first-negative-curvature exit."""
    rng = np.random.default_rng(5)
    n = 40
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    evals = np.linspace(-1.0, 4.0, n)
    A_d = Q @ np.diag(evals) @ Q.T
    A_sp = sp.csr_matrix(A_d)
    g = rng.standard_normal(n)
    Delta = 2.0

    def qmodel(x):
        return 0.5 * x @ (A_d @ x) - g @ x

    out = {}
    for name in ("stcg", "gltr"):
        pt.init(args=[])
        A = pt.MatAIJ.from_scipy(A_sp)
        ksp = pt.KSP().create()
        ksp.setOperators(A)
        ksp.setType(name)
        ksp.getPC().setType("none")
        ksp.setRadius(Delta)
        ksp.setTolerances(rtol=1e-10, max_it=150)
        b = pt.Vec.from_array(g)
        x = A.createVecRight()
        ksp.solve(b, x)
        out[name] = np.asarray(x.getArray())[:n]
    ng = np.linalg.norm(out["gltr"])
    assert abs(ng - Delta) < 1e-4 * Delta
    assert qmodel(out["gltr"]) <= qmodel(out["stcg"]) + 1e-8
    # compare against the exact TR minimizer (dense Moré-Sorensen)
    lam_grid = np.linspace(1.0001, 50, 20000)
    norms = [np.linalg.norm(np.linalg.solve(A_d + l * np.eye(n), g))
             for l in lam_grid]
    lam_star = lam_grid[int(np.argmin(np.abs(np.asarray(norms) - Delta)))]
    x_star = np.linalg.solve(A_d + lam_star * np.eye(n), g)
    # the ~21-dim Lanczos subspace captures >=90% of the exact TR decrease
    assert qmodel(out["gltr"]) <= 0.9 * qmodel(x_star)


# ------------------------------ ibcgs -------------------------------

def test_ibcgs_converges_nonsymmetric():
    A_sp = convdiff2d(20)
    k, _, res = _solve("ibcgs", A_sp, pc="jacobi", rtol=1e-9)
    assert k.getConvergedReason().converged
    assert res < 1e-7


def test_ibcgs_trajectory_close_to_bcgs_but_distinct_impl():
    """Same BiCGStab family => similar iteration counts; the restructured
    recurrence gives a numerically different history (ibcgs.c notes the
    different rounding trajectory)."""
    A_sp = convdiff2d(16)
    k_b, xb, _ = _solve("bcgs", A_sp, pc="jacobi", rtol=1e-9)
    k_i, xi, _ = _solve("ibcgs", A_sp, pc="jacobi", rtol=1e-9)
    assert k_i.getConvergedReason().converged
    nb, ni = k_b.getIterationNumber(), k_i.getIterationNumber()
    assert ni <= 2 * nb + 10
    assert np.allclose(xb, xi, atol=1e-6)
    hb = np.asarray(k_b.getConvergenceHistory())
    hi = np.asarray(k_i.getConvergenceHistory())
    m = min(len(hb), len(hi), ni, nb)
    assert not np.array_equal(hb[1:m], hi[1:m])


def test_symmlq_real_implementation():
    """SYMMLQ (symmlq.c LQ recurrence): converges on SPD and symmetric
    INDEFINITE systems; its trajectory differs from MINRES (which used to
    serve it)."""
    from tests.test_mg_gamg import poisson2d
    A_sp = poisson2d(20)
    k, _, res = _solve("symmlq", A_sp, pc="jacobi", rtol=1e-10)
    assert k.getConvergedReason().converged and res < 1e-8
    A_ind = (A_sp - 1.5 * sp.eye(A_sp.shape[0])).tocsr()
    k1, x1, res1 = _solve("symmlq", A_ind, pc="none", rtol=1e-9,
                          max_it=3000)
    k2, _, _ = _solve("minres", A_ind, pc="none", rtol=1e-9, max_it=3000)
    assert k1.getConvergedReason().converged and res1 < 1e-7
    h1 = np.asarray(k1.getConvergenceHistory())
    h2 = np.asarray(k2.getConvergenceHistory())
    assert not np.allclose(h1[1:10], h2[1:10])


def test_ibcgs_spd_with_ilu():
    """ibcgs.c requires PCApplyTranspose: with the transpose solve enabled
    ILU works; WITHOUT it the solver must refuse (a silent forward-apply
    substitution corrupts the single-reduction recurrence for
    nonsymmetric PCs) rather than quietly degrade."""
    from tests.test_mg_gamg import poisson2d
    k, _, res = _solve("ibcgs", poisson2d(20), pc="ilu", rtol=1e-9,
                       opts=["-pc_factor_transpose_solve"])
    assert k.getConvergedReason().converged
    assert res < 1e-7
    import pytest as _pytest
    from petsc_tpu.sys.error import Error as _Err
    with _pytest.raises(_Err, match="ranspose"):
        _solve("ibcgs", poisson2d(10), pc="ilu", rtol=1e-9)


def test_gltr_lanczos_cap_reports_reason():
    """Hitting the Lanczos capacity (TMAX) before max_it must report
    KSP_CONVERGED_ITS (the TR solution over the built space, gltr.c) —
    never reason 0 ('still iterating')."""
    from tests.test_mg_gamg import poisson2d
    k, _, res = _solve("gltr", poisson2d(60), pc="none", rtol=1e-12,
                       max_it=600)
    assert int(k.getConvergedReason()) != 0


def test_ibcgs_with_gamg_transpose_cycle():
    """PCApplyTranspose_MG role: the symmetric V-cycle exposes mult_t, so
    transpose-needing solvers accept MG/GAMG preconditioners."""
    from tests.test_mg_gamg import poisson2d
    k, _, res = _solve("ibcgs", poisson2d(24), pc="gamg", rtol=1e-9)
    assert k.getConvergedReason().converged
    assert res < 1e-7
