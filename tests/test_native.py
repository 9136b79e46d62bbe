"""Native C++ graph-ops component: build, correctness vs python fallbacks
(reference: these are C in mis.c/agg.c/aijfact.c/genrcm.c/greedy)."""

import numpy as np
import pytest
import scipy.sparse as sp

import petsc_tpu as pt
from petsc_tpu import native
from tests.test_mg_gamg import poisson2d


def test_native_builds():
    assert native.lib() is not None, "g++ toolchain present; lib must build"


def test_native_ilu0_matches_python():
    A = poisson2d(12)
    i, j, v = A.indptr.astype(np.int64), A.indices.astype(np.int64), A.data
    out = native.ilu0_inplace(i, j, v)
    # python reference path
    from petsc_tpu.mat import factor
    import petsc_tpu.native as nat
    saved = nat._lib
    nat._lib = False  # force fallback
    try:
        (Li, Lj, Lv), (Ui, Uj, Uv), dinv = factor.ilu0(i, j, v)
    finally:
        nat._lib = saved
    rows = np.repeat(np.arange(len(i) - 1), np.diff(i))
    assert np.allclose(out[j < rows], Lv)
    assert np.allclose(out[j > rows], Uv)
    assert np.allclose(1.0 / out[j == rows], dinv)


def test_native_levels_matches():
    A = sp.tril(poisson2d(10), k=-1).tocsr()
    i, j = A.indptr.astype(np.int64), A.indices.astype(np.int64)
    lev, nlev = native.levels(i, j, True)
    # python check
    m = len(i) - 1
    ref = np.zeros(m, dtype=np.int64)
    for r in range(m):
        cols = j[i[r]:i[r + 1]]
        if len(cols):
            ref[r] = ref[cols].max() + 1
    assert np.array_equal(lev, ref)
    assert nlev == ref.max() + 1


def test_native_mis_valid():
    G = poisson2d(16)
    G2 = G + G.T
    i, j = G2.indptr.astype(np.int64), G2.indices.astype(np.int64)
    perm = np.random.default_rng(0).permutation(G2.shape[0])
    agg, nagg, roots = native.mis_aggregate(i, j, perm)
    # roots are independent (no two roots adjacent)
    root_set = set(roots.tolist())
    for r in roots:
        for c in j[i[r]:i[r + 1]]:
            if c != r:
                assert int(c) not in root_set
    # every vertex aggregated (no singletons in a connected stencil graph)
    assert (agg >= 0).all()
    assert agg.max() == nagg - 1


def test_rcm_reduces_bandwidth():
    from petsc_tpu.mat.order import get_ordering, bandwidth
    rng = np.random.default_rng(0)
    p = rng.permutation(400)
    A = poisson2d(20)
    P = sp.csr_matrix((np.ones(400), (np.arange(400), p)), shape=(400, 400))
    shuffled = (P @ A @ P.T).tocsr()
    rp, _ = get_ordering(pt.MatAIJ.from_scipy(shuffled), "rcm")
    R = sp.csr_matrix((np.ones(400), (np.arange(400), rp)), shape=(400, 400))
    reordered = (R @ shuffled @ R.T).tocsr()
    assert bandwidth(pt.MatAIJ.from_scipy(reordered)) < \
        bandwidth(pt.MatAIJ.from_scipy(shuffled))


def test_native_coloring_valid():
    A = poisson2d(12)
    C = (A.T @ A).tocsr()
    colors = native.greedy_color(C.indptr.astype(np.int64),
                                 C.indices.astype(np.int64))
    rows = np.repeat(np.arange(C.shape[0]), np.diff(C.indptr))
    off = C.indices != rows
    assert (colors[rows[off]] != colors[C.indices[off]]).all()


def test_iluk_reduces_iterations():
    """ILU(k) fill levels strengthen the preconditioner monotonically."""
    import petsc_tpu as pt
    A_sp = poisson2d(24)
    its = []
    for k in (0, 1, 2):
        pt.init(args=["-pc_factor_levels", str(k)])
        A = pt.MatAIJ.from_scipy(A_sp)
        ksp = pt.KSP().create()
        ksp.setOperators(A)
        ksp.setType("gmres")
        ksp.getPC().setType("ilu")
        ksp.setFromOptions()
        ksp.setTolerances(rtol=1e-10, max_it=500)
        b = A.createVecLeft(); b.set(1.0)
        x = A.createVecRight()
        ksp.solve(b, x)
        assert ksp.getConvergedReason().converged
        its.append(ksp.getIterationNumber())
    assert its[2] < its[1] < its[0], its


def test_iluk_exact_limit():
    """Large k approaches a complete factorization (1-2 iterations)."""
    import petsc_tpu as pt
    pt.init(args=["-pc_factor_levels", "30"])
    A = pt.MatAIJ.from_scipy(poisson2d(10))
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("gmres")
    ksp.getPC().setType("ilu")
    ksp.setFromOptions()
    ksp.setTolerances(rtol=1e-10)
    b = A.createVecLeft(); b.set(1.0)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getIterationNumber() <= 2


def test_hem_coarsening_gamg():
    """-pc_gamg_mat_coarsen_type hem (heavy-edge matching, hem impl role)."""
    import petsc_tpu as pt
    from petsc_tpu import native
    A_sp = poisson2d(32)
    agg, nagg = native.hem_aggregate(
        A_sp.indptr.astype(np.int64), A_sp.indices.astype(np.int64),
        A_sp.data, 3)
    # 3 rounds of pairing: aggregates of ~2^3=8 -> strong coarsening
    assert nagg < A_sp.shape[0] // 4
    assert (agg >= 0).all() and agg.max() == nagg - 1
    pt.init(args=["-pc_gamg_mat_coarsen_type", "hem"])
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("gamg")
    ksp.setFromOptions()
    ksp.setTolerances(rtol=1e-8, max_it=100)
    b = A.createVecLeft(); b.set(1.0)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    assert ksp.getIterationNumber() <= 25
