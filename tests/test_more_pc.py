"""Tests for sor/asm/composite/ksp/fieldsplit PCs."""

import numpy as np
import pytest
import scipy.sparse as sp

import petsc_tpu as pt
from tests.test_mg_gamg import poisson2d


def run(pc_type, A_sp=None, ksp_type="gmres", setup=None, rtol=1e-8,
        max_it=300):
    A_sp = A_sp if A_sp is not None else poisson2d(24)
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType(ksp_type)
    pc = ksp.getPC()
    pc.setType(pc_type)
    if setup:
        setup(pc)
    ksp.setTolerances(rtol=rtol, max_it=max_it)
    u = A.createVecRight()
    u.setArray(np.random.default_rng(5).random(A_sp.shape[0]))
    b = A.createVecLeft()
    A.mult(u, b)
    x = A.createVecRight()
    ksp.solve(b, x)
    x.axpy(-1.0, u)
    return ksp, float(x.norm()) / max(float(u.norm()), 1e-30)


def test_pc_sor():
    ksp, err = run("sor", ksp_type="cg")
    assert ksp.getConvergedReason().converged
    assert err < 1e-6


def test_pc_sor_vs_jacobi_iterations():
    k1, _ = run("sor", ksp_type="cg")
    k2, _ = run("jacobi", ksp_type="cg")
    assert k1.getIterationNumber() < k2.getIterationNumber()


def test_pc_asm():
    ksp, err = run("asm", setup=lambda pc: pc._impl.__dict__.update(
        nblocks=4, overlap=1))
    assert ksp.getConvergedReason().converged
    assert err < 1e-6


def test_pc_asm_overlap_helps():
    def mk(ov):
        k, _ = run("asm", setup=lambda pc: pc._impl.__dict__.update(
            nblocks=6, overlap=ov))
        return k.getIterationNumber()
    assert mk(2) <= mk(0)


def test_pc_composite():
    def setup(pc):
        pc._impl.ctype = "multiplicative"
        pc._impl.addPC("jacobi")
        pc._impl.addPC("sor")
    ksp, err = run("composite", setup=setup)
    assert ksp.getConvergedReason().converged
    assert err < 1e-6


def test_pc_ksp():
    def setup(pc):
        inner = pc._impl.getKSP()
        inner.setType("cg")
        inner.setTolerances(rtol=1e-2, max_it=20)
        inner.getPC().setType("jacobi")
        inner.setNormType("preconditioned")
    ksp, err = run("ksp", ksp_type="fgmres", setup=setup)
    assert ksp.getConvergedReason().converged
    assert err < 1e-6


def _stokes_like():
    """Saddle-ish 2x2 block system: [[A, B^T], [B, -C]] SPD-definite enough
    for gmres+fieldsplit."""
    n = 12
    A0 = poisson2d(n)
    N = n * n
    rng = np.random.default_rng(0)
    B = sp.random(N // 2, N, density=0.05, random_state=1, format="csr")
    C = sp.eye(N // 2, format="csr") * 0.5
    return sp.bmat([[A0 + 4 * sp.eye(N), B.T], [B, -C]], format="csr"), N


@pytest.mark.parametrize("ftype,fact", [
    ("additive", None), ("multiplicative", None),
    ("schur", "diag"), ("schur", "lower"), ("schur", "full"),
])
def test_pc_fieldsplit(ftype, fact):
    S, N = _stokes_like()

    def setup(pc):
        impl = pc._impl
        impl.ftype = ftype
        if fact:
            impl.schur_fact = fact
            impl.schur_pre = "selfp"
        impl.setIS("0", np.arange(N))
        impl.setIS("1", np.arange(N, S.shape[0]))
        impl.sub_types = {"0": "ilu", "1": "jacobi"}
    ksp, err = run("fieldsplit", A_sp=S, setup=setup, max_it=500)
    assert ksp.getConvergedReason().converged, (ftype, fact,
                                                ksp.getConvergedReason())
    assert err < 1e-5


def test_pc_lsc_schur():
    """PCLSC on the Schur block of a Stokes-like saddle system (lsc.c):
    -fieldsplit_1_pc_type lsc analog via sub_types."""
    n = 10
    A0 = poisson2d(n)
    N = n * n
    # B = 1-D difference operator rows (full row rank, m < N)
    rows, cols, vals = [], [], []
    m = N // 2
    for r in range(m):
        rows += [r, r]
        cols += [2 * r, 2 * r + 1]
        vals += [1.0, -1.0]
    B = sp.csr_matrix((vals, (rows, cols)), shape=(m, N))
    S = sp.bmat([[A0 + 4 * sp.eye(N), B.T], [B, None]], format="csr")

    def setup(pc):
        impl = pc._impl
        impl.ftype = "schur"
        impl.schur_fact = "full"
        impl.setIS("0", np.arange(N))
        impl.setIS("1", np.arange(N, S.shape[0]))
        impl.sub_types = {"0": "ilu", "1": "lsc"}
    ksp, err = run("fieldsplit", A_sp=S, setup=setup, ksp_type="fgmres",
                   max_it=500)
    assert ksp.getConvergedReason().converged, ksp.getConvergedReason()
    assert err < 1e-5


def test_pc_gasm_user_subdomains():
    """PCGASM with user-defined non-uniform subdomains (gasm.c
    PCGASMSetSubdomains)."""
    A_sp = poisson2d(12)
    n = A_sp.shape[0]
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("gmres")
    pc = ksp.getPC()
    pc.setType("gasm")
    pc._impl.setSubdomains([np.arange(0, n // 3), np.arange(n // 3, n)])
    pc._impl.overlap = 2
    ksp.setTolerances(rtol=1e-8)
    b = pt.Vec.from_array(np.ones(n))
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    r = A_sp @ np.asarray(x.getArray())[:n] - 1.0
    assert np.linalg.norm(r) < 1e-6


def test_pc_redistribute_strips_dirichlet_rows():
    """PCREDISTRIBUTE (redistribute.c): Dirichlet-eliminated rows (only a
    diagonal) are stripped, inner solve runs on the reduced system, and
    the stripped values come back as b_i/a_ii."""
    A_sp = poisson2d(10).tolil()
    n = A_sp.shape[0]
    # eliminate 12 rows as Dirichlet: identity row
    bdry = np.arange(0, n, 9)
    for r in bdry:
        A_sp.rows[r] = [int(r)]
        A_sp.data[r] = [1.0]
    A_sp = A_sp.tocsr()
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("preonly")
    pc = ksp.getPC()
    pc.setType("redistribute")
    rng = np.random.default_rng(0)
    b = pt.Vec.from_array(rng.random(n))
    x = A.createVecRight()
    pt.init(args=["-redistribute_ksp_type", "gmres",
                  "-redistribute_ksp_rtol", "1e-12",
                  "-redistribute_pc_type", "ilu"])
    ksp.solve(b, x)
    xr = np.asarray(x.getArray())[:n]
    ref = np.linalg.solve(A_sp.toarray(), np.asarray(b.getArray())[:n])
    assert np.allclose(xr, ref, atol=1e-8)
    pt.init(args=[])


def test_pc_cp_column_projection():
    """PCCP (cp.c): column-projection sweep == forward GS on the normal
    equations; verify one apply against the host computation and that it
    preconditions GMRES."""
    import scipy.sparse as sp
    A_sp = poisson2d(8)
    n = A_sp.shape[0]
    A = pt.MatAIJ.from_scipy(A_sp)
    pc = pt.KSP().create().getPC()
    pc.setOperators(A, A)
    pc.setType("cp")
    pc.setUp()
    from petsc_tpu.ops import operator
    op = operator.bind(pc.meta, pc.device_data())
    b = np.random.default_rng(0).random(n)
    import jax.numpy as jnp
    y = np.asarray(op.mult(jnp.asarray(np.pad(b, (0, A.row_layout.pad)))))
    N = (A_sp.T @ A_sp).tocsr()
    rhs = A_sp.T @ b
    DL = sp.tril(N, k=0).tocsr()
    ref = sp.linalg.spsolve_triangular(DL.tocsr(), rhs, lower=True)
    assert np.allclose(y[:n], ref, atol=1e-10)
    ksp, err = run("cp", A_sp=A_sp, ksp_type="gmres", max_it=800)
    assert ksp.getConvergedReason().converged
    assert err < 1e-5


def test_pc_patch_star_relaxation():
    """PCPATCH: vertex-star patches smooth a Poisson problem — as a
    preconditioner for CG it converges and beats plain Jacobi."""
    A_sp = poisson2d(10)
    n = A_sp.shape[0]
    A = pt.MatAIJ.from_scipy(A_sp)

    def its(pc_type):
        ksp = pt.KSP().create()
        ksp.setOperators(A)
        ksp.setType("cg")
        ksp.getPC().setType(pc_type)
        ksp.setTolerances(rtol=1e-8, max_it=500)
        b = pt.Vec.from_array(np.ones(n))
        x = A.createVecRight()
        ksp.solve(b, x)
        assert ksp.getConvergedReason().converged
        r = A_sp @ np.asarray(x.getArray())[:n] - 1.0
        assert np.linalg.norm(r) < 1e-6
        return ksp.getIterationNumber()

    assert its("patch") < its("jacobi")


def test_heterogeneous_blocks_via_fieldsplit():
    """ex7.c's 'advanced' path — DIFFERENT solvers per block (bcgs+none
    with inner rtol vs jacobi) — composes here as PCFieldSplit additive
    with a pc_ksp sub-solver configured through prefixed options."""
    pt.init(args=["-fieldsplit_0_pc_type", "ksp",
                  "-fieldsplit_0_ksp_ksp_type", "bcgs",
                  "-fieldsplit_0_ksp_pc_type", "none",
                  "-fieldsplit_0_ksp_ksp_rtol", "1e-6",
                  "-fieldsplit_1_pc_type", "jacobi"])
    A_sp = poisson2d(4)
    N = A_sp.shape[0]
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    pc = ksp.getPC()
    pc.setType("fieldsplit")
    impl = pc._impl
    impl.ftype = "additive"
    impl.setIS("0", np.arange(0, N // 2))
    impl.setIS("1", np.arange(N // 2, N))
    ksp.setTolerances(rtol=1e-5)
    ksp.setFromOptions()
    b = pt.Vec.from_array(np.ones(N))
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    assert ksp.getIterationNumber() <= 10
    r = A_sp @ np.asarray(x.getArray())[:N] - 1.0
    assert np.linalg.norm(r) < 1e-4
    pt.init(args=[])
