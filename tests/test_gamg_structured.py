"""Structured-head GAMG: gather-free geometric first levels on grid
operators (TPU redesign; gamg.c has no equivalent — see
pc/gamg.py:_structured_head). Also covers the even-size extension of the
MatInterpQ1 transfers (dm/interp.py)."""

import numpy as np
import pytest
import scipy.sparse as sp

import petsc_tpu as pt
from petsc_tpu.parallel.mesh import comm_self


def poisson3d(n, pts=7):
    ex = np.ones(n)
    T1 = sp.diags([-ex[:-1], 2 * ex, -ex[:-1]], [-1, 0, 1], format="csr")
    I1 = sp.identity(n, format="csr")
    if pts == 7:
        return (sp.kron(sp.kron(T1, I1), I1) + sp.kron(sp.kron(I1, T1), I1)
                + sp.kron(sp.kron(I1, I1), T1)).tocsr()
    B1 = sp.diags([ex[:-1], 4 * ex, ex[:-1]], [-1, 0, 1], format="csr")
    return (sp.kron(sp.kron(T1, B1), B1) + sp.kron(sp.kron(B1, T1), B1)
            + sp.kron(sp.kron(B1, B1), T1)).tocsr()


@pytest.mark.parametrize("n,pts", [(16, 7), (17, 7), (16, 27)])
def test_structured_head_converges(n, pts):
    A_sp = poisson3d(n, pts)
    A = pt.MatAIJ.from_scipy(A_sp, comm=comm_self())
    A.setStencilGrid((n, n, n))
    pt.init(args=["-pc_gamg_structured_limit", "200"])
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("gamg")
    ksp.setFromOptions()
    ksp.setTolerances(rtol=1e-8, max_it=60)
    b = A.createVecLeft(); b.set(1.0)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    assert ksp.getIterationNumber() <= 15
    res = np.linalg.norm(A_sp @ np.asarray(x.getArray())[:A_sp.shape[0]] - 1)
    assert res < 1e-4
    levels = ksp.getPC()._impl.levels
    # first transfer is the gather-free structured interpolation, and the
    # structured coarse operators re-bind onto the dnd stencil path
    assert levels[0].P.meta[0] == "interp_q1"
    assert levels[1].A.meta[0] == "aij_dnd"


def test_structured_head_opt_out():
    n = 16
    A_sp = poisson3d(n)
    A = pt.MatAIJ.from_scipy(A_sp, comm=comm_self())
    A.setStencilGrid((n, n, n))
    pt.init(args=["-pc_gamg_structured_coarsening", "0"])
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("gamg")
    ksp.setFromOptions()
    ksp.setTolerances(rtol=1e-8, max_it=60)
    b = A.createVecLeft(); b.set(1.0)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    levels = ksp.getPC()._impl.levels
    assert levels[0].P.meta[0] != "interp_q1"


def test_no_grid_no_structured_head():
    # operators without a declared grid take the plain SA path
    A_sp = poisson3d(12)
    A = pt.MatAIJ.from_scipy(A_sp, comm=comm_self())
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("gamg")
    ksp.setTolerances(rtol=1e-8, max_it=60)
    b = A.createVecLeft(); b.set(1.0)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    levels = ksp.getPC()._impl.levels
    assert all(getattr(l.P, "meta", ("",))[0] != "interp_q1"
               for l in levels if l.P is not None)


@pytest.mark.parametrize("fshape", [(8, 6), (9, 7), (16, 16, 16),
                                    (9, 8, 6), (128,)])
def test_interp_even_odd_adjoint(fshape):
    import jax.numpy as jnp
    from petsc_tpu.dm.interp import MatInterpQ1
    from petsc_tpu.ops import operator
    rng = np.random.default_rng(3)
    cshape = tuple((s + 1) // 2 for s in fshape)
    M = MatInterpQ1(fshape, cshape)
    P = M.to_scipy()
    op = operator.bind(M.meta, M.device_data())
    xc = jnp.asarray(rng.random(int(np.prod(cshape))))
    xf = jnp.asarray(rng.random(int(np.prod(fshape))))
    assert np.allclose(np.asarray(op.mult(xc)), P @ np.asarray(xc))
    assert np.allclose(np.asarray(op.mult_t(xf)), P.T @ np.asarray(xf))
    # constants are preserved (the SA near-nullspace survives the head)
    ones = jnp.ones(int(np.prod(cshape)))
    assert np.allclose(np.asarray(op.mult(ones)), 1.0)


def test_native_spgemm_matches_scipy():
    from petsc_tpu import native
    rng = np.random.default_rng(5)
    A = sp.random(257, 301, density=0.04, format="csr", random_state=7)
    B = sp.random(301, 129, density=0.05, format="csr", random_state=8)
    C = native.spgemm(A, B)
    if C is None:
        pytest.skip("no native toolchain")
    ref = (A @ B).tocsr()
    ref.sort_indices()
    assert np.allclose(C.toarray(), ref.toarray())
    T = native.csr_transpose(A)
    assert np.allclose(T.toarray(), A.T.toarray())


def test_native_strength_and_mis2_match_python():
    from petsc_tpu import native
    from petsc_tpu.pc.gamg import mis_aggregate, square_graph
    rng = np.random.default_rng(11)
    A = sp.random(400, 400, density=0.02, format="csr", random_state=9)
    A = (A + A.T + sp.identity(400)).tocsr()
    for th in (-1.0, 0.05):
        G = native.strength_sym(A, th)
        if G is None:
            pytest.skip("no native toolchain")
        Gr = abs(A).tocsr()
        Gr = (Gr + Gr.T).tocsr()
        if th >= 0:
            d = np.sqrt(np.abs(Gr.diagonal())); d[d == 0] = 1.0
            rows = np.repeat(np.arange(400), np.diff(Gr.indptr))
            keep = (np.abs(Gr.data) > th * d[rows] * d[Gr.indices]) \
                | (Gr.indices == rows)
            Gr = sp.csr_matrix(
                (Gr.data[keep], Gr.indices[keep],
                 np.concatenate([[0], np.cumsum(np.bincount(
                     rows[keep], minlength=400))])), shape=Gr.shape)
        assert G.nnz == Gr.nnz
        assert np.allclose(G.toarray(), Gr.toarray())
    G = native.strength_sym(A, -1.0)
    perm = rng.permutation(400)
    agg1, n1, r1 = native.mis2_aggregate(G.indptr, G.indices, perm)
    agg2, n2, r2 = mis_aggregate(square_graph(G), perm=perm)
    assert n1 == n2
    assert np.array_equal(agg1, agg2)
    assert np.array_equal(r1, r2)
