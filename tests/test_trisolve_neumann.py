"""Truncated-Neumann triangular solves (-pc_factor_trisolve neumann):
strict-triangular ILU factors are nilpotent, so the Neumann series
terminates exactly at the level depth — the TPU-first replacement for
the gather-bound level-scheduled sweeps (aijcusparse.cu csrsv role;
VERDICT r4 item 4).
"""
import numpy as np
import scipy.sparse as sp
import pytest

import petsc_tpu as pt


def _A3d(n=12, jitter=True):
    I = sp.eye(n)
    T = sp.diags([2.2 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1])
    A = (sp.kron(sp.kron(T, I), I) + sp.kron(sp.kron(I, T), I)
         + sp.kron(sp.kron(I, I), T)).tocsr()
    if jitter:
        A = A + sp.diags(0.1 * np.random.default_rng(3).random(n ** 3))
    return A.tocsr(), n


def test_neumann_exact_at_depth():
    """With sweeps >= level depth the Neumann apply IS the exact
    trisolve: the two PCs produce identical applications."""
    A_sp, n = _A3d(8)
    pt.options().set_value("pc_factor_trisolve", "neumann")
    pt.options().set_value("pc_factor_trisolve_sweeps", str(3 * 8))
    A = pt.MatAIJ.from_scipy(A_sp)
    A.setStencilGrid((n, n, n))
    pc = pt.PC().setType("ilu")
    pc.setOperators(A, A)
    pc.setFromOptions()
    pc.setUp()
    import jax
    import jax.numpy as jnp
    from petsc_tpu.ops import operator
    b = jnp.asarray(np.random.default_rng(0).random(A.row_layout.Npad))
    z1 = np.asarray(jax.jit(operator.bind(pc._meta, pc._data).mult)(b))
    pt.options().set_value("pc_factor_trisolve", "levels")
    pc2 = pt.PC().setType("ilu")
    pc2.setOperators(A, A)
    pc2.setFromOptions()
    pc2.setUp()
    z2 = np.asarray(jax.jit(operator.bind(pc2._meta, pc2._data).mult)(b))
    assert np.abs(z1 - z2).max() < 1e-11 * np.abs(z2).max()


@pytest.mark.parametrize("sweeps", [4, 8])
def test_neumann_gmres_converges(sweeps):
    A_sp, n = _A3d(10)
    pt.options().set_value("pc_factor_trisolve", "neumann")
    pt.options().set_value("pc_factor_trisolve_sweeps", str(sweeps))
    A = pt.MatAIJ.from_scipy(A_sp)
    A.setStencilGrid((n, n, n))
    ksp = pt.KSP().create().setType("gmres")
    ksp.setOperators(A)
    ksp.getPC().setType("ilu")
    ksp.getPC().setFromOptions()
    ksp.setTolerances(rtol=1e-10, max_it=300)
    u = A.createVecRight(); u.set(1.0)
    b = A.createVecLeft(); A.mult(u, b)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    x.axpy(-1.0, u)
    assert float(x.norm()) < 1e-7
    # the factors ride the grid fast path when the operator declares one
    meta = ksp.getPC()._meta
    assert meta[0] == "pc_trisolve_neumann"
    assert meta[1][0].startswith(("aij_dnd", "aij_dia", "dnd")), meta[1][0]


def test_neumann_transpose_solve():
    """mult_t: (U^-1 L^-1)^T through the transposed factor sweeps."""
    A_sp, n = _A3d(6)
    pt.options().set_value("pc_factor_trisolve", "neumann")
    pt.options().set_value("pc_factor_trisolve_sweeps", str(3 * 6))
    A = pt.MatAIJ.from_scipy(A_sp)
    pc = pt.PC().setType("ilu")
    pc.setOperators(A, A)
    pc.setFromOptions()
    pc.setUp()
    from petsc_tpu.ops import operator
    op = operator.bind(pc._meta, pc._data)
    if op.mult_t is None:
        pytest.skip("factor layout provides no transpose apply")
    m = A_sp.shape[0]
    b = np.random.default_rng(1).random(A.row_layout.Npad)
    z = np.asarray(op.mult(b))[:m]
    zt = np.asarray(op.mult_t(b))[:m]
    # M^-T b == (M^-1)^T b: check via <M^-1 e_i, b> identity on a probe
    rng = np.random.default_rng(2)
    w = rng.random(A.row_layout.Npad)
    lhs = float(np.dot(np.asarray(op.mult(w))[:m], b[:m]))
    rhs = float(np.dot(w[:m], zt))
    assert abs(lhs - rhs) < 1e-9 * max(abs(lhs), 1.0)
