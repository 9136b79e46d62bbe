"""DT/FE/DS tests: quadrature exactness, P1/P2 Poisson with manufactured
solutions, autodiff element Jacobians (plexfem.c / dt.c roles)."""

import numpy as np
import jax.numpy as jnp
import pytest

import petsc_tpu as pt
from petsc_tpu.dm.fe import DS, FE, gauss_quadrature
from petsc_tpu.dm.plex import DMPlex


def test_quadrature_exactness():
    # tri 3-pt rule integrates degree-2 exactly: int x^2 over ref tri = 1/12
    qp, qw = gauss_quadrature(2, 2)
    assert np.isclose((qw * qp[:, 0] ** 2).sum(), 1.0 / 12.0)
    # tensor 2x2 Gauss integrates x^3 y^3 over unit square = 1/16
    qp, qw = gauss_quadrature(2, 2, cell="tensor")
    assert np.isclose((qw * qp[:, 0] ** 3 * qp[:, 1] ** 3).sum(), 1.0 / 16)


def _poisson_solve(fe_kind, n):
    """-Δu = f on (0,1)^2, u = g on boundary, manufactured
    u* = sin(pi x) sin(pi y)."""
    plex = DMPlex.createBoxMesh((n, n), simplex=True)
    fe = FE.create(fe_kind)
    ds = DS(plex, fe)
    ds.setResidual(
        f0=lambda u, gu, x: -2 * jnp.pi ** 2
        * jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1]),
        f1=lambda u, gu, x: gu)         # ∫ ∇u.∇v - ∫ f v
    u = np.zeros(ds.ndof)
    A = ds.assembleJacobian(u)
    F = np.asarray(ds.assembleResidual(u))
    bdofs = ds.boundary_dofs(
        lambda x: min(x[0], x[1], 1 - x[0], 1 - x[1]) < 1e-12)
    Am = pt.MatAIJ.from_scipy(A)
    bvec = pt.Vec.from_array(-F)
    xbc = pt.Vec.from_array(np.zeros(ds.ndof))
    Am.zeroRowsColumns(bdofs, diag=1.0, x=xbc, b=bvec)
    ksp = pt.KSP().create()
    ksp.setOperators(Am)
    ksp.setType("cg")
    ksp.getPC().setType("ilu")
    ksp.setTolerances(rtol=1e-12)
    sol = Am.createVecRight()
    ksp.solve(bvec, sol)
    assert ksp.getConvergedReason().converged
    uh = np.asarray(sol.getArray())[: ds.ndof]
    xs = ds.dof_coords
    uex = np.sin(np.pi * xs[:, 0]) * np.sin(np.pi * xs[:, 1])
    return np.max(np.abs(uh - uex))


def test_p1_poisson_converges_order2():
    e1 = _poisson_solve("p1", 8)
    e2 = _poisson_solve("p1", 16)
    rate = np.log2(e1 / e2)
    assert 1.7 < rate < 2.4, (e1, e2, rate)


def test_p2_poisson_much_more_accurate():
    """P2 beats P1 at the same mesh by a large factor (3rd-order nodal)."""
    ep1 = _poisson_solve("p1", 8)
    ep2 = _poisson_solve("p2", 8)
    assert ep2 < 0.1 * ep1, (ep1, ep2)


def test_nonlinear_form_jacobian_consistency():
    """The autodiff element Jacobian matches FD of the residual for a
    nonlinear reaction term (g0..g3 derivation, plexfem.c role)."""
    plex = DMPlex.createBoxMesh((3, 3), simplex=True)
    ds = DS(plex, FE.create("p1"))
    ds.setResidual(f0=lambda u, gu, x: u ** 3 - 1.0,
                   f1=lambda u, gu, x: gu)
    rng = np.random.default_rng(0)
    u = rng.random(ds.ndof)
    A = ds.assembleJacobian(u).toarray()
    F0 = np.asarray(ds.assembleResidual(u))
    h = 1e-7
    for j in rng.choice(ds.ndof, 5, replace=False):
        up = u.copy()
        up[j] += h
        fd = (np.asarray(ds.assembleResidual(up)) - F0) / h
        assert np.allclose(A[:, j], fd, atol=1e-5)
