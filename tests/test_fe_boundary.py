"""Boundary-integral (natural BC) weak forms — the PetscDSAddBoundary
NATURAL role (plexfem.c boundary FEM assembly: facet quadrature, outward
normals, trace basis). Acceptance contract: manufactured-solution
convergence at the interior order for Neumann data, and Robin terms
(u-dependent flux) entering the exact autodiff Jacobian."""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse.linalg as spla

from petsc_tpu.dm.fe import DS, FE, lagrange_fe
from petsc_tpu.dm.plex import DMPlex


def _uex(dim):
    if dim == 2:
        return (lambda x: jnp.exp(x[0] + 0.5 * x[1]),
                lambda x: jnp.stack([jnp.exp(x[0] + 0.5 * x[1]),
                                     0.5 * jnp.exp(x[0] + 0.5 * x[1])]),
                lambda x: -1.25 * jnp.exp(x[0] + 0.5 * x[1]))  # f = -lap u
    return (lambda x: jnp.exp(x[0] + 0.5 * x[1] - 0.25 * x[2]),
            lambda x: jnp.exp(x[0] + 0.5 * x[1] - 0.25 * x[2])
            * jnp.stack([jnp.ones(()), jnp.full((), 0.5),
                         jnp.full((), -0.25)]),
            lambda x: -(1 + 0.25 + 0.0625)
            * jnp.exp(x[0] + 0.5 * x[1] - 0.25 * x[2]))


def _solve_neumann(fe, faces, dim, robin=0.0):
    """-lap u = f, Dirichlet on the x=0 face, natural BC elsewhere:
    Neumann du/dn = g (robin=0) or Robin  a u + du/dn = g."""
    plex = DMPlex.createBoxMesh(faces, simplex=True)
    ds = DS(plex, fe)
    uex, guex, f = _uex(dim)
    ds.setResidual(f0=lambda u_, gu, x: -f(x), f1=lambda u_, gu, x: gu)
    if robin:
        ds.setBdResidual(
            lambda u, x, n: robin * u - (n @ guex(x) + robin * uex(x)),
            predicate=lambda c: c[0] > 1e-6)
    else:
        ds.setBdResidual(lambda u, x, n: -(n @ guex(x)),
                         predicate=lambda c: c[0] > 1e-6)
    u0 = np.zeros(ds.ndof)
    J = ds.assembleJacobian(u0)
    F = np.asarray(ds.assembleResidual(u0))
    bnd = ds.boundary_dofs(lambda x: x[0] < 1e-9)
    X = ds.dof_coords
    ue = np.asarray([float(uex(x)) for x in X])
    u = ue.copy()                     # lift the Dirichlet data
    keep = np.ones(ds.ndof, bool)
    keep[bnd] = False
    rhs = -F[keep] - J[keep][:, bnd] @ ue[bnd]
    u[keep] = spla.spsolve(J[keep][:, keep].tocsc(), rhs)
    return float(np.abs(u - ue).max())


@pytest.mark.parametrize("mk_fe,order", [
    (lambda: lagrange_fe(2, 1), 2.0),
    (lambda: FE.create("p2"), 3.0)])
def test_neumann_convergence_2d(mk_fe, order):
    e1 = _solve_neumann(mk_fe(), (6, 6), 2)
    e2 = _solve_neumann(mk_fe(), (12, 12), 2)
    rate = np.log2(e1 / e2)
    assert rate > order - 0.6, (e1, e2, rate)


def test_neumann_convergence_3d_p1():
    e1 = _solve_neumann(lagrange_fe(3, 1), (3, 3, 3), 3)
    e2 = _solve_neumann(lagrange_fe(3, 1), (6, 6, 6), 3)
    rate = np.log2(e1 / e2)
    assert rate > 1.4, (e1, e2, rate)


def test_robin_convergence_2d_p1():
    """Robin a u + du/dn = g exercises the u-dependent boundary Jacobian
    (the g0-on-boundary block) through the same autodiff kernel."""
    e1 = _solve_neumann(lagrange_fe(2, 1), (6, 6), 2, robin=2.5)
    e2 = _solve_neumann(lagrange_fe(2, 1), (12, 12), 2, robin=2.5)
    rate = np.log2(e1 / e2)
    assert rate > 1.4, (e1, e2, rate)


def test_bd_jacobian_is_tangent_of_bd_residual():
    fe = lagrange_fe(2, 1)
    plex = DMPlex.createBoxMesh((4, 4), simplex=True)
    ds = DS(plex, fe)
    ds.setResidual(f1=lambda u_, gu, x: gu)
    ds.setBdResidual(lambda u, x, n: 3.0 * u ** 2 - x[0])
    rng = np.random.default_rng(7)
    u = rng.standard_normal(ds.ndof)
    du = rng.standard_normal(ds.ndof) * 1e-6
    F0 = np.asarray(ds.assembleResidual(u))
    F1 = np.asarray(ds.assembleResidual(u + du))
    J = ds.assembleJacobian(u)
    np.testing.assert_allclose(F1 - F0, J @ du, rtol=2e-4, atol=1e-12)
