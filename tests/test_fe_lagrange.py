"""Arbitrary-order Lagrange FE family (PetscSpace x PetscDualSpace x
PetscFE, src/dm/dt): Stroud conical simplex quadrature (dt.c
PetscDTStroudConicalQuadrature), monomial-space/lattice-node Vandermonde
tabulation, continuous dof layout with edge/face orientation, and the
generic DS weak-form kernel (any dim, simplex/tensor cells, vector
fields). Convergence orders are the acceptance contract (plexfem.c /
SNES ex12-style verification)."""

import math

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse.linalg as spla

from petsc_tpu.dm.fe import DS, lagrange_fe, stroud_conical_quadrature
from petsc_tpu.dm.plex import DMPlex


def test_stroud_quadrature_exactness():
    for deg in (1, 3, 5):
        qp, qw = stroud_conical_quadrature(2, deg)
        for a in range(deg + 1):
            for b in range(deg + 1 - a):
                exact = (math.factorial(a) * math.factorial(b)
                         / math.factorial(a + b + 2))
                got = float((qw * qp[:, 0] ** a * qp[:, 1] ** b).sum())
                assert abs(got - exact) < 1e-13
    qp, qw = stroud_conical_quadrature(3, 4)
    assert abs(qw.sum() - 1 / 6) < 1e-13
    assert abs(float((qw * qp[:, 0]).sum()) - 1 / 24) < 1e-13


@pytest.mark.parametrize("dim,k,cell", [
    (2, 1, "simplex"), (2, 2, "simplex"), (2, 3, "simplex"),
    (2, 4, "simplex"), (3, 1, "simplex"), (3, 2, "simplex"),
    (3, 3, "simplex"), (2, 1, "tensor"), (2, 2, "tensor"),
    (3, 1, "tensor")])
def test_lagrange_partition_of_unity(dim, k, cell):
    fe = lagrange_fe(dim, k, cell)
    assert np.allclose(fe.B.sum(axis=1), 1.0, atol=1e-11)
    assert np.allclose(fe.D.sum(axis=1), 0.0, atol=1e-10)
    # delta property at the nodes
    from petsc_tpu.dm.fe import _eval_monomials, _p_monomials, _q_monomials
    expo = _q_monomials(dim, k) if cell == "tensor" else _p_monomials(dim, k)
    Vn, _ = _eval_monomials(expo, fe.nodes)
    np.testing.assert_allclose(Vn @ np.linalg.inv(Vn), np.eye(fe.nb),
                               atol=1e-9)


def _solve_poisson(fe_args, faces, simplex):
    plex = DMPlex.createBoxMesh(faces, simplex=simplex)
    ds = DS(plex, lagrange_fe(*fe_args))
    dim = fe_args[0]
    w = np.pi

    def f(x):
        r = 2 * w * w if dim == 2 else 3 * w * w
        out = r * jnp.sin(w * x[0]) * jnp.sin(w * x[1])
        return out * jnp.sin(w * x[2]) if dim == 3 else out

    ds.setResidual(f0=lambda u_, gu, x: -f(x), f1=lambda u_, gu, x: gu)
    u0 = np.zeros(ds.ndof)
    J = ds.assembleJacobian(u0)
    F = np.asarray(ds.assembleResidual(u0))
    bnd = ds.boundary_dofs(lambda x: x.min() < 1e-9 or x.max() > 1 - 1e-9)
    keep = np.ones(ds.ndof, bool)
    keep[bnd] = False
    ui = spla.spsolve(J[keep][:, keep].tocsc(), -F[keep])
    u = np.zeros(ds.ndof)
    u[keep] = ui
    X = ds.dof_coords
    uex = np.sin(w * X[:, 0]) * np.sin(w * X[:, 1])
    if dim == 3:
        uex = uex * np.sin(w * X[:, 2])
    return float(np.abs(u - uex).max())


@pytest.mark.parametrize("fe_args,simplex,order", [
    ((2, 1), True, 2.0), ((2, 2), True, 3.0), ((2, 3), True, 4.0),
    ((2, 2, "tensor"), False, 3.0)])
def test_poisson_convergence_2d(fe_args, simplex, order):
    e1 = _solve_poisson(fe_args, (6, 6), simplex)
    e2 = _solve_poisson(fe_args, (12, 12), simplex)
    rate = np.log2(e1 / e2)
    assert rate > order - 0.6, (fe_args, rate)


@pytest.mark.parametrize("fe_args,simplex,order", [
    ((3, 2), True, 3.0), ((3, 1, "tensor"), False, 2.0)])
def test_poisson_convergence_3d(fe_args, simplex, order):
    e1 = _solve_poisson(fe_args, (3, 3, 3), simplex)
    e2 = _solve_poisson(fe_args, (6, 6, 6), simplex)
    rate = np.log2(e1 / e2)
    assert rate > order - 0.7, (fe_args, rate)


def test_vector_elasticity_p2():
    """2-D linear elasticity with a manufactured solution through the
    ncomp vector-field path (node-major, component-minor dofs)."""
    mu = lam = 1.0

    def f1_elast(u_, gu, x):
        e = 0.5 * (gu + gu.T)
        return 2 * mu * e + lam * jnp.trace(e) * jnp.eye(2)

    def f_body(x):
        s, c = jnp.sin, jnp.cos
        u = s(jnp.pi * x[0]) * s(jnp.pi * x[1])
        uxx = uyy = -jnp.pi ** 2 * u
        uxy = jnp.pi ** 2 * c(jnp.pi * x[0]) * c(jnp.pi * x[1])
        return jnp.array([-((2 * mu + lam) * uxx + mu * uyy),
                          -((mu + lam) * uxy)])

    plex = DMPlex.createBoxMesh((10, 10), simplex=True)
    ds = DS(plex, lagrange_fe(2, 2, ncomp=2))
    ds.setResidual(f0=lambda u_, gu, x: -f_body(x), f1=f1_elast)
    u0 = np.zeros(ds.ndof)
    J = ds.assembleJacobian(u0)
    assert abs(J - J.T).max() < 1e-10
    F = np.asarray(ds.assembleResidual(u0))
    bnd = ds.boundary_dofs(lambda x: x.min() < 1e-9 or x.max() > 1 - 1e-9)
    keep = np.ones(ds.ndof, bool)
    keep[bnd] = False
    ui = spla.spsolve(J[keep][:, keep].tocsc(), -F[keep])
    u = np.zeros(ds.ndof)
    u[keep] = ui
    uex = np.zeros(ds.ndof)
    X = ds.dof_coords
    uex[0::2] = np.sin(np.pi * X[:, 0]) * np.sin(np.pi * X[:, 1])
    assert np.abs(u - uex).max() < 2e-3


def test_p3_edge_orientation_continuity():
    """P3 has 2 dofs per edge — a wrong orientation breaks continuity
    and symmetry of the assembled operator."""
    plex = DMPlex.createBoxMesh((3, 3), simplex=True)
    ds = DS(plex, lagrange_fe(2, 3))
    ds.setResidual(f1=lambda u_, gu, x: gu)
    u = np.random.default_rng(0).random(ds.ndof)
    J = ds.assembleJacobian(u)
    assert abs(J - J.T).max() < 1e-10
    # interpolating a global cubic gives zero Laplace residual against
    # interior test functions (patch test)
    ue = np.asarray([x[0] ** 3 - 3 * x[0] * x[1] ** 2
                     for x in ds.dof_coords])   # harmonic cubic
    F = np.asarray(ds.assembleResidual(ue))
    bnd = ds.boundary_dofs(lambda x: x.min() < 1e-9 or x.max() > 1 - 1e-9)
    keep = np.ones(ds.ndof, bool)
    keep[bnd] = False
    assert np.abs(F[keep]).max() < 1e-10


def test_p4_tet_supported():
    """P4 on tets (round 5): face-interior dofs numbered in the
    canonical sorted-global-vertex frame — full conforming element
    (deep checks in test_fe_p4_3d.py)."""
    fe = lagrange_fe(3, 4)
    assert fe.nb == 35          # C(4+3, 3)
    assert sum(1 for kk in fe.node_kinds if kk[0] == "face") == 12  # 3/face


def test_crouzeix_raviart_poisson():
    """Nonconforming P1 (CR): midpoint-dof Poisson converges at O(h^2)
    in the discrete L2 (midpoint) norm; basis is a partition of unity."""
    from petsc_tpu.dm.fe import crouzeix_raviart_fe
    fe = crouzeix_raviart_fe()
    assert np.allclose(fe.B.sum(axis=1), 1.0)

    def solve(n):
        plex = DMPlex.createBoxMesh((n, n), simplex=True)
        ds = DS(plex, fe)
        w = np.pi
        f = lambda x: 2 * w * w * jnp.sin(w * x[0]) * jnp.sin(w * x[1])
        ds.setResidual(f0=lambda u_, gu, x: -f(x),
                       f1=lambda u_, gu, x: gu)
        u0 = np.zeros(ds.ndof)
        J = ds.assembleJacobian(u0)
        F = np.asarray(ds.assembleResidual(u0))
        bnd = ds.boundary_dofs(
            lambda x: x.min() < 1e-9 or x.max() > 1 - 1e-9)
        keep = np.ones(ds.ndof, bool)
        keep[bnd] = False
        u = np.zeros(ds.ndof)
        u[keep] = spla.spsolve(J[keep][:, keep].tocsc(), -F[keep])
        X = ds.dof_coords
        uex = np.sin(w * X[:, 0]) * np.sin(w * X[:, 1])
        return np.sqrt(np.mean((u - uex) ** 2))

    e1, e2 = solve(8), solve(16)
    assert np.log2(e1 / e2) > 1.5, (e1, e2)
