"""Higher-order H(div)/H(curl) and non-simplex-cell FE family:
RT1 x P1disc mixed Poisson, full-linear Nédélec (2nd kind), prism
(wedge) Lagrange P1/P2, and Q2 hexes — the remaining named members of
the reference's PetscSpace/PetscDualSpace inventory
(src/dm/dt/space/impls/ptrimmed/spaceptrimmed.c,
src/dm/dt/dualspace/impls/lagrange/dspacelagrange.c).
Convergence orders are the acceptance contract."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse.linalg as spla

from petsc_tpu.dm.fe import (
    DS, lagrange_fe, nedelec1_curlcurl, prism_quadrature,
    rt1_mixed_poisson)
from petsc_tpu.dm.plex import DMPlex

W = np.pi


def _scipy(K):
    return K.to_scipy() if hasattr(K, "to_scipy") else K._scipy


# ---------------------------------------------------------------- RT1

def _rt1_errors(n):
    plex = DMPlex.createBoxMesh((n, n), simplex=True)

    def f(x):
        return 2 * W * W * np.sin(W * x[0]) * np.sin(W * x[1])

    K, rhs, nflux, eval_sigma, eval_u = rt1_mixed_poisson(plex, f=f)
    Ks = _scipy(K)
    s = spla.spsolve(Ks.tocsc(),
                     np.asarray(rhs.getArray())[: Ks.shape[0]])
    sig, xq, wdet = eval_sigma(s)
    sx = W * np.cos(W * xq[..., 0]) * np.sin(W * xq[..., 1])
    sy = W * np.sin(W * xq[..., 0]) * np.cos(W * xq[..., 1])
    esig = np.sqrt((wdet * ((sig[..., 0] - sx) ** 2
                            + (sig[..., 1] - sy) ** 2)).sum())
    uh, xq, wdet = eval_u(s)
    uex = np.sin(W * xq[..., 0]) * np.sin(W * xq[..., 1])
    eu = np.sqrt((wdet * (uh - uex) ** 2).sum())
    return esig, eu, s, eval_u, nflux


def test_rt1_second_order_flux_and_potential():
    e1 = _rt1_errors(8)
    e2 = _rt1_errors(16)
    rate_sig = np.log2(e1[0] / e2[0])
    rate_u = np.log2(e1[1] / e2[1])
    # one order above RT0 on BOTH fields
    assert rate_sig > 1.8, rate_sig
    assert rate_u > 1.8, rate_u


def test_rt1_elementwise_conservation():
    """div sigma_h = P1-projection of -f holds through the saddle
    system: the second block row enforces (div sigma + f, v) = 0 for
    every P1disc v — check the residual of that block directly."""
    plex = DMPlex.createBoxMesh((6, 6), simplex=True)
    K, rhs, nflux, eval_sigma, eval_u = rt1_mixed_poisson(plex, f=1.0)
    Ks = _scipy(K)
    s = spla.spsolve(Ks.tocsc(),
                     np.asarray(rhs.getArray())[: Ks.shape[0]])
    res = Ks @ s - np.asarray(rhs.getArray())[: Ks.shape[0]]
    assert np.abs(res[nflux:]).max() < 1e-10


# --------------------------------------------------- Nédélec 2nd kind

def _E(x):
    return np.array([np.sin(W * x[1]), np.sin(W * x[0])])


def _n1_interp_err(n):
    plex = DMPlex.createBoxMesh((n, n), simplex=True)
    K, dofs, eval_E, edges = nedelec1_curlcurl(plex)
    Eh, xq, wdet = eval_E(dofs(_E))
    ex = np.sin(W * xq[..., 1])
    ey = np.sin(W * xq[..., 0])
    return np.sqrt((wdet * ((Eh[..., 0] - ex) ** 2
                            + (Eh[..., 1] - ey) ** 2)).sum())


def test_nedelec1_interpolation_second_order():
    e1, e2 = _n1_interp_err(8), _n1_interp_err(16)
    assert np.log2(e1 / e2) > 1.8


def _n1_solve_err(n):
    """curl-curl + mass with manufactured E, essential tangential BCs
    from the exact dofs; rhs through the interpolant (O(h^2) consistent,
    rate-preserving)."""
    plex = DMPlex.createBoxMesh((n, n), simplex=True)
    K, dofs, eval_E, edges = nedelec1_curlcurl(plex, alpha=1.0, beta=1.0)
    Ks = _scipy(K)
    ne = len(edges)
    Ms = _scipy(nedelec1_curlcurl(plex, alpha=0.0, beta=1.0)[0])
    rhs = Ms @ dofs(lambda x: (W * W + 1) * _E(x))
    bset = set(plex.markBoundaryVertices().tolist())
    bedge = np.array([i for i, (a, b) in enumerate(edges)
                      if a in bset and b in bset])
    fix = np.zeros(2 * ne, bool)
    fix[2 * bedge] = True
    fix[2 * bedge + 1] = True
    sex = dofs(_E)
    s = sex * fix
    keep = ~fix
    s[keep] = spla.spsolve(Ks[keep][:, keep].tocsc(),
                           (rhs - Ks @ (sex * fix))[keep])
    Eh, xq, wdet = eval_E(s)
    ex = np.sin(W * xq[..., 1])
    ey = np.sin(W * xq[..., 0])
    return np.sqrt((wdet * ((Eh[..., 0] - ex) ** 2
                            + (Eh[..., 1] - ey) ** 2)).sum())


def test_nedelec1_solve_second_order():
    e1, e2 = _n1_solve_err(8), _n1_solve_err(16)
    assert np.log2(e1 / e2) > 1.8


def test_nedelec1_spd_and_gradient_kernel():
    """K is SPD (beta > 0), and with alpha-only the discrete gradients
    of nodal functions are in the kernel (exact sequence — same
    property the Whitney element certifies)."""
    plex = DMPlex.createBoxMesh((4, 4), simplex=True)
    K, dofs, eval_E, edges = nedelec1_curlcurl(plex, alpha=1.0, beta=0.0)
    Ks = _scipy(K).toarray()
    assert np.abs(Ks - Ks.T).max() < 1e-10
    # E = grad(phi) for smooth phi has curl 0 -> K E ~ 0 after
    # interpolation ONLY if grad(phi) is in the space: take phi linear
    # and quadratic (grad in P1^2 subset of the space) — exact kernel
    for phi_grad in (lambda x: np.array([1.0, 2.0]),
                     lambda x: np.array([x[0], -x[1]])):
        s = dofs(phi_grad)
        assert np.abs(Ks @ s).max() < 1e-10


# ----------------------------------------------------- prisms / wedge

def test_prism_quadrature_and_partition_of_unity():
    qp, qw = prism_quadrature(4)
    assert abs(qw.sum() - 0.5) < 1e-13
    assert abs(float((qw * qp[:, 0] ** 2 * qp[:, 2] ** 2).sum())
               - (1 / 12) * (1 / 3)) < 1e-13
    for k in (1, 2):
        fe = lagrange_fe(3, k, "prism")
        assert fe.nb == (6 if k == 1 else 18)
        assert np.allclose(fe.B.sum(axis=1), 1.0, atol=1e-11)
        assert np.allclose(fe.D.sum(axis=1), 0.0, atol=1e-10)


def _prism_poisson_err(n, k):
    tri = DMPlex.createBoxMesh((n, n), simplex=True)
    plex = tri.extrudeToPrisms(n)
    ds = DS(plex, lagrange_fe(3, k, "prism"))

    def f(x):
        return 3 * W * W * jnp.sin(W * x[0]) * jnp.sin(W * x[1]) \
            * jnp.sin(W * x[2])

    ds.setResidual(f0=lambda u, gu, x: -f(x), f1=lambda u, gu, x: gu)
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
    uex = np.sin(W * X[:, 0]) * np.sin(W * X[:, 1]) * np.sin(W * X[:, 2])
    return np.abs(u - uex).max()


def test_prism_p1_poisson_converges():
    e1, e2 = _prism_poisson_err(4, 1), _prism_poisson_err(8, 1)
    assert np.log2(e1 / e2) > 1.5, (e1, e2)


def test_prism_p2_poisson_converges():
    e1, e2 = _prism_poisson_err(3, 2), _prism_poisson_err(6, 2)
    assert np.log2(e1 / e2) > 2.4, (e1, e2)


def test_prism_boundary_faces():
    tri = DMPlex.createBoxMesh((3, 3), simplex=True)
    p = tri.extrudeToPrisms(3)
    bnd = p.markBoundaryVertices()
    # every vertex of the unit-cube surface is on the boundary: interior
    # vertices are the strictly-inside grid points
    X = p.coords
    on_surface = ((X.min(axis=1) < 1e-12) | (X.max(axis=1) > 1 - 1e-12))
    assert set(bnd.tolist()) == set(np.nonzero(on_surface)[0].tolist())


# --------------------------------------------------------- Q2 on hex

def test_q2_hex_element_counts():
    fe = lagrange_fe(3, 2, "tensor")
    assert fe.nb == 27
    kinds = [k[0] for k in fe.node_kinds]
    assert kinds.count("vertex") == 8
    assert kinds.count("edge") == 12
    assert kinds.count("face") == 6
    assert kinds.count("interior") == 1


def test_q2_hex_poisson_converges():
    def err(n):
        plex = DMPlex.createBoxMesh((n, n, n), simplex=False)
        ds = DS(plex, lagrange_fe(3, 2, "tensor"))

        def f(x):
            return 3 * W * W * jnp.sin(W * x[0]) * jnp.sin(W * x[1]) \
                * jnp.sin(W * x[2])

        ds.setResidual(f0=lambda u, gu, x: -f(x),
                       f1=lambda u, gu, x: gu)
        u0 = np.zeros(ds.ndof)
        J = ds.assembleJacobian(u0)
        F = np.asarray(ds.assembleResidual(u0))
        bnd = ds.boundary_dofs(
            lambda x: x.min() < 1e-9 or x.max() > 1 - 1e-9)
        keep = np.ones(ds.ndof, bool)
        keep[bnd] = False
        ui = spla.spsolve(J[keep][:, keep].tocsc(), -F[keep])
        u = np.zeros(ds.ndof)
        u[keep] = ui
        X = ds.dof_coords
        uex = np.sin(W * X[:, 0]) * np.sin(W * X[:, 1]) \
            * np.sin(W * X[:, 2])
        return np.abs(u - uex).max()

    e1, e2 = err(2), err(4)
    assert np.log2(e1 / e2) > 2.5, (e1, e2)
