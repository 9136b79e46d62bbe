"""FV on unstructured plex meshes (plexfvm.c / fv.c roles): face
geometry closure checks, 2-D advection on a gmsh triangle mesh
converging at 1st order, Barth-Jespersen TVD bound preservation, and
tet/quad smoke integration with TS."""

import numpy as np
import pytest
import jax.numpy as jnp

import petsc_tpu as pt
from petsc_tpu.dm.plex import DMPlex
from petsc_tpu.dm.fv_plex import FVPlex, face_geometry

# asymmetric unstructured square (same fixture style as test_plex_refine)
GMSH_SQUARE = """$MeshFormat
4.1 0 8
$EndMeshFormat
$Nodes
1 5 1 5
2 1 0 5
1
2
3
4
5
0 0 0
1 0 0
1 1 0
0 1 0
0.55 0.45 0
$EndNodes
$Elements
1 4 1 4
2 1 2 4
1 1 2 5
2 2 3 5
3 3 4 5
4 4 1 5
$EndElements
$EndMesh
"""


def _advect(mesh, T=0.25, vel=(1.0, 0.5), order=1, limiter="barth",
            cfl=0.4):
    """Advect a smooth bump with forward Euler; returns (u_final, exact,
    cell volumes)."""
    g = face_geometry(mesh)
    vx, vy = vel

    def flux(u):
        return (vx * u, vy * u)

    def wavespeed(uL, uR, n):
        return vx * n[:, 0] + vy * n[:, 1]

    fv = FVPlex(mesh, flux, wavespeed, riemann="upwind",
                bc="outflow", order=order, limiter=limiter)
    rhs = fv.makeRHS()
    cc = g["ccent"]

    def bump(x, y):
        r2 = (x - 0.3) ** 2 + (y - 0.3) ** 2
        return np.exp(-r2 / 0.02)

    u = jnp.asarray(bump(cc[:, 0], cc[:, 1]))
    h = float(np.sqrt(g["vol"].min()))
    dt = cfl * h / np.hypot(vx, vy)
    nst = int(np.ceil(T / dt))
    dt = T / nst
    import jax

    @jax.jit
    def step(u):
        # SSP-RK2 (Heun): TVD with the limited reconstruction
        k1 = rhs(0.0, u)
        u1 = u + dt * k1
        return 0.5 * (u + u1 + dt * rhs(0.0, u1))

    for _ in range(nst):
        u = step(u)
    exact = bump(cc[:, 0] - vx * T, cc[:, 1] - vy * T)
    return np.asarray(u), exact, g["vol"]


def test_face_geometry_closure():
    """Sum of outward face normals*area over each cell's faces is zero
    (discrete divergence theorem) and interior areas/volumes are sane."""
    p = DMPlex.createBoxMesh((5, 4), simplex=True)
    g = face_geometry(p)
    nc = p.ncells
    acc = np.zeros((nc, 2))
    for f in range(len(g["area"])):
        na = g["normal"][f] * g["area"][f]
        acc[g["cL"][f]] += na
        if g["cR"][f] >= 0:
            acc[g["cR"][f]] -= na
    assert np.abs(acc).max() < 1e-13
    assert abs(g["vol"].sum() - 1.0) < 1e-13
    # tet mesh closure too
    p3 = DMPlex.createBoxMesh((2, 2, 2), simplex=True)
    g3 = face_geometry(p3)
    acc3 = np.zeros((p3.ncells, 3))
    for f in range(len(g3["area"])):
        na = g3["normal"][f] * g3["area"][f]
        acc3[g3["cL"][f]] += na
        if g3["cR"][f] >= 0:
            acc3[g3["cR"][f]] -= na
    assert np.abs(acc3).max() < 1e-13
    assert abs(g3["vol"].sum() - 1.0) < 1e-12


def test_advection_first_order_convergence_gmsh(tmp_path):
    """1st-order upwind FV on refined gmsh triangle meshes: volume-
    weighted L1 error drops by >= 1.6x per refinement (order ~1)."""
    msh = tmp_path / "sq.msh"
    msh.write_text(GMSH_SQUARE)
    base = DMPlex.createFromGmsh(str(msh))
    errs = []
    m = base
    for lvl in range(3):
        for _ in range(2 if lvl == 0 else 1):
            m = m.refine()
        if lvl == 0:
            m0 = m
        u, ex, vol = _advect(m, order=1)
        errs.append(float(np.sum(np.abs(u - ex) * vol)))
    rate01 = errs[0] / errs[1]
    rate12 = errs[1] / errs[2]
    assert rate01 > 1.6 and rate12 > 1.6, (errs, rate01, rate12)


def test_second_order_beats_first():
    m = DMPlex.createBoxMesh((24, 24), simplex=True)
    u1, ex, vol = _advect(m, order=1)
    u2, _, _ = _advect(m, order=2, limiter="barth")
    e1 = float(np.sum(np.abs(u1 - ex) * vol))
    e2 = float(np.sum(np.abs(u2 - ex) * vol))
    assert e2 < 0.6 * e1, (e1, e2)


def test_barth_jespersen_tvd_bounds():
    """Advecting a 0/1 step with the limited 2nd-order scheme must not
    create values outside [min(u0), max(u0)] beyond roundoff (the TVD
    property the limiter exists for); unlimited 2nd order overshoots."""
    m = DMPlex.createBoxMesh((20, 20), simplex=True)
    g = face_geometry(m)
    cc = g["ccent"]

    def run(limiter):
        def flux(u):
            return (1.0 * u, 0.0 * u)

        def wavespeed(uL, uR, n):
            return n[:, 0]

        fv = FVPlex(m, flux, wavespeed, riemann="upwind",
                    bc="outflow", order=2, limiter=limiter)
        rhs = fv.makeRHS()
        u = jnp.asarray((cc[:, 0] < 0.4).astype(np.float64))
        h = float(np.sqrt(g["vol"].min()))
        dt = 0.3 * h
        import jax

        @jax.jit
        def step(u):
            k1 = rhs(0.0, u)
            u1 = u + dt * k1
            return 0.5 * (u + u1 + dt * rhs(0.0, u1))

        for _ in range(int(0.2 / dt)):
            u = step(u)
        return np.asarray(u)

    u_lim = run("barth")
    u_unl = run("none")
    assert u_lim.min() > -1e-10 and u_lim.max() < 1.0 + 1e-10, \
        (u_lim.min(), u_lim.max())
    assert u_unl.max() > 1.0 + 1e-4 or u_unl.min() < -1e-4


def test_rusanov_tet_quad_with_ts():
    """Rusanov flux on a tet mesh and a quad mesh, integrated through
    the TS interface (method-of-lines contract)."""
    for mesh in (DMPlex.createBoxMesh((3, 3, 3), simplex=True),
                 DMPlex.createBoxMesh((8, 8), simplex=False)):
        g = face_geometry(mesh)
        dim = g["ccent"].shape[1]

        def flux(u, dim=dim):
            return tuple(u if d == 0 else 0.5 * u for d in range(dim))

        def wavespeed(uL, uR, n):
            s = n[:, 0] + 0.5 * sum(n[:, d] for d in range(1, n.shape[1]))
            return jnp.abs(s) + 0.0 * uL

        fv = FVPlex(mesh, flux, wavespeed, riemann="rusanov",
                    bc="outflow", order=1)
        rhs = fv.makeRHS()
        nc = mesh.ncells
        ts = pt.TS().create()
        ts.setType("ssp")
        ts.setRHSFunction(lambda t, u: rhs(t, u))
        u0 = jnp.asarray(np.exp(
            -10 * np.sum((g["ccent"] - 0.4) ** 2, axis=1)))
        h = float(g["vol"].min()) ** (1.0 / dim)
        ts.setTimeStep(0.2 * h)
        ts.setMaxTime(0.05)
        u = ts.solveCompiled(u0)
        u = np.asarray(u[0] if isinstance(u, tuple) else u)[:nc]
        assert np.all(np.isfinite(u))
        assert u.max() <= 1.05 and u.min() >= -0.05
