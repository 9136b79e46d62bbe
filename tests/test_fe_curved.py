"""High-order (curved) geometry: isoparametric P2 coordinate fields via
DMPlex.curveBoundary (plexgeometry.c's degree-2 coordinate-space /
DMPlexRemapGeometry role).  The acceptance contract is the classic
curved-domain result: P2 elements on a disk recover O(h^3) in L2 only
when the geometry is quadratic; straight edges cap convergence."""

import numpy as np
import jax.numpy as jnp
import scipy.sparse.linalg as spla

from petsc_tpu.dm.fe import DS, lagrange_fe, _geom_p2_tri
from petsc_tpu.dm.plex import DMPlex


def disk_mesh(nr):
    """Unit-disk triangulation by concentric rings (6i points on ring
    i), fan-stitched by angle."""
    pts = [(0.0, 0.0)]
    rings = []
    for i in range(1, nr + 1):
        r = i / nr
        n = 6 * i
        th = 2 * np.pi * np.arange(n) / n
        rings.append(np.arange(len(pts), len(pts) + n))
        pts += [(r * np.cos(t), r * np.sin(t)) for t in th]
    cells = [[0, rings[0][k], rings[0][(k + 1) % 6]] for k in range(6)]
    for i in range(1, nr):
        a, b = rings[i - 1], rings[i]
        n0, n1 = len(a), len(b)
        ia = ib = 0
        while ia < n0 or ib < n1:
            ta = (ia + 1) / n0 if ia < n0 else 1e9
            tb = (ib + 1) / n1 if ib < n1 else 1e9
            if tb <= ta:
                cells.append([a[ia % n0], b[ib % n1], b[(ib + 1) % n1]])
                ib += 1
            else:
                cells.append([a[ia % n0], b[ib % n1], a[(ia + 1) % n0]])
                ia += 1
    return DMPlex.createFromCellList(2, np.asarray(cells),
                                     np.asarray(pts))


def test_geom_p2_partition_of_unity():
    pts = np.array([[0.2, 0.3], [0.5, 0.1], [1 / 3, 1 / 3]])
    B, D = _geom_p2_tri(pts)
    assert np.allclose(B.sum(axis=1), 1.0, atol=1e-13)
    assert np.allclose(D.sum(axis=1), 0.0, atol=1e-13)
    # straight P2 field reproduces the affine map exactly
    ref = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0],
                    [0.5, 0.0], [0.5, 0.5], [0.0, 0.5]])
    assert np.allclose(B @ ref, pts, atol=1e-13)


def _solve_disk(nr, curved):
    plex = disk_mesh(nr)
    if curved:
        plex.curveBoundary(lambda x: x / np.linalg.norm(x))
    ds = DS(plex, lagrange_fe(2, 2))

    def uex(x):
        return (1 - x[0] ** 2 - x[1] ** 2) * np.exp(x[0])

    def f(x):
        ex = jnp.exp(x[0])
        r2 = x[0] ** 2 + x[1] ** 2
        return -(ex * (1 - r2) - 4 * x[0] * ex - 4 * ex)

    ds.setResidual(f0=lambda u, gu, x: -f(x), f1=lambda u, gu, x: gu)
    u0 = np.zeros(ds.ndof)
    J = ds.assembleJacobian(u0)
    F = np.asarray(ds.assembleResidual(u0))
    X = ds.dof_coords
    bnd = np.nonzero(np.linalg.norm(X, axis=1) > 1 - 1e-6)[0]
    keep = np.ones(ds.ndof, bool)
    keep[bnd] = False
    ui = spla.spsolve(J[keep][:, keep].tocsc(), -F[keep])
    u = np.zeros(ds.ndof)
    u[keep] = ui
    return ds.l2_error(u, uex)


def test_curved_p2_third_order_on_disk():
    e1, e2 = _solve_disk(8, True), _solve_disk(16, True)
    rate = np.log2(e1 / e2)
    assert rate > 2.6, (e1, e2, rate)
    # and the curved solve beats straight geometry by orders of
    # magnitude at the same resolution (the point of the feature)
    es = _solve_disk(8, False)
    assert es > 50 * e1, (es, e1)


def test_curved_dof_coords_on_true_boundary():
    plex = disk_mesh(6).curveBoundary(lambda x: x / np.linalg.norm(x))
    ds = DS(plex, lagrange_fe(2, 2))
    X = ds.dof_coords
    r = np.linalg.norm(X, axis=1)
    # curved boundary-edge midpoints sit ON the unit circle
    nbnd = (r > 1 - 1e-9).sum()
    assert nbnd >= 2 * 6 * 6  # 36 boundary vertices + 36 midpoints
    assert np.allclose(r[r > 1 - 1e-9], 1.0, atol=1e-12)


def test_curved_area_quadrature():
    """The curved Jacobian integrates the disk area to O(h^4) (P2
    boundary panels), far beyond the polygon's O(h^2) deficit."""
    plex = disk_mesh(12)
    poly_area = 0.0
    v = plex.coords[plex.cells]
    poly_area = float(np.abs(
        (v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1])
        - (v[:, 2, 0] - v[:, 0, 0]) * (v[:, 1, 1] - v[:, 0, 1])
    ).sum() / 2)
    plex.curveBoundary(lambda x: x / np.linalg.norm(x))
    ds = DS(plex, lagrange_fe(2, 1))
    # integrate 1 through l2_error trick: ||0 - 1||^2 = area
    area = ds.l2_error(np.zeros(ds.ndof), lambda x: 1.0) ** 2
    assert abs(area - np.pi) < 0.05 * abs(poly_area - np.pi)
    assert abs(area - np.pi) < 2e-4
