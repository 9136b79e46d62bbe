"""DMPlexTransform family + DMAdaptLabel/DMAdaptMetric
(reference: src/dm/impls/plex/transform/impls/*, plexadapt.c)."""

import numpy as np
import pytest

from petsc_tpu.dm.plex import DMPlex
from petsc_tpu.dm.plex_transform import (
    PlexTransform, adapt_label, adapt_metric, alfeld_split, refine_1d,
    to_box, to_simplex)


def _tri_area(coords, cells):
    v = coords[cells]
    return 0.5 * np.abs(
        (v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1])
        - (v[:, 2, 0] - v[:, 0, 0]) * (v[:, 1, 1] - v[:, 0, 1]))


def _quad_area(coords, cells):
    # shoelace per quad (ccw plex corner order 00,10,11,01 is a cycle
    # 0-1-2-3)
    v = coords[cells]
    x, y = v[..., 0], v[..., 1]
    s = np.zeros(len(cells))
    for k in range(4):
        j = (k + 1) % 4
        s += x[:, k] * y[:, j] - x[:, j] * y[:, k]
    return 0.5 * np.abs(s)


def _tet_vol(coords, cells):
    v = coords[cells]
    J = np.stack([v[:, 1] - v[:, 0], v[:, 2] - v[:, 0],
                  v[:, 3] - v[:, 0]], axis=1)
    return np.abs(np.linalg.det(J)) / 6.0


def _hex_vol(coords, cells):
    # split into the same Kuhn tets and sum
    kuhn = [[0, 1, 2, 6], [0, 2, 3, 6], [0, 3, 7, 6],
            [0, 7, 4, 6], [0, 4, 5, 6], [0, 5, 1, 6]]
    return sum(_tet_vol(coords, cells[:, t]).sum() for t in kuhn)


def _edge_counts(cells, pairs):
    from collections import Counter
    cnt = Counter()
    for cell in cells:
        for a, b in pairs:
            cnt[tuple(sorted((int(cell[a]), int(cell[b]))))] += 1
    return cnt


def _assert_conforming_tri(cells):
    """Every edge is shared by at most 2 triangles, and the counts form
    a closed surface complex (1 = boundary, 2 = interior) — the
    no-hanging-node property."""
    cnt = _edge_counts(cells, [(0, 1), (1, 2), (2, 0)])
    assert set(cnt.values()) <= {1, 2}


def test_alfeld_triangles():
    p = DMPlex.createBoxMesh((3, 3), simplex=True)
    p.labels = {"zone": np.array([0, 1])}
    q = alfeld_split(p)
    assert q.ncells == 3 * p.ncells
    assert np.isclose(_tri_area(q.coords, q.cells).sum(), 1.0)
    _assert_conforming_tri(q.cells)
    # labels inherited: 2 parents x 3 children
    assert len(q.labels["zone"]) == 6
    # interpolation rows sum to one
    assert np.allclose(np.asarray(q._interp.sum(axis=1)).ravel(), 1.0)


def test_alfeld_tets_volume_and_orientation():
    p = DMPlex.createBoxMesh((2, 2, 2), simplex=True)
    q = alfeld_split(p)
    assert q.ncells == 4 * p.ncells
    assert np.isclose(_tet_vol(q.coords, q.cells).sum(), 1.0)
    # all children positively oriented when parents are
    v = q.coords[q.cells]
    J = np.stack([v[:, 1] - v[:, 0], v[:, 2] - v[:, 0],
                  v[:, 3] - v[:, 0]], axis=1)
    det = np.linalg.det(J)
    assert (np.sign(det) == np.sign(det[0])).all()


def test_tobox_triangles():
    p = DMPlex.createBoxMesh((3, 2), simplex=True)
    q = to_box(p)
    assert q.cells.shape[1] == 4
    assert q.ncells == 3 * p.ncells
    assert np.isclose(_quad_area(q.coords, q.cells).sum(), 1.0)
    cnt = _edge_counts(q.cells, [(0, 1), (1, 2), (2, 3), (3, 0)])
    assert set(cnt.values()) <= {1, 2}


def test_tobox_tets():
    p = DMPlex.createBoxMesh((2, 2, 2), simplex=True)
    q = to_box(p)
    assert q.cells.shape[1] == 8
    assert q.ncells == 4 * p.ncells
    assert np.isclose(_hex_vol(q.coords, q.cells), 1.0)


def test_tosimplex_quads_and_hexes():
    p = DMPlex.createBoxMesh((3, 3), simplex=False)
    q = to_simplex(p)
    assert q.ncells == 2 * p.ncells
    assert np.isclose(_tri_area(q.coords, q.cells).sum(), 1.0)
    _assert_conforming_tri(q.cells)
    h = DMPlex.createBoxMesh((2, 2, 2), simplex=False)
    t = to_simplex(h)
    assert t.ncells == 6 * h.ncells
    assert np.isclose(_tet_vol(t.coords, t.cells).sum(), 1.0)


def test_refine_1d():
    p = DMPlex.createFromCellList(
        1, [[0, 1], [1, 2]], [[0.0], [0.5], [1.0]])
    q = refine_1d(p)
    assert q.ncells == 4
    assert np.isclose(np.sort(q.coords.ravel())[1], 0.25)


def test_adapt_label_conforming():
    p = DMPlex.createBoxMesh((4, 4), simplex=True)
    marked = np.array([0, 5])
    q = adapt_label(p, marked)
    _assert_conforming_tri(q.cells)
    assert np.isclose(_tri_area(q.coords, q.cells).sum(), 1.0)
    # marked cells got 4 regular children
    for m in marked:
        assert (q.parent_cells == m).sum() == 4
    # strictly adaptive: fewer cells than uniform refinement
    assert p.ncells < q.ncells < 4 * p.ncells
    # interpolation rows sum to one (P1 transfer consistency)
    assert np.allclose(np.asarray(q._interp.sum(axis=1)).ravel(), 1.0)


def test_adapt_label_via_dmlabel_and_solve():
    from petsc_tpu.dm.label import DMLabel
    from petsc_tpu.ksp.ksp import KSP
    p = DMPlex.createBoxMesh((4, 4), simplex=True)
    lbl = DMLabel("adapt")
    lbl.insertIS(np.array([3, 7, 11]), 1)
    q = p.adaptLabel(lbl)
    _assert_conforming_tri(q.cells)
    # Poisson on the adapted mesh still assembles + solves SPD
    A, b = q.assemblePoissonP1(f=1.0)
    ksp = KSP().setType("cg").setOperators(A).setTolerances(rtol=1e-10)
    x = b.duplicate()
    ksp.solve(b, x)
    assert ksp.getIterationNumber() > 0
    xs = np.asarray(x.getArray())
    assert np.isfinite(xs).all() and xs.max() > 0


def _assert_conforming_tet(cells):
    """Every triangular face is shared by at most 2 tets (1 = boundary,
    2 = interior) — no hanging nodes/faces."""
    from collections import Counter
    cnt = Counter()
    for cell in cells:
        for f in ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)):
            cnt[tuple(sorted(int(cell[v]) for v in f))] += 1
    assert set(cnt.values()) <= {1, 2}


def test_adapt_label_tets_conforming():
    p = DMPlex.createBoxMesh((2, 2, 2), simplex=True)
    marked = np.array([0, 7, 20])
    q = adapt_label(p, marked)
    _assert_conforming_tet(q.cells)
    assert np.isclose(_tet_vol(q.coords, q.cells).sum(), 1.0)
    # every marked tet was actually bisected (>= 2 children)
    for m in marked:
        assert (q.parent_cells == m).sum() >= 2
    # adaptive: strictly between no refinement and uniform red
    assert p.ncells < q.ncells < 8 * p.ncells
    assert np.allclose(np.asarray(q._interp.sum(axis=1)).ravel(), 1.0)
    # positive volumes (no degenerate children)
    assert _tet_vol(q.coords, q.cells).min() > 1e-12


def test_adapt_label_tets_repeated_and_solve():
    """Two adaptation rounds stay conforming, and P1 Poisson assembles
    and solves on the result (the end-to-end contract)."""
    import scipy.sparse.linalg as spla
    from petsc_tpu.dm.fe import DS, lagrange_fe
    p = DMPlex.createBoxMesh((2, 2, 2), simplex=True)
    q = adapt_label(p, np.arange(6))
    _assert_conforming_tet(q.cells)
    r = adapt_label(q, np.arange(0, q.ncells, 3))
    _assert_conforming_tet(r.cells)
    assert np.isclose(_tet_vol(r.coords, r.cells).sum(), 1.0)
    ds = DS(r, lagrange_fe(3, 1))
    ds.setResidual(f0=lambda u, gu, x: -1.0, f1=lambda u, gu, x: gu)
    J = ds.assembleJacobian(np.zeros(ds.ndof))
    F = np.asarray(ds.assembleResidual(np.zeros(ds.ndof)))
    bnd = ds.boundary_dofs(lambda x: x.min() < 1e-9 or x.max() > 1 - 1e-9)
    keep = np.ones(ds.ndof, bool)
    keep[bnd] = False
    u = spla.spsolve(J[keep][:, keep].tocsc(), -F[keep])
    assert np.isfinite(u).all() and u.max() > 0


def test_adapt_metric_tets():
    p = DMPlex.createBoxMesh((2, 2, 2), simplex=True)
    h = np.where(np.linalg.norm(p.coords, axis=1) < 0.5, 0.15, 1.0)
    q = adapt_metric(p, h, max_passes=8)
    _assert_conforming_tet(q.cells)
    assert np.isclose(_tet_vol(q.coords, q.cells).sum(), 1.0)
    cc = q.coords[q.cells].mean(axis=1)
    near = (np.linalg.norm(cc, axis=1) < 0.5).sum()
    far = (np.linalg.norm(cc - 1.0, axis=1) < 0.5).sum()
    assert near > 2 * far


def test_adapt_metric_concentrates_cells():
    p = DMPlex.createBoxMesh((4, 4), simplex=True)
    # ask for tiny edges near the origin corner, coarse elsewhere
    def target_h(coords):
        r = np.linalg.norm(coords, axis=1)
        return np.where(r < 0.4, 0.08, 0.5)
    q = adapt_metric(p, target_h(p.coords), max_passes=4)
    _assert_conforming_tri(q.cells)
    assert np.isclose(_tri_area(q.coords, q.cells).sum(), 1.0)
    cc = q.coords[q.cells].mean(axis=1)
    near = (np.linalg.norm(cc, axis=1) < 0.4).sum()
    far = (np.linalg.norm(cc - np.array([1.0, 1.0]), axis=1) < 0.4).sum()
    assert near > 3 * far


def test_adapt_metric_tensor_anisotropic():
    p = DMPlex.createBoxMesh((4, 4), simplex=True)
    # metric demanding h=1/16 in x, h=1/4 in y -> more x-refinement
    nv = len(p.coords)
    M = np.zeros((nv, 2, 2))
    M[:, 0, 0] = 16.0 ** 2
    M[:, 1, 1] = 4.0 ** 2
    q = adapt_metric(p, M, max_passes=5)
    _assert_conforming_tri(q.cells)
    # the longest remaining metric length is within the band
    e01 = q.coords[q.cells[:, 1]] - q.coords[q.cells[:, 0]]
    l2 = 16.0 ** 2 * e01[:, 0] ** 2 + 4.0 ** 2 * e01[:, 1] ** 2
    assert l2.max() <= 2.0 + 1e-12


def test_plextransform_object_api():
    p = DMPlex.createBoxMesh((2, 2), simplex=True)
    t = PlexTransform("refine_alfeld")
    assert t.getType() == "refine_alfeld"
    q = t.apply(p)
    assert q.ncells == 3 * p.ncells
    r = PlexTransform("refine_regular").apply(p)
    assert r.ncells == 4 * p.ncells
    s = p.transform("transform_filter", cells=np.arange(4))
    assert s.ncells == 4
    with pytest.raises(Exception):
        PlexTransform("not_a_type")


def test_pcmg_on_adapted_hierarchy():
    """createInterpolation drives PCMG on an adaptLabel-refined plex
    just like uniform refine (the DM-driven geometric-MG contract)."""
    p = DMPlex.createBoxMesh((4, 4), simplex=True)
    q = p.adaptLabel(np.arange(8))
    I = q.createInterpolation(p)
    assert tuple(I.shape if isinstance(I.shape, tuple) else I.shape()) \
        == (q.nvertices, p.nvertices)
    # transfer of the linear function x+y is exact (P1 reproduction)
    lin = p.coords.sum(axis=1)
    fine = I.mult_array(lin) if hasattr(I, "mult_array") else None
    if fine is None:
        from petsc_tpu.vec.vec import Vec
        v = Vec.from_array(lin)
        w = Vec.from_array(np.zeros(q.nvertices))
        I.mult(v, w)
        fine = np.asarray(w.getArray())
    assert np.allclose(fine, q.coords.sum(axis=1), atol=1e-12)
