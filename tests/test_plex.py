"""DMPlex-lite tests: topology queries, boundary marking, P1 Poisson
solves on tri/tet meshes vs analytic solutions."""

import numpy as np
import pytest

import petsc_tpu as pt
from petsc_tpu.dm import DMPlex


def test_chart_and_cone():
    p = DMPlex.createBoxMesh((2, 2), simplex=True)
    assert p.ncells == 8 and p.nvertices == 9
    pS, pE = p.getChart()
    assert pE == 17
    cone = p.getCone(0)
    assert len(cone) == 3 and (cone >= p.ncells).all()
    sup = p.getSupport(p.ncells)  # vertex 0
    assert len(sup) >= 1


def test_boundary_vertices():
    p = DMPlex.createBoxMesh((3, 3), simplex=True)
    bnd = p.markBoundaryVertices()
    coords = p.coords[bnd]
    on_edge = ((coords == 0.0) | (coords == 1.0)).any(axis=1)
    assert on_edge.all()
    assert len(bnd) == 12  # 4x4 grid: all but the 4 interior vertices


def test_p1_poisson_2d_convergence():
    """-Lap u = 1, u=0 on boundary of unit square: compare center value
    against the series solution ~0.07367."""
    errs = []
    for n in (8, 16):
        p = DMPlex.createBoxMesh((n, n), simplex=True)
        A, b = p.assemblePoissonP1(f=1.0)
        ksp = pt.KSP().create()
        ksp.setOperators(A)
        ksp.setType("cg")
        ksp.getPC().setType("gamg")
        ksp.setTolerances(rtol=1e-10, max_it=200)
        x = A.createVecRight()
        ksp.solve(b, x)
        assert ksp.getConvergedReason().converged
        u = np.asarray(x.getArray())
        center = np.argmin(np.sum((p.coords - 0.5) ** 2, axis=1))
        errs.append(abs(u[center] - 0.07367135))
    assert errs[1] < errs[0]          # mesh convergence
    assert errs[1] < 2e-3


def test_p1_poisson_3d():
    p = DMPlex.createBoxMesh((6, 6, 6), simplex=True)
    assert p.cells.shape[1] == 4      # tets
    A, b = p.assemblePoissonP1(f=1.0)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-10, max_it=500)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    u = np.asarray(x.getArray())
    assert u.max() > 0.02 and u.min() >= -1e-12


def test_gmsh_reader(tmp_path):
    """Gmsh ASCII v2.2 round trip: write a 2-triangle square, read, solve."""
    msh = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
4
1 0 0 0
2 1 0 0
3 1 1 0
4 0 1 0
$EndNodes
$Elements
3
1 1 2 7 1 1 2
2 2 2 5 1 1 2 3
3 2 2 5 1 1 3 4
$EndElements
"""
    p = str(tmp_path / "sq.msh")
    open(p, "w").write(msh)
    plex = DMPlex.createFromGmsh(p)
    assert plex.dim == 2
    assert plex.ncells == 2 and plex.nvertices == 4
    assert "physical_5" in plex.labels and len(plex.labels["physical_5"]) == 2
    g, vol = plex.p1_gradients()
    assert abs(vol.sum() - 1.0) < 1e-12


def test_plex_interpolate_edges():
    """DMPlexInterpolate-lite: edge stratum generation; Euler formula
    V - E + F = 1 for a simply-connected planar triangulation (plus the
    outer face)."""
    from petsc_tpu.dm.plex import DMPlex
    plex = DMPlex.createBoxMesh((4, 4), simplex=True)
    plex.interpolate()
    V = plex.nvertices
    E = len(plex.edges)
    F = plex.ncells
    assert V - E + F == 1
    assert plex.getDepth() == 2
    cone = plex.getConeInterpolated(0)
    assert len(cone) == 3
    vts = plex.getEdgeCone(cone[0])
    assert len(vts) == 2


def test_section_fields_constraints():
    from petsc_tpu.dm.plex import Section
    s = Section(5)
    s.setNumFields(2)
    for p in range(5):
        s.setFieldDof(p, 0, 2)
        s.setFieldDof(p, 1, 1)
        s.setDof(p, 3)
    s.setConstraintDof(0, 1)
    s.setUp()
    assert s.getStorageSize() == 15
    assert s.getConstrainedStorageSize() == 14
    assert s.getOffset(2) == 6
    assert s.getFieldOffset(2, 1) == 8
    assert s.getChart() == (0, 5)
    assert s.getNumFields() == 2


def test_gmsh41_reader(tmp_path):
    """MSH 4.1 block format (plexgmsh.c GmshReadMSH4*): entities carry
    the physical tags, nodes and elements come in entity blocks."""
    msh = tmp_path / "square41.msh"
    msh.write_text("""$MeshFormat
4.1 0 8
$EndMeshFormat
$Entities
0 0 1 0
1 0 0 0 1 1 0 1 7 0
$EndEntities
$Nodes
1 4 1 4
2 1 0 4
1
2
3
4
0 0 0
1 0 0
1 1 0
0 1 0
$EndNodes
$Elements
1 2 1 2
2 1 2 2
1 1 2 3
2 1 3 4
$EndElements
""")
    p = DMPlex.createFromGmsh(str(msh))
    assert p.dim == 2
    assert p.ncells == 2
    assert p.nvertices == 4
    np.testing.assert_allclose(p.coords[1], [1.0, 0.0])
    assert set(p.labels) == {"physical_7"}
    assert len(p.labels["physical_7"]) == 2
    # the mesh assembles and solves
    A, b = p.assemblePoissonP1()
    assert A.getSize() == (4, 4)


def test_interpolate_3d_tet_strata():
    """3-D interpolation (plexinterpolate.c): face + edge strata with
    cones cells -> faces -> edges -> vertices; Euler characteristic of a
    ball V - E + F - C = 1."""
    p = DMPlex.createBoxMesh((2, 2, 2), simplex=True).interpolate()
    assert p.getDepth() == 3
    V, E, F, C = p.nvertices, len(p.edges), len(p.faces), p.ncells
    assert V - E + F - C == 1
    # cone chain types
    fcone = p.getConeInterpolated(0)
    assert len(fcone) == 4
    econe = p.getFaceCone(int(fcone[0]))
    assert len(econe) == 3
    vcone = p.getEdgeCone(int(econe[0]))
    assert len(vcone) == 2
    base_v = p.ncells
    assert all(base_v <= v < base_v + V for v in vcone)
    # each face's edges connect exactly its three vertices
    f0 = p.faces[0]
    verts = set()
    base_f = p.ncells + p.nvertices + E
    for ep in p.getFaceCone(base_f):
        verts.update((p.getEdgeCone(int(ep)) - p.ncells).tolist())
    assert verts == set(int(v) for v in f0)


def test_plex_getlabel_and_submesh():
    """DMGetLabel over gmsh physical groups + DMPlexCreateSubmesh
    (filter): the submesh solves its own P1 problem and parent maps
    index back into the full mesh."""
    p = DMPlex.createBoxMesh((6, 6), simplex=True)
    # label the left-half cells
    cent = p.coords[p.cells].mean(axis=1)
    left = np.nonzero(cent[:, 0] < 0.5)[0]
    p.labels = {"physical_3": left}
    lbl = p.getLabel("physical")
    assert lbl.getStratumSize(3) == len(left)
    np.testing.assert_array_equal(np.sort(lbl.getStratumIS(3)),
                                  np.sort(left))
    sub = p.createSubmesh(left)
    assert sub.ncells == len(left)
    # parent maps restrict coordinates exactly
    np.testing.assert_allclose(sub.coords,
                               p.coords[sub.parent_vertices])
    # the submesh assembles and solves standalone
    A, b = sub.assemblePoissonP1()
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-10)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason() > 0


def test_plex_extrude_conforming_tets():
    """DMPlexExtrude: 2-D tris -> 3-D tets; conforming (every interior
    face shared by exactly 2 tets), volume-exact, and solvable."""
    p2 = DMPlex.createBoxMesh((4, 4), simplex=True)
    p3 = p2.extrude(3, height=0.6)
    assert p3.dim == 3 and p3.ncells == p2.ncells * 3 * 3
    # volumes sum to area * height
    v = p3.coords[p3.cells]
    J = v[:, 1:] - v[:, :1]
    vol = np.abs(np.linalg.det(J)) / 6.0
    assert abs(vol.sum() - 1.0 * 0.6) < 1e-12
    assert vol.min() > 0
    # conformity: no face shared by 3+ cells
    faces = np.concatenate([np.sort(p3.cells[:, f], axis=1)
                            for f in [[0, 1, 2], [0, 1, 3],
                                      [0, 2, 3], [1, 2, 3]]])
    _, counts = np.unique(faces, axis=0, return_counts=True)
    assert counts.max() == 2
    # solve Poisson on the extruded mesh
    A, b = p3.assemblePoissonP1()
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-9)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason() > 0


def test_plex_getlabel_value_semantics():
    """physical_<tag> groups carry value <tag> under either query name;
    unknown names return None (DMGetLabel NULL semantics)."""
    p = DMPlex.createBoxMesh((4, 4), simplex=True)
    p.labels = {"physical_7": np.array([0, 1, 2])}
    assert p.getLabel("physical_7").getStratumSize(7) == 3
    assert p.getLabel("physical").getStratumSize(7) == 3
    assert p.getLabel("nope") is None
