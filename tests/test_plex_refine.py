"""DMPlex uniform (regular) refinement and geometric multigrid on
unstructured meshes (plexrefine.c role + DMDA-dainterp.c role combined;
round-3 VERDICT item 7)."""

import numpy as np
import pytest

import petsc_tpu as pt
from petsc_tpu.dm.plex import DMPlex
from petsc_tpu.parallel.mesh import comm_self, make_comm

GMSH_SQUARE = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
5
1 0 0 0
2 1 0 0
3 1 1 0
4 0 1 0
5 0.45 0.55 0
$EndNodes
$Elements
4
1 2 2 5 1 1 2 5
2 2 2 5 1 2 3 5
3 2 2 5 1 3 4 5
4 2 2 5 1 4 1 5
$EndElements
"""


@pytest.mark.parametrize("faces,simplex", [((4, 4), True), ((3, 3), False),
                                           ((2, 2, 2), True),
                                           ((2, 2, 2), False)])
def test_refine_geometry(faces, simplex):
    p = DMPlex.createBoxMesh(faces, simplex=simplex)
    f = p.refine()
    nch = 4 if p.dim == 2 else 8
    assert f.ncells == p.ncells * nch
    if simplex:
        _, v0 = p.p1_gradients()
        _, v1 = f.p1_gradients()
        assert abs(v1.sum() - v0.sum()) < 1e-12
        assert v1.min() > 0
    # linear functions are interpolated exactly (P1/Q1 exactness)
    lin = p.coords @ np.arange(1, p.dim + 1) + 0.5
    linf = f.coords @ np.arange(1, p.dim + 1) + 0.5
    assert np.abs(f._interp @ lin - linf).max() < 1e-12
    # coarsen() walks back, createInterpolation returns the recorded P
    assert f.coarsen() is p
    P = f.createInterpolation(p)
    assert P.getSize() == (f.nvertices, p.nvertices)


def test_refine_labels_inherit():
    p = DMPlex.createBoxMesh((2, 2), simplex=True)
    p.labels = {"mat": np.asarray([0, 1])}
    f = p.refine()
    assert len(f.labels["mat"]) == 8  # 2 parents x 4 children


def test_geometric_mg_refined_tri():
    p = DMPlex.createBoxMesh((4, 4), simplex=True)
    for _ in range(3):
        p = p.refine()
    A, b = p.assemblePoissonP1(f=1.0)
    pt.init(args=["-pc_mg_levels", "4"])
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("mg")
    ksp.getPC().setFromOptions()
    ksp.setTolerances(rtol=1e-8, max_it=50)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    # DMDA geometric MG solves this class of problem in <= 10 its;
    # the unstructured hierarchy must stay within 2x (VERDICT item 7)
    assert ksp.getIterationNumber() <= 12
    A_sp = A.to_scipy()
    r = A_sp @ np.asarray(x.getArray())[:A_sp.shape[0]] \
        - np.asarray(b.getArray())[:A_sp.shape[0]]
    assert np.linalg.norm(r) < 1e-5


def test_geometric_mg_gmsh_mesh(tmp_path):
    """Unstructured gmsh mesh (asymmetric fan around an interior vertex)
    refined 3x, solved with geometric MG."""
    msh = tmp_path / "sq.msh"
    msh.write_text(GMSH_SQUARE)
    p = DMPlex.createFromGmsh(str(msh))
    for _ in range(3):
        p = p.refine()
    A, b = p.assemblePoissonP1(f=1.0)
    pt.init(args=["-pc_mg_levels", "4"])
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("mg")
    ksp.getPC().setFromOptions()
    ksp.setTolerances(rtol=1e-8, max_it=50)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    assert ksp.getIterationNumber() <= 12


def test_geometric_mg_sharded_fine_level(tmp_path):
    """Same hierarchy with the FINE operator distributed over 4 shards
    (coarse levels replicate — the telescope pattern)."""
    msh = tmp_path / "sq.msh"
    msh.write_text(GMSH_SQUARE)
    p = DMPlex.createFromGmsh(str(msh))
    for _ in range(3):
        p = p.refine()
    A, b = p.assemblePoissonP1(f=1.0)
    comm = make_comm(4)
    A4 = pt.MatAIJ.from_scipy(A.to_scipy(), comm=comm)
    A4._dm = p
    ksp = pt.KSP().create()
    ksp.setOperators(A4)
    ksp.setType("cg")
    ksp.getPC().setType("mg")
    pt.init(args=["-pc_mg_levels", "4"])
    ksp.getPC().setFromOptions()
    ksp.setTolerances(rtol=1e-8, max_it=50)
    bv = A4.createVecLeft()
    bv.setArray(np.asarray(b.getArray())[:A4.getSize()[0]])
    x = A4.createVecRight()
    ksp.solve(bv, x)
    assert ksp.getConvergedReason().converged
    assert ksp.getIterationNumber() <= 12
    A_sp = A.to_scipy()
    r = A_sp @ np.asarray(x.getArray())[:A_sp.shape[0]] \
        - np.asarray(b.getArray())[:A_sp.shape[0]]
    assert np.linalg.norm(r) < 1e-5


def test_convergence_under_refinement():
    """P1 Poisson convergence study: L2 error drops ~4x per refinement
    (the plexrefine convergence-test role, e.g. snes tutorial ex12)."""
    # manufactured solution u = sin(pi x) sin(pi y), f = 2 pi^2 u
    errs = []
    p = DMPlex.createBoxMesh((4, 4), simplex=True)
    for lev in range(3):
        p = p.refine()
        import scipy.sparse as sp
        g, vol = p.p1_gradients()
        # assemble with the exact f at vertices (mass-lumped load)
        A, _ = p.assemblePoissonP1(f=1.0)
        A_sp = A.to_scipy()
        x, y = p.coords[:, 0], p.coords[:, 1]
        uex = np.sin(np.pi * x) * np.sin(np.pi * y)
        f = 2 * np.pi ** 2 * uex
        bl = np.zeros(p.nvertices)
        np.add.at(bl, p.cells.reshape(-1),
                  np.repeat(vol / 3.0, 3) * f[p.cells].reshape(-1))
        bnd = p.markBoundaryVertices()
        bl[bnd] = 0.0
        u = sp.linalg.spsolve(A_sp.tocsc(), bl)
        # mass-lumped L2 error
        lump = np.zeros(p.nvertices)
        np.add.at(lump, p.cells.reshape(-1), np.repeat(vol / 3.0, 3))
        errs.append(np.sqrt(np.sum(lump * (u - uex) ** 2)))
    rate = errs[0] / errs[1], errs[1] / errs[2]
    assert rate[0] > 3.4 and rate[1] > 3.6, (errs, rate)
