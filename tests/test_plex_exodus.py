"""ExodusII mesh IO through scipy's netCDF-3 reader (plexexodusii.c
role — Exodus files are netCDF-3 classic containers, so no netCDF-C
dependency is needed)."""
import numpy as np
import pytest

import petsc_tpu as pt
from petsc_tpu.dm.plex import DMPlex


@pytest.mark.parametrize("simplex,dim", [(True, 2), (False, 2),
                                         (True, 3), (False, 3)])
def test_exodus_roundtrip(tmp_path, simplex, dim):
    faces = (3, 3) if dim == 2 else (2, 2, 2)
    p = DMPlex.createBoxMesh(faces, simplex=simplex)
    path = str(tmp_path / "mesh.exo")
    p.viewExodus(path)
    q = DMPlex.createFromExodus(path)
    assert q.dim == p.dim
    assert q.ncells == p.ncells
    assert q.nvertices == p.nvertices
    assert np.allclose(q.coords, p.coords)
    assert np.array_equal(q.cells, p.cells)


def test_exodus_solve_after_load(tmp_path):
    """A loaded Exodus mesh drives the standard assembly+solve path."""
    p = DMPlex.createBoxMesh((4, 4), simplex=True)
    path = str(tmp_path / "m.exo")
    p.viewExodus(path)
    q = DMPlex.createFromExodus(path)
    A, b = q.assemblePoissonP1(f=1.0)
    ksp = pt.KSP().create().setType("cg")
    ksp.setOperators(A)
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-10, max_it=500)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    assert float(np.abs(np.asarray(x.getArray())).max()) > 1e-4
