"""VTK/VTU solution output (PETSCVIEWERVTK / plexvtu.c role)."""

import base64
import re
import struct

import numpy as np

import petsc_tpu as pt
from petsc_tpu.dm.plex import DMPlex
from petsc_tpu.sys.vtk import write_vtk, write_vtu


def test_vtu_roundtrip(tmp_path):
    p = DMPlex.createBoxMesh((3, 3), simplex=True)
    u = np.sin(p.coords[:, 0]) + p.coords[:, 1]
    path = str(tmp_path / "t.vtu")
    write_vtu(p, path, point_data={"u": u},
              cell_data={"rank": np.zeros(p.ncells)})
    txt = open(path).read()
    m = re.search(r'Name="u"[^>]*>\s*([A-Za-z0-9+/=]+)\s*</DataArray>', txt)
    raw = base64.b64decode(m.group(1))
    nb = struct.unpack("<I", raw[:4])[0]
    vals = np.frombuffer(raw[4:4 + nb], dtype=np.float64)
    assert np.allclose(vals, u)


def test_vtu_3d_cells(tmp_path):
    for simplex in (True, False):
        q = DMPlex.createBoxMesh((2, 2, 2), simplex=simplex)
        path = str(tmp_path / "t3.vtu")
        write_vtu(q, path, point_data={"z": q.coords[:, 2]})
        assert "UnstructuredGrid" in open(path).read()


def test_legacy_vtk_and_grid(tmp_path):
    p = DMPlex.createBoxMesh((2, 2), simplex=False)
    path = str(tmp_path / "t.vtk")
    write_vtk(p, path, point_data={"u": np.arange(float(p.nvertices))})
    txt = open(path).read()
    assert "UNSTRUCTURED_GRID" in txt and f"POINTS {p.nvertices}" in txt
    path2 = str(tmp_path / "g.vtk")
    write_vtk((4, 5, 6), path2, point_data={"u": np.arange(120.0)})
    assert "STRUCTURED_POINTS" in open(path2).read()
    path3 = str(tmp_path / "g.vti")
    write_vtu((4, 5, 6), path3, point_data={"u": np.arange(120.0)})
    assert "ImageData" in open(path3).read()


def test_ksp_view_solution_vtk(tmp_path):
    p = DMPlex.createBoxMesh((4, 4), simplex=True)
    A, b = p.assemblePoissonP1(f=1.0)
    out = str(tmp_path / "sol.vtu")
    pt.init(args=["-ksp_view_solution", f"vtk:{out}"])
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-8, max_it=200)
    x = A.createVecRight()
    ksp.solve(b, x)
    txt = open(out).read()
    assert 'Name="solution"' in txt
