"""DMPlex HDF5 mesh I/O (plexhdf5.c / plexhdf5xdmf.c roles): round-trip
topology+coords+labels, XDMF-layout interchange, section-vector
round-trip, and a distributed solve on a loaded mesh."""

import numpy as np
import pytest

import petsc_tpu as pt
from petsc_tpu.dm.plex import DMPlex

h5py = pytest.importorskip("h5py")


def test_roundtrip_box_tri(tmp_path):
    p = DMPlex.createBoxMesh((4, 3), simplex=True)
    p.labels = {"physical_7": np.array([0, 2, 5], dtype=np.int64)}
    f = str(tmp_path / "mesh.h5")
    p.viewHDF5(f, name="box")
    q = DMPlex.createFromHDF5(f, name="box")
    assert q.dim == 2
    assert np.array_equal(q.cells, p.cells)
    assert np.allclose(q.coords, p.coords)
    assert np.array_equal(q.labels["physical_7"], [0, 2, 5])
    lbl = q.getLabel("physical_7")
    assert lbl is not None


def test_roundtrip_box_tet(tmp_path):
    p = DMPlex.createBoxMesh((2, 2, 2), simplex=True)
    f = str(tmp_path / "mesh3.h5")
    p.viewHDF5(f)
    q = DMPlex.createFromHDF5(f)
    assert q.dim == 3 and q.ncells == p.ncells
    assert np.allclose(q.coords, p.coords)


def test_xdmf_layout_interchange(tmp_path):
    """A file carrying ONLY the reference XDMF datasets
    (/viz/topology/cells + /geometry/vertices, plexhdf5xdmf.c) loads."""
    p = DMPlex.createBoxMesh((3, 3), simplex=True)
    f = str(tmp_path / "xdmf.h5")
    with h5py.File(f, "w") as h:
        d = h.create_dataset("viz/topology/cells",
                             data=np.asarray(p.cells, dtype=np.int64))
        d.attrs["cell_dim"] = np.int64(2)
        h.create_dataset("geometry/vertices",
                         data=np.asarray(p.coords))
    q = DMPlex.createFromHDF5(f)
    assert q.dim == 2 and q.ncells == p.ncells
    assert np.array_equal(q.cells, p.cells)


def test_vec_roundtrip_and_mismatch(tmp_path):
    p = DMPlex.createBoxMesh((4, 4), simplex=True)
    f = str(tmp_path / "m.h5")
    p.viewHDF5(f)
    u = np.linspace(0, 1, p.nvertices)
    p.vecViewHDF5(f, "u", u)
    v = p.vecLoadHDF5(f, "u")
    assert np.allclose(v, u)
    small = DMPlex.createBoxMesh((2, 2), simplex=True)
    from petsc_tpu.sys.error import Error
    with pytest.raises(Error):
        small.vecLoadHDF5(f, "u")


def test_solve_on_loaded_mesh_distributed(tmp_path):
    """VERDICT r3 item 6 'done' criterion: a solve on a loaded mesh at
    nshards=4 (write -> load -> distribute -> P1 Poisson -> CG)."""
    from petsc_tpu.parallel.mesh import make_comm
    p = DMPlex.createBoxMesh((10, 10), simplex=True)
    f = str(tmp_path / "solve.h5")
    p.viewHDF5(f)
    q = DMPlex.createFromHDF5(f, comm=make_comm(4))
    q = q.distribute()
    A, b = q.assemblePoissonP1(f=1.0)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-10, max_it=500)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    # compare against the serial assembly of the original mesh
    A0, b0 = p.assemblePoissonP1(f=1.0)
    ksp0 = pt.KSP().create()
    ksp0.setOperators(A0)
    ksp0.setType("cg")
    ksp0.getPC().setType("jacobi")
    ksp0.setTolerances(rtol=1e-10, max_it=500)
    x0 = A0.createVecRight()
    ksp0.solve(b0, x0)
    n0 = float(x0.norm())
    assert abs(float(x.norm()) - n0) / n0 < 1e-6
