"""Viewer/serialization tests: PETSc binary format round trip + npz
checkpoint (format per reference aij.c:664 / vector.c:856)."""

import numpy as np

import petsc_tpu as pt
from petsc_tpu.sys import viewer
from tests.test_mg_gamg import poisson2d


def test_vec_binary_roundtrip(tmp_path):
    p = str(tmp_path / "v.dat")
    v = pt.Vec.from_array(np.linspace(0, 1, 37))
    viewer.vec_save(p, v)
    w = viewer.load(p)
    assert np.allclose(np.asarray(w.getArray()), np.asarray(v.getArray()))


def test_mat_binary_roundtrip(tmp_path):
    p = str(tmp_path / "m.dat")
    A = pt.MatAIJ.from_scipy(poisson2d(9))
    viewer.mat_save(p, A)
    B = viewer.load(p)
    assert (A.to_scipy() != B.to_scipy()).nnz == 0


def test_multi_object_file(tmp_path):
    p = str(tmp_path / "sys.dat")
    A = pt.MatAIJ.from_scipy(poisson2d(5))
    b = pt.Vec.from_array(np.arange(25.0))
    viewer.mat_save(p, A)
    viewer.vec_save(p, b, append=True)
    objs = viewer.load_all(p)
    assert len(objs) == 2
    assert objs[0].getSize() == (25, 25)
    assert np.allclose(np.asarray(objs[1].getArray()), np.arange(25.0))


def test_binary_is_bigendian_int32(tmp_path):
    """Byte-level check of the header layout (aij.c:664)."""
    p = str(tmp_path / "m2.dat")
    A = pt.MatAIJ.from_scipy(poisson2d(3))
    viewer.mat_save(p, A)
    raw = np.fromfile(p, dtype=">i4", count=4)
    assert raw[0] == 1211216
    assert raw[1] == 9 and raw[2] == 9
    assert raw[3] == A.nnz()


def test_npz_checkpoint(tmp_path):
    p = str(tmp_path / "ck.npz")
    A = pt.MatAIJ.from_scipy(poisson2d(6))
    x = pt.Vec.from_array(np.ones(36))
    viewer.checkpoint_save(p, A=A, x=x, t=np.array(3.5))
    out = viewer.checkpoint_load(p)
    assert (out["A"].to_scipy() != A.to_scipy()).nnz == 0
    assert np.allclose(np.asarray(out["x"].getArray()), 1.0)
    assert out["t"] == 3.5


def test_log_view(capsys):
    pt.init(args=[])
    A = pt.MatAIJ.from_scipy(poisson2d(8))
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    b = A.createVecLeft(); b.set(1.0)
    x = A.createVecRight()
    ksp.solve(b, x)
    pt.log().view()
    out = capsys.readouterr().out
    assert "KSPSolve" in out and "log_view" in out


def test_matrix_market_roundtrip(tmp_path):
    from petsc_tpu.mat.mmio import load_matrix_market, save_matrix_market
    p = str(tmp_path / "m.mtx")
    A = pt.MatAIJ.from_scipy(poisson2d(7))
    save_matrix_market(p, A)
    B = load_matrix_market(p)
    assert (abs(A.to_scipy() - B.to_scipy())).nnz == 0


def test_bench_spmv_driver(tmp_path, capsys):
    from petsc_tpu.mat.mmio import save_matrix_market
    from examples import bench_spmv
    p = str(tmp_path / "t.mtx")
    save_matrix_market(p, pt.MatAIJ.from_scipy(poisson2d(12)))
    bench_spmv.main(["-fmtx", p])
    out = capsys.readouterr().out
    assert "Gnnz/s" in out
