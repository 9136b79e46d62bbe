"""HDF5 viewer (hdf5v.c analog) and nested/flamegraph log handlers."""

import io
import numpy as np

import petsc_tpu as pt
from petsc_tpu.sys.hdf5 import ViewerHDF5


def test_hdf5_vec_mat_roundtrip(tmp_path):
    import scipy.sparse as sp
    p = str(tmp_path / "o.h5")
    A0 = sp.random(12, 9, density=0.4, random_state=0, format="csr")
    v0 = np.random.default_rng(1).random(7)
    A = pt.MatAIJ.from_scipy(A0)
    v = pt.Vec.from_array(v0)
    with ViewerHDF5(p, "w") as w:
        w.pushGroup("/fields")
        w.writeVec("u", v)
        w.writeMat("A", A)
        w.popGroup()
    with ViewerHDF5(p, "r") as r:
        r.pushGroup("/fields")
        v1 = r.loadVec("u")
        A1 = r.loadMat("A")
        assert r.hasDataset("u") and not r.hasDataset("zzz")
    assert np.allclose(np.asarray(v1.getArray())[:7], v0)
    assert np.allclose(A1.to_scipy().toarray(), A0.toarray())


def test_hdf5_timestepping(tmp_path):
    p = str(tmp_path / "ts.h5")
    with ViewerHDF5(p, "w") as w:
        w.pushTimestepping()
        for k in range(3):
            w.setTimestep(k)
            w.writeVec("u", pt.Vec.from_array(np.full(4, float(k))))
    with ViewerHDF5(p, "r") as r:
        for k in range(3):
            u = r.loadVec("u", timestep=k)
            assert np.allclose(np.asarray(u.getArray())[:4], k)


def test_flamegraph_and_xml_handlers():
    pt.init(args=[])
    from petsc_tpu import config as cfg
    log = cfg.log()
    with log.nested("KSPSolve"):
        log.log_event("MatMult", 0.003, count=5)
    buf = io.StringIO()
    log.view_flamegraph(file=buf)
    out = buf.getvalue()
    assert "KSPSolve;MatMult 3000" in out
    buf = io.StringIO()
    log.view_nested_xml(file=buf)
    x = buf.getvalue()
    assert "<name>KSPSolve</name>" in x and "<ncalls>5</ncalls>" in x


def test_log_view_file_option(tmp_path):
    p = str(tmp_path / "flame.txt")
    pt.init(args=["-log_view", f":{p}:ascii_flamegraph"])
    from petsc_tpu import config as cfg
    cfg.log().log_event("VecNorm", 0.001)
    pt.finalize()
    txt = open(p).read()
    assert "VecNorm 1000" in txt
    pt.init(args=[])
