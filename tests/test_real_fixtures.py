"""Real (non-synthetic) matrix fixtures (round-3 VERDICT missing item 7).

The reference benchmarks the actual SuiteSparse collection
(src/mat/tests/bench_spmv.c:377-397); this environment has no egress, so
the fixtures shipped in tests/data/ are the reference's own
share/petsc/datafiles/matrices set — including LFAT5 (Oberwolfach 1-D
beam, a genuine Davis-collection matrix) — validating the MatrixMarket
loader, the device layouts, and the PETSc-binary reader against
reference-WRITTEN files rather than self-generated patterns.
"""

import os

import numpy as np
import pytest

import petsc_tpu as pt

DATA = os.path.join(os.path.dirname(__file__), "data")


def _mtx_to_scipy(path):
    """Independent loader (scipy's own mmread) as ground truth."""
    import scipy.io as sio
    return sio.mmread(path).tocsr()


@pytest.mark.parametrize("name", ["LFAT5.mtx", "m_05_05_crk.mtx",
                                  "amesos2_test_mat0.mtx"])
def test_matrix_market_loader_matches_scipy(name):
    from petsc_tpu.mat.mmio import load_matrix_market
    path = os.path.join(DATA, name)
    ref = _mtx_to_scipy(path)
    A = load_matrix_market(path)
    assert A.getSize() == ref.shape
    got = A.to_scipy().tocsr()
    d = (got - ref).tocoo()
    assert len(d.data) == 0 or np.abs(d.data).max() < 1e-12


@pytest.mark.parametrize("kind", ["ell", "csr"])
def test_lfat5_layouts_spmv(kind):
    """LFAT5's irregular beam pattern through the explicit device
    layouts: SpMV must match scipy exactly."""
    pt.init(args=["-mat_spmv_kind", kind])
    ref = _mtx_to_scipy(os.path.join(DATA, "LFAT5.mtx"))
    A = pt.MatAIJ.from_scipy(ref)
    x = np.arange(1.0, ref.shape[1] + 1)
    y = A.op().mult(np.asarray(x, dtype=np.float64))
    np.testing.assert_allclose(np.asarray(y)[: ref.shape[0]], ref @ x,
                               rtol=1e-12)
    pt.init(args=[])


def test_lfat5_solve_gmres_ilu():
    """BASELINE config-2 role (GMRES(30)+ILU0) on a real matrix."""
    ref = _mtx_to_scipy(os.path.join(DATA, "LFAT5.mtx"))
    A = pt.MatAIJ.from_scipy(ref)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("gmres")
    ksp.getPC().setType("ilu")
    ksp.setTolerances(rtol=1e-10, max_it=200)
    b = A.createVecLeft()
    b.setArray(np.ones(ref.shape[0]))
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    r = ref @ np.asarray(x.getArray())[: ref.shape[0]] - 1.0
    assert np.linalg.norm(r) < 1e-6


def test_petsc_binary_reader_reference_written():
    """spd/ns int64-float64 were written by the REFERENCE's MatView —
    the interop contract the PETSc-binary reader claims."""
    from petsc_tpu.sys import viewer
    for name, spd in (("spd-real-int64-float64", True),
                      ("ns-real-int64-float64", False)):
        A = viewer.load(os.path.join(DATA, name))
        sp = A.to_scipy().tocsr()
        m, n = sp.shape
        assert m == n and sp.nnz > 0
        sym = (abs(sp - sp.T)).max() if m else 0.0
        if spd:
            assert sym < 1e-12
            w = np.linalg.eigvalsh(sp.toarray())
            assert w.min() > 0
        else:
            assert sym > 1e-12   # genuinely nonsymmetric fixture


def test_petsc_binary_system_solve():
    """tiny_system_with_x0: Mat + rhs Vec concatenated in one
    reference-written file (the MatLoad/VecLoad stream contract)."""
    from petsc_tpu.sys import viewer
    objs = viewer.load_all(os.path.join(DATA, "tiny_system_with_x0"))
    A = objs[0]
    vecs = [o for o in objs[1:] if hasattr(o, "getArray")]
    assert vecs, "expected at least the rhs vector in the stream"
    b = vecs[0]
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("gmres")
    ksp.getPC().setType("ilu")
    ksp.setTolerances(rtol=1e-12, max_it=100)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    sp = A.to_scipy().tocsr()
    n = sp.shape[0]
    r = sp @ np.asarray(x.getArray())[:n] - np.asarray(b.getArray())[:n]
    assert np.linalg.norm(r) / max(np.linalg.norm(np.asarray(b.getArray())[:n]), 1e-30) < 1e-8
