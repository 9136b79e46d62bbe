"""DMComposite/DMShell/DMRedundant/DMStag tests."""

import numpy as np

import petsc_tpu as pt
from petsc_tpu.dm import DMComposite, DMRedundant, DMShell, DMStag


def test_composite_pack_unpack():
    da = pt.DMDA.create(2, (5, 5))
    red = DMRedundant.create(3)
    dmc = DMComposite.create([da, red])
    assert dmc.N == 28
    v = dmc.createGlobalVector()
    subs = dmc.getAccess(v)
    subs[0].set(1.0)
    subs[1].setArray(np.array([7.0, 8.0, 9.0]))
    dmc.restoreAccess(v, subs)
    arr = np.asarray(v.getArray())
    assert np.allclose(arr[:25], 1.0)
    assert np.allclose(arr[25:], [7, 8, 9])
    iss = dmc.getFieldIS()
    assert len(iss) == 2 and len(iss[1]) == 3


def test_composite_fieldsplit():
    """DMComposite field ISes drive PCFieldSplit."""
    import scipy.sparse as sp
    from tests.test_mg_gamg import poisson2d
    da = pt.DMDA.create(2, (6, 6))
    red = DMRedundant.create(4)
    dmc = DMComposite.create([da, red])
    A00 = poisson2d(6)
    A11 = sp.eye(4, format="csr") * 3.0
    A = sp.block_diag([A00 + sp.eye(36), A11]).tocsr()
    M = pt.MatAIJ.from_scipy(A)
    ksp = pt.KSP().create()
    ksp.setOperators(M)
    ksp.setType("gmres")
    pc = ksp.getPC()
    pc.setType("fieldsplit")
    iss = dmc.getFieldIS()
    pc._impl.setIS("0", iss[0])
    pc._impl.setIS("1", iss[1])
    ksp.setTolerances(rtol=1e-10)
    b = M.createVecLeft(); b.set(1.0)
    x = M.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged


def test_shell():
    dm = DMShell()
    dm.setCreateGlobalVector(lambda d: pt.Vec.from_array(np.zeros(7)))
    v = dm.createGlobalVector()
    assert v.getSize() == 7


def test_stag_2d_layout():
    st = DMStag.create((4, 3), (1, 1, 2))  # vertices, faces, 2 per element
    # vertices (5*4), left faces (5*3... shapes: left=(ny, nx+1)) etc.
    offs = st.getStratumOffsets()
    assert offs["vertex"][1] == (4, 5)
    assert offs["element"][2] == 2
    v = st.createGlobalVector()
    assert v.getSize() == st.N
    el = st.getVecArray(v, "element")
    assert el.shape == (3, 4, 2)
    el[:] = 2.5
    st.setVecArray(v, "element", el)
    da, dv = st.splitToDMDA(v, "element")
    assert np.allclose(np.asarray(dv.getArray()), 2.5)


def test_stag_1d():
    st = DMStag.create(8, (1, 1))
    assert st.N == 9 + 8
    v = st.createGlobalVector()
    st.setVecArray(v, "vertex", np.arange(9.0))
    assert np.allclose(st.getVecArray(v, "vertex"), np.arange(9.0))


def test_stokes_mac_fieldsplit():
    """DMStag MAC Stokes + FGMRES/fieldsplit-Schur: manufactured-solution
    convergence and discrete incompressibility."""
    from examples import stokes_stag
    k1, e1, d1 = stokes_stag.main(["-n", "8"])
    k2, e2, d2 = stokes_stag.main(["-n", "16"])
    assert k1.getConvergedReason().converged
    assert k2.getConvergedReason().converged
    assert d2 < 1e-8                      # div-free
    assert e2 < e1 / 2                    # mesh convergence


def test_dmlabel():
    from petsc_tpu.dm.label import DMLabel
    lab = DMLabel("boundary")
    lab.insertIS([3, 1, 2], 7)
    lab.setValue(9, 7)
    lab.setValue(4, 2)
    lab.setValue(4, 3)            # relabel moves the point
    assert lab.getValue(4) == 3 and lab.getValue(1) == 7
    assert lab.getValue(100) == -1
    assert lab.getStratumIS(7).tolist() == [1, 2, 3, 9]
    assert lab.getStratumSize(2) == 0
    assert lab.getValueIS().tolist() == [3, 7]
    assert lab.stratumHasPoint(7, 2)


def test_dmsliced_product():
    from petsc_tpu.dm.label import DMProduct, DMSliced
    s = DMSliced.create(bs=3, n=10)
    v = s.createGlobalVector()
    assert v.getSize() == 30
    p = DMProduct()
    p.setDM(1, s)
    assert p.getDM(1) is s


def test_plex_partitioner():
    from petsc_tpu.dm.plex import DMPlex, PetscPartitioner
    plex = DMPlex.createBoxMesh((6, 6), simplex=True)
    for t in ("simple", "bisection"):
        part = PetscPartitioner(t).partition(plex, 4)
        assert len(part) == len(plex.cells)
        counts = np.bincount(part, minlength=4)
        assert counts.min() > 0
        assert counts.max() - counts.min() <= max(2, len(plex.cells) // 8)


def test_mat_localref():
    from petsc_tpu.mat.utility import MatLocalRef
    A = pt.MatAIJ(None)
    A.setSizes((6, 6))
    L = MatLocalRef.create(A, [2, 4, 5])
    L.setValues([0, 1], [0, 1], [[1.0, 2.0], [3.0, 4.0]])
    L.assemble()
    S = A.to_scipy().toarray()
    assert S[2, 2] == 1.0 and S[2, 4] == 2.0 and S[4, 4] == 4.0
