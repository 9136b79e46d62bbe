"""AO / MatPartitioning / VecGhost tests."""

import numpy as np

import petsc_tpu as pt
from petsc_tpu.parallel.ao import AO
from petsc_tpu.mat.partition import MatPartitioning
from petsc_tpu.vec.ghost import VecGhost
from petsc_tpu.vec.vec import InsertMode
from tests.test_mg_gamg import poisson2d


def test_ao_roundtrip():
    app = np.array([3, 0, 4, 1, 2])
    ao = AO.createBasic(app)
    p = ao.applicationToPetsc(app)
    assert np.array_equal(p, np.arange(5))
    assert np.array_equal(ao.petscToApplication(p), app)
    assert ao.applicationToPetsc(-1) == -1  # negative passthrough


def test_partition_balanced_cut():
    A = pt.MatAIJ.from_scipy(poisson2d(16))
    mp = MatPartitioning.create().setAdjacency(A).setNParts(4)
    part = mp.apply()
    counts = np.bincount(part, minlength=4)
    assert counts.min() >= 0.8 * counts.max()
    # rb beats a random partition on edge cut
    rng = np.random.default_rng(0)
    rand_cut = mp.edge_cut(rng.integers(0, 4, 256))
    assert mp.edge_cut(part) < rand_cut


def test_vec_ghost():
    v = VecGhost.createGhost(10, [2, 7])
    v.setArray(np.arange(10.0))
    v.ghostUpdate()  # forward
    lf = np.array(v.getLocalForm())
    assert np.allclose(lf[10:], [2.0, 7.0])
    # reverse ADD: contributions land on owners
    lf[10:] = [100.0, 200.0]
    v.setLocalForm(lf)
    v.ghostUpdate(InsertMode.ADD_VALUES, mode="reverse")
    arr = np.asarray(v.getArray())
    assert arr[2] == 102.0 and arr[7] == 207.0
