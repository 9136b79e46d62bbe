"""Sharded structured GAMG head (round-3 VERDICT item 8): slab-sharded
grid operators (dnd_mpi) coarsen geometrically by device probing — the
coarse levels stay dnd_mpi (gather-free), the Q1 transfers are
GSPMD-partitioned global slicing, and only the small tail is gathered
for the serial aggregation continuation (telescope pattern,
telescope.c + gamg.c:155-201)."""

import numpy as np
import pytest

import petsc_tpu as pt
from petsc_tpu.parallel.mesh import make_comm
from tests.test_mg_gamg import poisson3d


def _build(n, nshards=8):
    A_sp = poisson3d(n).tocsr()
    comm = make_comm(nshards)
    A = pt.MatAIJ.from_scipy(A_sp, comm=comm)
    A.setStencilGrid((n, n, n))
    return A_sp, A


def test_sharded_structured_levels():
    pt.init(args=[])
    n = 32
    A_sp, A = _build(n)
    if A.comm.nshards == 1:
        pytest.skip("needs the 8-virtual-device mesh")
    assert A.meta[0] == "dnd_mpi"
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("gamg")
    ksp.setTolerances(rtol=1e-8, max_it=60)
    b = A.createVecLeft()
    b.setArray(np.ones(A_sp.shape[0]))
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    assert ksp.getIterationNumber() <= 15
    # the head levels stayed slab-sharded stencils — no gathered fine
    # operator anywhere (the whole point of the sharded head)
    levs = ksp.getPC()._impl.levels
    assert levs[0].A.meta[0] == "dnd_mpi"
    assert levs[1].A.meta[0] == "dnd_mpi", [l.A.meta[0] for l in levs]
    # true residual
    xa = np.asarray(x.getArray())[: A_sp.shape[0]]
    r = np.linalg.norm(A_sp @ xa - 1.0) / np.linalg.norm(
        np.ones(A_sp.shape[0]))
    assert r < 1e-7, r


def test_sharded_head_matches_serial_iterations():
    """The probed sharded hierarchy is the SAME operator sequence as the
    serial device head: iteration counts must agree."""
    pt.init(args=[])
    n = 16
    A_sp, A = _build(n)
    if A.comm.nshards == 1:
        pytest.skip("needs the 8-virtual-device mesh")

    def solve(Am):
        ksp = pt.KSP().create()
        ksp.setOperators(Am)
        ksp.setType("cg")
        ksp.getPC().setType("gamg")
        ksp.setTolerances(rtol=1e-8, max_it=60)
        b = Am.createVecLeft()
        b.setArray(np.ones(A_sp.shape[0]))
        x = Am.createVecRight()
        ksp.solve(b, x)
        assert ksp.getConvergedReason().converged
        return ksp.getIterationNumber()

    its_mpi = solve(A)
    A1 = pt.MatAIJ.from_scipy(A_sp)
    A1.setStencilGrid((n, n, n))
    its_ser = solve(A1)
    assert abs(its_mpi - its_ser) <= 2, (its_mpi, its_ser)


def test_sharded_head_f32_cycle():
    pt.init(args=["-pc_mg_dtype", "single"])
    n = 32
    A_sp, A = _build(n)
    if A.comm.nshards == 1:
        pytest.skip("needs the 8-virtual-device mesh")
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("gamg")
    ksp.getPC().setFromOptions()
    ksp.setTolerances(rtol=1e-8, max_it=60)
    b = A.createVecLeft()
    b.setArray(np.ones(A_sp.shape[0]))
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    xa = np.asarray(x.getArray())[: A_sp.shape[0]]
    r = np.linalg.norm(A_sp @ xa - 1.0) / np.linalg.norm(
        np.ones(A_sp.shape[0]))
    assert r < 1e-7, r
    pt.init(args=[])
