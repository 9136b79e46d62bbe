"""DMSwarm PIC tests (swarm.c / swarm_pic.c behavior)."""

import numpy as np
import pytest

import petsc_tpu as pt


def make_swarm(n=9, ppcell=2, dim=2):
    da = pt.DMDA.create(dim=dim, sizes=(n,) * dim)
    sw = pt.DMSwarm.create()
    sw.setType("pic")
    sw.setCellDM(da)
    sw.registerField("w", 1)
    sw.insertPointsUsingCellDM(ppcell=ppcell)
    return da, sw


def test_insert_and_sizes():
    da, sw = make_swarm(n=5, ppcell=2)
    assert sw.getLocalSize() == (4 * 2) ** 2
    X = sw.getField("DMSwarmPIC_coor")
    assert X.min() > 0 and X.max() < 1


def test_deposit_conserves_total():
    """CIC deposition conserves the summed particle weight exactly."""
    da, sw = make_swarm(n=7, ppcell=3)
    w = sw.getField("w")
    rng = np.random.default_rng(0)
    w[:, 0] = rng.random(len(w))
    sw.restoreField("w", w)
    rho = sw.depositSum("w")
    assert np.isclose(float(np.sum(np.asarray(rho.getArray())[: 7 * 7])),
                      w[:, 0].sum(), atol=1e-12)


def test_interpolate_linear_exact():
    """CIC interpolation reproduces a multilinear nodal field exactly."""
    da, sw = make_swarm(n=6, ppcell=2)
    xs = np.linspace(0, 1, 6)
    nodal = (2.0 * xs[None, :] + 3.0 * xs[:, None] + 1.0).reshape(-1)
    out = sw.interpolateToParticles(pt.Vec.from_array(nodal))
    X = sw.getField("DMSwarmPIC_coor")
    # node_id uses (i0 * ny + j) with coor axis0 = x: exact linear field
    exact = 2.0 * X[:, 1] + 3.0 * X[:, 0] + 1.0
    assert np.allclose(out, exact, atol=1e-12), np.abs(out - exact).max()


def test_project_constant_field():
    """Projecting a constant particle field gives that constant on all
    touched nodes (weighted average semantics)."""
    da, sw = make_swarm(n=5, ppcell=2)
    w = sw.getField("w")
    w[:] = 3.5
    sw.restoreField("w", w)
    v = sw.projectFields("w")
    arr = np.asarray(v.getArray())[: 5 * 5]
    touched = arr != 0
    assert touched.sum() > 0
    assert np.allclose(arr[touched], 3.5)


def test_migrate_sorts_by_cell():
    da, sw = make_swarm(n=5, ppcell=2)
    rng = np.random.default_rng(1)
    # shuffle particles, then migrate re-sorts by owning cell
    perm = rng.permutation(sw.getLocalSize())
    X = sw.getField("DMSwarmPIC_coor")
    sw.restoreField("DMSwarmPIC_coor", X[perm])
    sw.migrate()
    cid = sw.binToCells()
    assert np.all(np.diff(cid) >= 0)


def test_add_remove_points():
    da, sw = make_swarm(n=5, ppcell=1)
    n0 = sw.getLocalSize()
    sw.addNPoints(np.array([[0.5, 0.5], [0.1, 0.9]]))
    assert sw.getLocalSize() == n0 + 2
    mask = np.zeros(sw.getLocalSize(), dtype=bool)
    mask[0] = True
    sw.removePoints(mask)
    assert sw.getLocalSize() == n0 + 1


def test_swarm_1d_and_3d():
    """Binning/deposition generalize across dimensions."""
    for dim, n in ((1, 9), (3, 4)):
        da = pt.DMDA.create(dim=dim, sizes=(n,) * dim)
        sw = pt.DMSwarm.create()
        sw.setType("pic")
        sw.setCellDM(da)
        sw.registerField("w", 1)
        sw.insertPointsUsingCellDM(ppcell=2)
        assert sw.getLocalSize() == (2 * (n - 1)) ** dim
        w = sw.getField("w")
        w[:] = 1.0
        sw.restoreField("w", w)
        rho = sw.depositSum("w")
        total = float(np.sum(np.asarray(rho.getArray())[: n ** dim]))
        assert np.isclose(total, sw.getLocalSize(), atol=1e-10)
        cid = sw.binToCells()
        assert cid.min() >= 0 and cid.max() < (n - 1) ** dim
