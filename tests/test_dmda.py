"""DMDA structured-grid tests (reference model: src/dm/impls/da tests and
src/ksp/ksp/tutorials/ex45.c geometric-MG solves)."""

import numpy as np
import jax.numpy as jnp
import pytest

import petsc_tpu as pt


def test_da_basic():
    da = pt.DMDA.create(2, (9, 5), dof=2)
    assert da.N == 90
    v = da.createGlobalVector()
    arr = da.getVecArray(v)
    assert arr.shape == (5, 9, 2)
    arr[2, 3, 1] = 7.0
    da.setVecArray(v, arr)
    flat = np.asarray(v.getArray())
    assert flat[da.dof_index(3, 2, c=1)] == 7.0


def test_da_coarsen_refine():
    da = pt.DMDA.create(3, (9, 9, 9))
    dac = da.coarsen()
    assert dac.sizes == (5, 5, 5)
    assert dac.refine().sizes == (9, 9, 9)


def test_da_interpolation_partition_of_unity():
    da = pt.DMDA.create(2, (9, 9))
    dac = da.coarsen()
    P = da.createInterpolation(dac)
    ones = pt.Vec.from_array(np.ones(dac.N))
    y = P.createVecLeft()
    P.mult(ones, y)
    assert np.allclose(np.asarray(y.getArray()), 1.0)


def test_ex45_mg():
    from examples import ex45
    ksp = ex45.main(["-da_grid_x", "17", "-da_grid_y", "17", "-da_grid_z",
                     "17", "-ksp_type", "cg", "-pc_type", "mg",
                     "-ksp_rtol", "1e-8"])
    assert ksp.getConvergedReason().converged
    assert ksp.getIterationNumber() <= 15
    # solution solves the system
    x = ksp.getSolution()
    r = ksp.mat.createVecLeft()
    ksp.mat.mult(x, r)
    b = ksp.getDM().createGlobalVector()
    ex45.compute_rhs(ksp, b)
    r.axpy(-1.0, b)
    assert float(r.norm()) < 1e-8 * max(float(b.norm()), 1)


def test_ex45_gamg():
    from examples import ex45
    ksp = ex45.main(["-da_grid_x", "17", "-da_grid_y", "17", "-da_grid_z",
                     "17", "-ksp_type", "cg", "-pc_type", "gamg",
                     "-ksp_rtol", "1e-8"])
    assert ksp.getConvergedReason().converged
    assert ksp.getIterationNumber() <= 20


def test_interp_dof2():
    """Q1 interpolation with dof=2 interpolates each component (the
    dainterp.c dof-block path)."""
    dac = pt.DMDA.create(dim=2, sizes=(5, 5), dof=2)
    daf = pt.DMDA.create(dim=2, sizes=(9, 9), dof=2)
    P = daf.createInterpolation(dac)
    from petsc_tpu.ops import operator
    op = operator.bind(P.meta, P.device_data())
    xc = np.random.default_rng(1).random(5 * 5 * 2)
    yf = np.asarray(op.mult(jnp.asarray(xc)))
    Pm = P.to_scipy()
    assert Pm.shape == (9 * 9 * 2, 5 * 5 * 2)
    assert np.allclose(yf, Pm @ xc, atol=1e-12)
    # adjoint consistency
    r = np.random.default_rng(2).random(9 * 9 * 2)
    assert np.allclose(np.asarray(op.mult_t(jnp.asarray(r))), Pm.T @ r,
                       atol=1e-12)
