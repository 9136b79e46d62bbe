"""SNES tests (reference model: src/snes/tutorials/ex5.c Bratu, ex3.c, and
small algebraic systems; newtonls/tr/qn/anderson + jacobian modes)."""

import numpy as np
import pytest
import jax.numpy as jnp

import petsc_tpu as pt


def small_system():
    """x^2 + x*y = 3, x*y + y^2 = 6; solution (1, 2)."""
    def F(x):
        return jnp.array([x[0] ** 2 + x[0] * x[1] - 3.0,
                          x[0] * x[1] + x[1] ** 2 - 6.0])
    return F


def run_small(snes_type="newtonls", jac=None, **kw):
    snes = pt.SNES().create()
    snes.setType(snes_type)
    snes.setFunction(small_system())
    if jac == "fd":
        snes.setUseFD(True, coloring=False)
    elif jac == "mf":
        snes.setUseMF(True)
    x = pt.Vec.from_array(np.array([2.0, 3.0]))
    snes.solve(None, x)
    return snes, np.asarray(x.getArray())


@pytest.mark.parametrize("stype", ["newtonls", "newtontr"])
def test_small_system(stype):
    snes, x = run_small(stype)
    assert snes.getConvergedReason().converged, snes.getConvergedReason()
    assert np.allclose(x, [1.0, 2.0], atol=1e-5)


@pytest.mark.parametrize("stype", ["qn", "anderson"])
def test_gradient_system(stype):
    """Monotone (gradient-type) residual — the intended use of qn/anderson
    (impls/qn minimizes with F treated as a gradient)."""
    import scipy.sparse as sp
    n = 24
    T = sp.diags([2 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")

    def F(x):
        return jnp.asarray(T @ np.asarray(x)) + 0.5 * jnp.tanh(x) - 1.0

    snes = pt.SNES().create()
    snes.setType(stype)
    snes.setTolerances(rtol=1e-10, max_it=500)
    snes.setFunction(F)
    x = pt.Vec.from_array(np.zeros(n))
    snes.solve(None, x)
    assert snes.getConvergedReason().converged, snes.getConvergedReason()
    xs = np.asarray(x.getArray())
    assert np.linalg.norm(np.asarray(F(jnp.asarray(xs)))) < 1e-5


def test_nrichardson():
    """Nonlinear Richardson on a well-conditioned fixed-point problem."""
    def F(x):
        return x - jnp.cos(x)  # contraction; root ~0.739

    snes = pt.SNES().create()
    snes.setType("nrichardson")
    snes.setTolerances(rtol=1e-10, max_it=200)
    snes.setFunction(F)
    x = pt.Vec.from_array(np.zeros(6))
    snes.solve(None, x)
    assert snes.getConvergedReason().converged
    assert np.allclose(np.asarray(x.getArray()), 0.7390851332151607, atol=1e-6)


def test_small_system_fd():
    snes, x = run_small(jac="fd")
    assert snes.getConvergedReason().converged
    assert np.allclose(x, [1.0, 2.0], atol=1e-5)


def test_small_system_mf():
    snes, x = run_small(jac="mf")
    assert snes.getConvergedReason().converged
    assert np.allclose(x, [1.0, 2.0], atol=1e-5)


def test_bratu_ex5():
    from examples import ex5
    snes, x = ex5.main(["-da_grid_x", "17", "-da_grid_y", "17",
                        "-par", "6.0"])
    assert snes.getConvergedReason().converged
    # reference ex5 converges in 3-5 Newton its at this size
    assert snes.getIterationNumber() <= 6
    # residual small
    r = snes._func_np(np.asarray(x.getArray()))
    assert np.linalg.norm(r) < 1e-7


def test_bratu_ex5_jvp_gamg():
    """Matrix-free JVP Jacobian + assembled pmat via user callback, GAMG."""
    from examples import ex5
    import petsc_tpu as pt
    pt.init(args=["-snes_mf"])
    da = pt.DMDA.create(2, (17, 17))
    lam = 6.0
    snes = pt.SNES().create()
    snes.setFunction(ex5.make_residual(da, lam))
    snes.getKSP().setType("gmres")
    x = da.createGlobalVector()
    snes.setFromOptions()
    snes.solve(None, x)
    assert snes.getConvergedReason().converged


def test_fd_coloring():
    """FD-colored Jacobian against a known pattern (snesj2.c model)."""
    import scipy.sparse as sp
    n = 30
    main = 2 * np.ones(n)
    T = sp.diags([main, -np.ones(n - 1), -np.ones(n - 1)], [0, 1, -1],
                 format="csr")

    def F(x):
        return jnp.asarray(T @ np.asarray(x)) + 0.1 * jnp.asarray(x) ** 3 - 1.0

    snes = pt.SNES().create()
    snes.setFunction(F)
    pat = pt.MatAIJ.from_scipy(T)
    snes.setJacobian(J=None, P=pat)
    snes._jac_mode = "fd_color"
    x = pt.Vec.from_array(np.zeros(n))
    snes.solve(None, x)
    assert snes.getConvergedReason().converged
    xs = np.asarray(x.getArray())
    assert np.linalg.norm(np.asarray(F(jnp.asarray(xs)))) < 1e-6


def test_ew_forcing():
    from examples import ex5
    snes, x = ex5.main(["-da_grid_x", "17", "-da_grid_y", "17",
                        "-snes_ksp_ew"])
    assert snes.getConvergedReason().converged


def test_bratu_dm_fd_coloring():
    """SNES + DMDA with NO user Jacobian: stencil-pattern preallocation
    drives the colored FD Jacobian (snesj2.c + fdda.c workflow)."""
    from examples import ex5
    da = pt.DMDA.create(2, (17, 17), stencil_type="star")
    snes = pt.SNES().create()
    snes.setDM(da)
    snes.setFunction(ex5.make_residual(da, 6.0))
    snes.setUseFD(True, coloring=True)
    x = da.createGlobalVector()
    snes.solve(None, x)
    assert snes.getConvergedReason().converged
    assert snes.getIterationNumber() <= 8


def test_solve_compiled_jfnk():
    """One-XLA-program Newton-Krylov matches the host-driven solve."""
    snes = pt.SNES().create()
    snes.setFunction(small_system())
    snes.setTolerances(rtol=1e-10)
    x = pt.Vec.from_array(np.array([2.0, 3.0]))
    snes.solveCompiled(x)
    assert snes.getConvergedReason().converged
    assert np.allclose(np.asarray(x.getArray()), [1.0, 2.0], atol=1e-8)


def test_solve_compiled_bratu():
    from examples import ex5
    da = pt.DMDA.create(2, (17, 17))
    snes = pt.SNES().create()
    snes.setFunction(ex5.make_residual(da, 6.0))
    snes.setTolerances(rtol=1e-8)
    x = da.createGlobalVector()
    snes.solveCompiled(x)
    assert snes.getConvergedReason().converged
    r = snes._func_np(np.asarray(x.getArray()))
    assert np.linalg.norm(r) < 1e-6


@pytest.mark.parametrize("lstype", ["secant", "bisection", "nleqerr"])
def test_linesearch_variants(lstype):
    """secant/bisection/nleqerr line searches solve Bratu-like problems
    (linesearch impls parity)."""
    import jax.numpy as jnp
    snes = pt.SNES().create()
    snes.setType("newtonls")
    snes.linesearch.kind = lstype

    def F(x):
        return x ** 3 + 2.0 * x - 4.0 + 0.5 * jnp.roll(x, 1)

    snes.setFunction(F)
    x = pt.Vec.from_array(np.zeros(8))
    snes.solve(None, x)
    assert snes.getConvergedReason().converged, (lstype,
                                                 snes.getConvergedReason())
    r = np.asarray(F(jnp.asarray(np.asarray(x.getArray()))))
    assert np.linalg.norm(r[:8]) < 1e-6
