"""TS integrator tests (reference model: src/ts/tutorials/ex3/ex4-style
linear/stiff problems with known solutions)."""

import numpy as np
import pytest
import jax.numpy as jnp

import petsc_tpu as pt


def decay_rhs(t, u):
    return -u


def run_decay(ts_type, dt=0.01, T=1.0, adapt="none", **setup):
    ts = pt.TS().create()
    ts.setType(ts_type)
    ts.setRHSFunction(decay_rhs)
    ts.setTimeStep(dt)
    ts.setMaxTime(T)
    ts.adapt.kind = adapt
    for k, v in setup.items():
        getattr(ts, k)(v)
    u = pt.Vec.from_array(np.array([1.0, 2.0]))
    ts.solve(u)
    return ts, np.asarray(u.getArray())


@pytest.mark.parametrize("ts_type,tol", [
    ("euler", 5e-3), ("ssp", 1e-6), ("rk", 1e-7),
    ("beuler", 6e-3), ("cn", 1e-5), ("theta", 1e-5),
    ("bdf", 1e-3), ("rosw", 1e-6),
])
def test_decay(ts_type, tol):
    ts, u = run_decay(ts_type)
    exact = np.array([1.0, 2.0]) * np.exp(-1.0)
    assert ts.getConvergedReason().converged
    assert abs(ts.getTime() - 1.0) < 1e-12
    assert np.allclose(u, exact, atol=tol), (u, exact)


def test_rk_adaptive():
    ts, u = run_decay("rk", dt=0.5, adapt="basic", setRKType="5dp")
    exact = np.array([1.0, 2.0]) * np.exp(-1.0)
    assert ts.getConvergedReason().converged
    assert np.allclose(u, exact, atol=1e-4)
    assert ts.getStepNumber() < 30


def test_rk_3bs_adapt_stiffish():
    """Adaptive 3bs on a mildly stiff linear system."""
    A = np.array([[-2.0, 1.0], [1.0, -20.0]])

    def rhs(t, u):
        return jnp.asarray(A) @ u

    ts = pt.TS().create()
    ts.setType("rk")
    ts.setRHSFunction(rhs)
    ts.setTimeStep(0.1)
    ts.setMaxTime(1.0)
    ts.adapt.kind = "basic"
    u = pt.Vec.from_array(np.array([1.0, 1.0]))
    ts.solve(u)
    import scipy.linalg as sla
    exact = sla.expm(A) @ np.array([1.0, 1.0])
    assert np.allclose(np.asarray(u.getArray()), exact, atol=1e-3)


def test_arkimex_split():
    """IMEX: stiff linear implicit + nonstiff explicit, vs expm."""
    lam_stiff, lam_soft = -50.0, -1.0

    def fe(t, u):
        return lam_soft * u

    def fi(t, u, udot):
        return udot - lam_stiff * u

    ts = pt.TS().create()
    ts.setType("arkimex")
    ts.setRHSFunction(fe)
    ts.setIFunction(fi)
    ts.setTimeStep(0.02)
    ts.setMaxTime(0.5)
    ts.adapt.kind = "none"
    u = pt.Vec.from_array(np.array([1.0]))
    ts.solve(u)
    exact = np.exp((lam_stiff + lam_soft) * 0.5)
    assert ts.getConvergedReason().converged
    assert np.allclose(np.asarray(u.getArray()), exact, rtol=2e-2)


def test_beuler_stiff_stable():
    """Backward Euler is stable at dt far beyond the explicit limit."""
    def rhs(t, u):
        return -1000.0 * u

    ts = pt.TS().create()
    ts.setType("beuler")
    ts.setRHSFunction(rhs)
    ts.setTimeStep(0.1)       # explicit limit would be 0.002
    ts.setMaxTime(1.0)
    ts.adapt.kind = "none"
    u = pt.Vec.from_array(np.array([1.0]))
    ts.solve(u)
    assert ts.getConvergedReason().converged
    assert abs(float(u.getArray()[0])) < 1e-8


def test_convergence_order_cn():
    """CN converges at 2nd order on the decay problem."""
    errs = []
    for dt in (0.1, 0.05):
        _, u = run_decay("cn", dt=dt)
        errs.append(abs(u[0] - np.exp(-1.0)))
    rate = np.log2(errs[0] / errs[1])
    assert 1.7 < rate < 2.3, (errs, rate)


def test_solve_compiled_matches_host_loop():
    """lax.scan compiled loop == host-driven loop for fixed-step rk."""
    def rhs(t, u):
        return -u + 0.1 * jnp.sin(t)

    ts1 = pt.TS().create()
    ts1.setType("rk")
    ts1.setRHSFunction(rhs)
    ts1.setTimeStep(0.01)
    ts1.setMaxTime(1.0)
    ts1.adapt.kind = "none"
    u1 = pt.Vec.from_array(np.array([1.0, 2.0]))
    ts1.solve(u1)

    ts2 = pt.TS().create()
    ts2.setType("rk")
    ts2.setRHSFunction(rhs)
    ts2.setTimeStep(0.01)
    ts2.setMaxTime(1.0)
    u2 = pt.Vec.from_array(np.array([1.0, 2.0]))
    ts2.solveCompiled(u2)
    assert abs(ts2.getTime() - 1.0) < 1e-9
    assert np.allclose(np.asarray(u1.getArray()),
                       np.asarray(u2.getArray()), atol=1e-12)


def test_solve_compiled_differentiable():
    import jax

    ts = pt.TS().create()
    ts.setType("euler")
    ts.setRHSFunction(lambda t, u: -u)
    ts.setTimeStep(0.01)
    ts.setMaxTime(1.0)

    def final(u0):
        uf, _ = ts.solveCompiled(u0, nsteps=100, dt=0.01)
        return uf[0]

    g = jax.grad(final)(jnp.array([2.0]))
    # d u_T / d u_0 = (1 - dt)^100
    assert abs(float(g[0]) - (1 - 0.01) ** 100) < 1e-10


def test_compiled_stage_solves():
    """Implicit stepping with fully-jitted JFNK stage solves matches the
    host-driven SNES path."""
    results = []
    for compiled in (False, True):
        ts = pt.TS().create()
        ts.setType("beuler")
        ts.setRHSFunction(lambda t, u: -u ** 3 - u + 1.0)
        ts.setTimeStep(0.05)
        ts.setMaxTime(0.5)
        ts.adapt.kind = "none"
        ts.use_compiled_snes = compiled
        u = pt.Vec.from_array(np.array([0.0, 2.0]))
        ts.solve(u)
        assert ts.getConvergedReason().converged
        results.append(np.asarray(u.getArray()))
    assert np.allclose(results[0], results[1], atol=1e-8)


def test_exact_final_interpolate():
    """TS_EXACTFINALTIME_INTERPOLATE: fixed dt that doesn't divide T —
    step past and linearly interpolate back (ts.c exact-final modes)."""
    ts = pt.TS().create()
    ts.setType("rk")
    ts.setRHSFunction(decay_rhs)
    ts.setTimeStep(0.03)          # 0.99 then overshoot to 1.02
    ts.setMaxTime(1.0)
    ts.adapt.kind = "none"
    ts.setExactFinalTime("interpolate")
    u = pt.Vec.from_array(np.array([1.0]))
    ts.solve(u)
    assert abs(ts.getTime() - 1.0) < 1e-12
    # linear interpolation error ~ O(dt^2) on top of RK accuracy
    assert abs(float(u.getArray()[0]) - np.exp(-1.0)) < 1e-4
