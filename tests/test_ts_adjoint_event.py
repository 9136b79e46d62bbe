"""TS trajectory/adjoint (TSAdjointSolve role via AD replay) and TSEvent
tests."""

import numpy as np
import jax.numpy as jnp

import petsc_tpu as pt


def test_adjoint_linear_decay():
    """du/dt = -a u => du_T/du_0 = exp(-a T); adjoint must match."""
    a = 1.3
    ts = pt.TS().create()
    ts.setType("rk")
    ts.setRHSFunction(lambda t, u: -a * u)
    ts.setTimeStep(0.01)
    ts.setMaxTime(1.0)
    ts.adapt.kind = "none"
    ts.setSaveTrajectory()
    u = pt.Vec.from_array(np.array([2.0]))
    u0 = np.array([2.0])
    ts.solve(u)
    lam = ts.adjointSolve(np.array([1.0]), u0)
    assert np.allclose(np.asarray(lam.getArray()), np.exp(-a), atol=1e-6)
    # forward sensitivity agrees
    S = ts.forwardSensitivities(u0, np.array([1.0]))
    assert np.allclose(S, np.exp(-a), atol=1e-6)


def test_adjoint_nonlinear():
    """Logistic u' = u(1-u): check adjoint vs finite differences."""
    def rhs(t, u):
        return u * (1.0 - u)

    def run(u0val):
        ts = pt.TS().create()
        ts.setType("rk")
        ts.setRHSFunction(rhs)
        ts.setTimeStep(0.02)
        ts.setMaxTime(1.0)
        ts.adapt.kind = "none"
        ts.setSaveTrajectory()
        u = pt.Vec.from_array(np.array([u0val]))
        ts.solve(u)
        return ts, float(u.getArray()[0])

    ts, uT = run(0.3)
    lam = float(ts.adjointSolve(np.array([1.0]),
                                np.array([0.3])).getArray()[0])
    eps = 1e-6
    _, up = run(0.3 + eps)
    _, um = run(0.3 - eps)
    fd = (up - um) / (2 * eps)
    assert abs(lam - fd) < 1e-5, (lam, fd)


def test_event_detection():
    """Falling ball: z'' = -g; event at z=0 stops the solve (the classic
    ex40-style bouncing-ball event test)."""
    g = 9.8
    z0, v0 = 10.0, 0.0

    def rhs(t, u):
        return jnp.array([u[1], -g])

    ts = pt.TS().create()
    ts.setType("rk")
    ts.setRHSFunction(rhs)
    ts.setTimeStep(0.05)
    ts.setMaxTime(10.0)
    ts.adapt.kind = "none"
    ts.setEventHandler(lambda ts_, t, u: u[0], terminate=True)
    u = pt.Vec.from_array(np.array([z0, v0]))
    ts.solve(u)
    t_hit = np.sqrt(2 * z0 / g)
    assert ts.getConvergedReason() == pt.TSConvergedReason.CONVERGED_EVENT
    assert abs(ts.getTime() - t_hit) < 1e-4
    assert abs(float(u.getArray()[0])) < 1e-6


def test_event_postevent_bounce():
    """Reflecting postevent continues the integration."""
    g = 9.8

    def rhs(t, u):
        return jnp.array([u[1], -g])

    def post(ts_, t, u):
        u = np.asarray(u).copy()
        u[1] = -0.5 * u[1]     # inelastic bounce
        u[0] = 1e-9
        return u

    ts = pt.TS().create()
    ts.setType("rk")
    ts.setRHSFunction(rhs)
    ts.setTimeStep(0.05)
    ts.setMaxTime(3.0)
    ts.adapt.kind = "none"
    ts.setEventHandler(lambda ts_, t, u: u[0], postevent=post)
    u = pt.Vec.from_array(np.array([5.0, 0.0]))
    ts.solve(u)
    assert ts.getConvergedReason().converged
    assert float(u.getArray()[0]) > -1e-6


def test_trajectory_singlefile_roundtrip(tmp_path):
    """TSTrajectory singlefile: save the step schedule, reload in a fresh
    TS, and the AD replay reproduces the forward solution."""
    import jax.numpy as jnp
    p = str(tmp_path / "traj.npz")
    ts = pt.TS().create()
    ts.setType("rk")
    ts.setRHSFunction(lambda t, u: -u)
    ts.setTimeStep(0.02)
    ts.setMaxTime(0.5)
    ts.adapt.kind = "none"
    ts.setSaveTrajectory()
    u = pt.Vec.from_array(np.array([1.0, 2.0]))
    ts.solve(u)
    uf = np.asarray(u.getArray())[:2]
    ts.trajectorySave(p)

    ts2 = pt.TS().create()
    ts2.setType("rk")
    ts2.setRHSFunction(lambda t, u: -u)
    ts2.trajectoryLoad(p)
    ur = np.asarray(ts2.replay(jnp.asarray(np.array([1.0, 2.0]))))
    assert np.allclose(ur[:2], uf, atol=1e-12)
