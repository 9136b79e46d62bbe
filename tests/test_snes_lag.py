"""SNES Jacobian/preconditioner lagging (-snes_lag_jacobian /
-snes_lag_preconditioner; snes.c SNESComputeJacobian lag semantics)."""
import numpy as np
import jax.numpy as jnp

import petsc_tpu as pt


def _bratu_1d(n=64, lam=3.0):
    h = 1.0 / (n - 1)

    def residual(u):
        f = jnp.zeros_like(u)
        lap = (2 * u[1:-1] - u[:-2] - u[2:]) / h**2
        f = f.at[1:-1].set(lap - lam * jnp.exp(u[1:-1]))
        f = f.at[0].set(u[0])
        f = f.at[-1].set(u[-1])
        return f
    return residual


def _run(n, opts):
    for k, v in opts.items():
        pt.options().set_value(k, v)
    try:
        snes = pt.SNES().create()
        snes.setFunction(_bratu_1d(n))
        snes.setTolerances(rtol=1e-10, max_it=50)
        x = pt.Vec.from_array(np.zeros(n))
        calls = {"n": 0}
        orig = snes._compute_jacobian_now

        def counted(x_np):
            calls["n"] += 1
            return orig(x_np)
        snes._compute_jacobian_now = counted
        snes.solve(None, x)
        assert snes.getConvergedReason().converged
        return snes.getIterationNumber(), calls["n"], x
    finally:
        for k in opts:
            pt.options().delete_value(k)


def test_lag_jacobian_freeze_still_converges():
    its0, builds0, x0 = _run(64, {})
    assert builds0 == its0            # default: rebuild every iteration
    its2, builds2, x2 = _run(64, {"snes_lag_jacobian": "-2"})
    assert builds2 == 1               # frozen after the first build
    assert its2 >= its0               # chord method: more (linear) steps
    assert np.allclose(np.asarray(x0.getArray()),
                       np.asarray(x2.getArray()), atol=1e-8)


def test_lag_every_other():
    its, builds, _ = _run(64, {"snes_lag_jacobian": "2"})
    assert builds == (its + 1) // 2 + (1 if its % 2 == 0 else 0) or \
        builds <= its                 # every other call actually builds
    assert builds < its or its <= 2


def test_lag_preconditioner_frozen():
    """Fresh Jacobian every step, frozen P object: PCSetUp's state
    check then reuses the setup across Newton steps."""
    its, builds, x = _run(64, {"snes_lag_preconditioner": "-2"})
    assert builds == its              # J rebuilt every iteration
    # converges to the same solution
    _, _, x0 = _run(64, {})
    assert np.allclose(np.asarray(x.getArray()),
                       np.asarray(x0.getArray()), atol=1e-8)


def test_ts_setdm_sparse_stage_jacobians():
    """TSSetDM (ts.c): the stage SNES inherits the DM, so stage
    Jacobians assemble through the DMDA stencil coloring (sparse)
    rather than dense jacfwd."""
    import jax.numpy as jnp
    from examples.heat import make_rhs
    n = 17
    da = pt.DMDA.create(2, (n, n), dof=1, stencil_width=1)
    nx, _ = da.sizes
    hx = 1.0 / (nx - 1)
    ts = pt.TS().create().setType("cn")
    ts.setDM(da)
    ts.setRHSFunction(make_rhs(da))
    ts.setTimeStep(0.25 * hx * hx)
    ts.setMaxSteps(20)
    ts.setMaxTime(1e9)
    assert ts.getSNES().dm is da
    xy = da.node_coords()
    u0 = np.sin(np.pi * xy[:, 0] * hx) * np.sin(np.pi * xy[:, 1] * hx)
    u = pt.Vec.from_array(jnp.asarray(u0))
    ts.solve(u)
    tend = 20 * 0.25 * hx * hx
    uex = u0 * np.exp(-2 * np.pi ** 2 * tend)
    assert np.abs(np.asarray(u.getArray())[: len(u0)] - uex).max() < 2e-3
