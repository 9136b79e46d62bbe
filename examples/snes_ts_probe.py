"""Chip artifact for the nonlinear/TS layer (r4 VERDICT item 8): run the
ex5 Bratu Newton solve (reference src/snes/tutorials/ex5.c) and a TS
heat step sequence on the accelerator, and emit one JSON line per block
with iterations / function norms / wall-clock.

Run on chip:  python examples/snes_ts_probe.py -n 257 [-par 6.0]
"""

import json
import sys
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import petsc_tpu as pt


def bratu_block(n, lam=6.0, pc_type="gamg"):
    """Newton-LS Bratu at n x n (ex5.c): GAMG inner linear solves on the
    DMDA stencil operator; history = the SNES function norms."""
    import jax
    from examples.ex5 import make_jacobian, make_residual
    out = {"artifact": "snes_bratu_ex5", "n": n, "par": lam,
           "inner_pc": pc_type}
    da = pt.DMDA.create(2, (n, n), dof=1, stencil_width=1)
    nx, ny = da.sizes
    snes = pt.SNES().create()
    snes.setDM(da)
    snes.setFunction(make_residual(da, lam))
    J = da.createMatrix()
    snes.setJacobian(make_jacobian(da, lam), J=J)
    ksp = snes.getKSP()
    ksp.setType("cg")
    ksp.getPC().setType(pc_type)
    ksp.setTolerances(rtol=1e-5, max_it=200)
    x = da.createGlobalVector()
    lamf = lam / (lam + 1.0)
    xy = da.node_coords()
    xi, yi = xy[:, 0], xy[:, 1]
    hx = 1.0 / (nx - 1)
    g = lamf * np.sqrt(np.minimum(np.minimum(xi, nx - 1 - xi) * hx,
                                  np.minimum(yi, ny - 1 - yi) * hx))
    g[(xi == 0) | (xi == nx - 1) | (yi == 0) | (yi == ny - 1)] = 0.0
    t0 = time.perf_counter()
    x.setArray(g)
    snes.solve(None, x)
    out["wall_s"] = round(time.perf_counter() - t0, 2)
    out["newton_its"] = snes.getIterationNumber()
    out["fnorm"] = float(snes.getFunctionNorm())
    hist = np.asarray(snes.getConvergenceHistory()) \
        if hasattr(snes, "getConvergenceHistory") else np.asarray(
            getattr(snes, "_history", []))
    out["fnorm_history"] = [float(h) for h in np.atleast_1d(hist)][:20]
    out["reason"] = int(snes.getConvergedReason())
    out["converged"] = bool(snes.getConvergedReason() > 0)
    # warm re-solve (compiled programs cached): the production number
    x2 = da.createGlobalVector()
    x2.setArray(g)
    t0 = time.perf_counter()
    snes.solve(None, x2)
    out["warm_wall_s"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(out), flush=True)
    return out


def ts_heat_block(n, nsteps=50, dt=None):
    """TS Crank-Nicolson heat steps at n x n vs the analytic decay of
    the fundamental mode (ex3.c role)."""
    import jax.numpy as jnp
    from examples.heat import make_rhs
    out = {"artifact": "ts_heat_cn", "n": n, "steps": nsteps}
    da = pt.DMDA.create(2, (n, n), dof=1, stencil_width=1)
    nx, ny = da.sizes
    hx = 1.0 / (nx - 1)
    dt = dt if dt is not None else 0.25 * hx * hx / 0.25
    ts = pt.TS().create()
    ts.setType("cn")
    ts.setRHSFunction(make_rhs(da))
    # fully-jitted JFNK stage solves: the assembled-Jacobian default
    # would jacfwd a DENSE (n^2) matrix per step with no DM pattern
    ts.use_compiled_snes = True
    ts.setTimeStep(dt)
    ts.setMaxSteps(nsteps)
    ts.setMaxTime(1e9)
    xy = da.node_coords()
    X = (xy[:, 0] * hx).reshape(-1)
    Y = (xy[:, 1] * hx).reshape(-1)
    u0 = np.sin(np.pi * X) * np.sin(np.pi * Y)
    u = pt.Vec.from_array(jnp.asarray(u0))
    t0 = time.perf_counter()
    ts.solve(u)
    out["wall_s"] = round(time.perf_counter() - t0, 2)
    tend = ts.getTime() if hasattr(ts, "getTime") else nsteps * dt
    uex = u0 * np.exp(-2 * np.pi ** 2 * float(tend))
    err = float(np.abs(np.asarray(u.getArray())[: len(u0)] - uex).max())
    out["t_end"] = float(tend)
    out["max_err_vs_analytic"] = err
    out["dt"] = dt
    print(json.dumps(out), flush=True)
    return out


def main(argv=None):
    pt.init(args=argv if argv is not None else sys.argv[1:])
    opts = pt.options()
    n = opts.get_int("n", default=257)
    lam = opts.get_real("par", default=6.0)
    b = bratu_block(n, lam)
    h = ts_heat_block(min(n, 129), nsteps=opts.get_int("ts_steps",
                                                       default=50))
    return b, h


if __name__ == "__main__":
    main()
