"""FV tests: limiters, Riemann fluxes, TVD advection, Burgers shock."""

import numpy as np
import jax.numpy as jnp
import pytest

import petsc_tpu as pt
from petsc_tpu.dm.fv import FV, limiter, riemann_rusanov


def test_limiters_properties():
    r = jnp.linspace(-2, 4, 61)
    for name in ("minmod", "vanleer", "mc", "superbee"):
        phi = limiter(name)(r)
        assert float(phi.min()) >= 0.0          # positivity
        assert np.allclose(float(limiter(name)(jnp.asarray(1.0))), 1.0)
    assert np.allclose(np.asarray(limiter("none")(r)), 1.0)


def _advect(n=64, order=2, lim="minmod", T=1.0):
    da = pt.DMDA.create(dim=1, sizes=(n,), boundary_type="periodic")
    fv = FV(da, flux=lambda u: u, wavespeed=lambda u: jnp.ones_like(u),
            riemann="rusanov", limiter_type=lim, order=order)
    ts = pt.TS().create()
    ts.setType("ssp")
    ts.setRHSFunction(fv.makeRHS())
    ts.setTimeStep(0.4 / n)
    ts.setMaxTime(T)
    ts.adapt.kind = "none"
    x = (np.arange(n) + 0.5) / n
    u0 = np.where((x > 0.25) & (x < 0.5), 1.0, 0.0)   # square wave
    u = pt.Vec.from_array(u0.astype(float))
    ts.solve(u)
    return u0, np.asarray(u.getArray())[:n]


def test_advection_tvd_no_overshoot():
    """MUSCL+minmod advection of a square wave over one period: no new
    extrema (TVD) and profile returns close to the start."""
    u0, uT = _advect()
    assert uT.min() >= -1e-10 and uT.max() <= 1.0 + 1e-10
    assert np.linalg.norm(uT - u0, 1) / len(u0) < 0.1


def test_second_order_beats_first():
    u0, u1 = _advect(order=1)
    _, u2 = _advect(order=2)
    e1 = np.linalg.norm(u1 - u0, 1)
    e2 = np.linalg.norm(u2 - u0, 1)
    assert e2 < 0.7 * e1


def test_burgers_shock_speed():
    """Burgers u_t + (u^2/2)_x = 0 with Riemann data (1, 0): the shock
    moves at speed 1/2 (Rankine-Hugoniot)."""
    n = 128
    da = pt.DMDA.create(dim=1, sizes=(n,), boundary_type="periodic")
    fv = FV(da, flux=lambda u: 0.5 * u * u, wavespeed=lambda u: u,
            limiter_type="minmod")
    ts = pt.TS().create()
    ts.setType("ssp")
    ts.setRHSFunction(fv.makeRHS())
    ts.setTimeStep(0.2 / n)
    ts.setMaxTime(0.25)
    ts.adapt.kind = "none"
    x = (np.arange(n) + 0.5) / n
    u0 = np.where((x > 0.1) & (x < 0.4), 1.0, 0.0)
    u = pt.Vec.from_array(u0.astype(float))
    ts.solve(u)
    uT = np.asarray(u.getArray())[:n]
    # right shock started at x=0.4, speed 0.5 -> at 0.525 after t=0.25
    shock = x[np.argmax(np.abs(np.diff(uT)))]
    assert abs(shock - 0.525) < 0.03, shock
