"""basicsymplectic / pseudo / alpha TS tests."""

import numpy as np
import pytest
import jax.numpy as jnp

import petsc_tpu as pt


@pytest.mark.parametrize("order,drift", [(1, 2e-2), (2, 1e-3), (4, 1e-6)])
def test_symplectic_harmonic_energy(order, drift):
    """Harmonic oscillator: H = p^2/2 + q^2/2; energy drift bounded."""
    ts = pt.TS().create()
    ts.setType("basicsymplectic")
    ts.symplectic_order = order
    ts.setHamiltonianSplit(lambda t, p: p, lambda t, q: -q)
    ts.setTimeStep(0.05)
    ts.setMaxTime(20.0)
    ts.adapt.kind = "none"
    u = pt.Vec.from_array(np.array([1.0, 0.0]))
    ts.solve(u)
    q, p = np.asarray(u.getArray())
    E = 0.5 * (q * q + p * p)
    assert abs(E - 0.5) < drift, E
    # phase accuracy at least first order
    assert abs(q - np.cos(ts.getTime())) < 0.3


def test_pseudo_steady_state():
    """PTC drives du/dt = -(u^3 + u - 2) to the root u=1."""
    def rhs(t, u):
        return -(u ** 3 + u - 2.0)

    ts = pt.TS().create()
    ts.setType("pseudo")
    ts.setRHSFunction(rhs)
    ts.setTimeStep(0.05)
    ts.setMaxTime(1e12)
    ts.setMaxSteps(200)
    ts.pseudo_fatol = 1e-10
    ts.adapt.kind = "none"
    u = pt.Vec.from_array(np.array([5.0, -3.0]))
    ts.solve(u)
    assert np.allclose(np.asarray(u.getArray()), 1.0, atol=1e-6)
    assert ts.getStepNumber() < 100  # SER accelerates


def test_alpha_decay_order2():
    errs = []
    for dt in (0.1, 0.05):
        ts = pt.TS().create()
        ts.setType("alpha")
        ts.setRHSFunction(lambda t, u: -u)
        ts.setTimeStep(dt)
        ts.setMaxTime(1.0)
        ts.adapt.kind = "none"
        u = pt.Vec.from_array(np.array([1.0]))
        ts.solve(u)
        errs.append(abs(float(u.getArray()[0]) - np.exp(-1.0)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 1.5, (errs, rate)


def test_heat_equation_dmda():
    """2-D heat equation: CN decay matches analytic within FD error."""
    from examples import heat
    ts, ratio, exact = heat.main(["-ts_type", "cn", "-ts_dt", "0.002",
                                  "-ts_max_time", "0.02"])
    assert ts.getConvergedReason().converged
    assert abs(ratio - exact) / exact < 5e-3


def test_heat_equation_explicit_vs_implicit():
    from examples import heat
    _, r1, e = heat.main(["-ts_type", "rk", "-ts_dt", "0.0002",
                          "-ts_max_time", "0.01"])
    _, r2, _ = heat.main(["-ts_type", "beuler", "-ts_dt", "0.0005",
                          "-ts_max_time", "0.01"])
    assert abs(r1 - r2) < 2e-2


def test_irk_gauss_order4():
    errs = []
    for dt in (0.1, 0.05):
        ts = pt.TS().create()
        ts.setType("irk")
        ts.setRHSFunction(lambda t, u: -u)
        ts.setTimeStep(dt)
        ts.setMaxTime(1.0)
        ts.adapt.kind = "none"
        u = pt.Vec.from_array(np.array([1.0]))
        ts.solve(u)
        errs.append(abs(float(u.getArray()[0]) - np.exp(-1.0)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 3.5, (errs, rate)


def test_irk_stiff_stable():
    """Gauss(2) is A-stable (not L-stable): the step amplification must
    match its stability function R(z) exactly — no blowup at z = -50."""
    lam, dt = -500.0, 0.1
    ts = pt.TS().create()
    ts.setType("irk")
    ts.setRHSFunction(lambda t, u: lam * u)
    ts.setTimeStep(dt)
    ts.setMaxTime(1.0)
    ts.adapt.kind = "none"
    u = pt.Vec.from_array(np.array([1.0]))
    ts.solve(u)
    z = lam * dt
    R = (1 + z / 2 + z * z / 12) / (1 - z / 2 + z * z / 12)
    assert abs(float(u.getArray()[0]) - R ** 10) < 1e-6


import jax.numpy as jnp


@pytest.mark.parametrize("gt,tol", [
    ("23", 1e-3), ("24", 1e-3), ("exrk2a", 1e-3), ("rk32g1", 1e-5),
])
def test_glee_decay(gt, tol):
    """GLEE methods (glee.c) integrate decay at their design order; the
    carried second item estimates the GLOBAL error."""
    ts = pt.TS().create()
    ts.setType("glee")
    ts.glee_type = gt
    ts.setRHSFunction(lambda t, u: -u)
    ts.setTimeStep(0.05)
    ts.setMaxTime(1.0)
    ts.adapt.kind = "none"
    u = pt.Vec.from_array(np.array([1.0, 2.0]))
    ts.solve(u)
    assert ts.getConvergedReason().converged
    exact = np.array([1.0, 2.0]) * np.exp(-1.0)
    assert np.allclose(np.asarray(u.getArray()), exact, atol=tol), gt


def test_glee_global_error_tracks_true_error():
    """The GLEE error item approximates the actual global error."""
    ts = pt.TS().create()
    ts.setType("glee")
    ts.glee_type = "23"
    ts.setRHSFunction(lambda t, u: -u)
    ts.setTimeStep(0.05)
    ts.setMaxTime(1.0)
    ts.adapt.kind = "none"
    u = pt.Vec.from_array(np.array([1.0]))
    ts.solve(u)
    Y = ts._glee_prop[1] if ts._glee_prop is not None else ts._glee_Y
    est = abs(float(Y[1][0]))          # y-eps form: item 1 IS the error
    true = abs(float(u.getArray()[0]) - np.exp(-1.0))
    assert est > 0 and 0.1 * true < est < 10 * true


def test_eimex_explicit_order():
    """EIMEX with nrows rows is order ~nrows (pure explicit part)."""
    errs = []
    for dtv in (0.1, 0.05):
        ts = pt.TS().create()
        ts.setType("eimex")
        ts.eimex_max_rows = 3
        ts.setRHSFunction(lambda t, u: -u)
        ts.setTimeStep(dtv)
        ts.setMaxTime(1.0)
        ts.adapt.kind = "none"
        u = pt.Vec.from_array(np.array([1.0]))
        ts.solve(u)
        errs.append(abs(float(u.getArray()[0]) - np.exp(-1.0)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 2.5, (errs, rate)


def test_eimex_imex_stiff():
    """EIMEX partitioned: stiff implicit + nonstiff explicit vs exact."""
    lam_stiff, lam_soft = -50.0, -1.0
    ts = pt.TS().create()
    ts.setType("eimex")
    ts.eimex_max_rows = 2
    ts.setRHSFunction(lambda t, u: lam_soft * u)
    ts.setIFunction(lambda t, u, udot: udot - lam_stiff * u)
    ts.setTimeStep(0.05)
    ts.setMaxTime(0.5)
    ts.adapt.kind = "none"
    u = pt.Vec.from_array(np.array([1.0]))
    ts.solve(u)
    exact = np.exp((lam_stiff + lam_soft) * 0.5)
    assert ts.getConvergedReason().converged
    assert abs(float(u.getArray()[0]) - exact) < 5e-3


def test_mprk_multirate_order2():
    """MPRK (multirate partitioned RK, mprk.c): slow/fast additive split
    converges at 2nd order and matches expm."""
    errs = []
    for dtv in (0.1, 0.05):
        ts = pt.TS().create()
        ts.setType("mprk")
        ts.mprk_ratio = 2
        ts.setRHSSplit("slow", lambda t, u: -0.1 * u)
        ts.setRHSSplit("fast", lambda t, u: -3.0 * u)
        ts.setTimeStep(dtv)
        ts.setMaxTime(1.0)
        ts.adapt.kind = "none"
        u = pt.Vec.from_array(np.array([1.0]))
        ts.solve(u)
        errs.append(abs(float(u.getArray()[0]) - np.exp(-3.1)))
    rate = np.log2(errs[0] / errs[1])
    assert 1.7 < rate < 2.4, (errs, rate)


def test_mprk_with_is_partition():
    """Component-partitioned multirate: fast IS covers the stiff block."""
    A = np.diag([-0.2, -8.0])

    def full(t, u):
        return jnp.asarray(A) @ u

    ts = pt.TS().create()
    ts.setType("mprk")
    ts.mprk_ratio = 4
    ts.setRHSSplit("slow", full, iset=[0])
    ts.setRHSSplit("fast", full, iset=[1])
    ts.setTimeStep(0.05)
    ts.setMaxTime(1.0)
    ts.adapt.kind = "none"
    u = pt.Vec.from_array(np.array([1.0, 1.0]))
    ts.solve(u)
    exact = np.exp(np.diag(A))
    assert np.allclose(np.asarray(u.getArray()), exact, atol=2e-3)


def test_adapt_dsp_controller():
    """DSP (Soderlind H211PI) adaptor integrates decay accurately with
    smooth step-size evolution (adapt/impls/dsp)."""
    ts = pt.TS().create()
    ts.setType("rk")
    ts.setRHSFunction(lambda t, u: -u)
    ts.setTimeStep(0.2)
    ts.setMaxTime(1.0)
    ts.adapt.kind = "dsp"
    ts.adapt.rtol = ts.adapt.atol = 1e-6
    u = pt.Vec.from_array(np.array([1.0]))
    ts.solve(u)
    assert ts.getConvergedReason().converged
    assert abs(float(u.getArray()[0]) - np.exp(-1.0)) < 1e-5


def test_adapt_history_replay():
    """History adaptor replays a prescribed dt sequence exactly."""
    seq = [0.1, 0.2, 0.3, 0.4]
    ts = pt.TS().create()
    ts.setType("rk")
    ts.setRHSFunction(lambda t, u: -u)
    ts.setTimeStep(seq[0])
    ts.setMaxTime(1.0)
    ts.adapt.setHistory(seq)
    u = pt.Vec.from_array(np.array([1.0]))
    ts.solve(u)
    assert abs(ts.getTime() - 1.0) < 1e-12
    assert ts.getStepNumber() == 4


def test_mimex_stiff():
    ts = pt.TS().create()
    ts.setType("mimex")
    ts.setRHSFunction(lambda t, u: -u)
    ts.setIFunction(lambda t, u, udot: udot + 40.0 * u)
    ts.setTimeStep(0.05)
    ts.setMaxTime(0.5)
    ts.adapt.kind = "none"
    u = pt.Vec.from_array(np.array([1.0]))
    ts.solve(u)
    assert ts.getConvergedReason().converged
    exact = np.exp(-41.0 * 0.5)
    # backward-Euler accuracy at this dt
    assert abs(float(u.getArray()[0]) - exact) < 5e-2


def test_alpha2_oscillator():
    """Generalized-alpha2 (Chung-Hulbert) on u'' + w^2 u = 0: 2nd-order
    accurate, stable, and (rho=1, no numerical damping) amplitude
    preserved."""
    w = 2.0 * np.pi
    errs = []
    for dtv in (0.01, 0.005):
        ts = pt.TS().create()
        ts.setType("alpha2")
        ts.alpha_radius = 1.0       # no dissipation
        ts.setI2Function(lambda t, u, v, a: a + w * w * u)
        ts.setTimeStep(dtv)
        ts.setMaxTime(1.0)
        ts.adapt.kind = "none"
        ts.alpha2_v0 = np.zeros(1)
        u = pt.Vec.from_array(np.array([1.0]))
        ts.solve(u)
        assert ts.getConvergedReason().converged
        errs.append(abs(float(u.getArray()[0]) - np.cos(w * 1.0)))
    rate = np.log2(errs[0] / errs[1])
    # at rho=1 (midpoint Newmark) the linear oscillator superconverges
    assert rate > 1.7, (errs, rate)
    assert errs[1] < 1e-5


@pytest.mark.parametrize("sspt,order", [("rks2", 2), ("rks3", 3),
                                        ("rk104", 4)])
def test_ssp_variants_order(sspt, order):
    """SSP types converge at design order on the decay problem."""
    errs = []
    for dtv in (0.1, 0.05):
        ts = pt.TS().create()
        ts.setType("ssp")
        ts.ssp_type = sspt
        ts.setRHSFunction(lambda t, u: -u)
        ts.setTimeStep(dtv)
        ts.setMaxTime(1.0)
        ts.adapt.kind = "none"
        u = pt.Vec.from_array(np.array([1.0]))
        ts.solve(u)
        errs.append(abs(float(u.getArray()[0]) - np.exp(-1.0)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > order - 0.5, (sspt, errs, rate)


def test_radau5_order_and_lstability():
    """Radau IIA(3): 5th order on decay, and L-stable (strong damping of
    a very stiff mode at large dt)."""
    errs = []
    for dtv in (0.2, 0.1):
        ts = pt.TS().create()
        ts.setType("radau5")
        ts.setRHSFunction(lambda t, u: -u)
        ts.setTimeStep(dtv)
        ts.setMaxTime(1.0)
        ts.adapt.kind = "none"
        u = pt.Vec.from_array(np.array([1.0]))
        ts.solve(u)
        errs.append(abs(float(u.getArray()[0]) - np.exp(-1.0)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 4.0, (errs, rate)
    # L-stability: one huge-dt step on a stiff mode decays hard
    ts = pt.TS().create()
    ts.setType("radau5")
    ts.setRHSFunction(lambda t, u: -1e4 * u)
    ts.setTimeStep(1.0)
    ts.setMaxTime(1.0)
    ts.adapt.kind = "none"
    u = pt.Vec.from_array(np.array([1.0]))
    ts.solve(u)
    assert abs(float(u.getArray()[0])) < 1e-3
