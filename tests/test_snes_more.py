"""FAS / VI / ncg / composite SNES tests."""

import numpy as np
import pytest
import jax.numpy as jnp

import petsc_tpu as pt


def test_vinewtonrsls_obstacle():
    """1-D obstacle problem: -u'' = -1 with u >= phi; classic VI test
    (src/snes/tutorials/ex9 model)."""
    n = 60
    h = 1.0 / (n + 1)
    xs = np.linspace(h, 1 - h, n)
    phi = 0.5 - 4 * (xs - 0.5) ** 2          # obstacle

    def F(u):
        um = jnp.concatenate([jnp.zeros(1), u[:-1]])
        up = jnp.concatenate([u[1:], jnp.zeros(1)])
        return (2 * u - um - up) / h ** 2 + 1.0   # -u'' = -1

    snes = pt.SNES().create()
    snes.setType("vinewtonrsls")
    snes.setFunction(F)
    snes.setVariableBounds(phi, np.full(n, 1e20))
    snes.setTolerances(rtol=1e-10, max_it=50)
    x = pt.Vec.from_array(np.maximum(phi, 0.0))
    snes.solve(None, x)
    assert snes.getConvergedReason().converged
    u = np.asarray(x.getArray())
    assert (u >= phi - 1e-10).all()
    # contact region exists and residual is +ve there (pushing against)
    contact = u <= phi + 1e-8
    assert contact.any() and (~contact).any()


def test_fas_bratu():
    from examples import ex5
    da = pt.DMDA.create(2, (33, 33))
    lam = 5.0
    snes = pt.SNES().create()
    snes.setType("fas")
    snes.setDM(da)
    snes.fas_levels = 3
    snes.fas_residual_factory = lambda d: ex5.make_residual(d, lam)
    snes.setFunction(ex5.make_residual(da, lam))
    snes.setTolerances(rtol=1e-5, max_it=80)
    x = da.createGlobalVector()
    snes.solve(None, x)
    assert snes.getConvergedReason().converged
    r = snes._func_np(np.asarray(x.getArray()))
    assert np.linalg.norm(r) < 1e-4


def test_ncg_gradient_system():
    import scipy.sparse as sp
    n = 30
    T = sp.diags([2 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")

    def F(x):
        return jnp.asarray(T @ np.asarray(x)) + 0.1 * jnp.tanh(x) - 0.5

    snes = pt.SNES().create()
    snes.setType("ncg")
    snes.setTolerances(rtol=1e-8, max_it=500)
    snes.setFunction(F)
    x = pt.Vec.from_array(np.zeros(n))
    snes.solve(None, x)
    assert snes.getConvergedReason().converged
    assert np.linalg.norm(np.asarray(
        F(jnp.asarray(np.asarray(x.getArray()))))) < 1e-5


def test_composite():
    def F(x):
        return jnp.array([x[0] ** 2 + x[0] * x[1] - 3.0,
                          x[0] * x[1] + x[1] ** 2 - 6.0])

    snes = pt.SNES().create()
    snes.setType("composite")
    snes.composite_types = ["newtonls"]
    snes.setFunction(F)
    snes.setTolerances(rtol=1e-10, max_it=30)
    x = pt.Vec.from_array(np.array([2.0, 3.0]))
    snes.solve(None, x)
    assert snes.getConvergedReason().converged
    assert np.allclose(np.asarray(x.getArray()), [1.0, 2.0], atol=1e-5)


def test_ngs_bratu():
    """Colored secant nonlinear Gauss-Seidel converges on Bratu (slowly —
    it is a smoother; coarse tolerance)."""
    from examples import ex5
    da = pt.DMDA.create(2, (17, 17))
    snes = pt.SNES().create()
    snes.setType("ngs")
    snes.setDM(da)
    snes.setFunction(ex5.make_residual(da, 5.0))
    snes.setTolerances(rtol=1e-4, max_it=400)
    snes.ngs_sweeps = 2
    x = da.createGlobalVector()
    snes.solve(None, x)
    assert snes.getConvergedReason().converged


@pytest.mark.parametrize("stype", ["nasm", "aspin"])
def test_nasm_aspin(stype):
    """Nonlinear additive Schwarz on a 1-D reaction-diffusion problem."""
    import scipy.sparse as sp
    n = 40
    T = sp.diags([2 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr").toarray()
    Tj = jnp.asarray(T)

    def F(x):
        return Tj @ x + 0.3 * jnp.exp(x) - 1.0

    snes = pt.SNES().create()
    snes.setType(stype)
    snes.nasm_blocks = 4
    snes.nasm_overlap = 3
    snes.setTolerances(rtol=1e-8, max_it=60)
    snes.setFunction(F)
    x = pt.Vec.from_array(np.zeros(n))
    snes.solve(None, x)
    assert snes.getConvergedReason().converged, snes.getConvergedReason()
    xs = np.asarray(x.getArray())
    assert np.linalg.norm(np.asarray(F(jnp.asarray(xs)))) < 1e-6


def test_ms_smoother():
    from examples import ex5
    da = pt.DMDA.create(2, (17, 17))
    snes = pt.SNES().create()
    snes.setType("ms")
    snes.setDM(da)
    snes.setFunction(ex5.make_residual(da, 2.0))
    snes.setTolerances(rtol=1e-3, max_it=2000)
    x = da.createGlobalVector()
    snes.solve(None, x)
    assert snes.getConvergedReason().converged


def test_snes_patch_vertex_star():
    """SNESPATCH (src/snes/impls/patch role): nonlinear vertex-star patch
    relaxation; patches span Jacobian-pattern neighbors."""
    import scipy.sparse as sp
    n = 24
    T = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1]).tocsr()

    def fun(x):
        return jnp.asarray(T.toarray()) @ x + 0.1 * x ** 3 - 1.0

    snes = pt.SNES().create()
    snes.setType("patch")
    snes.setFunction(fun)
    snes.patch_pattern = pt.MatAIJ.from_scipy(T)
    snes.setTolerances(rtol=1e-8, max_it=200)
    x = pt.Vec.from_array(np.zeros(n))
    snes.solve(None, x)
    assert snes.getConvergedReason() > 0
    xs = np.asarray(x.getArray())[:n]
    r = T @ xs + 0.1 * xs ** 3 - 1.0
    assert np.linalg.norm(r) < 1e-6


def test_snes_patch_without_pattern():
    """Fallback windows (no Jacobian pattern): every dof is some patch's
    center, so the sweep must still converge."""
    n = 16

    def fun(x):
        lap = 2 * x - jnp.roll(x, 1) - jnp.roll(x, -1)
        return lap + 0.2 * x ** 3 - 1.0

    snes = pt.SNES().create()
    snes.setType("patch")
    snes.setFunction(fun)
    snes.setTolerances(rtol=1e-8, max_it=300)
    x = pt.Vec.from_array(np.zeros(n))
    snes.solve(None, x)
    assert snes.getConvergedReason() > 0
