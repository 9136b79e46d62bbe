"""Tao optimization tests (reference model: src/tao/unconstrained/tutorials
rosenbrock1.c and leastsquares tests)."""

import numpy as np
import pytest
import jax.numpy as jnp

import petsc_tpu as pt


def rosenbrock(x):
    return jnp.sum(100.0 * (x[1::2] - x[0::2] ** 2) ** 2
                   + (1.0 - x[0::2]) ** 2)


@pytest.mark.parametrize("ttype,maxit", [
    ("lmvm", 200), ("nls", 100), ("ntr", 100), ("cg", 800), ("bnls", 100),
])
def test_rosenbrock(ttype, maxit):
    tao = pt.Tao().create()
    tao.setType(ttype)
    tao.setObjective(rosenbrock)
    tao.setMaximumIterations(maxit)
    x = pt.Vec.from_array(np.zeros(10))
    tao.solve(x)
    assert tao.getConvergedReason().converged, tao.getConvergedReason()
    assert np.allclose(np.asarray(x.getArray()), 1.0, atol=1e-4)


def test_blmvm_bounds():
    tao = pt.Tao().create()
    tao.setType("blmvm")
    tao.setObjective(lambda x: jnp.sum((x - 2.0) ** 2))
    tao.setVariableBounds(np.zeros(5), np.ones(5))  # optimum clipped at 1
    x = pt.Vec.from_array(np.full(5, 0.5))
    tao.solve(x)
    assert tao.getConvergedReason().converged
    assert np.allclose(np.asarray(x.getArray()), 1.0, atol=1e-6)


def test_brgn_least_squares():
    """Fit y = a*exp(b*t) by Gauss-Newton."""
    t = jnp.linspace(0, 1, 20)
    y = 2.0 * jnp.exp(1.5 * t)

    def resid(p):
        return p[0] * jnp.exp(p[1] * t) - y

    tao = pt.Tao().create()
    tao.setType("brgn")
    tao.setResidual(resid)
    x = pt.Vec.from_array(np.array([1.0, 1.0]))
    tao.solve(x)
    assert tao.getConvergedReason().converged
    assert np.allclose(np.asarray(x.getArray()), [2.0, 1.5], atol=1e-6)


def test_neldermead():
    tao = pt.Tao().create()
    tao.setType("nm")
    tao.setObjective(lambda x: jnp.sum((x - 3.0) ** 2))
    tao.setTolerances(gatol=1e-8)
    x = pt.Vec.from_array(np.zeros(3))
    tao.solve(x)
    assert np.allclose(np.asarray(x.getArray()), 3.0, atol=1e-3)


def test_almm_equality_constrained():
    """min x^2+y^2 s.t. x+y=1 -> (0.5, 0.5)."""
    tao = pt.Tao().create()
    tao.setType("almm")
    tao.setObjective(lambda x: jnp.sum(x ** 2))
    tao.setEqualityConstraints(lambda x: jnp.array([x[0] + x[1] - 1.0]))
    x = pt.Vec.from_array(np.zeros(2))
    tao.solve(x)
    assert np.allclose(np.asarray(x.getArray()), 0.5, atol=1e-4)


def test_almm_inequality():
    """min (x-2)^2 s.t. x <= 1 -> x = 1."""
    tao = pt.Tao().create()
    tao.setType("almm")
    tao.setObjective(lambda x: jnp.sum((x - 2.0) ** 2))
    tao.setInequalityConstraints(lambda x: x - 1.0)
    x = pt.Vec.from_array(np.zeros(3))
    tao.solve(x)
    assert np.allclose(np.asarray(x.getArray()), 1.0, atol=1e-3)


def test_bncg_bounds():
    tao = pt.Tao().create()
    tao.setType("bncg")
    tao.setObjective(lambda x: jnp.sum((x - 2.0) ** 2))
    tao.setVariableBounds(np.zeros(6), np.ones(6))
    x = pt.Vec.from_array(np.full(6, 0.3))
    tao.solve(x)
    assert tao.getConvergedReason().converged
    assert np.allclose(np.asarray(x.getArray()), 1.0, atol=1e-6)


def test_owlqn_l1_sparsity():
    rng = np.random.default_rng(0)
    A = rng.random((40, 10))
    xs = np.zeros(10); xs[1] = 2.0; xs[7] = -1.0
    b = A @ xs
    tao = pt.Tao().create()
    tao.setType("owlqn")
    tao.setObjective(lambda x: 0.5 * jnp.sum((jnp.asarray(A) @ x - b) ** 2))
    tao.setRegularizerWeight(0.5)
    tao.setTolerances(gatol=1e-6)
    x = pt.Vec.from_array(np.zeros(10))
    tao.solve(x)
    sol = np.asarray(x.getArray())
    assert np.sum(np.abs(sol) > 0.05) <= 4        # sparse
    assert abs(sol[1]) > 0.5 and abs(sol[7]) > 0.2  # support recovered


def test_tron_bounds():
    tao = pt.Tao().create()
    tao.setType("tron")
    tao.setObjective(rosenbrock)
    tao.setVariableBounds(np.full(10, -0.5), np.full(10, 0.8))
    x = pt.Vec.from_array(np.zeros(10))
    tao.solve(x)
    assert tao.getConvergedReason().converged
    sol = np.asarray(x.getArray())
    assert (sol >= -0.5 - 1e-10).all() and (sol <= 0.8 + 1e-10).all()
    # bound active at the clipped optimum
    assert np.isclose(sol[0::2].max(), 0.8, atol=1e-4)


def test_ntl_rosenbrock():
    """NTL (trust region + line-search salvage, ntl.c) on Rosenbrock."""
    tao = pt.Tao().create()
    tao.setType("ntl")
    tao.setObjective(rosenbrock)
    tao.setMaximumIterations(100)
    x = pt.Vec.from_array(np.zeros(10))
    tao.solve(x)
    assert tao.getConvergedReason().converged
    assert np.allclose(np.asarray(x.getArray()), 1.0, atol=1e-4)


def test_pc_lmvm_secant_and_host_match():
    """PCLMVM two-loop apply satisfies the secant condition H y_k = s_k for
    the latest pair, and matches the host _lbfgs_dir recursion exactly."""
    from petsc_tpu.ops import operator
    from petsc_tpu.tao.tao import _lbfgs_dir
    from tests.test_mg_gamg import poisson2d
    A_sp = poisson2d(6)
    n = A_sp.shape[0]
    A = pt.MatAIJ.from_scipy(A_sp)
    pc = pt.PC(options=None) if False else pt.KSP().create().getPC()
    pc.setOperators(A, A)
    pc.setType("lmvm")
    rng = np.random.default_rng(0)
    S, Y = [], []
    for _ in range(4):
        sv = rng.standard_normal(n)
        S.append(sv)
        Y.append(A_sp @ sv)
        pc._impl.update(sv, Y[-1])
    pc.setUp()
    op = operator.bind(pc.meta, pc.device_data())
    # secant: H y_last = s_last (exact for the newest pair)
    out = np.asarray(op.mult(jnp.asarray(np.pad(Y[-1], (0, pc.pmat.row_layout.pad)))))
    assert np.allclose(out[:n], S[-1], atol=1e-10)
    # matches the host two-loop used by Tao lmvm
    g = rng.standard_normal(n)
    ref = _lbfgs_dir(S, Y, g.copy())
    out2 = np.asarray(op.mult(jnp.asarray(np.pad(g, (0, pc.pmat.row_layout.pad)))))
    assert np.allclose(out2[:n], ref, atol=1e-10)


def test_pounders_least_squares():
    """POUNDerS-style DFO least squares: exponential fit without
    derivatives (leastsquares/impls/pounders role)."""
    t = jnp.linspace(0, 1, 20)
    y = 2.0 * jnp.exp(1.5 * t)

    def resid(p):
        return p[0] * jnp.exp(p[1] * t) - y

    tao = pt.Tao().create()
    tao.setType("pounders")
    tao.setResidual(resid)
    tao.setMaximumIterations(200)
    tao.setTolerances(gatol=1e-10)
    x = pt.Vec.from_array(np.array([1.0, 1.0]))
    tao.solve(x)
    assert tao.getConvergedReason().converged, tao.getConvergedReason()
    assert np.allclose(np.asarray(x.getArray()), [2.0, 1.5], atol=1e-4)


def test_ssils_complementarity():
    """SSILS semismooth Newton on an NCP with known solution: F(x) = Mx+q
    (LCP). Solution of 0<=x ⊥ Mx+q>=0 for M SPD."""
    M = np.array([[2.0, 0.5], [0.5, 1.0]])
    q = np.array([-1.0, 1.0])
    # solution: x1 solves first row active (F1=0), x2=0 with F2>=0
    # 2 x1 - 1 = 0 -> x1 = 0.5; F2 = 0.25 + 1 > 0 OK

    def F(x):
        return jnp.asarray(M) @ x + jnp.asarray(q)

    tao = pt.Tao().create()
    tao.setType("ssils")
    tao.setConstraints(F)
    tao.setTolerances(gatol=1e-10)
    x = pt.Vec.from_array(np.array([1.0, 1.0]))
    tao.solve(x)
    assert tao.getConvergedReason().converged
    sol = np.asarray(x.getArray())
    assert np.allclose(sol, [0.5, 0.0], atol=1e-7), sol


def test_pdipm_bound_constrained():
    """PDIPM interior point: quadratic with active bound; optimum clipped
    to the boundary with vanishing KKT residual."""
    tao = pt.Tao().create()
    tao.setType("pdipm")
    tao.setObjective(lambda x: jnp.sum((x - 2.0) ** 2))
    tao.setVariableBounds(np.zeros(4), np.ones(4))
    tao.setTolerances(gatol=1e-8)
    tao.setMaximumIterations(100)
    x = pt.Vec.from_array(np.full(4, 0.5))
    tao.solve(x)
    assert tao.getConvergedReason().converged
    assert np.allclose(np.asarray(x.getArray()), 1.0, atol=1e-6)


def test_pdipm_interior_optimum():
    """When the optimum is interior, pdipm matches the unconstrained one."""
    tao = pt.Tao().create()
    tao.setType("pdipm")
    tao.setObjective(lambda x: jnp.sum((x - 0.3) ** 2) + 0.1 * x[0] * x[1])
    tao.setVariableBounds(np.zeros(2), np.ones(2))
    tao.setTolerances(gatol=1e-9)
    tao.setMaximumIterations(200)
    x = pt.Vec.from_array(np.full(2, 0.5))
    tao.solve(x)
    assert tao.getConvergedReason().converged
    # unconstrained optimum of x'Qx form: solve 2(x-0.3)+0.1*swap = 0
    Q = np.array([[2.0, 0.1], [0.1, 2.0]])
    ref = np.linalg.solve(Q, np.array([0.6, 0.6]))
    assert np.allclose(np.asarray(x.getArray()), ref, atol=1e-5)


def test_bmrm_regularized_risk():
    """BMRM bundle method: lambda/2||w||^2 + hinge-like smooth risk; the
    optimum satisfies lambda*w + dR(w) = 0."""
    A = np.array([[1.0, 0.2], [0.1, 1.5], [0.7, 0.3]])
    y = np.array([1.0, -1.0, 0.5])

    def risk(w):
        return jnp.sum(jnp.logaddexp(0.0, -(jnp.asarray(A) @ w) *
                                     jnp.asarray(y)))

    tao = pt.Tao().create()
    tao.setType("bmrm")
    tao.bmrm_lambda = 0.5
    tao.setObjective(risk)
    tao.setTolerances(gatol=1e-5)   # bundle tail is sublinear by design
    tao.setMaximumIterations(200)
    x = pt.Vec.from_array(np.zeros(2))
    tao.solve(x)
    assert tao.getConvergedReason().converged
    w = np.asarray(x.getArray())
    import jax
    g = np.asarray(jax.grad(risk)(jnp.asarray(w)))
    assert np.linalg.norm(0.5 * w + g) < 1e-3    # stationarity of J


def test_lcl_pde_constrained():
    """LCL reduced-space: min 0.5||u - t||^2 + a/2||d||^2 subject to the
    'PDE' A u = d (design = source). Known optimum from the KKT system."""
    n = 4
    A = np.diag([2.0, 2.1, 2.2, 2.3])
    t = np.array([1.0, 2.0, 3.0, 4.0])
    alpha = 0.1

    def constraints(z):
        d, u = z[:n], z[n:]
        return jnp.asarray(A) @ u - d

    def objective(z):
        d, u = z[:n], z[n:]
        return 0.5 * jnp.sum((u - jnp.asarray(t)) ** 2) \
            + 0.5 * alpha * jnp.sum(d ** 2)

    tao = pt.Tao().create()
    tao.setType("lcl")
    tao.n_design = n
    tao.setObjective(objective)
    tao.setConstraints(constraints)
    tao.setTolerances(gatol=1e-10)
    tao.setMaximumIterations(300)
    x = pt.Vec.from_array(np.zeros(2 * n))
    tao.solve(x)
    assert tao.getConvergedReason().converged
    z = np.asarray(x.getArray())
    d, u = z[:n], z[n:2 * n]
    # KKT: u = (I + alpha A^2)^{-1} t (after eliminating d = A u)
    uex = np.linalg.solve(np.eye(n) + alpha * A @ A, t)
    assert np.allclose(u, uex, atol=1e-6), (u, uex)
    assert np.allclose(d, A @ uex, atol=1e-6)
