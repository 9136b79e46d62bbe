"""VecNest / MatFFT / MatKAIJ / MatGetFactor / MatFDColoring / PCSVD."""

import numpy as np
import jax.numpy as jnp

import petsc_tpu as pt
from petsc_tpu.vec.nest import VecNest
from petsc_tpu.mat.extra_formats import MatFFT, MatKAIJ
from petsc_tpu.mat.fdcoloring import MatFDColoring
from tests.test_mg_gamg import poisson2d


def test_vecnest():
    a = pt.Vec.from_array(np.arange(3.0))
    b = pt.Vec.from_array(np.ones(2))
    v = VecNest.create([a, b])
    assert v.getSize() == 5
    assert np.allclose(np.asarray(v.getArray()), [0, 1, 2, 1, 1])
    subs = v.getNestSubVecs()
    assert subs[0].getSize() == 3


def test_mat_fft():
    n = 16
    M = MatFFT.create(n)
    x = jnp.asarray(np.random.default_rng(0).random(n))
    from petsc_tpu.ops import operator
    op = operator.bind(M.meta, M.device_data())
    y = op.mult(x)
    assert np.allclose(np.asarray(y), np.fft.fft(np.asarray(x)))
    # round trip
    assert np.allclose(np.asarray(op.mult_t(y)) / n, np.asarray(x))


def test_mat_kaij():
    A_sp = poisson2d(4)
    A = pt.MatAIJ.from_scipy(A_sp)
    S = np.array([[2.0, 0.0], [0.0, 3.0]])
    T = np.array([[1.0, 0.5], [0.0, 1.0]])
    K = MatKAIJ.create(A, S, T)
    from petsc_tpu.ops import operator
    op = operator.bind(K.meta, K.device_data())
    rng = np.random.default_rng(1)
    x = rng.random(16 * 2)
    X = x.reshape(16, 2)
    ref = X @ S.T + (A_sp @ X) @ T.T
    assert np.allclose(np.asarray(op.mult(jnp.asarray(x))),
                       ref.reshape(-1))


def test_mat_get_factor():
    A = pt.MatAIJ.from_scipy(poisson2d(8))
    F = A.getFactor("petsc", "lu").factorNumeric()
    b = pt.Vec.from_array(np.ones(64))
    x = F.solve(b)
    r = A.to_scipy() @ np.asarray(x.getArray()) - 1.0
    assert np.linalg.norm(r) < 1e-10


def test_mat_fd_coloring():
    import scipy.sparse as sp
    T = poisson2d(6)
    pat = pt.MatAIJ.from_scipy(T)
    fdc = MatFDColoring(pat)
    assert fdc.ncolors <= 8  # 5-pt stencil distance-2 chromatic bound

    def fn(x):
        return T @ x + 0.1 * x ** 2

    x0 = np.random.default_rng(0).random(36)
    J = fdc.apply(fn, x0)
    Jref = T + sp.diags(0.2 * x0)
    assert np.abs((J.to_scipy() - Jref).toarray()).max() < 1e-6


def test_pc_svd():
    from tests.test_more_pc import run
    ksp, err = run("svd", ksp_type="gmres")
    assert ksp.getConvergedReason().converged
    assert ksp.getIterationNumber() <= 2
    assert err < 1e-8
