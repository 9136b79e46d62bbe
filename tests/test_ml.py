"""ML layer tests (reference model: src/ml/regressor tests, src/ml/da
LETKF)."""

import numpy as np
import pytest

import petsc_tpu as pt
from petsc_tpu.ml import Regressor, letkf_analysis, gaspari_cohn


def _data(n=60, p=5, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.random((n, p))
    w = np.arange(1.0, p + 1)
    y = X @ w + 2.0 + noise * rng.standard_normal(n)
    return X, y, w


def test_ols():
    X, y, w = _data()
    r = Regressor().create()
    r.fit(X, y)
    assert np.allclose(np.asarray(r.getCoefficients().getArray()), w,
                       atol=1e-8)
    assert abs(r.getIntercept() - 2.0) < 1e-8
    pred = r.predict(X)
    assert np.allclose(np.asarray(pred.getArray()), y, atol=1e-8)


def test_ridge_shrinks():
    X, y, w = _data()
    r = Regressor().create().setLinearType("ridge").setRegularizerWeight(50.0)
    r.fit(X, y)
    c = np.asarray(r.getCoefficients().getArray())
    assert np.linalg.norm(c) < np.linalg.norm(w)


def test_lasso_sparsity():
    X, y, w = _data(n=100, p=8)
    # only first two features matter
    y = X[:, 0] * 3.0 + X[:, 1] * (-2.0) + 1.0
    r = Regressor().create().setLinearType("lasso").setRegularizerWeight(1.0)
    r.fit(X, y)
    c = np.asarray(r.getCoefficients().getArray())
    assert np.sum(np.abs(c) > 0.2) <= 3
    assert abs(c[0]) > 0.5


def test_letkf_reduces_error():
    rng = np.random.default_rng(1)
    n, k, m = 40, 20, 10
    truth = np.sin(np.linspace(0, 2 * np.pi, n))
    Xf = truth[:, None] + 0.5 * rng.standard_normal((n, k))
    Hidx = np.linspace(0, n - 1, m).astype(int)
    H = np.zeros((m, n)); H[np.arange(m), Hidx] = 1.0
    R = np.full(m, 1e-6)
    yo = truth[Hidx]
    Xa = np.asarray(letkf_analysis(Xf, yo, H, R))
    err_f = np.abs(Xf.mean(axis=1)[Hidx] - truth[Hidx]).max()
    err_a = np.abs(Xa.mean(axis=1)[Hidx] - truth[Hidx]).max()
    assert err_a < 1e-3 < err_f
    # ensemble spread shrinks at observed points
    assert Xa[Hidx].std(axis=1).mean() < Xf[Hidx].std(axis=1).mean()


def test_letkf_localized():
    rng = np.random.default_rng(2)
    n, k, m = 30, 12, 6
    truth = np.cos(np.linspace(0, np.pi, n))
    Xf = truth[:, None] + 0.3 * rng.standard_normal((n, k))
    Hidx = np.linspace(0, n - 1, m).astype(int)
    H = np.zeros((m, n)); H[np.arange(m), Hidx] = 1.0
    R = np.full(m, 1e-6)
    yo = truth[Hidx]
    dist = np.abs(np.arange(n)[:, None] - Hidx[None, :])
    rho = gaspari_cohn(dist / 6.0)
    Xa = np.asarray(letkf_analysis(Xf, yo, H, R, localization=rho))
    err_f = np.abs(Xf.mean(axis=1)[Hidx] - truth[Hidx]).max()
    err_a = np.abs(Xa.mean(axis=1)[Hidx] - truth[Hidx]).max()
    assert err_a < err_f


def test_gaspari_cohn_shape():
    w = gaspari_cohn(np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0]))
    assert w[0] == 1.0
    assert np.all(np.diff(w) <= 1e-12)
    assert w[-1] == 0.0 and w[-2] <= 1e-12
