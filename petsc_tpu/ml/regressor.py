"""PetscRegressor: regression solvers on the framework's linear algebra.

Behavioral reference: src/ml/regressor (PetscRegressorCreate/Fit/Predict,
impls/linear — OLS via KSPLSQR on the design matrix, ridge via normal
equations shift, lasso via TaoBRGN with L1 regularizer). TPU design: the
design matrix is a dense jnp array (MXU path); OLS/ridge solve with LSQR /
Cholesky on the normal equations, lasso with ISTA-style proximal gradient
(the BRGN regularized-subproblem role).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..sys.error import Error
from ..sys.object import PObject
from ..vec.vec import Vec


class Regressor(PObject):
    _class_name = "PetscRegressor"
    _impls = ("linear",)

    def __init__(self, comm=None, **kw):
        super().__init__(**kw)
        self.comm = comm
        self._type = "linear"
        self.linear_type = "ols"    # ols | ridge | lasso
        self.fit_intercept = True
        self.regularizer_weight = 1.0
        self._coef = None
        self._intercept = 0.0

    def create(self, comm=None):
        self.comm = comm or self.comm
        return self

    def setType(self, t):
        if t not in self._impls:
            raise KeyError(t)
        self._type = t
        return self

    def setLinearType(self, t):
        self.linear_type = t
        return self

    def setFitIntercept(self, flag):
        self.fit_intercept = bool(flag)
        return self

    def setRegularizerWeight(self, w):
        self.regularizer_weight = float(w)
        return self

    def setFromOptions(self):
        t = self.opt("get_string", "regressor_type", None)
        if t:
            self.setType(t)
        t = self.opt("get_string", "regressor_linear_type", None)
        if t:
            self.linear_type = t
        w = self.opt("get_real", "regressor_regularizer_weight", None)
        if w is not None:
            self.regularizer_weight = w
        return self

    # ---------------- fit/predict ----------------

    def fit(self, X, y):
        X = np.asarray(X.getDenseArray() if hasattr(X, "getDenseArray")
                       else X, dtype=np.float64)
        y = np.asarray(y.getArray() if isinstance(y, Vec) else y,
                       dtype=np.float64)
        if self.fit_intercept:
            xm, ym = X.mean(axis=0), y.mean()
            Xc, yc = X - xm, y - ym
        else:
            xm, ym = 0.0, 0.0
            Xc, yc = X, y
        lt = self.linear_type
        if lt == "ols":
            coef = np.asarray(jnp.linalg.lstsq(jnp.asarray(Xc),
                                               jnp.asarray(yc))[0])
        elif lt == "ridge":
            lam = self.regularizer_weight
            G = Xc.T @ Xc + lam * np.eye(Xc.shape[1])
            coef = np.linalg.solve(G, Xc.T @ yc)
        elif lt == "lasso":
            coef = _ista_lasso(jnp.asarray(Xc), jnp.asarray(yc),
                               self.regularizer_weight)
        else:
            raise Error(f"regressor linear type {lt}")
        self._coef = coef
        self._intercept = float(ym - np.dot(np.atleast_1d(xm), coef)) \
            if self.fit_intercept else 0.0
        return self

    def predict(self, X, y=None):
        X = np.asarray(X.getDenseArray() if hasattr(X, "getDenseArray")
                       else X, dtype=np.float64)
        out = X @ self._coef + self._intercept
        if y is not None:
            y.setArray(out)
            return y
        return Vec.from_array(out, comm=self.comm)

    def getCoefficients(self):
        return Vec.from_array(self._coef, comm=self.comm)

    def getIntercept(self):
        return self._intercept


def _ista_lasso(X, y, lam, iters=500):
    """Proximal gradient (ISTA) for 0.5||Xw - y||^2 + lam ||w||_1."""
    L = float(jnp.linalg.norm(X, ord=2)) ** 2

    @jax.jit
    def step(w):
        g = X.T @ (X @ w - y)
        z = w - g / L
        return jnp.sign(z) * jnp.maximum(jnp.abs(z) - lam / L, 0.0)

    w = jnp.zeros((X.shape[1],), dtype=X.dtype)
    for _ in range(iters):
        w = step(w)
    return np.asarray(w)
