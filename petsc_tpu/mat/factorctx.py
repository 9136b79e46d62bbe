"""FactorContext: the MatGetFactor / MatLUFactorSymbolic / Numeric /
MatSolve object surface (reference src/mat/interface/matrix.c factor
paths), backed by the framework's factorizations."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import operator, trisolve
from ..sys.error import Error
from . import factor


class FactorContext:
    def __init__(self, A, solver_type="petsc", kind="lu"):
        if solver_type not in ("petsc",):
            raise Error(f"MatSolverType '{solver_type}' not available; "
                        "built-in 'petsc' backend covers lu/ilu/cholesky/icc")
        self.A = A
        self.kind = kind
        self._plan = None

    def factorSymbolic(self, *a, **kw):
        return self  # symbolic phase folded into numeric (host)

    def factorNumeric(self, *a, **kw):
        indptr, indices, vals = self.A.getValuesCSR()
        if self.kind in ("ilu", "icc"):
            L, U, dinv = factor.ilu0(indptr, indices, vals)
            self._tail, self._data = trisolve.make_trisolve_plan(L, U, dinv)
            self._perm = None
        elif self.kind in ("lu", "cholesky"):
            L, U, dinv, pr, pc = factor.splu_factors(self.A.to_scipy())
            self._tail, self._data = trisolve.make_trisolve_plan(L, U, dinv)
            self._perm = (jnp.asarray(pr), jnp.asarray(pc))
        else:
            raise Error(f"factor kind {self.kind}")
        return self

    def solve(self, b, x=None):
        from ..vec.vec import Vec
        if self._plan is None and not hasattr(self, "_data"):
            self.factorNumeric()
        m, nlevL, nlevU = self._tail
        barr = b.array if isinstance(b, Vec) else jnp.asarray(b)
        if self._perm is not None:
            pr, pc = self._perm
            w = jnp.zeros((m,), barr.dtype).at[pr].set(barr[:m])
            u = trisolve.trisolve_apply(self._data, w, m, nlevL, nlevU)
            out = u[pc]
        else:
            out = trisolve.trisolve_apply(self._data, barr, m, nlevL, nlevU)
        if x is None:
            return Vec.from_array(np.asarray(out), comm=self.A.comm)
        x.array = out
        return x
