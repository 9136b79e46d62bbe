"""PF: pointwise-function objects (src/vec/pf — PFCreate/PFSetType/PFApply
with types constant/identity/quick(string)/shell). In the TPU design a PF
is a jitted elementwise map applied to Vec arrays."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class PF:
    def __init__(self, dimin=1, dimout=1, comm=None):
        self.dimin, self.dimout = dimin, dimout
        self._fn = None

    @classmethod
    def create(cls, dimin=1, dimout=1, comm=None):
        return cls(dimin, dimout, comm)

    def setType(self, t, ctx=None):
        if t == "constant":
            c = jnp.asarray(ctx if ctx is not None else 0.0)
            self._fn = lambda x: jnp.broadcast_to(c, x.shape)
        elif t == "identity":
            self._fn = lambda x: x
        elif t == "string":
            # quick-function string of x, e.g. "x*x + 1"
            expr = compile(ctx, "<pf>", "eval")
            self._fn = lambda x: eval(expr, {"x": x, "jnp": jnp,
                                             "np": jnp})
        else:
            raise KeyError(f"PF type '{t}'")
        return self

    def setApply(self, fn):
        """PFSetApplyRoutine (shell)."""
        self._fn = fn
        return self

    def apply(self, x, y=None):
        """PFApplyVec: y = f(x) elementwise (jitted)."""
        arr = jnp.asarray(x.getArray() if hasattr(x, "getArray") else x)
        out = jax.jit(self._fn)(arr)
        if y is not None:
            y.setArray(np.asarray(out))
            return y
        return np.asarray(out)

    __call__ = apply
