"""Gather-free Q1 grid transfer operators for DMDA multigrid.

Behavioral reference: src/dm/impls/da/dainterp.c:39-605 (DMDA Q1
interpolation matrices used by PCMG). TPU redesign: instead of an
assembled sparse matrix (whose SpMV needs gathers), vertex-centered
factor-2 Q1 prolongation is per-axis zero-stuff + neighbor averaging on
the grid — pure slicing, fused by XLA; restriction is its exact adjoint.
The operator still presents as a Mat (meta/data contract) so PCMG composes
it like any other interpolation.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..mat.mat import Mat
from ..ops import operator


def _interp_axis(c, axis, nf):
    """1-D vertex-subsampled linear prolongation along `axis`:
    nc = (nf+1)//2 -> nf. Even fine points inject the coarse values; odd
    points average their two coarse neighbors. Odd nf is the classical
    vertex-centered Q1 (nf = 2nc-1, dainterp.c); even nf clamps the last
    odd point to its single in-range neighbor (weight 1)."""
    nc = c.shape[axis]
    sl = [slice(None)] * c.ndim

    def ax_slice(s):
        sl2 = list(sl)
        sl2[axis] = s
        return tuple(sl2)

    shape = list(c.shape)
    shape[axis] = nf
    f = jnp.zeros(shape, dtype=c.dtype)
    f = f.at[ax_slice(slice(0, nf, 2))].set(c[ax_slice(slice(0, (nf + 1) // 2))])
    nodd = nf // 2
    mid = 0.5 * (c[ax_slice(slice(0, nodd))]
                 + c[ax_slice(slice(1, nodd + 1))]) if nf % 2 else \
        0.5 * (c + jnp.concatenate(
            [c[ax_slice(slice(1, nc))], c[ax_slice(slice(nc - 1, nc))]],
            axis=axis))
    f = f.at[ax_slice(slice(1, nf, 2))].set(mid)
    return f


def _restrict_axis(f, axis, nc):
    """Adjoint of _interp_axis: nf -> nc = (nf+1)//2."""
    nf = f.shape[axis]
    sl = [slice(None)] * f.ndim

    def ax_slice(s):
        sl2 = list(sl)
        sl2[axis] = s
        return tuple(sl2)

    c = f[ax_slice(slice(0, nf, 2))]
    mid = f[ax_slice(slice(1, nf, 2))]          # (nodd,) odd fine points
    nodd = nf // 2
    if nf % 2:                                  # vertex-centered, nodd=nc-1
        c = c.at[ax_slice(slice(0, nc - 1))].add(0.5 * mid)
        c = c.at[ax_slice(slice(1, nc))].add(0.5 * mid)
    else:                                       # even: nodd=nc, last clamped
        c = c + 0.5 * mid
        c = c.at[ax_slice(slice(1, nc))].add(
            0.5 * mid[ax_slice(slice(0, nodd - 1))])
        c = c.at[ax_slice(slice(nc - 1, nc))].add(
            0.5 * mid[ax_slice(slice(nodd - 1, nodd))])
    return c


class MatInterpQ1(Mat):
    """Q1 prolongation coarse->fine on (…, ny, nx) grids as slicing ops;
    dof>1 fields interpolate per component (trailing dof axis)."""

    def __init__(self, fine_shape, coarse_shape, comm=None, dof=1, **kw):
        super().__init__(comm, **kw)
        self.fine_shape = tuple(fine_shape)
        self.coarse_shape = tuple(coarse_shape)
        self.dof = int(dof)
        self.setSizes((int(np.prod(fine_shape)) * self.dof,
                       int(np.prod(coarse_shape)) * self.dof))
        self._assembled = True

    @property
    def meta(self):
        return ("interp_q1", self.fine_shape, self.coarse_shape, self.dof)

    def device_data(self):
        return {}

    def transpose(self):
        # PCMG only needs mult_t, provided by the binder
        return self

    def to_scipy(self):
        import scipy.sparse as sp
        # materialize (for Galerkin RAP on host): tensor product of 1-D ops
        P = None
        for ax in range(len(self.fine_shape)):
            nf, nc = self.fine_shape[ax], self.coarse_shape[ax]
            rows, cols, vals = [], [], []
            for fi in range(nf):
                if fi % 2 == 0:
                    rows.append(fi); cols.append(fi // 2); vals.append(1.0)
                else:
                    hi = min(fi // 2 + 1, nc - 1)  # clamp (even-nf last odd)
                    rows += [fi, fi]; cols += [fi // 2, hi]
                    vals += [0.5, 0.5]
            p1 = sp.csr_matrix((vals, (rows, cols)), shape=(nf, nc))
            p1.sum_duplicates()
            P = p1 if P is None else sp.kron(P, p1, format="csr")
        if self.dof > 1:
            P = sp.kron(P, sp.eye(self.dof), format="csr")
        return P


def _bind_interp_q1(meta, data):
    _, fshape, cshape, dof = (meta + (1,))[:4]
    nd = len(fshape)

    def mult(x):
        shape = cshape + ((dof,) if dof > 1 else ())
        v = x[: int(np.prod(cshape)) * dof].reshape(shape)
        for ax in range(nd):
            v = _interp_axis(v, ax, fshape[ax])
        return v.reshape(-1)

    def mult_t(x):
        shape = fshape + ((dof,) if dof > 1 else ())
        v = x[: int(np.prod(fshape)) * dof].reshape(shape)
        for ax in range(nd - 1, -1, -1):
            v = _restrict_axis(v, ax, cshape[ax])
        return v.reshape(-1)

    return operator.Op(mult=mult, mult_t=mult_t)


operator.register_binder("interp_q1", _bind_interp_q1)
