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


class MatInterpQ1MPI(MatInterpQ1):
    """Slab-sharded Q1 prolongation: the leading (sharded) axis transfers
    exchange exactly ONE boundary plane per neighbor via lax.ppermute
    inside shard_map; the tail axes stay pure local slicing. Written as
    an EXPLICIT shard_map (not GSPMD-partitioned global slicing) both
    for the gather-free guarantee and for correctness: XLA's automatic
    partitioner mis-shards the strided interleave when this transfer is
    composed with the shard_map stencil operators inside one program
    (measured on the 8-virtual-device mesh: a jitted Richardson loop
    diverges from the identical eager iteration; see
    tests/test_gamg_mpi_head.py)."""

    def __init__(self, fine_shape, coarse_shape, comm, **kw):
        super().__init__(fine_shape, coarse_shape, comm=comm, **kw)
        self._Pn = comm.nshards
        self._axis = comm.axis
        self._mesh = comm.mesh
        if (fine_shape[0] % (2 * self._Pn) != 0
                or coarse_shape[0] % self._Pn != 0
                or fine_shape[0] != 2 * coarse_shape[0]):
            raise ValueError("MatInterpQ1MPI slab contract: nf0 = 2*nc0, "
                             "both divisible over the shards")

    @property
    def meta(self):
        return ("interp_q1_mpi", self.fine_shape, self.coarse_shape,
                self._Pn, self._axis, self._mesh)


def _bind_interp_q1_mpi(meta, data):
    import jax
    from jax import lax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    _, fshape, cshape, Pn, axis, mesh = meta
    nd = len(fshape)
    nzl_c = cshape[0] // Pn
    nzl_f = fshape[0] // Pn          # = 2 * nzl_c
    ctail = tuple(cshape[1:])
    ftail = tuple(fshape[1:])
    blk_c = nzl_c * int(np.prod(ctail)) if ctail else nzl_c
    blk_f = nzl_f * int(np.prod(ftail)) if ftail else nzl_f
    fwd = [(i, i + 1) for i in range(Pn - 1)]   # plane to next shard
    bwd = [(i + 1, i) for i in range(Pn - 1)]   # plane to prev shard

    def local_mult(xc):
        c = xc.reshape(-1)[:blk_c].reshape((nzl_c,) + ctail)
        # tail axes: pure local Q1 interp
        for ax in range(1, nd):
            c = _interp_axis(c, ax, fshape[ax])
        # leading axis: even fine planes inject, odd average (k, k+1);
        # the k+1 of the slab's last odd plane is the NEXT shard's first
        # plane — one ppermute; the GLOBAL last odd plane clamps to its
        # own last coarse plane (even-nf branch of _interp_axis)
        nxt = lax.ppermute(c[:1], axis, bwd)     # next shard's first plane
        is_last = jax.lax.axis_index(axis) == Pn - 1
        nxt = jnp.where(is_last, c[-1:], nxt)
        ext = jnp.concatenate([c, nxt], axis=0)  # (nzl_c + 1, ftail)
        odd = 0.5 * (ext[:-1] + ext[1:])
        f = jnp.stack([c, odd], axis=1).reshape((nzl_f,) + ftail)
        return f.reshape(1, blk_f)

    def local_mult_t(xf):
        f = xf.reshape(-1)[:blk_f].reshape((nzl_f,) + ftail)
        even = f[0::2]
        odd = f[1::2]
        # adjoint of the leading axis: c_k += even_k + 0.5*odd_k
        # + 0.5*odd_{k-1}; odd_{k-1} of the slab's first plane comes from
        # the PREVIOUS shard; the global clamp adds the last shard's own
        # last odd plane again to its last coarse plane
        prev = lax.ppermute(odd[-1:], axis, fwd)  # prev shard's last odd
        c = even + 0.5 * odd
        c = c.at[1:].add(0.5 * odd[:-1])
        c = c.at[:1].add(0.5 * prev)
        is_last = jax.lax.axis_index(axis) == Pn - 1
        c = c.at[-1:].add(jnp.where(is_last, 0.5 * odd[-1:], 0.0))
        # tail axes: local adjoints, reverse order
        for ax in range(nd - 1, 0, -1):
            c = _restrict_axis(c, ax, cshape[ax])
        return c.reshape(1, blk_c)

    smap = shard_map(local_mult, mesh=mesh,
                     in_specs=P(axis), out_specs=P(axis, None))
    smap_t = shard_map(local_mult_t, mesh=mesh,
                       in_specs=P(axis), out_specs=P(axis, None))

    def mult(x):
        return smap(x).reshape(-1)

    def mult_t(x):
        return smap_t(x).reshape(-1)

    return operator.Op(mult=mult, mult_t=mult_t)


operator.register_binder("interp_q1_mpi", _bind_interp_q1_mpi)


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
