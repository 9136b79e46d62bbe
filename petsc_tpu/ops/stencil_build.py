"""Device-side construction of constant-coefficient grid-stencil operators.

Role of DMDA matrix assembly (reference src/dm/impls/da/fdda.c) for the
common constant-coefficient case, done the TPU way: the `aij_dnd` /
`dnd_mpi` coefficient arrays are GENERATED in HBM with jnp ops — no host
COO staging and no host->device transfer of O(nnz) data. At 512^3 the
27-point operator is ~29 GB of coefficients; building it on device is the
only scalable path (and mirrors MatSetValuesCOO's "numeric phase on
device" design, gcreate.c:706).

Boundary convention: an offset's coefficient is zero wherever the
neighbor falls outside the grid (Dirichlet row truncation — the pattern
`bench_kspsolve.c` and ex45 produce).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import config


def stencil_offsets(ndim: int, kind: str):
    """Offsets for 'star' (2*ndim+1-point) or 'box' (3^ndim-point)."""
    if kind == "star":
        offs = [(0,) * ndim]
        for ax in range(ndim):
            for s in (-1, 1):
                o = [0] * ndim
                o[ax] = s
                offs.append(tuple(o))
        return offs
    if kind == "box":
        from itertools import product
        return [o for o in product((-1, 0, 1), repeat=ndim)]
    raise ValueError(kind)


def _valid_mask(shape, off, one):
    """Indicator of rows whose `off` neighbor is inside the grid. `one` is
    a TRACED scalar 1.0 — threading it through keeps XLA from constant-
    folding the O(N) coefficient arrays into literals (which would embed
    hundreds of MB of constants in the executable; the axon tunnel's
    compile endpoint rejects such payloads)."""
    m = one
    for ax, o in enumerate(off):
        n = shape[ax]
        idx = jnp.arange(n)
        ok = jnp.broadcast_to(one, (n,)) if o == 0 else \
            jnp.where((idx + o >= 0) & (idx + o < n), one, 0.0 * one)
        shp = [1] * len(shape)
        shp[ax] = n
        m = m * ok.reshape(shp)
    return jnp.broadcast_to(m, shape)


def build_dnd(shape, offsets=None, diag_coef=None, off_coef=-1.0,
              kind="box", dtype=None, variable=False):
    """(meta, data) for the `aij_dnd` binder, fully on device.

    diag_coef default: number of off-diagonal offsets (26 for 3-D box,
    2*ndim for star) — the diagonally-dominant Poisson-type operator of
    bench_kspsolve.c (27-point, diag 26) / ex45 (7-point, diag 6).

    variable=True materializes the boundary-masked per-offset coefficient
    PLANES on device instead of folding them to meta scalars — the same
    operator through the general variable-coefficient mult path (used by
    the bench's varcoef metric and by tests; real variable-coefficient
    operators arrive via MatAIJ.setStencilGrid)."""
    shape = tuple(int(s) for s in shape)
    dt = dtype or config.real_dtype()
    if offsets is None:
        offsets = [o for o in stencil_offsets(len(shape), kind)
                   if any(o)]
    offsets = [tuple(int(v) for v in o) for o in offsets]
    if (0,) * len(shape) not in offsets:
        offsets = [(0,) * len(shape)] + offsets
    if diag_coef is None:
        diag_coef = float(len(offsets) - 1)

    uniq = np.asarray(offsets)
    lpad = tuple(int(max(0, -uniq[:, ax].min())) for ax in range(len(shape)))
    rpad = tuple(int(max(0, uniq[:, ax].max())) for ax in range(len(shape)))
    if variable:
        # boundary-masked planes, generated in HBM (453 MB at 128^3 f64
        # never crosses the tunnel)
        @jax.jit
        def gen_planes(one):
            planes = []
            for o in offsets:
                c = diag_coef if not any(o) else off_coef
                planes.append(c * _valid_mask(shape, o, one))
            return jnp.stack(planes).reshape((len(offsets),) + shape)

        coef = gen_planes(jnp.asarray(1.0, dt))

        @jax.jit
        def gen_diag(dval):
            return jnp.broadcast_to(dval, (int(np.prod(shape)),))

        meta = ("aij_dnd", shape, tuple(offsets), lpad, rpad,
                int(np.prod(shape)))
        return meta, {"coef": coef,
                      "diag": gen_diag(jnp.asarray(diag_coef, dt))}

    # every plane of a constant-coefficient stencil folds to a SCALAR:
    # the boundary-clip mask is redundant with the mult's zero padding
    # (clipped neighbors read zeros from the pad), so no (K, *shape)
    # coefficient array is stored at all — SpMV traffic drops from
    # ~(K+2) streams to x + y (the MATDIA constant-diagonal idea taken
    # to its TPU conclusion)
    cvals = tuple(float(diag_coef) if not any(o) else float(off_coef)
                  for o in offsets)
    coef = jnp.zeros((0,) + shape, dtype=dt)
    meta = ("aij_dnd", shape, tuple(offsets), lpad, rpad,
            int(np.prod(shape)), cvals)
    # the diagonal of a constant stencil is one SCALAR: consumers
    # (jacobi dinv, smoother scaling, Lanczos similarity) all broadcast,
    # and the materialized (N,) array is 1.07 GB at 512^3 f64 — plus its
    # f32 cycle copy — for a single number. getDiagonal broadcasts on
    # demand.
    return meta, {"coef": coef, "diag": jnp.asarray(float(diag_coef), dt)}


def as_mat(meta, data, comm=None):
    """Wrap a (meta, data) stencil operator as a first-class Mat so the
    device arrays ride the jit contract as ARGUMENTS. (A MatShell closure
    would embed them as compile-time CONSTANTS — at 512^3 that bakes a
    1 GB diagonal into the executable payload, which a dev tunnel cannot
    upload and XLA constant-folds at glacial speed.)"""
    from ..mat.mat import Mat

    class _StencilMat(Mat):
        @property
        def meta(self):
            return self._meta_val

        def device_data(self):
            return self._data_val

        def nnz(self):
            return nnz_of(self._shape_val, self._offsets_val)

    M = _StencilMat(comm)
    N = int(meta[5])
    M.setSizes((N, N))
    M._meta_val = meta
    M._data_val = data
    M._shape_val = meta[1]
    M._offsets_val = meta[2]
    # declare the grid so PCGAMG's structured head engages (without this
    # the flagship device-generated operator silently took the slow
    # aggregation V-cycle: 3.1 s/it vs ~ms on the geometric head)
    M._grid_shape = tuple(int(s) for s in meta[1])
    M._assembled = True
    return M


def nnz_of(shape, offsets):
    """Exact nonzero count of the masked stencil (for nnz/s metrics)."""
    shape = np.asarray(shape)
    total = 0
    for off in offsets:
        rows = 1
        for ax, o in enumerate(off):
            rows *= shape[ax] - abs(int(o))
        total += rows
    return int(total)
