"""Pallas TPU kernels: streams triad + fused BLAS-1 passes.

Roles from the reference: src/benchmarks/streams/{BasicVersion.c,
CUDAVersion.cu} (triad bandwidth calibration — the speed-of-light anchor
all solver rates are judged against, doc/manual/streams.md:20-34) and the
fused device BLAS-1 of VecSeqCUPM (vecseqcupm_impl.hpp): the Krylov
update chains (AXPY + dot in the same HBM pass) that PETSc fuses by hand
in CUDA are expressed here as single Pallas kernels.

TPU tiling: 1-D vectors are viewed as (rows, 128) tiles (last dim = lane
width); each grid step processes a (BLK_R, 128) block in VMEM. All
kernels also run in interpret mode off-TPU, so tests exercise them on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
BLK_R = 512          # (512, 128) f32 block = 256 KiB per operand in VMEM


def _interpret(*arrs):
    """Kernel execution policy:
      - off-TPU: interpret (tests/virtual CPU meshes);
      - on TPU with 64-bit inputs: interpret — Mosaic has no 64-bit
        element types, and f64 is this framework's default precision;
      - on TPU with 32-bit inputs: compiled Mosaic when
        PETSC_TPU_PALLAS_COMPILED=1 (opt-in: the dev tunnel's remote
        compile helper currently 500s on grid+accumulator kernels even
        though plain pallas_call compiles; on direct-attached TPUs set
        the flag).
    The numerics are identical either way — XLA's fused jnp path is the
    production fallback and is already near roofline for these BLAS-1
    shapes (PERF.md)."""
    import os
    if jax.default_backend() not in ("tpu",):
        return True
    if any(jnp.asarray(a).dtype.itemsize > 4 for a in arrs):
        return True
    return os.environ.get("PETSC_TPU_PALLAS_COMPILED", "0") != "1"


def _as_tiles(x):
    """Pad to a multiple of BLK_R*LANE and view as (rows, LANE)."""
    n = x.shape[0]
    rem = (-n) % (BLK_R * LANE)
    if rem:
        x = jnp.pad(x, (0, rem))
    return x.reshape(-1, LANE), n


# ---------------------------------------------------------------------
# triad: a = b + alpha * c  (STREAMS)
# ---------------------------------------------------------------------

def _triad_kernel(alpha_ref, b_ref, c_ref, a_ref):
    a_ref[:] = b_ref[:] + alpha_ref[0, 0] * c_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def triad(b, c, alpha, interpret=None):
    interpret = _interpret(b, c) if interpret is None else interpret
    bt, n = _as_tiles(b)
    ct, _ = _as_tiles(c)
    grid = bt.shape[0] // BLK_R
    out = pl.pallas_call(
        _triad_kernel,
        out_shape=jax.ShapeDtypeStruct(bt.shape, bt.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK_R, LANE), lambda i: (i, 0)),
            pl.BlockSpec((BLK_R, LANE), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((BLK_R, LANE), lambda i: (i, 0)),
        interpret=interpret,
    )(jnp.asarray([[alpha]], dtype=b.dtype), bt, ct)
    return out.reshape(-1)[:n]


# ---------------------------------------------------------------------
# fused axpy + dot:  y <- y + alpha x;  returns (y, <y, y>)
# one read of x, one read+write of y, norm for free (VecAXPY+VecDot fusion)
# ---------------------------------------------------------------------

def _axpy_normsq_kernel(alpha_ref, x_ref, y_ref, out_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[0, 0] = jnp.zeros((), acc_ref.dtype)

    ynew = y_ref[:] + alpha_ref[0, 0] * x_ref[:]
    out_ref[:] = ynew
    acc_ref[0, 0] += jnp.sum(ynew * ynew)


@functools.partial(jax.jit, static_argnames=("interpret",))
def axpy_normsq(alpha, x, y, interpret=None):
    """y + alpha*x and ||y + alpha*x||^2 in ONE pass over HBM."""
    interpret = _interpret(x, y) if interpret is None else interpret
    xt, n = _as_tiles(x)
    yt, _ = _as_tiles(y)
    grid = xt.shape[0] // BLK_R
    out, acc = pl.pallas_call(
        _axpy_normsq_kernel,
        out_shape=(jax.ShapeDtypeStruct(xt.shape, x.dtype),
                   jax.ShapeDtypeStruct((1, 1), x.dtype)),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK_R, LANE), lambda i: (i, 0)),
            pl.BlockSpec((BLK_R, LANE), lambda i: (i, 0)),
        ],
        out_specs=(pl.BlockSpec((BLK_R, LANE), lambda i: (i, 0)),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=interpret,
    )(jnp.asarray([[alpha]], dtype=x.dtype), xt, yt)
    return out.reshape(-1)[:n], acc[0, 0]


# ---------------------------------------------------------------------
# fused double dot: (<x, y>, <y, y>) in one pass (CG's beta/convergence
# pair — the split-phase reduction comb.c role done spatially)
# ---------------------------------------------------------------------

def _dot2_kernel(x_ref, y_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[0, 0] = jnp.zeros((), acc_ref.dtype)
        acc_ref[0, 1] = jnp.zeros((), acc_ref.dtype)

    xv, yv = x_ref[:], y_ref[:]
    acc_ref[0, 0] += jnp.sum(xv * yv)
    acc_ref[0, 1] += jnp.sum(yv * yv)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dot2(x, y, interpret=None):
    interpret = _interpret(x, y) if interpret is None else interpret
    xt, n = _as_tiles(x)
    yt, _ = _as_tiles(y)
    grid = xt.shape[0] // BLK_R
    acc = pl.pallas_call(
        _dot2_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 2), x.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((BLK_R, LANE), lambda i: (i, 0)),
            pl.BlockSpec((BLK_R, LANE), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(xt, yt)
    return acc[0, 0], acc[0, 1]


def streams_triad_bandwidth(n=(1 << 24), dtype=jnp.float32, reps=5):
    """Measured triad bandwidth GB/s (BasicVersion.c / process.py:32
    methodology: 3*n*sizeof / best time)."""
    import time
    b = jnp.ones((n,), dtype)
    c = jnp.full((n,), 2.0, dtype)
    triad(b, c, 3.14).block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        triad(b, c, 3.14).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return 3.0 * n * jnp.dtype(dtype).itemsize / best / 1e9
