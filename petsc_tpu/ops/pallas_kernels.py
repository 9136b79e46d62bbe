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


_COMPILED_OK = None


def pallas_compiled_available():
    """One-time probe: can this runtime compile a gridded Mosaic kernel?

    Compiled Mosaic requires tracing with x64 DISABLED: with the
    framework's global f64 default on, BlockSpec index maps emit i64
    grid indices and Mosaic fails to legalize `func.return (i32, i64)`
    (measured 2026-08-17 on the axon tunnel's TpuAotCompiler).  The
    production wrappers therefore trace the f32 kernels under
    jax.enable_x64(False); this probe verifies that path end-to-end
    once and caches the verdict.  Off-TPU the answer is always False
    (interpret mode is the CPU test path)."""
    global _COMPILED_OK
    if _COMPILED_OK is None:
        if jax.default_backend() != "tpu":
            _COMPILED_OK = False
        else:
            try:
                def _probe(x_ref, o_ref):
                    o_ref[:] = x_ref[:] + 1.0
                x = jnp.zeros((2 * 8, LANE), jnp.float32)
                with jax.enable_x64(False):
                    out = pl.pallas_call(
                        _probe,
                        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                        grid=(2,),
                        in_specs=[pl.BlockSpec((8, LANE), lambda i: (i, 0))],
                        out_specs=pl.BlockSpec((8, LANE), lambda i: (i, 0)),
                    )(x)
                out.block_until_ready()
                _COMPILED_OK = True
            except Exception:
                _COMPILED_OK = False
    return _COMPILED_OK


def _interpret(*arrs):
    """Kernel execution policy (auto, no flags):
      - off-TPU: interpret (tests/virtual CPU meshes);
      - on TPU with 64-bit inputs: interpret — Mosaic has no 64-bit
        element types, and f64 is this framework's default precision;
      - on TPU with 32-bit inputs: compiled Mosaic iff the runtime can
        compile it (pallas_compiled_available probe).
    The numerics are identical either way — XLA's fused jnp path is the
    production fallback and is already near roofline for these BLAS-1
    shapes (PERF.md)."""
    if jax.default_backend() not in ("tpu",):
        return True
    if any(jnp.asarray(a).dtype.itemsize > 4 for a in arrs):
        return True
    return not pallas_compiled_available()


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


def _x64_guard(interpret):
    """Compiled Mosaic must trace with x64 off (see
    pallas_compiled_available); interpret mode keeps the caller's
    setting so f64 CPU tests stay exact."""
    import contextlib
    return contextlib.nullcontext() if interpret else jax.enable_x64(False)


def triad(b, c, alpha, interpret=None):
    interpret = _interpret(b, c) if interpret is None else interpret
    with _x64_guard(interpret):
        return _triad(b, c, alpha, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _triad(b, c, alpha, interpret):
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


def axpy_normsq(alpha, x, y, interpret=None):
    """y + alpha*x and ||y + alpha*x||^2 in ONE pass over HBM."""
    interpret = _interpret(x, y) if interpret is None else interpret
    with _x64_guard(interpret):
        return _axpy_normsq(alpha, x, y, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _axpy_normsq(alpha, x, y, interpret):
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


def dot2(x, y, interpret=None):
    interpret = _interpret(x, y) if interpret is None else interpret
    with _x64_guard(interpret):
        return _dot2(x, y, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dot2(x, y, interpret):
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
