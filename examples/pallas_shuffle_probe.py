"""Chip probe: in-kernel Mosaic dynamic gathers (the '2D gather' path).

pallas_gather_probe.py G1 failed with 'Only 2D gather is supported' --
so SOME 2D gather lowers inside Mosaic.  Candidates:

  S1  lane shuffle: take_along_axis(V (C,128), s (C,128), axis=1)
      -- each output lane picks an input lane of the same row.  If this
      hits the hardware shuffle unit, a one-hot 128-lane select (0.26
      ns/elem) collapses to ~1 op/elem.
  S2  row gather: jnp.take(x2 (B,128), q (C,), axis=0) in-kernel.
  S3  two-level: rows = take(x2, q, axis=0) then take_along_axis lanes
      = a full unstructured gather x[128q+s] inside VMEM.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp


def x64_off():
    return jax.enable_x64(False)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed_rate(f, nelem, pairs=((3, 13), (3, 53), (3, 203))):
    def timed(K):
        float(f(np.int32(K)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(np.int32(K)))
            best = min(best, time.perf_counter() - t0)
        return best
    rate = 0.0
    for lo, hi in pairs:
        t_lo, t_hi = timed(lo), timed(hi)
        per = (t_hi - t_lo) / (hi - lo)
        if per > 0 and t_hi > 1.5 * t_lo:
            rate = nelem / per / 1e9
        if t_hi > 4 * t_lo:
            break
    return rate


def run_loop(name, f, args, nelem):
    """f(*args) -> array; K-differenced feedback loop on args[0]."""
    def loop(a0, rest, K):
        def body(i, v):
            y = f(v, *rest)
            return v * 0.5 + jnp.zeros_like(v).at[(0,) * v.ndim].set(
                jnp.sum(y) * 1e-12) + 0.5
        return jnp.sum(jax.lax.fori_loop(0, K, body, a0))
    jf = jax.jit(loop)
    r = timed_rate(lambda K: jf(args[0], args[1:], K), nelem)
    print(f"{name}: {r:8.3f} Gelem/s", flush=True)


def probe_s1(dt, C=1_048_576):
    rng = np.random.default_rng(0)
    V = (0.5 + (jnp.arange(C * 128) % 997) / 997.0).astype(dt).reshape(C, 128)
    s = jnp.asarray(rng.integers(0, 128, (C, 128), dtype=np.int32))

    def kernel(v_ref, s_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(v_ref[...], s_ref[...], axis=1)

    BC = 8192
    f = pl.pallas_call(
        kernel,
        grid=(C // BC,),
        in_specs=[pl.BlockSpec((BC, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BC, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BC, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, 128), dt),
    )
    f0 = f
    def f(V, s):
        with x64_off():
            return f0(V, s)
    y = f(V, s)
    ref = jnp.take_along_axis(V, s, axis=1)
    err = float(jnp.max(jnp.abs(y - ref)))
    assert err == 0.0, err
    print(f"  S1 correctness ok ({np.dtype(dt).name})", flush=True)
    run_loop(f"S1 lane shuffle     {np.dtype(dt).name}", f, (V, s), C * 128)


def probe_s2(dt, B=4096, C=1_048_576):
    rng = np.random.default_rng(1)
    x2 = (0.5 + (jnp.arange(B * 128) % 997) / 997.0).astype(dt).reshape(B, 128)
    q = jnp.asarray(rng.integers(0, B, (C,), dtype=np.int32))

    def kernel(x_ref, q_ref, o_ref):
        o_ref[...] = jnp.take(x_ref[...], q_ref[...], axis=0)

    BC = 8192
    f = pl.pallas_call(
        kernel,
        grid=(C // BC,),
        in_specs=[pl.BlockSpec((B, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BC,), lambda i: (i,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BC, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, 128), dt),
    )
    f0 = f
    def f(x2, q):
        with x64_off():
            return f0(x2, q)
    y = f(x2, q)
    ref = jnp.take(x2, q, axis=0)
    err = float(jnp.max(jnp.abs(y - ref)))
    assert err == 0.0, err
    print(f"  S2 correctness ok ({np.dtype(dt).name})", flush=True)
    run_loop(f"S2 row gather       {np.dtype(dt).name}", f, (x2, q),
             C * 128)


def probe_s3(dt, B=4096, C=1_048_576):
    rng = np.random.default_rng(2)
    x2 = (0.5 + (jnp.arange(B * 128) % 997) / 997.0).astype(dt).reshape(B, 128)
    q = jnp.asarray(rng.integers(0, B, (C, 128), dtype=np.int32))
    s = jnp.asarray(rng.integers(0, 128, (C, 128), dtype=np.int32))

    def kernel(x_ref, q_ref, s_ref, o_ref):
        rows = jnp.take(x_ref[...], q_ref[...].reshape(-1), axis=0)
        rows = rows.reshape(q_ref.shape + (128,))
        # lane pick: rows (BC,128,128) take_along_axis on last axis
        g = jnp.take_along_axis(rows, s_ref[...][..., None], axis=2)
        o_ref[...] = g[..., 0]

    BC = 512
    f = pl.pallas_call(
        kernel,
        grid=(C // BC,),
        in_specs=[pl.BlockSpec((B, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BC, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BC, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BC, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, 128), dt),
    )
    f0 = f
    def f(x2, q, s):
        with x64_off():
            return f0(x2, q, s)
    y = f(x2, q, s)
    xf = x2.reshape(-1)
    ref = xf[q * 128 + s]
    err = float(jnp.max(jnp.abs(y - ref)))
    assert err == 0.0, err
    print(f"  S3 correctness ok ({np.dtype(dt).name})", flush=True)
    run_loop(f"S3 full VMEM gather {np.dtype(dt).name}", f, (x2, q, s),
             C * 128)


def main():
    import petsc_tpu as pt
    pt.init(args=[])
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    for dt in (jnp.float32, jnp.float64):
        for nm, fn in (("s1", probe_s1), ("s2", probe_s2), ("s3", probe_s3)):
            if which not in ("all", nm):
                continue
            try:
                fn(dt)
            except Exception as e:  # noqa: BLE001
                print(f"{nm} {np.dtype(dt).name}: FAILED "
                      f"({type(e).__name__}: {str(e)[:160]})", flush=True)


if __name__ == "__main__":
    main()
