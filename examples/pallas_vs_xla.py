"""Compiled Mosaic kernels vs XLA fusion on the real chip (round-2
VERDICT item 5 evidence).

Times K-iteration jitted fori_loops and differences two K values so
tunnel dispatch jitter cancels (bench.py methodology).  Compares the
fused Pallas dot2 / axpy_normsq / triad against their plain-jnp
XLA-fused equivalents at f32.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from petsc_tpu.ops import pallas_kernels as pk


def timed(fn, *args, k_lo=20, k_hi=520, reps=5):
    """Median (t(k_hi) - t(k_lo)) / (k_hi - k_lo) per iteration.

    fn MUST be loop-dependent (each step's inputs derived from the
    previous step's outputs) or XLA hoists it out of the fori_loop."""
    import statistics
    jfn = {}

    for k in (k_lo, k_hi):
        @jax.jit
        def body(args, k=k):
            def step(i, a):
                return fn(*a)
            out = lax.fori_loop(0, k, step, args)
            # reduce to one scalar over ALL elements: float() on it forces
            # execution (the axon tunnel does NOT synchronize on
            # block_until_ready), and full-array dependence stops XLA from
            # slice-propagating a shortcut through the loop
            return sum(jnp.sum(a) for a in jax.tree_util.tree_leaves(out))
        jfn[k] = body
        float(jfn[k](args))  # compile + warm
    deltas = []
    for _ in range(reps):
        ts = {}
        for k in (k_lo, k_hi):
            t0 = time.perf_counter()
            float(jfn[k](args))
            ts[k] = time.perf_counter() - t0
        deltas.append((ts[k_hi] - ts[k_lo]) / (k_hi - k_lo))
    return statistics.median(deltas)


def main():
    n = 1 << 24
    x = jnp.arange(n, dtype=jnp.float32) / n
    y = jnp.ones(n, jnp.float32)
    fb = jnp.float32
    assert pk.pallas_compiled_available(), "no compiled Mosaic available"
    res = {}

    # dot2: (<x,y>, <y,y>) — pallas fused single pass vs XLA.
    # feed the scalars back into y (one identical axpy pass on both
    # sides) so the reduction is loop-dependent and can't be hoisted.
    def xla_dot2(x, y):
        a, b = jnp.vdot(x, y), jnp.vdot(y, y)
        return x, y + 1e-20 * (a + b) * x

    def pal_dot2(x, y):
        a, b = pk._dot2(x, y, False)
        return x, y + 1e-20 * (a + b) * x

    with jax.enable_x64(False):
        t_xla = timed(xla_dot2, x, y)
        t_pal = timed(pal_dot2, x, y)
    # both sides pay the same 3n-word axpy on top of the 2n-word dots
    res["dot2"] = {"xla_us": round(t_xla * 1e6, 1),
                   "pallas_us": round(t_pal * 1e6, 1),
                   "gbps_xla": round(5 * n * 4 / t_xla / 1e9, 1),
                   "gbps_pallas": round(5 * n * 4 / t_pal / 1e9, 1)}

    # triad: a = b + alpha c
    with jax.enable_x64(False):
        t_xla = timed(lambda b, c: (b + 3.0 * c, c), x, y)
        t_pal = timed(lambda b, c: (pk._triad(b, c, 3.0, False), c), x, y)
    res["triad"] = {"xla_us": round(t_xla * 1e6, 1),
                    "pallas_us": round(t_pal * 1e6, 1),
                    "gbps_xla": round(3 * n * 4 / t_xla / 1e9, 1),
                    "gbps_pallas": round(3 * n * 4 / t_pal / 1e9, 1)}

    # axpy+normsq fused (CG update + convergence check in one pass);
    # y <- y - 0.5 x is contracting so the f32 carry stays bounded,
    # and the norm feeds the next alpha so nothing hoists.
    def xla_axpy_normsq(x, y):
        ynew = y - 0.5 * x
        nsq = jnp.vdot(ynew, ynew)
        return x * (1.0 + 1e-20 * nsq), ynew

    def pal_axpy_normsq(x, y):
        ynew, nsq = pk._axpy_normsq(-0.5, x, y, False)
        return x * (1.0 + 1e-20 * nsq), ynew

    with jax.enable_x64(False):
        t_xla = timed(xla_axpy_normsq, x, y)
        t_pal = timed(pal_axpy_normsq, x, y)
    res["axpy_normsq"] = {"xla_us": round(t_xla * 1e6, 1),
                          "pallas_us": round(t_pal * 1e6, 1),
                          "gbps_xla": round(5 * n * 4 / t_xla / 1e9, 1),
                          "gbps_pallas": round(5 * n * 4 / t_pal / 1e9, 1)}

    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main()
