"""Chip probe: can a Pallas TPU kernel gather from VMEM-resident x faster
than the ~0.1 Gelem/s XLA gather floor (csr_formulations.py probes)?

Three kernel variants, all keeping the 500k-element x fully VMEM-resident
(x is ~2-4 MB; v5e VMEM is far larger) and streaming the index/data arrays
through the grid:

  G1  jnp.take inside the kernel on the flattened x block
  G2  one-hot contraction within a 128-wide lane window (no gather at all:
      idx decomposed as 128*q + s; rows pre-bucketed by q on the host so
      each grid step's block reads one rolled x view and contracts an
      iota==s one-hot over lanes)  -- pure VPU, measures the no-gather
      alternative's real rate
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
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


def probe_g1(dt, n=524_288, m=4_194_304, C=65_536):
    """jnp.take of a VMEM-resident x inside a pallas kernel."""
    rng = np.random.default_rng(0)
    x = (0.5 + (jnp.arange(n) % 1000) / 1000.0).astype(dt)
    idx = jnp.asarray(rng.integers(0, n, m, dtype=np.int32))

    def kernel(x_ref, idx_ref, o_ref):
        xv = x_ref[...].reshape(-1)
        iv = idx_ref[...].reshape(-1)
        o_ref[...] = jnp.take(xv, iv, axis=0).reshape(o_ref.shape)

    x2 = x.reshape(-1, 128)
    idx2 = idx.reshape(-1, 128)
    grid = m // C

    f = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((n // 128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C // 128, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C // 128, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m // 128, 128), dt),
    )

    y0 = f(x2, idx2)
    ref = x[idx].reshape(-1, 128)
    err = float(jnp.max(jnp.abs(y0 - ref)))
    assert err == 0.0, err

    def loop(x2, idx2, K):
        def body(i, v):
            y = f(v, idx2)
            return v * 0.5 + jnp.zeros_like(v).at[0, 0].set(
                jnp.sum(y) * 1e-12) + 0.5
        return jnp.sum(jax.lax.fori_loop(0, K, body, x2))

    jf = jax.jit(loop)
    r = timed_rate(lambda K: jf(x2, idx2, K), m)
    print(f"G1 pallas VMEM take  {np.dtype(dt).name}: {r:8.3f} Gelem/s",
          flush=True)


def probe_g2(dt, n=524_288, m=4_194_304):
    """One-hot lane contraction: no gather anywhere.

    Model: every gathered element is x[128*q + s].  Pretend rows are
    pre-bucketed so q is the block row and only s varies: per 128-slot
    group contract onehot(s) against the x row.  Measures the pure-VPU
    cost of replacing one gathered element by a 128-wide masked sum.
    """
    rng = np.random.default_rng(1)
    B = n // 128
    G = m // 128  # one x-row reused per 128 outputs
    qs = jnp.asarray(rng.integers(0, B, G, dtype=np.int32))
    ss = jnp.asarray(rng.integers(0, 128, (G, 128), dtype=np.int32))
    x2 = (0.5 + (jnp.arange(n) % 1000) / 1000.0).astype(dt).reshape(B, 128)

    lane = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)

    def apply(x2):
        rows = x2[qs]                      # (G, 128) block gather
        oh = (ss[:, :, None] == lane[None, 0, :, None].squeeze(-1)).astype(dt)
        return jnp.einsum("gps,gs->gp", oh, rows)

    def apply_nogather(x2):
        # q also folded away: use rolled x rows (stand-in: x2 tiled) so the
        # measurement isolates the one-hot contraction cost itself.
        rows = jnp.broadcast_to(x2[:1], (G, 128))
        oh = (ss[:, :, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (G, 128, 128), 2)).astype(dt)
        return jnp.einsum("gps,gs->gp", oh, rows)

    for name, fn in (("G2 blockgather+onehot", apply),
                     ("G3 onehot only       ", apply_nogather)):
        def loop(x2, K, fn=fn):
            def body(i, v):
                y = fn(v)
                return v * 0.5 + jnp.zeros_like(v).at[0, 0].set(
                    jnp.sum(y) * 1e-12) + 0.5
            return jnp.sum(jax.lax.fori_loop(0, K, body, x2))
        jf = jax.jit(loop)
        r = timed_rate(lambda K: jf(x2, K), m)
        print(f"{name} {np.dtype(dt).name}: {r:8.3f} Gelem/s", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    import petsc_tpu as pt
    pt.init(args=[])
    for dt in (jnp.float32, jnp.float64):
        if which in ("all", "g1"):
            try:
                probe_g1(dt)
            except Exception as e:  # noqa: BLE001
                print(f"G1 {np.dtype(dt).name}: FAILED "
                      f"({type(e).__name__}: {str(e)[:200]})", flush=True)
        if which in ("all", "g2"):
            try:
                probe_g2(dt)
            except Exception as e:  # noqa: BLE001
                print(f"G2 {np.dtype(dt).name}: FAILED "
                      f"({type(e).__name__}: {str(e)[:200]})", flush=True)


if __name__ == "__main__":
    main()
