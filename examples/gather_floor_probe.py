"""Chip probe: is there ANY fast gather on this TPU? (round-5 basis for
the gather-class SpMV ceiling documented in PERF.md.)

Measured 2026-08-20 on the v5e chip (forced scalar fetches — through
the dev tunnel `block_until_ready` can return without waiting; always
time with `float(...)` like bench.py):

    XLA 2-D per-lane gather (take_along_axis axis=0), f32: 0.13 Gelem/s
    same, f64:                                            0.05 Gelem/s
    XLA element gather x[idx] (pallas_gather_probe.py):  ~0.033 Gelem/s
    Pallas in-kernel 1-D jnp.take:        NotImplementedError (2-D only)
    Pallas 64-bit refs:                   NotImplementedError
    one-hot lane select (f32):            ~0.26 ns/slot (the fast pick)

Every gather route lands in the 0.03-0.13 Gelem/s class, so per-nnz
gather formulations cap near 0.1 Gnnz/s and the gather-free one-hot
select (slots >= J*m) is the only fast alternative — the quantitative
ceiling for structureless matrices (rand-band class) on this machine.
"""
import sys
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import petsc_tpu as pt


def main(argv=None):
    pt.init(args=argv if argv is not None else sys.argv[1:])
    import jax
    import jax.numpy as jnp
    m2 = 3907                        # 500k elements per apply
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, m2, (m2, 128), dtype=np.int32))
    for dt in (jnp.float32, jnp.float64):
      try:
        val = jnp.asarray(rng.random((m2, 128)), dt)
        x = jnp.asarray(rng.random((m2, 128)), dt)

        def loop(x, idx, val, K):
            # single-carry feedback: every iteration re-gathers from the
            # evolving x (hoist-proof), output folds to one scalar
            return jnp.sum(jax.lax.fori_loop(
                0, K,
                lambda k, w: val * jnp.take_along_axis(w, idx, axis=0)
                * jnp.asarray(1e-3, dt) + w * jnp.asarray(0.9, dt), x))

        jf = jax.jit(loop)
        float(jf(x, idx, val, np.int32(3)))
        ts = {}
        for K in (100, 900):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(jf(x, idx, val, np.int32(K)))
                best = min(best, time.perf_counter() - t0)
            ts[K] = best
        per = (ts[900] - ts[100]) / 800
        print(f"per-lane take_along_axis {np.dtype(dt).name}: "
              f"{m2 * 128 / max(per, 1e-12) / 1e9:.2f} Gelem/s "
              f"({'measured' if ts[900] > 1.5 * ts[100] else 'LB'})",
              flush=True)
      except Exception as e:  # noqa: BLE001 — probe must report, not die
        print(f"per-lane take_along_axis {np.dtype(dt).name}: FAILED "
              f"{type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
