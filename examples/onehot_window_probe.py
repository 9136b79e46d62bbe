"""Chip probe: 128-lane one-hot select rate (the unstructured SpMV core).

Design: nonzero column c = 128*q + s.  Row gather x2[q] from the
VMEM-resident (B,128) x view is ~free (pallas_gather_probe G2 vs G3);
the lane pick is a one-hot contraction over the 128 lanes.  This probe
measures the achievable Gnnz/s of that formulation, chunked via lax.map
so intermediates stay ~64 MB.

Windows narrower than 128 are NOT probed: TPU tiles are (8,128), so an
(B, W<128) row is not lane-contiguous and the row gather degenerates.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp


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


def probe(dt, n=524_288, m=500_000, K=16, C=8_192):
    rng = np.random.default_rng(0)
    B = n // 128
    mp = -(-m // C) * C
    q = jnp.asarray(rng.integers(0, B, (mp, K), dtype=np.int32))
    s = jnp.asarray(rng.integers(0, 128, (mp, K), dtype=np.int32))
    d = jnp.asarray(rng.standard_normal((mp, K)), dtype=dt)
    x2 = (0.5 + (jnp.arange(n) % 1000) / 1000.0).astype(dt).reshape(B, 128)
    nchunk = mp // C
    qc = q.reshape(nchunk, C, K)
    sc = s.reshape(nchunk, C, K)
    dc = d.reshape(nchunk, C, K)

    def spmv(x2):
        def chunk(args):
            qq, ss, dd = args
            rows = x2[qq]                                    # (C, K, 128)
            oh = (ss[..., None] == jax.lax.broadcasted_iota(
                jnp.int32, (C, K, 128), 2))
            g = jnp.sum(jnp.where(oh, rows, 0), axis=2)      # (C, K)
            return jnp.sum(dd * g, axis=1)
        return jax.lax.map(chunk, (qc, sc, dc)).reshape(-1)[:m]

    y = np.asarray(jax.device_get(spmv(x2)[:4096]))
    xf = np.asarray(jax.device_get(x2)).reshape(-1)
    qn, sn, dn = (np.asarray(jax.device_get(a))[:4096] for a in (q, s, d))
    yref = np.sum(dn * xf[qn * 128 + sn], axis=1)
    err = np.max(np.abs(y - yref)) / max(np.max(np.abs(yref)), 1e-30)
    assert err < 1e-5, err
    print(f"  correctness ok ({np.dtype(dt).name})", flush=True)

    def loop(x2, K_):
        def body(i, v):
            y = spmv(v)
            return v * 0.5 + jnp.zeros_like(v).at[0, 0].set(
                jnp.sum(y) * 1e-12) + 0.5
        return jnp.sum(jax.lax.fori_loop(0, K_, body, x2))
    jf = jax.jit(loop)
    r = timed_rate(lambda K_: jf(x2, K_), m * K)
    print(f"onehot128 {np.dtype(dt).name}: {r:8.3f} Gnnz/s", flush=True)


def main():
    import petsc_tpu as pt
    pt.init(args=[])
    for dt in (jnp.float32, jnp.float64):
        try:
            probe(dt)
        except Exception as e:  # noqa: BLE001
            print(f"{np.dtype(dt).name}: FAILED "
                  f"({type(e).__name__}: {str(e)[:150]})", flush=True)


if __name__ == "__main__":
    main()
