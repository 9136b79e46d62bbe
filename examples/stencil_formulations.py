"""Chip experiment: single-pass 27-tap stencil formulations (round-3
VERDICT item 1).

The round-2 dnd mult applies 27 dynamic slices of a padded x — XLA fuses
the arithmetic but re-reads x per tap (~29-pass HBM traffic, 38-73% of
roofline depending on folding). Candidates measured here:

  A  current: 27 shifted slices, constant-folded scalars
  B  separable: y = (cd-co)*x + co*Bz(By(Bx x)) with 1-D 3-tap box
     filters (valid whenever all 26 off-diagonal coefficients are equal —
     the bench_kspsolve.c operator)
  C  z-scan fused: lax.scan over z-planes carrying 2-D 9-tap plane sums
     in VMEM; reads x once, writes y once (the classic streaming-stencil
     schedule)
  Av current with 27 per-offset coefficient PLANES (variable-coefficient)
  Cv z-scan variable: coefficient slab (27, ny, nx) read once per plane,
     x planes carried — x traffic drops 27x, coef traffic (the floor)
     unchanged

Methodology identical to bench.py: K-differenced jitted fori_loop, best
of pairs, device-generated operands (nothing crosses the tunnel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import petsc_tpu as pt

pt.init(args=[])

N = 128
CD, CO = 26.0, -1.0
DT = jnp.float64


def timed_rate(f, nnz, pairs=((3, 103), (3, 403))):
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
            rate = nnz / per / 1e9
        if t_hi > 4 * t_lo:
            break
    return rate


OFFS = [(dz, dy, dx) for dz in (-1, 0, 1) for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)]
NNZ = sum((N - abs(a)) * (N - abs(b)) * (N - abs(c)) for a, b, c in OFFS)


def mult_A(x):
    v = x.reshape(N, N, N)
    vp = jnp.pad(v, 1)
    acc = jnp.zeros((N, N, N), x.dtype)
    for dz, dy, dx in OFFS:
        c = CD if (dz, dy, dx) == (0, 0, 0) else CO
        acc = acc + c * jax.lax.dynamic_slice(
            vp, (1 + dz, 1 + dy, 1 + dx), (N, N, N))
    return acc.reshape(-1)


def box1d(v, ax):
    pads = [(0, 0)] * 3
    pads[ax] = (1, 1)
    vp = jnp.pad(v, pads)
    return (jax.lax.slice_in_dim(vp, 0, N, axis=ax)
            + jax.lax.slice_in_dim(vp, 1, N + 1, axis=ax)
            + jax.lax.slice_in_dim(vp, 2, N + 2, axis=ax))


def mult_B(x):
    v = x.reshape(N, N, N)
    s = box1d(box1d(box1d(v, 2), 1), 0)
    return ((CD - CO) * v + CO * s).reshape(-1)


def boxsum2d(p):
    # p: (ny, nx) plane; 9-tap sum with zero boundary
    q = box1d_2(p, 0)
    return box1d_2(q, 1)


def box1d_2(p, ax):
    pads = [(0, 0), (0, 0)]
    pads[ax] = (1, 1)
    pp = jnp.pad(p, pads)
    return (jax.lax.slice_in_dim(pp, 0, N, axis=ax)
            + jax.lax.slice_in_dim(pp, 1, N + 1, axis=ax)
            + jax.lax.slice_in_dim(pp, 2, N + 2, axis=ax))


def mult_C(x):
    v = x.reshape(N, N, N)
    zplane = jnp.zeros((N, N), x.dtype)
    xs = jnp.concatenate([v[1:], zplane[None]], axis=0)

    def step(carry, x_next):
        p_prev, p_cur, x_cur = carry
        p_next = boxsum2d(x_next)
        out = (CD - CO) * x_cur + CO * (p_prev + p_cur + p_next)
        return (p_cur, p_next, x_next), out

    init = (zplane, boxsum2d(v[0]), v[0])
    _, y = jax.lax.scan(step, init, xs)
    return y.reshape(-1)


def mult_Av(x, coef):
    # coef: (27, N, N, N) per-offset planes
    v = x.reshape(N, N, N)
    vp = jnp.pad(v, 1)
    acc = jnp.zeros((N, N, N), x.dtype)
    for k, (dz, dy, dx) in enumerate(OFFS):
        acc = acc + coef[k] * jax.lax.dynamic_slice(
            vp, (1 + dz, 1 + dy, 1 + dx), (N, N, N))
    return acc.reshape(-1)


def mult_Cv(x, cs):
    # z-scan: per output plane k read coefficient slab (27, N, N) once and
    # combine with the three carried x planes shifted in (dy, dx).
    # cs is PRE-TRANSPOSED to (N_z, 27, N, N) at operator-build time —
    # transposing inside the mult would re-stream the full 453 MB array.
    v = x.reshape(N, N, N)
    zplane = jnp.zeros((N, N), x.dtype)
    xs = jnp.concatenate([v[1:], zplane[None]], axis=0)

    def shifted(p, dy, dx):
        pp = jnp.pad(p, 1)
        return jax.lax.dynamic_slice(pp, (1 + dy, 1 + dx), (N, N))

    def step(carry, inp):
        x_prev, x_cur = carry
        x_next, cslab = inp
        planes = (x_prev, x_cur, x_next)
        out = jnp.zeros((N, N), x_cur.dtype)
        for k, (dz, dy, dx) in enumerate(OFFS):
            out = out + cslab[k] * shifted(planes[dz + 1], dy, dx)
        return (x_cur, x_next), out

    _, y = jax.lax.scan(step, (zplane, v[0]), (xs, cs))
    return y.reshape(-1)


def make_mult_Sv(cz):
    # slab-blocked variable-coef: per z-chunk the padded x slab
    # ((cz+2) x (N+2)^2, ~2.4 MB at cz=16) is materialized once and all 27
    # taps read it from VMEM; coefficient planes stream from HBM exactly
    # once. Cuts x traffic 27x vs Av without scan-per-plane overhead.
    def mult_Sv(x, coef):
        v = x.reshape(N, N, N)
        vp = jnp.pad(v, 1)

        def body(ci, acc):
            z0 = ci * cz
            xc = jax.lax.dynamic_slice(
                vp, (z0, 0, 0), (cz + 2, N + 2, N + 2))
            cc = jax.lax.dynamic_slice(coef, (0, z0, 0, 0), (27, cz, N, N))
            a = jnp.zeros((cz, N, N), x.dtype)
            for k, (dz, dy, dx) in enumerate(OFFS):
                a = a + cc[k] * jax.lax.dynamic_slice(
                    xc, (1 + dz, 1 + dy, 1 + dx), (cz, N, N))
            return jax.lax.dynamic_update_slice(acc, a, (z0, 0, 0))

        out = jax.lax.fori_loop(0, N // cz, body,
                                jnp.zeros((N, N, N), x.dtype))
        return out.reshape(-1)
    return mult_Sv


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(N ** 3), DT)

    # correctness cross-check at the full size (device-to-device)
    yA = mult_A(x)
    for name, f in (("B", mult_B), ("C", mult_C)):
        err = float(jnp.max(jnp.abs(f(x) - yA)) / jnp.max(jnp.abs(yA)))
        print(f"check {name}: rel err {err:.2e}")
        assert err < 1e-13, (name, err)

    # variable-coef checks: masked constant planes reproduce A exactly
    def masks():
        idx = jnp.arange(N)
        m = []
        for dz, dy, dx in OFFS:
            ok = jnp.ones((N, N, N), DT)
            for ax, o in ((0, dz), (1, dy), (2, dx)):
                okv = ((idx + o >= 0) & (idx + o < N)).astype(DT)
                shp = [1, 1, 1]
                shp[ax] = N
                ok = ok * okv.reshape(shp)
            c = CD if (dz, dy, dx) == (0, 0, 0) else CO
            m.append(c * ok)
        return jnp.stack(m)

    coef = masks()
    coef_t = jnp.moveaxis(coef, 1, 0)  # (N_z, 27, N, N) storage layout
    for name, f, c in (("Av", mult_Av, coef), ("Cv", mult_Cv, coef_t)):
        err = float(jnp.max(jnp.abs(f(x, c) - yA)) / jnp.max(jnp.abs(yA)))
        print(f"check {name}: rel err {err:.2e}")
        assert err < 1e-13, (name, err)

    def bench_const(f):
        def loop(x, K):
            return jnp.sum(jax.lax.fori_loop(
                0, K, lambda i, v: f(v) * 1e-2, x))
        jf = jax.jit(loop)
        return timed_rate(lambda K: jf(x, K), NNZ)

    def bench_var(f, c):
        def loop(x, c, K):
            return jnp.sum(jax.lax.fori_loop(
                0, K, lambda i, v: f(v, c) * 1e-2, x))
        jf = jax.jit(loop)
        return timed_rate(lambda K: jf(x, c, K), NNZ)

    for cz in (8, 16, 32):
        f = make_mult_Sv(cz)
        err = float(jnp.max(jnp.abs(f(x, coef) - yA)) / jnp.max(jnp.abs(yA)))
        assert err < 1e-13, (cz, err)

    for name, r in (("B  separable const     ", bench_const(mult_B)),
                    ("Av 27-slice var-coef   ", bench_var(mult_Av, coef)),
                    ("Sv8  slab var-coef     ", bench_var(make_mult_Sv(8), coef)),
                    ("Sv16 slab var-coef     ", bench_var(make_mult_Sv(16), coef)),
                    ("Sv32 slab var-coef     ", bench_var(make_mult_Sv(32), coef))):
        print(f"{name}: {r:8.1f} Gnnz/s")


if __name__ == "__main__":
    main()
