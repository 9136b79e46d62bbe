"""Reduction primitives tuned for TPU f64.

`jnp.vdot`/`jnp.dot` on two vectors lower to dot_general — and with no
f64 MXU on TPU that matmul gets SCALAR-EMULATED: measured 12.6 ms per
inner product on a 2M-element f64 vector (v5e) vs 0.059 ms for the fused
elementwise-multiply + `jnp.sum` VPU reduction — a 200x difference that
dominated every Krylov iteration. All solver inner products go through
fdot/fnorm2 (real arithmetic — the framework's scalar type; reference
VecDot/VecNorm, src/vec/vec/interface/rvector.c)."""

import jax.numpy as jnp


def fdot(a, b):
    """<a, b> for real vectors as a fused multiply + VPU tree-sum."""
    return jnp.sum(a * b)


def fnorm2(a):
    """||a||_2 via fdot (never through dot_general)."""
    return jnp.sqrt(jnp.sum(a * a))


def fgemv(V, w):
    """V @ w for (m, n) x (n,) real Krylov-basis products: broadcast
    multiply + per-row VPU sum (measured 0.20 ms vs 11.5 ms dot_general
    at m=31, n=0.5M f64 on v5e)."""
    return jnp.sum(V * w[None, :], axis=1)


def fgemvT(h, V):
    """h @ V for (m,) x (m, n) real: weighted row combination without
    dot_general."""
    return jnp.sum(h[:, None] * V, axis=0)
