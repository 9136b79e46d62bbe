"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import jax.numpy as jnp

from petsc_tpu.ops import pallas_kernels as pk


def test_triad():
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.random(70000), dtype=jnp.float32)
    c = jnp.asarray(rng.random(70000), dtype=jnp.float32)
    out = pk.triad(b, c, 2.5)
    assert np.allclose(np.asarray(out), np.asarray(b) + 2.5 * np.asarray(c),
                       atol=1e-5)


def test_axpy_normsq():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random(100000), dtype=jnp.float32)
    y = jnp.asarray(rng.random(100000), dtype=jnp.float32)
    out, nsq = pk.axpy_normsq(0.7, x, y)
    ref = np.asarray(y) + 0.7 * np.asarray(x)
    assert np.allclose(np.asarray(out), ref, atol=1e-5)
    assert abs(float(nsq) - float(np.dot(ref, ref))) < 1e-2 * np.dot(ref, ref) ** 0.5 + 1.0


def test_dot2():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random(80000), dtype=jnp.float32)
    y = jnp.asarray(rng.random(80000), dtype=jnp.float32)
    d1, d2 = pk.dot2(x, y)
    assert abs(float(d1) - float(np.dot(x, y))) < 1.0
    assert abs(float(d2) - float(np.dot(y, y))) < 1.0
