"""Fifth probe: is the production-vs-synthetic per-iteration gap the
While-loop trip-count pipelining effect?

XLA:TPU can double-buffer/pipeline While bodies with KNOWN trip counts
(lax.fori_loop with static bounds); a data-dependent condition (the
Krylov convergence check) defeats it, serializing HBM traffic with
compute.  This probe runs the IDENTICAL synthetic CG body twice — once
under fori_loop(0, K) and once under while_loop with a dynamic
(convergence-shaped) condition — and K-differences both.

Run: python examples/iter_profile5.py -n 128 -pc_mg_dtype single
"""

import json
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
    from petsc_tpu.ops import operator
    from petsc_tpu.ops.reduce import fdot
    opts = pt.options()
    n = opts.get_int("n", default=128)
    N = n ** 3
    from examples.solve_probe import build_operators
    A, Pm = build_operators(n, "star")
    ksp = pt.KSP().create()
    ksp.setOperators(A, Pm)
    ksp.setType("cg")
    pc = ksp.getPC()
    pc.setType("gamg")
    pc.setFromOptions()
    t0 = time.perf_counter()
    pc.setUp()
    print(f"setup {time.perf_counter()-t0:.1f} s", flush=True)
    meta, Ameta = pc.meta, A.meta
    Pd, Ad = pc.device_data(), A.device_data()
    v = jnp.ones((A.row_layout.Npad,))
    out = {"n": n}

    def body_of(data):
        Adata, Pdata = data

        def body(s):
            x, r, p, beta, i = s
            w = operator.bind(Ameta, Adata).mult(p)
            a = beta / fdot(p, w)
            x = x + a * p
            r = r - a * w
            z = operator.bind(meta, Pdata).mult(r)
            bn = fdot(z, r)
            p = z + (bn / beta) * p
            return (x, r, p, bn, i + 1)
        return body

    def s0():
        return (jnp.zeros_like(v), v, v, jnp.asarray(1.0),
                jnp.asarray(0, jnp.int32))

    def run_fori(data, K):
        b = body_of(data)
        return jnp.sum(jax.lax.fori_loop(
            0, K, lambda i, s: b(s), s0())[0])

    def run_while(data, K):
        b = body_of(data)
        # dynamic, convergence-shaped condition (beta is data-dependent)
        def cond(s):
            return (s[3] > 1e-300) & (s[4] < K)
        return jnp.sum(jax.lax.while_loop(cond, b, s0())[0])

    for tag, fn in (("fori", run_fori), ("while_dyn", run_while)):
        f = jax.jit(fn, static_argnums=1)
        float(f((Ad, Pd), 2))
        ts = {}
        for K in (5, 15):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(f((Ad, Pd), K))
                best = min(best, time.perf_counter() - t0)
            ts[K] = best
        out[f"per_it_ms_{tag}"] = round((ts[15] - ts[5]) / 10 * 1e3, 2)
        print(f"[{tag}] per-it {out[f'per_it_ms_{tag}']} ms", flush=True)
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main()
