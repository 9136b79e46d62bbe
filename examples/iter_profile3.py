"""Third probe: why does the f32 V-cycle cost ~11 ms back-to-back but
~59 ms inside the compiled CG loop?

Hypothesis under test: in the back-to-back K-loop the trailing
f32->f64 output cast and next iteration's f64->f32 input cast cancel
(XLA folds the exact f32->f64->f32 convert pair), so the measured
chain is ALL-f32 — flattering.  Inside CG the loop state (x, r, p) is
genuinely f64, so every iteration pays the real mixed-precision
boundary.  Here we K-loop the cycle with an f64 update between applies
(w <- w - 1e-3 z) to reproduce the in-solve pattern, and also K-loop a
full synthetic CG body for cross-checking against the max_it
differencing.

Run: python examples/iter_profile3.py -n 256 -pc_mg_dtype single
"""

import json
import sys
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import petsc_tpu as pt


def kdiff2(make_body, data, u0, label, pairs=((2, 12), (2, 42))):
    import jax
    import jax.numpy as jnp

    def loop(data, u, K):
        out = jax.lax.fori_loop(0, K, make_body(data), u)
        return jnp.sum(out[0] if isinstance(out, tuple) else out)

    f = jax.jit(loop, static_argnums=2)
    float(f(data, u0, 2))
    per = None
    th = None
    for lo, hi in pairs:
        tl = th = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); float(f(data, u0, lo))
            tl = min(tl, time.perf_counter() - t0)
            t0 = time.perf_counter(); float(f(data, u0, hi))
            th = min(th, time.perf_counter() - t0)
        if th > 1.5 * tl:
            per = (th - tl) / (hi - lo)
            break
    if per is None:
        per = th / hi
    print(f"{label}: {per*1e3:.3f} ms", flush=True)
    return per * 1e3


def main(argv=None):
    pt.init(args=argv if argv is not None else sys.argv[1:])
    import jax
    import jax.numpy as jnp
    from petsc_tpu.ops import operator
    from petsc_tpu.ops.reduce import fdot
    opts = pt.options()
    n = opts.get_int("n", default=256)
    N = n ** 3
    from examples.solve_probe import build_operators
    A, Pm = build_operators(n, "star")
    ksp = pt.KSP().create()
    ksp.setOperators(A, Pm)
    ksp.setType("cg")
    pc = ksp.getPC()
    pc.setType("gamg")
    pc.setFromOptions()
    pc.setUp()
    meta = pc.meta
    print("cycle dtype flag:", meta[4], flush=True)
    d0 = pc.device_data()
    v = jnp.ones((A.row_layout.Npad,))
    out = {"n": n, "dtype_flag": meta[4]}

    # 1) pure back-to-back (cast pair foldable)
    out["cycle_pure_ms"] = kdiff2(
        lambda data: (lambda i, w: operator.bind(meta, data).mult(w)
                      * 1e-2),
        d0, v, "cycle back-to-back (foldable casts)")

    # 2) with a genuine f64 update between applies (in-CG pattern)
    def mk_f64chain(data):
        def body(i, carry):
            w, z = carry
            z = operator.bind(meta, data).mult(w)
            w = w - 1e-3 * z          # stays f64: real boundary each it
            return (w, z)
        return body

    out["cycle_f64chain_ms"] = kdiff2(
        mk_f64chain, d0, (v, jnp.zeros_like(v)),
        "cycle with f64 carry (in-CG pattern)")

    # 3) synthetic full CG body (no convergence logic)
    Ameta = A.meta
    Ad = A.device_data()

    def mk_cg(data):
        Adata, Pdata = data

        def body(i, s):
            x, r, p, beta = s
            Aop = operator.bind(Ameta, Adata)
            Bop = operator.bind(meta, Pdata)
            w = Aop.mult(p)
            a = beta / fdot(p, w)
            x = x + a * p
            r = r - a * w
            z = Bop.mult(r)
            beta_new = fdot(z, r)
            p = z + (beta_new / beta) * p
            return (x, r, p, beta_new)
        return body

    s0 = (jnp.zeros_like(v), v, v, jnp.asarray(1.0))
    out["cgbody_ms"] = kdiff2(mk_cg, (Ad, d0), s0,
                              "synthetic CG body")
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main()
