"""Fourth probe: time the REAL compiled CG+GAMG solver function (the
exact executable ksp.solve dispatches) by max_it differencing, with
variants, to locate the ~46 ms/it gap between the synthetic CG body
(19.5 ms, iter_profile3) and the measured in-solve cost (65 ms,
iter_profile2):

  a) real cfg (PRECONDITIONED norm)         — the production program
  b) normtype NONE (no _dp/check_converged) — convergence machinery cost
  c) converged_maxits, rtol 0               — same loop, no early exit

Run: python examples/iter_profile4.py -n 256 -pc_mg_dtype single
"""

import json
import sys
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import petsc_tpu as pt


def timed_fn(fn, mkargs, reps=3):
    import jax
    res = fn(*mkargs())                   # compile + warm
    jax.block_until_ready(res)
    best = float("inf")
    for _ in range(reps):
        args = mkargs()                   # fresh x0: arg 3 is DONATED
        t0 = time.perf_counter()
        res = fn(*args)
        jax.block_until_ready(res)
        best = min(best, time.perf_counter() - t0)
    return best, res


def main(argv=None):
    pt.init(args=argv if argv is not None else sys.argv[1:])
    import jax
    import jax.numpy as jnp
    from petsc_tpu.ksp.ksp import _compiled_solver
    from petsc_tpu.ksp.common import KSPConfig
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
    import time as _t
    _t0 = _t.perf_counter()
    pc.setUp()
    print(f"setup {_t.perf_counter()-_t0:.1f} s", flush=True)
    out = {"n": n}
    b = jnp.ones(N)
    Ad, Pd = A.device_data(), pc.device_data()

    for tag, normtype in (("precond", "preconditioned"),
                          ("nonorm", "none")):
        per = {}
        for m in (5, 15):
            cfg = KSPConfig(max_it=m, normtype=normtype,
                            guess_nonzero=False)
            print(f"[{tag}] compiling max_it={m} ...", flush=True)
            fn = _compiled_solver("cg", A.meta, pc.meta, cfg)
            t, res = timed_fn(
                fn, lambda: (Ad, Pd, b, jnp.zeros_like(b),
                             1e-30, 0.0, 1e12))
            per[m] = t
            print(f"[{tag}] max_it={m}: {t:.3f} s "
                  f"(its={int(res.its)})", flush=True)
        out[f"per_it_ms_{tag}"] = round((per[15] - per[5]) / 10 * 1e3, 2)
        out[f"fixed_ms_{tag}"] = round(
            (per[5] - 5 * (per[15] - per[5]) / 10) * 1e3, 1)
        print(f"[{tag}] per-it {out[f'per_it_ms_{tag}']} ms, fixed "
              f"{out[f'fixed_ms_{tag}']} ms", flush=True)
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main()
