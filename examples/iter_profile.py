"""Per-iteration anatomy of the CG+GAMG solve on the chip.

The scale artifacts (SCALE_r04.json) time one warm solve; the V-cycle
and SpMV numbers in PERF.md are back-to-back K-differenced applies.
Neither isolates what ONE Krylov iteration costs INSIDE the compiled
while_loop (data dependencies break the pipelining the K-loop enjoys).
This probe max_it-differences the whole solve — two fixed iteration
budgets m1 < m2 at rtol ~ 0, warm-timed, (t2 - t1)/(m2 - m1) — which
cancels dispatch latency and start-up exactly, and compares against
the component sum (fine SpMV + V-cycle + dots/axpys).

Run: python examples/iter_profile.py -n 256 [-pc_mg_dtype single]
"""

import json
import sys
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import petsc_tpu as pt


def warm_timed_solve(ksp, b_arr, N, max_it):
    import jax
    import jax.numpy as jnp
    ksp.setTolerances(rtol=1e-30, atol=0.0, max_it=max_it)
    x = pt.Vec.from_array(jnp.zeros(N))
    b = pt.Vec.from_array(b_arr)
    ksp.solve(b, x)                      # compile + warm this max_it
    best = float("inf")
    for _ in range(3):
        x.set(0.0)
        b = pt.Vec.from_array(b_arr)
        t0 = time.perf_counter()
        ksp.solve(b, x)
        jax.block_until_ready(x.array)
        best = min(best, time.perf_counter() - t0)
    return best


def main(argv=None):
    pt.init(args=argv if argv is not None else sys.argv[1:])
    import jax
    import jax.numpy as jnp
    opts = pt.options()
    n = opts.get_int("n", default=256)
    N = n ** 3
    from examples.solve_probe import build_operators, timed_apply
    A, Pm = build_operators(n, "star")
    out = {"n": n, "backend": jax.devices()[0].platform}

    b_arr = jnp.ones(N)

    # --- per-iteration CG+Jacobi (the bandwidth yardstick) ---
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    tj1 = warm_timed_solve(ksp, b_arr, N, 5)
    tj2 = warm_timed_solve(ksp, b_arr, N, 25)
    out["jacobi_per_it_ms"] = round((tj2 - tj1) / 20 * 1e3, 3)
    out["jacobi_dispatch_ms"] = round((tj1 - 5 * (tj2 - tj1) / 20) * 1e3, 1)
    print(f"CG+Jacobi per-it {out['jacobi_per_it_ms']} ms, "
          f"fixed overhead {out['jacobi_dispatch_ms']} ms", flush=True)

    # --- per-iteration CG+GAMG ---
    ksp = pt.KSP().create()
    ksp.setOperators(A, Pm)
    ksp.setType("cg")
    pc = ksp.getPC()
    pc.setType("gamg")
    pc.setFromOptions()
    t0 = time.perf_counter()
    pc.setUp()
    out["pcsetup_s"] = round(time.perf_counter() - t0, 1)
    out["levels"] = [(l.A.meta[0], l.A.getSize()[0])
                     for l in pc._impl.levels]
    print(f"PCSetUp {out['pcsetup_s']} s; levels {out['levels']}",
          flush=True)
    tg1 = warm_timed_solve(ksp, b_arr, N, 5)
    tg2 = warm_timed_solve(ksp, b_arr, N, 15)
    out["gamg_per_it_ms"] = round((tg2 - tg1) / 10 * 1e3, 3)
    out["gamg_dispatch_ms"] = round((tg1 - 5 * (tg2 - tg1) / 10) * 1e3, 1)
    print(f"CG+GAMG per-it {out['gamg_per_it_ms']} ms, "
          f"fixed overhead {out['gamg_dispatch_ms']} ms", flush=True)

    # --- components (back-to-back K-differenced) ---
    v = jnp.ones((A.row_layout.Npad,))
    out["spmv_ms"] = round(
        timed_apply(A.op().mult, v, "fine SpMV") * 1e3, 3)
    out["vcycle_ms"] = round(
        timed_apply(pc.op().mult, v, "V-cycle") * 1e3, 3)
    from petsc_tpu.ops.reduce import fnorm2

    def dot_like(w):
        return w * (fnorm2(w) * 1e-20 + 1.0)

    out["normdep_ms"] = round(
        timed_apply(dot_like, v, "norm+bcast (serialized)") * 1e3, 3)
    comp = out["spmv_ms"] + out["vcycle_ms"]
    print(f"component sum (SpMV + cycle) {comp:.3f} ms vs "
          f"measured per-it {out['gamg_per_it_ms']} ms "
          f"-> {out['gamg_per_it_ms'] / max(comp, 1e-9):.1f}x", flush=True)
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main()
