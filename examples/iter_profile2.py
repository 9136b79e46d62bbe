"""Follow-up to iter_profile.py: V-cycle anatomy with the hierarchy
data passed as jit ARGUMENTS (pc.op() closes over it — the literals
blow the tunnel's remote-compile payload limit at 256^3), per-level
timing, and an explicit f64-vs-f32 cycle comparison inside the solve.

Run: python examples/iter_profile2.py -n 256
"""

import json
import sys
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import petsc_tpu as pt


def kdiff(fn, v, data, label, pairs=((2, 12), (2, 42))):
    """K-differenced apply cost with `data` as a jit argument."""
    import jax
    import jax.numpy as jnp

    def loop(data, u, K):
        return jnp.sum(jax.lax.fori_loop(
            0, K, lambda i, w: fn(data, w) * 1e-2, u))

    f = jax.jit(loop, static_argnums=2)
    float(f(data, v, 2))
    per = None
    for lo, hi in pairs:
        tl = th = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); float(f(data, v, lo))
            tl = min(tl, time.perf_counter() - t0)
            t0 = time.perf_counter(); float(f(data, v, hi))
            th = min(th, time.perf_counter() - t0)
        if th > 1.5 * tl:
            per = (th - tl) / (hi - lo)
            break
    if per is None:
        per = th / hi
    print(f"{label}: {per*1e3:.3f} ms per apply", flush=True)
    return per * 1e3


def main(argv=None):
    pt.init(args=argv if argv is not None else sys.argv[1:])
    import jax
    import jax.numpy as jnp
    from petsc_tpu.ops import operator
    opts = pt.options()
    n = opts.get_int("n", default=256)
    N = n ** 3
    from examples.solve_probe import build_operators
    A, Pm = build_operators(n, "star")
    out = {"n": n, "backend": jax.devices()[0].platform}
    v = jnp.ones((A.row_layout.Npad,))

    for tag, extra in (("f32", ["-pc_mg_dtype", "single"]),
                       ("f64", [])):
        pt.init(args=(argv if argv is not None else sys.argv[1:]) + extra)
        ksp = pt.KSP().create()
        ksp.setOperators(A, Pm)
        ksp.setType("cg")
        pc = ksp.getPC()
        pc.setType("gamg")
        pc.setFromOptions()
        pc.setUp()
        meta = pc.meta
        print(f"[{tag}] bound pc meta head: {meta[0]}, cycle dtype flag:"
              f" {meta[4] if meta[0] == 'pc_mg' and len(meta) > 4 else '?'}",
              flush=True)
        # sample one level's stored dtype
        d0 = pc.device_data()
        leaf = jax.tree_util.tree_leaves(d0["levels"][1])[0]
        print(f"[{tag}] level-1 data dtype: {leaf.dtype}", flush=True)
        cyc = kdiff(lambda data, w: operator.bind(meta, data).mult(w),
                    v, d0, f"[{tag}] V-cycle (data-as-arg)")
        out[f"cycle_ms_{tag}"] = round(cyc, 3)
        # in-loop per-iteration via max_it differencing
        from examples.iter_profile import warm_timed_solve
        b_arr = jnp.ones(N)
        t1 = warm_timed_solve(ksp, b_arr, N, 5)
        t2 = warm_timed_solve(ksp, b_arr, N, 15)
        out[f"gamg_per_it_ms_{tag}"] = round((t2 - t1) / 10 * 1e3, 2)
        print(f"[{tag}] in-loop per-it "
              f"{out[f'gamg_per_it_ms_{tag}']} ms", flush=True)

    # fine SpMV yardsticks
    out["spmv_f64_ms"] = kdiff(
        lambda data, w: operator.bind(A.meta, data).mult(w),
        v, A.device_data(), "fine SpMV f64")
    d32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x,
        A.device_data())
    out["spmv_f32_ms"] = kdiff(
        lambda data, w: operator.bind(A.meta, data).mult(w),
        jnp.ones((A.row_layout.Npad,), jnp.float32), d32, "fine SpMV f32")
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main()
