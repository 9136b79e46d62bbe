"""Chip-instrumented CG+GAMG solve probe (VERDICT r3 items 1 and 3).

Measures, at -n edge^3 on whatever backend jax picked (the real chip
under axon):
  * PCSetUp wall time and the per-level operator kinds (asserting the
    structured geometric head engaged: level >= 1 kinds must be aij_dnd),
  * one V-cycle application cost via K-differencing (the round-3
    structured-head redesign's target was ~O(10) fine-SpMV equivalents,
    mg.c's work-unit expectation, vs the 261 ms/cycle aggregate-gather
    cycle it replaced),
  * warm CG+GAMG wall time and iterations to rtol 1e-8,
  * the same with -pc_mg_dtype single (f32 V-cycle in the f64 Krylov),
  * warm CG+Jacobi wall time to the same rtol (the reference's own
    sanity ratio: bench_kspsolve.c reports PCSetUp + KSPSolve).

Run: python examples/solve_probe.py -n 128 [-stencil star|box]
"""

import json
import sys
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import petsc_tpu as pt


def build_operators(n, kind="star"):
    """Device-generated dnd stencil Amat + host CSR twin Pmat (the
    poisson512.py pattern: never upload the fine operator through the
    tunnel)."""
    import scipy.sparse as sp
    from petsc_tpu.ops import stencil_build
    meta, data = stencil_build.build_dnd((n, n, n), kind=kind)
    A = stencil_build.as_mat(meta, data)
    if kind == "star":
        from examples.poisson_scale import poisson7_csr
        indptr, indices, vals = poisson7_csr(n)
        A_host = sp.csr_matrix((vals, indices, indptr), shape=(n**3, n**3))
    else:
        from examples.bench_kspsolve import build
        A_host = build(n)
    Pm = pt.MatAIJ.from_scipy(A_host, host_only=True)
    Pm.setStencilGrid((n, n, n))
    return A, Pm


def timed_apply(op_mult, v, label, k_pairs=((2, 12), (2, 42), (2, 162))):
    import jax
    import jax.numpy as jnp

    def loop(u, K):
        return jnp.sum(jax.lax.fori_loop(
            0, K, lambda i, w: op_mult(w) * 1e-2, u))

    f = jax.jit(loop, static_argnums=1)
    float(f(v, 2))
    per = None
    for lo, hi in k_pairs:
        tl = th = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); float(f(v, lo))
            tl = min(tl, time.perf_counter() - t0)
            t0 = time.perf_counter(); float(f(v, hi))
            th = min(th, time.perf_counter() - t0)
        if th > 1.5 * tl:
            per = (th - tl) / (hi - lo)
            break
    if per is None:
        per = th / hi
    print(f"{label}: {per*1e3:.3f} ms per apply", flush=True)
    return per


def main(argv=None):
    pt.init(args=argv if argv is not None else sys.argv[1:])
    import jax
    import jax.numpy as jnp
    opts = pt.options()
    n = opts.get_int("n", default=128)
    kind = opts.get_string("stencil", default="star")
    N = n ** 3
    out = {"n": n, "stencil": kind,
           "backend": jax.devices()[0].platform}
    A, Pm = build_operators(n, kind)

    results = {}
    for tag, extra in (("f64", []), ("f32cycle", ["-pc_mg_dtype", "single"])):
        pt.init(args=(argv if argv is not None else sys.argv[1:]) + extra)
        ksp = pt.KSP().create()
        ksp.setOperators(A, Pm)
        ksp.setType("cg")
        pc = ksp.getPC()
        pc.setType("gamg")
        pc.setFromOptions()
        t0 = time.perf_counter()
        pc.setUp()
        t_setup = time.perf_counter() - t0
        lev = pc._impl.levels
        kinds = [l.A.meta[0] for l in lev]
        sizes = [l.A.getSize()[0] for l in lev]
        print(f"[{tag}] PCSetUp {t_setup:.1f} s; levels:", flush=True)
        for k, s in zip(kinds, sizes):
            print(f"    {k:12s} rows={s:,}")
        # one V-cycle apply cost
        v = jnp.ones((A.row_layout.Npad,))
        per_cycle = timed_apply(pc.op().mult, v, f"[{tag}] V-cycle")
        ksp.setTolerances(rtol=1e-8, max_it=50)
        b = pt.Vec.from_array(jnp.ones(N))
        x = pt.Vec.from_array(jnp.zeros(N))
        ksp.solve(b, x)            # compile + warm
        x.set(0.0)
        t0 = time.perf_counter()
        ksp.solve(b, x)
        jax.block_until_ready(x.array)
        t_solve = time.perf_counter() - t0
        its = ksp.getIterationNumber()
        relres = float(ksp.getResidualNorm()) / float(ksp._rnorm0)
        # true residual check (f32 cycle must still hit the f64 target)
        r = np.linalg.norm(np.asarray(Pm.to_scipy() @ np.asarray(x.array)[:N]) - 1.0)
        print(f"[{tag}] CG+GAMG: {its} its in {t_solve:.3f} s warm, "
              f"relres {relres:.2e}, true |Ax-b| {r:.3e}", flush=True)
        results[tag] = {"setup_s": round(t_setup, 2),
                        "cycle_ms": round(per_cycle * 1e3, 3),
                        "solve_s": round(t_solve, 3), "its": its,
                        "relres": relres, "true_res": r,
                        "levels": list(zip(kinds, sizes))}

    # CG+Jacobi at the same rtol
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg"); ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-8, max_it=2000)
    b = pt.Vec.from_array(jnp.ones(N)); x = pt.Vec.from_array(jnp.zeros(N))
    ksp.solve(b, x)
    x.set(0.0)
    t0 = time.perf_counter()
    ksp.solve(b, x)
    jax.block_until_ready(x.array)
    t_j = time.perf_counter() - t0
    print(f"[jacobi] CG+Jacobi: {ksp.getIterationNumber()} its in "
          f"{t_j:.3f} s warm, relres "
          f"{float(ksp.getResidualNorm())/float(ksp._rnorm0):.2e}", flush=True)
    results["jacobi"] = {"solve_s": round(t_j, 3),
                         "its": ksp.getIterationNumber()}
    out["results"] = results
    best = min(results["f64"]["solve_s"], results["f32cycle"]["solve_s"])
    out["gamg_vs_jacobi_speedup"] = round(results["jacobi"]["solve_s"] / best, 2)
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main()
