"""512^3 scale demonstration on ONE chip (VERDICT row 63, the 64-bit
scale path): 7-point (or 27-point) Poisson with the constant-folded
device-generated stencil operator -- no host assembly, no index arrays
at all (the 27-pt case has 3.6e9 LOGICAL nnz, past int32, which the dnd
layout never materializes). CG+Jacobi entirely on device; reports
residual reduction and sustained Gnnz/s.

Run on chip:  python examples/poisson512.py -n 512 -its 50
"""

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
    opts = pt.options()
    n = opts.get_int("n", default=512)
    its = opts.get_int("its", default=50)
    kind = opts.get_string("stencil", default="star")
    from petsc_tpu.ops import stencil_build
    meta, data = stencil_build.build_dnd((n, n, n), kind=kind)
    nnz = stencil_build.nnz_of((n, n, n), meta[2])
    N = n ** 3
    # first-class Mat wrapper: device arrays are jit ARGUMENTS, not
    # closure constants (a MatShell lambda would bake the 1 GB diagonal
    # into the executable payload)
    A = stencil_build.as_mat(meta, data)
    ksp = pt.KSP().create()
    pc_type = opts.get_string("pc_type", default="jacobi")
    if pc_type == "gamg" and opts.get_bool("host_twin", default=False):
        # legacy Amat/Pmat split (-host_twin 1): a host_only CSR twin
        # drives the AMG setup. With the round-4 device-probed structured
        # head (pc/gamg_device.py) the setup runs from the device
        # operator directly — at 512^3 the twin alone is ~16 GB of host
        # CSR, so the default is no twin at all.
        import scipy.sparse as sp
        from examples.poisson_scale import poisson7_csr
        indptr, indices, vals = poisson7_csr(n)
        A_host = sp.csr_matrix((vals, indices, indptr), shape=(N, N))
        Pm = pt.MatAIJ.from_scipy(A_host, host_only=True)
        ksp.setOperators(A, Pm)
    else:
        ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType(pc_type)
    ksp.getPC().setFromOptions()   # honor -pc_mg_dtype / -pc_gamg_* knobs
    t0 = time.perf_counter()
    ksp.getPC().setUp()
    setup_s = time.perf_counter() - t0
    print(f"PCSetUp({pc_type}) {setup_s:.1f} s", flush=True)
    b = pt.Vec.from_array(jnp.ones(N))
    if pc_type == "gamg":
        # converges in ~10 its: report the converged solve directly.
        # -ksp_donate_rhs: at 512^3 the CG+GAMG program sits exactly on
        # the 15.75 GB HBM line; donating b (recreated per solve — a
        # fused device fill) frees the deciding fine-vector buffer
        pt.options().set_value("ksp_donate_rhs", "1")
        # record donation misfires (r4 VERDICT weak 8): jax warns when a
        # donated buffer could not be aliased — the 512^3 HBM budget
        # depends on the x0/b donations actually landing at EVERY size
        import warnings as _warnings
        donation_misses = []
        _orig_warn = _warnings.warn

        def _catch(msg, *a, **k):
            if "donated" in str(msg):
                donation_misses.append(str(msg).split("\n")[0])
            return _orig_warn(msg, *a, **k)
        _warnings.warn = _catch
        ksp.setTolerances(rtol=1e-8, max_it=opts.get_int("gamg_max_it", default=40))
        # -ksp_norm_type unpreconditioned: converge on ||b-Ax||_2/||b||_2
        # directly (KSP_NORM_UNPRECONDITIONED, iterativ.c:1519 semantics).
        # The preconditioned norm under-reports the true residual by
        # ~sqrt(kappa) here (M^-1 ~ A^-1 amplifies the smooth b ~190x at
        # 512^3), which round-4 SCALE rows surfaced as true_relres ~1e-6
        # at nominal rtol 1e-8 — a norm-semantics gap, not an f32 floor.
        ksp.setFromOptions()
        x = pt.Vec.from_array(jnp.zeros(N))
        ksp.solve(b, x)                      # compile + warm
        x.set(0.0)
        b = pt.Vec.from_array(jnp.ones(N))   # b was donated
        t0 = time.perf_counter()
        ksp.solve(b, x)          # returns with stats fetched = complete
        dt = time.perf_counter() - t0
        its = ksp.getIterationNumber()
        # true (unpreconditioned) residual on device: ||b - A x|| / ||b||
        from petsc_tpu.ops.reduce import fnorm2
        r = jnp.ones(N) - A.op().mult(x.array)[:N]
        true_rel = float(fnorm2(r)) / float(np.sqrt(N))
        relres = float(ksp.getResidualNorm()) / float(ksp._rnorm0)
        print(f"n={n}^3 rows={N:,} CG+GAMG: {its} its"
              f" in {dt:.2f} s warm, relres {relres:.2e}, "
              f"true |b-Ax|/|b| {true_rel:.2e}")
        import json
        _warnings.warn = _orig_warn
        print(json.dumps({
            "artifact": "cg_gamg_scale", "n": n, "rows": N,
            "pcsetup_s": round(setup_s, 1), "solve_s": round(dt, 2),
            "its": its, "relres": relres, "true_relres": true_rel,
            "norm_type": ksp.normtype,
            "cycle_dtype": opts.get_string("pc_mg_dtype", default="double"),
            "donation_misses": sorted(set(donation_misses)),
            "quality": "measured"}))
        pt.finalize()        # -log_view/-options_left print here
        return dt, nnz
    ksp.setTolerances(rtol=1e-30, max_it=its)
    ksp.converged_maxits = True

    def timed_solve(k):
        ksp.setTolerances(rtol=1e-30, max_it=k)
        x = pt.Vec.from_array(jnp.zeros(N))
        ksp.solve(b, x)                      # warm/compile this max_it
        x.set(0.0)
        t0 = time.perf_counter()
        ksp.solve(b, x)          # returns with stats fetched = complete
        return time.perf_counter() - t0, float(ksp.getResidualNorm())

    # iteration-differencing cancels the tunnel's per-solve dispatch
    # latency (same reasoning as bench.py's K-differencing)
    t1, _ = timed_solve(its)
    t2, rnorm = timed_solve(3 * its)
    rate = nnz * (2 * its) / max(t2 - t1, 1e-9) / 1e9
    r0 = float(ksp._rnorm0)          # same (preconditioned) norm as rnorm
    print(f"n={n}^3 rows={N:,} logical nnz={nnz:,} "
          f"({'>int32' if nnz > 2**31 else 'int32-ok'})")
    print(f"CG+Jacobi: {its}->{3*its} its {t1:.2f}->{t2:.2f} s, "
          f"{rate:.1f} Gnnz/s per-iteration, relres {rnorm / r0:.3e} "
          f"at {3*its} its")
    return t2, nnz


if __name__ == "__main__":
    main()
