"""Canonical solve benchmark: 3-D 27-point Laplacian, CG + AMG/Jacobi.

petsc_tpu analog of reference src/ksp/ksp/tutorials/bench_kspsolve.c
(default 100^3 = 1M dof; -matmult benchmarks SpMV only). Reports PCSetUp,
KSPSolve wall time and achieved rates, honoring -n <edge>, -matmult,
-ksp_type/-pc_type, -ksp_mixed_precision.

Run: python examples/bench_kspsolve.py -n 100 -pc_type gamg
     python examples/bench_kspsolve.py -matmult
"""

import sys
import time

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import petsc_tpu as pt


def build(n):
    """27-point stencil Laplacian on an n^3 grid (bench_kspsolve.c:1-40)."""
    import scipy.sparse as sp
    offs = [(dx, dy, dz) for dz in (-1, 0, 1) for dy in (-1, 0, 1)
            for dx in (-1, 0, 1) if (dx, dy, dz) != (0, 0, 0)]
    N = n ** 3
    idx = np.arange(N)
    z, r = divmod(idx, n * n)
    y, x = divmod(r, n)
    rows, cols, vals = [idx], [idx], [np.full(N, 26.0)]
    for dx, dy, dz in offs:
        xx, yy, zz = x + dx, y + dy, z + dz
        ok = (xx >= 0) & (xx < n) & (yy >= 0) & (yy < n) & (zz >= 0) & (zz < n)
        rows.append(idx[ok])
        cols.append((zz * n * n + yy * n + xx)[ok])
        vals.append(np.full(ok.sum(), -1.0))
    A = sp.csr_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(N, N))
    return A


def main(argv=None):
    pt.init(args=argv if argv is not None else sys.argv[1:])
    opts = pt.options()
    n = opts.get_int("n", default=100)
    matmult = opts.get_bool("matmult", default=False)
    N = n ** 3
    print(f"===========================================")
    print(f"Test: {'MatMult' if matmult else 'KSP'} performance - Poisson")
    print(f"  Input matrix: 27-pt finite difference stencil")
    print(f"  -n {n}")
    print(f"  DoFs = {N}")
    A_sp = build(n)
    print(f"  Number of nonzeros = {A_sp.nnz}")
    t0 = time.perf_counter()
    A = pt.MatAIJ.from_scipy(A_sp)
    A.setStencilGrid((n, n, n))
    print(f"Step1  - matrix assembly (host+device) took "
          f"{time.perf_counter() - t0:.4f} seconds")

    b = A.createVecLeft()
    b.set(1.0)
    x = A.createVecRight()

    if matmult:
        import jax
        import jax.numpy as jnp
        from petsc_tpu.ops import operator
        meta = A.meta

        def loop(data, v, K):
            op = operator.bind(meta, data)
            return jnp.sum(jax.lax.fori_loop(
                0, K, lambda i, u: op.mult(u) * 1e-2, v))

        f = jax.jit(loop, static_argnums=2)
        data = A.device_data()
        v = b.array
        float(f(data, v, 3))
        best = {}
        for K in (3, 23):
            bt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(data, v, K))
                bt = min(bt, time.perf_counter() - t0)
            best[K] = bt
        per = (best[23] - best[3]) / 20
        print(f"Step2  - MatMult: {per * 1e3:.4f} ms per mult, "
              f"{A_sp.nnz / per / 1e9:.2f} Gnnz/s, "
              f"{2 * A_sp.nnz / per / 1e9:.2f} GFLOP/s")
        return

    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType(opts.get_string("ksp_type", default="cg"))
    ksp.getPC().setType(opts.get_string("pc_type", default="gamg"))
    ksp.setTolerances(rtol=opts.get_real("ksp_rtol", default=1e-8),
                      max_it=1000)
    ksp.setFromOptions()
    t0 = time.perf_counter()
    ksp.setUp()
    t_setup = time.perf_counter() - t0
    print(f"Step2  - PCSetUp took {t_setup:.4f} seconds")
    t0 = time.perf_counter()
    ksp.solve(b, x)   # includes jit compile on first call
    t_first = time.perf_counter() - t0
    x2 = A.createVecRight()
    t0 = time.perf_counter()
    ksp.solve(b, x2)
    t_solve = time.perf_counter() - t0
    its = ksp.getIterationNumber()
    print(f"Step3  - KSPSolve (first, incl. compile) took "
          f"{t_first:.4f} seconds")
    print(f"Step4  - KSPSolve (warm) took {t_solve:.4f} seconds, "
          f"{its} iterations ({N * its / t_solve / 1e6:.1f} Mdof-iters/s)")
    r = A.createVecLeft()
    A.mult(x2, r)
    r.axpy(-1.0, b)
    print(f"  |b-Ax|/|b| = {float(r.norm()) / float(b.norm()):.3e}")
    return ksp


if __name__ == "__main__":
    main()
