"""SpMV benchmark over MatrixMarket files (reference
src/mat/tests/bench_spmv.c:377-397: MatrixMarket loader, JSON matrix
lists, nnz/s reporting).

Run: python examples/bench_spmv.py -fmtx path/to/matrix.mtx
     python examples/bench_spmv.py -matrix_list list.json   # ["a.mtx", ...]
"""

import json
import sys
import time

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import petsc_tpu as pt
from petsc_tpu.mat.mmio import load_matrix_market


def bench_one(path):
    import jax
    import jax.numpy as jnp
    from petsc_tpu.ops import operator
    A = load_matrix_market(path)
    m, n = A.getSize()
    nnz = A.nnz()
    meta = A.meta

    def loop(data, v, K):
        op = operator.bind(meta, data)
        return jnp.sum(jax.lax.fori_loop(
            0, K, lambda i, u: op.mult(u) * 1e-2, v))

    f = jax.jit(loop, static_argnums=2)
    data = A.device_data()
    v = jnp.asarray(np.random.default_rng(0).random(n))
    best = {}
    for K in (3, 23):
        float(f(data, v, K))
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(data, v, K))
            b = min(b, time.perf_counter() - t0)
        best[K] = b
    per = (best[23] - best[3]) / 20
    print(f"{path}: {m}x{n} nnz={nnz} kind={meta[0]} "
          f"{nnz / per / 1e9:.3f} Gnnz/s ({per * 1e3:.3f} ms/mult)")
    return nnz / per / 1e9


def _suite_matrices(small):
    """SuiteSparse-class synthetic matrices (no egress in this environment,
    so the classes are generated to match the published pattern statistics).

    atmosmodd (BASELINE config 2): 7-pt stencil, 1,270,432 rows, 8.8M nnz
    (atmospheric model, Davis collection) — variable coefficients, pure
    stencil pattern.  fem_bump: near-stencil with ~5% off-band entries
    (contact/constraint rows, the HYB spill case).  rand_band: K=16
    uniform-random columns in a +-1500 band — the no-structure worst case
    that defeats diagonal extraction."""
    import scipy.sparse as sp
    rng = np.random.default_rng(7)
    out = []

    def stencil7(nz, ny, nx, jitter=True):
        n = nz * ny * nx
        r = np.arange(n, dtype=np.int64)
        z, rem = r // (ny * nx), r % (ny * nx)
        yy, xx = rem // nx, rem % nx
        rows, cols, vals = [], [], []
        for (dz, dy, dx) in ((0, 0, 0), (0, 0, -1), (0, 0, 1), (0, -1, 0),
                             (0, 1, 0), (-1, 0, 0), (1, 0, 0)):
            ok = ((z + dz >= 0) & (z + dz < nz) & (yy + dy >= 0)
                  & (yy + dy < ny) & (xx + dx >= 0) & (xx + dx < nx))
            c = r + (dz * ny * nx + dy * nx + dx)
            v = np.full(n, 6.5) if (dz, dy, dx) == (0, 0, 0) \
                else np.full(n, -1.0)
            if jitter:
                v = v * (1.0 + 0.1 * ((r * 13 + dz + dy + dx) % 7) / 7.0)
            rows.append(r[ok]); cols.append(c[ok]); vals.append(v[ok])
        return sp.csr_matrix(
            (np.concatenate(vals),
             (np.concatenate(rows), np.concatenate(cols))), shape=(n, n))

    if small:
        out.append(("atmosmodd-class", stencil7(6, 60, 60)))
    else:
        out.append(("atmosmodd-class", stencil7(22, 239, 239)))

    # near-stencil + off-band spill (HYB case)
    A = stencil7(4, 80, 80) if small else stencil7(8, 160, 160)
    n = A.shape[0]
    i = np.arange(0, n, 4)
    j = (i * 1103515245 + 12345) % n
    S = sp.csr_matrix((np.full(len(i), 0.02), (i, j)), shape=(n, n))
    out.append(("fem-bump (5% spill)", (A + S).tocsr()))

    # banded random: no extractable structure
    n = 100_000 if small else 500_000
    K, band = 16, 1500
    r = np.arange(n, dtype=np.int64)
    rows, cols, vals = [], [], []
    for k in range(K):
        off = ((r * 1103515245 + 12345 + k * 40503) % (2 * band + 1)) - band
        c = np.clip(r + off, 0, n - 1) if k else r
        v = -(0.1 + ((r * (3 * k + 7)) % 89) / 89.0)
        if k == 0:
            v = 20.0 - v
        rows.append(r); cols.append(c); vals.append(v)
    out.append(("rand-band (no diag struct)", sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n)).tocsr()))
    return out


def bench_suite(small=False, solve=True):
    """Chip-measured production-path table (VERDICT r2 item 3): route each
    matrix through MatAIJ.from_scipy (auto layout), K-difference the jitted
    mult, then run the BASELINE config-2 end-to-end solve
    (GMRES(30)+ILU0) on the atmosmodd-class matrix."""
    import jax
    import jax.numpy as jnp
    from petsc_tpu.mat.aij import MatAIJ
    from petsc_tpu.ops import operator
    results = []
    for name, A in _suite_matrices(small):
        M = MatAIJ.from_scipy(A)
        meta, data = M.meta, M.device_data()
        nnz = A.nnz

        # data rides as a jit ARGUMENT: closing over it bakes the index
        # arrays into the program as constants, and the tunnel's
        # remote_compile rejects the multi-hundred-MB request (HTTP 413)
        def loop(d, v, K):
            op = operator.bind(meta, d)

            def body(i, u):
                y = op.mult(u)
                return u * 0.5 + jnp.zeros_like(u).at[0].set(
                    jnp.sum(y) * 1e-12) + 0.5
            return jnp.sum(jax.lax.fori_loop(0, K, body, v))

        jf = jax.jit(loop)
        v = jnp.asarray(np.random.default_rng(0).random(M.row_layout.Npad))

        def timed(K):
            float(jf(data, v, np.int32(K)))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(jf(data, v, np.int32(K)))
                best = min(best, time.perf_counter() - t0)
            return best

        rate = 0.0
        for lo, hi in ((3, 13), (3, 53), (3, 203)):
            t_lo, t_hi = timed(lo), timed(hi)
            per = (t_hi - t_lo) / (hi - lo)
            if per > 0 and t_hi > 1.5 * t_lo:
                rate = nnz / per / 1e9
            if t_hi > 4 * t_lo:
                break
        print(f"{name:28s} n={A.shape[0]:>9} nnz={nnz:>9} "
              f"kind={meta[0]:8s} {rate:8.3f} Gnnz/s", flush=True)
        results.append((name, meta[0], rate))

    if solve:
        name, A = _suite_matrices(small)[0]
        n = A.shape[0]
        M = MatAIJ.from_scipy(A)
        ksp = pt.KSP().create()
        ksp.setOperators(M)
        ksp.setType("gmres")
        ksp.getPC().setType("ilu")
        ksp.setTolerances(rtol=1e-8, max_it=400)
        xs = np.cos(0.01 * np.arange(n))
        b = pt.Vec.from_array(A @ xs)
        x = M.createVecRight()
        t0 = time.perf_counter()
        ksp.solve(b, x)
        t1 = time.perf_counter() - t0
        err = float(np.max(np.abs(np.asarray(x.array)[:n] - xs)))
        print(f"config-2 end-to-end GMRES(30)+ILU0 on {name}: "
              f"its={ksp.getIterationNumber()} rnorm={ksp.getResidualNorm():.3e} "
              f"err={err:.2e} wall={t1:.2f}s (incl. setup+compile)", flush=True)
        t0 = time.perf_counter()
        x2 = M.createVecRight()
        ksp.solve(b, x2)
        print(f"  warm re-solve: {time.perf_counter()-t0:.2f}s", flush=True)

        # truncated-Neumann trisolves (r5): same ILU0 factors applied as
        # stencil-SpMV sweeps instead of level-scheduled gathers
        pt.options().set_value("pc_factor_trisolve", "neumann")
        kn = pt.KSP().create()
        kn.setOperators(M)
        kn.setType("gmres")
        kn.getPC().setType("ilu")
        kn.getPC().setFromOptions()
        kn.setTolerances(rtol=1e-8, max_it=400)
        xn = M.createVecRight()
        t0 = time.perf_counter()
        kn.solve(b, xn)
        t1 = time.perf_counter() - t0
        errn = float(np.max(np.abs(np.asarray(xn.array)[:n] - xs)))
        print(f"config-2 GMRES(30)+ILU0-neumann: its={kn.getIterationNumber()} "
              f"err={errn:.2e} wall={t1:.2f}s (incl. setup+compile)",
              flush=True)
        t0 = time.perf_counter()
        xn2 = M.createVecRight()
        kn.solve(b, xn2)
        print(f"  warm re-solve: {time.perf_counter()-t0:.2f}s", flush=True)
        pt.options().set_value("pc_factor_trisolve", "")
    return results


def main(argv=None):
    pt.init(args=argv if argv is not None else sys.argv[1:])
    opts = pt.options()
    if opts.get_bool("suite", default=False):
        bench_suite(small=opts.get_bool("small", default=False),
                    solve=not opts.get_bool("no_solve", default=False))
        return
    f = opts.get_string("fmtx", default=None)
    lst = opts.get_string("matrix_list", default=None)
    paths = []
    if f:
        paths.append(f)
    if lst:
        paths += json.load(open(lst))
    if not paths:
        print("usage: bench_spmv.py -fmtx FILE | -matrix_list LIST.json")
        return
    for p in paths:
        bench_one(p)


if __name__ == "__main__":
    main()
