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


def main(argv=None):
    pt.init(args=argv if argv is not None else sys.argv[1:])
    opts = pt.options()
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
