"""Solve a tridiagonal linear system, then re-solve after a MatShift.

Reference: src/ksp/ksp/tutorials/ex1.c (1-D Laplacian (-1,2,-1), exact
solution u=1, GMRES+Jacobi at rtol 1e-5; the second solve checks that new
matrix values propagate to the solver automatically — here that is the
Mat state counter invalidating the compiled-solver's device data).

Run: python examples/ex1.py -ksp_monitor_short
Expected output parity: output/ex1_1.out.
"""

import sys as _sys
from pathlib import Path

_sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import petsc_tpu as pt


def main(argv=None):
    pt.init(args=argv if argv is not None else _sys.argv[1:])
    opts = pt.options()
    n = opts.get_int("n", default=10)

    A = pt.MatAIJ(None)
    A.setSizes((n, n))
    for i in range(1, n - 1):
        A.setValues([i], [i - 1, i, i + 1], [[-1.0, 2.0, -1.0]])
    A.setValues([0], [0, 1], [[2.0, -1.0]])
    A.setValues([n - 1], [n - 2, n - 1], [[-1.0, 2.0]])
    A.assemble()

    u = pt.Vec.from_array(np.ones(n))
    b = A.createVecLeft()
    A.mult(u, b)

    ksp = pt.KSP().create()
    ksp.setOperators(A, A)
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1.e-5)
    ksp.setFromOptions()

    x = A.createVecRight()
    ksp.solve(b, x)

    x.axpy(-1.0, u)
    norm = float(x.norm())
    its = ksp.getIterationNumber()
    print(f"Norm of error {norm:g}, Iterations {its}")

    # new nonzero values must propagate to the solver (state counter)
    A.shift(2.0)
    x2 = A.createVecRight()
    ksp.solve(b, x2)
    return ksp


if __name__ == "__main__":
    main()
