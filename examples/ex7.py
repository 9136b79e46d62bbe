"""Block Jacobi preconditioner for a 2-D Laplacian, with per-block
sub-solver configuration.

Reference: src/ksp/ksp/tutorials/ex7.c (m=4 grid, u*=1 rhs, GMRES +
bjacobi; block count follows the "rank" count = -pc_bjacobi_blocks
here). The reference's advanced path assigns DIFFERENT solvers per
block (bcgs+none / gmres+jacobi); this example exercises the uniform
-sub_* path — heterogeneous blocks compose via PCFieldSplit additive
with per-field sub_types in this framework.

Run: python examples/ex7.py -ksp_monitor_short
"""

import sys as _sys
from pathlib import Path

_sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import petsc_tpu as pt


def main(argv=None):
    pt.init(args=argv if argv is not None else _sys.argv[1:])
    opts = pt.options()
    m = opts.get_int("m", default=4)
    n = m
    N = m * n
    A = pt.MatAIJ(None)
    A.setSizes((N, N))
    from petsc_tpu.mat.mat import InsertMode
    for I in range(N):
        i, j = I // n, I % n
        vals, cols = [4.0], [I]
        if i > 0:
            cols.append(I - n); vals.append(-1.0)
        if i < m - 1:
            cols.append(I + n); vals.append(-1.0)
        if j > 0:
            cols.append(I - 1); vals.append(-1.0)
        if j < n - 1:
            cols.append(I + 1); vals.append(-1.0)
        A.setValues([I], cols, [vals], addv=InsertMode.ADD_VALUES)
    A.assemble()

    u = pt.Vec.from_array(np.ones(N))
    b = A.createVecLeft()
    A.mult(u, b)

    ksp = pt.KSP().create()
    ksp.setOperators(A, A)
    pc = ksp.getPC()
    pc.setType("bjacobi")
    pc._impl.nblocks = opts.get_int("pc_bjacobi_blocks", default=2)
    ksp.setTolerances(rtol=1e-5)
    ksp.setFromOptions()
    x = A.createVecRight()
    ksp.solve(b, x)
    x.axpy(-1.0, u)
    print(f"Norm of error {float(x.norm()):g} "
          f"iterations {ksp.getIterationNumber()}")
    return ksp


if __name__ == "__main__":
    main()
