"""Solve 3-D Laplacian with multigrid on a DMDA-managed grid.

petsc_tpu analog of reference src/ksp/ksp/tutorials/ex45.c: 7-point
finite-difference Laplacian on the unit cube, Dirichlet boundaries
(boundary rows set to the identity-scaled stencil), RHS h^3/tiny pattern as
in the reference, solved with CG + geometric multigrid (or any
-ksp_type/-pc_type from the options database).

Run: python examples/ex45.py -da_grid_x 33 -da_grid_y 33 -da_grid_z 33 \
        -pc_type mg -ksp_monitor_short
"""

import sys

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import petsc_tpu as pt


def compute_rhs(ksp, b):
    da = b._dm
    nx, ny, nz = da.sizes
    hx, hy, hz = 1.0 / (nx - 1), 1.0 / (ny - 1), 1.0 / (nz - 1)
    arr = np.full((nz, ny, nx), 2.0 * hx * hy * hz)
    # boundary nodes: Dirichlet value 0 scaled like the reference
    arr[0, :, :] = arr[-1, :, :] = 0.0
    arr[:, 0, :] = arr[:, -1, :] = 0.0
    arr[:, :, 0] = arr[:, :, -1] = 0.0
    da.setVecArray(b, arr)


def compute_operators(ksp, A, B):
    da = A._dm
    nx, ny, nz = da.sizes
    hx, hy, hz = 1.0 / (nx - 1), 1.0 / (ny - 1), 1.0 / (nz - 1)
    hhx, hhy, hhz = hy * hz / hx, hx * hz / hy, hx * hy / hz
    xyz = da.node_coords()
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    idx = da.dof_index(x, y, z)
    interior = da.interior_mask()
    bnd = ~interior
    ii, jj, vv = [idx[bnd]], [idx[bnd]], [np.full(bnd.sum(), 2.0 * (hhx + hhy + hhz))]
    I = idx[interior]
    xi, yi, zi = x[interior], y[interior], z[interior]
    ii.append(I); jj.append(I)
    vv.append(np.full(len(I), 2.0 * (hhx + hhy + hhz)))
    for d, h in ((da.dof_index(xi - 1, yi, zi), hhx),
                 (da.dof_index(xi + 1, yi, zi), hhx),
                 (da.dof_index(xi, yi - 1, zi), hhy),
                 (da.dof_index(xi, yi + 1, zi), hhy),
                 (da.dof_index(xi, yi, zi - 1), hhz),
                 (da.dof_index(xi, yi, zi + 1), hhz)):
        ii.append(I); jj.append(d); vv.append(np.full(len(I), -h))
    A.setPreallocationCOO(np.concatenate(ii), np.concatenate(jj))
    A.setValuesCOO(np.concatenate(vv))


def main(argv=None):
    pt.init(args=argv if argv is not None else sys.argv[1:])
    da = pt.DMDA.create(3, (7, 7, 7), dof=1, stencil_width=1)
    da.setFromOptions()

    ksp = pt.KSP().create()
    ksp.setDM(da)
    ksp.setComputeRHS(compute_rhs)
    ksp.setComputeOperators(compute_operators)
    ksp.setFromOptions()

    x = ksp.solve()
    r = ksp.mat.createVecLeft()
    ksp.mat.mult(x, r)
    b = da.createGlobalVector()
    compute_rhs(ksp, b)
    r.axpy(-1.0, b)
    print(f"Residual norm {float(r.norm()):g}")
    print(f"iterations {ksp.getIterationNumber()}")
    return ksp


if __name__ == "__main__":
    main()
