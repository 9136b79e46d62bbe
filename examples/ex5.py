"""Bratu nonlinear PDE in 2-D: -Laplacian(u) - lambda*exp(u) = 0.

petsc_tpu analog of reference src/snes/tutorials/ex5.c (solid-fuel
ignition): DMDA-managed grid, Dirichlet boundaries, finite differences,
SNES Newton with line search. The residual is a PURE jax function of the
grid array (shifted slices, no gather), so the Jacobian action is exact
via jax.jvp; the assembled preconditioner matrix uses the analytic stencil
(same entries as ex5.c FormJacobianLocal).

Run: python examples/ex5.py -da_grid_x 17 -da_grid_y 17 -par 6.0 \
        -snes_monitor_short
"""

import sys

import numpy as np
import jax.numpy as jnp

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import petsc_tpu as pt


def make_residual(da, lam):
    nx, ny = da.sizes
    hx, hy = 1.0 / (nx - 1), 1.0 / (ny - 1)
    sc = hx * hy * lam
    hxdhy, hydhx = hx / hy, hy / hx

    def residual(u_flat):
        u = u_flat.reshape(ny, nx)
        uc = u[1:-1, 1:-1]
        lap = (2.0 * uc - u[1:-1, :-2] - u[1:-1, 2:]) * hydhx \
            + (2.0 * uc - u[:-2, 1:-1] - u[2:, 1:-1]) * hxdhy
        f_int = lap - sc * jnp.exp(uc)
        f = u  # boundary rows: F = u (Dirichlet 0, ex5.c FormFunctionLocal)
        f = f.at[1:-1, 1:-1].set(f_int)
        return f.reshape(-1)

    return residual


def make_jacobian(da, lam):
    nx, ny = da.sizes
    hx, hy = 1.0 / (nx - 1), 1.0 / (ny - 1)
    sc = hx * hy * lam
    hxdhy, hydhx = hx / hy, hy / hx

    def jacobian(snes, X, J, P):
        u = np.asarray(X.getArray()).reshape(ny, nx)
        xy = da.node_coords()
        xi, yi = xy[:, 0], xy[:, 1]
        interior = da.interior_mask()
        bnd = ~interior
        I = da.dof_index(xi[interior], yi[interior])
        ii = [da.dof_index(xi[bnd], yi[bnd]), I]
        jj = [da.dof_index(xi[bnd], yi[bnd]), I]
        vv = [np.ones(bnd.sum()),
              2.0 * (hydhx + hxdhy) - sc * np.exp(u[yi[interior], xi[interior]])]
        for dx, dy, v in ((-1, 0, -hydhx), (1, 0, -hydhx),
                          (0, -1, -hxdhy), (0, 1, -hxdhy)):
            ii.append(I)
            jj.append(da.dof_index(xi[interior] + dx, yi[interior] + dy))
            vv.append(np.full(interior.sum(), v))
        P.setPreallocationCOO(np.concatenate(ii), np.concatenate(jj))
        P.setValuesCOO(np.concatenate(vv))

    return jacobian


def main(argv=None):
    pt.init(args=argv if argv is not None else sys.argv[1:])
    opts = pt.options()
    lam = opts.get_real("par", default=6.0)
    da = pt.DMDA.create(2, (4, 4), dof=1, stencil_width=1)
    da.setFromOptions()
    nx, ny = da.sizes

    snes = pt.SNES().create()
    snes.setDM(da)
    snes.setFunction(make_residual(da, lam))
    J = da.createMatrix()
    snes.setJacobian(make_jacobian(da, lam), J=J)

    x = da.createGlobalVector()
    # initial guess (ex5.c FormInitialGuess): lam/(lam+1) * sqrt distance
    temp1 = lam / (lam + 1.0)
    xy = da.node_coords()
    xi, yi = xy[:, 0], xy[:, 1]
    hx, hy = 1.0 / (nx - 1), 1.0 / (ny - 1)
    g = temp1 * np.sqrt(np.minimum(np.minimum(xi, nx - 1 - xi) * hx,
                                   np.minimum(yi, ny - 1 - yi) * hy))
    g[(xi == 0) | (xi == nx - 1) | (yi == 0) | (yi == ny - 1)] = 0.0
    x.setArray(g)

    snes.setFromOptions()
    snes.solve(None, x)
    print(f"Number of SNES iterations = {snes.getIterationNumber()}")
    return snes, x


if __name__ == "__main__":
    main()
