"""ex12 analog: nonlinear FEM Poisson on DMPlex with PetscDS weak forms.

Reference: src/snes/tutorials/ex12.c — -div((1+u^2) grad u) = f on the
unit square, Dirichlet BC, Lagrange elements of selectable order
(-fe_order, default 2), SNES Newton with the autodiff element Jacobian
(the g0..g3 blocks derived from the registered f0/f1 by jax.jacfwd).

The manufactured forcing is itself autodiff-derived: pick u_ex, define
the flux F(x) = (1+u^2) grad u at u = u_ex, and f = -div F comes from
jax.jacfwd — no hand-computed right-hand side.

Run: python examples/ex12.py -fe_order 2 -faces 12
"""

import sys

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import petsc_tpu as pt
from petsc_tpu.dm.fe import DS, lagrange_fe
from petsc_tpu.dm.plex import DMPlex


def u_exact(x):
    return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])


def forcing(x):
    """f = -div((1+u^2) grad u) at u = u_exact, by nested autodiff."""
    def flux(y):
        g = jax.grad(u_exact)(y)
        u = u_exact(y)
        return (1.0 + u * u) * g

    return -jnp.trace(jax.jacfwd(flux)(x))


def main(argv=None):
    pt.init(args=argv if argv is not None else sys.argv[1:])
    opts = pt.options()
    order = opts.get_int("fe_order", default=2)
    faces = opts.get_int("faces", default=12)

    plex = DMPlex.createBoxMesh((faces, faces), simplex=True)
    ds = DS(plex, lagrange_fe(2, order))
    ds.setResidual(f0=lambda u, gu, x: -forcing(x),
                   f1=lambda u, gu, x: (1.0 + u * u) * gu)
    bnd = ds.boundary_dofs(lambda x: x.min() < 1e-9 or x.max() > 1 - 1e-9)
    n = ds.ndof

    def residual(snes, x, f):
        u = np.asarray(x.getArray())[:n]
        F = np.array(ds.assembleResidual(u))
        F[bnd] = u[bnd]                      # essential BC: u = 0
        f.setArray(np.pad(F, (0, len(np.asarray(x.getArray())) - n)))

    def jacobian(snes, x, J, P):
        u = np.asarray(x.getArray())[:n]
        A = ds.assembleJacobian(u).tolil()
        for r in bnd:
            A.rows[r] = [int(r)]
            A.data[r] = [1.0]
        A = A.tocsr()
        coo = A.tocoo()
        keep = ~np.isin(coo.col, bnd) | (coo.row == coo.col)
        import scipy.sparse as sp
        A = sp.csr_matrix((coo.data[keep], (coo.row[keep], coo.col[keep])),
                          shape=A.shape)
        P.setValuesCSR(A.indptr, A.indices, A.data)
        P.assemble()

    snes = pt.SNES().create()
    J = pt.MatAIJ(None)
    J.setSizes((n, n))
    x = pt.Vec.from_array(np.zeros(n))
    f = pt.Vec.from_array(np.zeros(n))
    snes.setFunction(residual, f)
    snes.setJacobian(jacobian, J, J)
    snes.setTolerances(rtol=1e-10, atol=1e-12)
    snes.setFromOptions()
    snes.solve(None, x)

    u = np.asarray(x.getArray())[:n]
    uex = np.asarray([float(u_exact(jnp.asarray(xy)))
                      for xy in ds.dof_coords])
    err = np.abs(u - uex).max()
    print(f"P{order} nonlinear Poisson: {faces}x{faces} mesh, "
          f"{snes.getIterationNumber()} Newton its, max error {err:.3e}")
    return err, snes


if __name__ == "__main__":
    main()
