"""Driven cavity: velocity-vorticity formulation with buoyancy.

Reference: src/snes/tutorials/ex19.c (2-D driven cavity, 4 dof/node
(u, v, omega, T), upwinded convection, lid velocity 1/(mx*my), solved by
Newton on a DMDA). Re-designed vectorized: the residual is ONE jax
function of the (my, mx, 4) state built from array shifts — interior
stencils, upwind selects (jnp.where), and the four boundary closures as
masked row/column overwrites — so the exact Jacobian comes from jax.jvp
and the whole Newton step jit-compiles; no per-node loops.

Run: python examples/ex19.py [-da_refine 3] [-lidvelocity V] [-grashof G]
"""

import sys as _sys
from pathlib import Path

_sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

import petsc_tpu as pt


def make_residual(mx, my, lid, prandtl, grashof):
    """Pure residual F(X) on the flat (my*mx*4,) state vector."""
    dhx, dhy = float(mx - 1), float(my - 1)
    hx, hy = 1.0 / dhx, 1.0 / dhy
    hxdhy, hydhx = hx * dhy, hy * dhx

    def residual(xflat):
        X = xflat[: my * mx * 4].reshape(my, mx, 4)
        u, v, om, T = X[..., 0], X[..., 1], X[..., 2], X[..., 3]

        def sh(a, dj, di):
            """a shifted so result[j,i] = a[j+dj, i+di] (edges clamped —
            only interior values are consumed)."""
            return jnp.roll(a, (-dj, -di), axis=(0, 1))

        vx, vy = u, v
        vxp = 0.5 * (vx + jnp.abs(vx))
        vxm = 0.5 * (vx - jnp.abs(vx))
        vyp = 0.5 * (vy + jnp.abs(vy))
        vym = 0.5 * (vy - jnp.abs(vy))

        def lap(a):
            return ((2.0 * a - sh(a, 0, -1) - sh(a, 0, 1)) * hydhx
                    + (2.0 * a - sh(a, -1, 0) - sh(a, 1, 0)) * hxdhy)

        def upwind(a):
            return ((vxp * (a - sh(a, 0, -1)) + vxm * (sh(a, 0, 1) - a))
                    * hy
                    + (vyp * (a - sh(a, -1, 0)) + vym * (sh(a, 1, 0) - a))
                    * hx)

        fu = lap(u) - 0.5 * (sh(om, 1, 0) - sh(om, -1, 0)) * hx
        fv = lap(v) + 0.5 * (sh(om, 0, 1) - sh(om, 0, -1)) * hy
        fo = (lap(om) + upwind(om)
              - 0.5 * grashof * (sh(T, 0, 1) - sh(T, 0, -1)) * hy)
        ft = lap(T) + prandtl * upwind(T)

        F = jnp.stack([fu, fv, fo, ft], axis=-1)

        # boundary closures (ex19.c edge branches), as masked overwrites
        jj = jnp.arange(my)[:, None]
        ii = jnp.arange(mx)[None, :]
        bot = (jj == 0) & (ii >= 0)
        top = (jj == my - 1)
        left = (ii == 0)
        right = (ii == mx - 1)

        Fb = jnp.stack([
            u, v, om + (sh(u, 1, 0) - u) * dhy, T - sh(T, 1, 0)], axis=-1)
        Ft = jnp.stack([
            u - lid, v, om + (u - sh(u, -1, 0)) * dhy,
            T - sh(T, -1, 0)], axis=-1)
        Fl = jnp.stack([
            u, v, om - (sh(v, 0, 1) - v) * dhx, T], axis=-1)
        Fr = jnp.stack([
            u, v, om - (v - sh(v, 0, -1)) * dhx,
            T - (1.0 if grashof > 0 else 0.0)], axis=-1)

        # ex19.c edge order: bottom, top, then left, right — the later
        # (x-)edges own the corner points
        F = jnp.where(bot[..., None], Fb, F)
        F = jnp.where(top[..., None], Ft, F)
        F = jnp.where(left[..., None], Fl, F)
        F = jnp.where(right[..., None], Fr, F)
        out = jnp.zeros_like(xflat)
        return out.at[: my * mx * 4].set(F.reshape(-1))

    return residual


def initial_guess(mx, my, grashof):
    """FormInitialGuess: motionless fluid, linear equilibrium T."""
    X = np.zeros((my, mx, 4))
    if grashof > 0:
        dx = 1.0 / (mx - 1)
        X[..., 3] = (np.arange(mx) * dx)[None, :]
    return X.reshape(-1)


def main(argv=None):
    import sys
    pt.init(args=argv if argv is not None else sys.argv[1:])
    opts = pt.options()
    da = pt.DMDA.create(dim=2, sizes=(4, 4), dof=4, stencil_type="star")
    da.setFromOptions()
    mx, my = da.sizes
    lid = opts.get_real("lidvelocity", default=1.0 / (mx * my))
    prandtl = opts.get_real("prandtl", default=1.0)
    grashof = opts.get_real("grashof", default=1.0)

    def pg(v):
        # PETSc %g prints trailing "." on integral values (1 -> "1.")
        t = f"{v:g}"
        return t + "." if t.lstrip("-").isdigit() else t

    print(f"lid velocity = {pg(lid)}, prandtl # = {pg(prandtl)}, "
          f"grashof # = {pg(grashof)}")

    snes = pt.SNES().create()
    snes.setDM(da)
    residual = make_residual(mx, my, lid, prandtl, grashof)
    snes.setFunction(residual)
    snes.setUseMF(True)
    snes.setFromOptions()
    x = pt.Vec.from_array(initial_guess(mx, my, grashof))
    snes.solve(None, x)
    print(f"Number of SNES iterations = {snes.getIterationNumber()}")
    return snes, x, (mx, my)


if __name__ == "__main__":
    main()
