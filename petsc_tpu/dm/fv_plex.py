"""Cell-centered finite volumes on unstructured plex meshes.

Behavioral reference: src/dm/impls/plex/plexfvm.c
(DMPlexComputeResidual_Internal's FVM path: face geometry, Riemann
callbacks with (uL, uR, n) -> flux, ghost boundary cells) and
src/dm/dt/fv/interface/fv.c (PetscFVUpwind / PetscFVLeastSquares slope
reconstruction + PetscLimiter).

TPU redesign: the face loop is flattened into static gather/scatter
tables built once on host — uL/uR gathers, one fused Riemann evaluation
over ALL faces at once, and two segment scatter-adds back to cells. The
RHS closes over device arrays only (tables ride the jit contract as
arguments via the returned closure), so the whole method-of-lines step
jits into one XLA program and composes with every TS integrator.

Second order reconstructs per-cell least-squares gradients (the
PetscFVLeastSquares role, normal equations precomputed on host as a
dense per-cell pseudo-inverse over a fixed neighbor stencil) limited by
Barth-Jespersen (the TVD cell limiter plexfvm.c applies by default).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


_FACETS = {
    # local facet vertex ids per cell shape (simplex: opposite-vertex
    # convention; quad: edges in circulation order)
    (2, 3): [(1, 2), (2, 0), (0, 1)],
    (2, 4): [(0, 1), (1, 2), (2, 3), (3, 0)],
    (3, 4): [(1, 2, 3), (0, 3, 2), (0, 1, 3), (0, 2, 1)],
}


def face_geometry(plex):
    """Unique faces with (left cell, right cell|-1), outward-from-left
    unit normals, areas, centroids, and cell volumes/centroids
    (DMPlexComputeGeometryFVM's tables, vectorized host numpy)."""
    import math
    cells = np.asarray(plex.cells)
    coords = np.asarray(plex.coords)
    dim = plex.dim
    nv = cells.shape[1]
    try:
        facets = _FACETS[(dim, nv)]
    except KeyError:
        raise ValueError(f"FVPlex: unsupported cell ({dim}-d, {nv} verts)")
    nc = len(cells)
    # cell centroids + volumes
    ccent = coords[cells].mean(axis=1)
    if (dim, nv) in ((2, 3), (3, 4)):
        v = coords[cells]
        J = v[:, 1:, :] - v[:, :1, :]
        vol = np.abs(np.linalg.det(J)) / math.factorial(dim)
    else:  # quad: split into two triangles (2-D shoelace per triangle)
        v = coords[cells]

        def cross2(a, b):
            return a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]

        a1 = cross2(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
        a2 = cross2(v[:, 2] - v[:, 0], v[:, 3] - v[:, 0])
        vol = 0.5 * (np.abs(a1) + np.abs(a2))
    # face table: sorted vertex tuple -> (first cell, second cell)
    fverts = np.concatenate([cells[:, f] for f in facets])  # (nc*nf, k)
    fcell = np.tile(np.arange(nc), len(facets))
    key = np.sort(fverts, axis=1)
    uniq, first, inv, counts = np.unique(
        key, axis=0, return_index=True, return_inverse=True,
        return_counts=True)
    nf = len(uniq)
    cL = np.full(nf, -1, dtype=np.int64)
    cR = np.full(nf, -1, dtype=np.int64)
    order = np.argsort(inv, kind="stable")
    for idx in order:          # two entries max per face
        f = inv[idx]
        if cL[f] < 0:
            cL[f] = fcell[idx]
        else:
            cR[f] = fcell[idx]
    # geometry from the LEFT cell's (oriented) facet
    lv = fverts[first]                                   # (nf, k)
    if dim == 2:
        e = coords[lv[:, 1]] - coords[lv[:, 0]]
        normal = np.stack([e[:, 1], -e[:, 0]], axis=1)
        area = np.linalg.norm(normal, axis=1)
        fcent = 0.5 * (coords[lv[:, 0]] + coords[lv[:, 1]])
    else:
        e1 = coords[lv[:, 1]] - coords[lv[:, 0]]
        e2 = coords[lv[:, 2]] - coords[lv[:, 0]]
        normal = 0.5 * np.cross(e1, e2)
        area = np.linalg.norm(normal, axis=1)
        fcent = coords[lv].mean(axis=1)
    n_unit = normal / np.maximum(area, 1e-300)[:, None]
    # orient outward from cL
    flip = np.einsum("fd,fd->f", n_unit, fcent - ccent[cL]) < 0
    n_unit[flip] = -n_unit[flip]
    return {"cL": cL, "cR": cR, "normal": n_unit, "area": area,
            "fcent": fcent, "ccent": ccent, "vol": vol}


class FVPlex:
    """Cell-centered FVM for a scalar conservation law u_t + div F(u) = 0
    on a tri/quad/tet plex mesh.

    flux(u) -> tuple of dim flux components (elementwise jnp ops);
    wavespeed(uL, uR, nd...) -> |df/du . n| bound for Rusanov, or the
    signed advection speed for upwind. Boundary conditions: "outflow"
    (ghost copies the interior state) or ("dirichlet", g) with g a
    constant or a callable of the face centroids."""

    def __init__(self, plex, flux, wavespeed, riemann="rusanov",
                 bc="outflow", order=1, limiter="barth"):
        self.plex = plex
        self.flux = flux
        self.wavespeed = wavespeed
        self.riemann = riemann
        self.bc = bc
        self.order = int(order)
        self.limiter_name = limiter
        g = face_geometry(plex)
        self.geom = g
        interior = g["cR"] >= 0
        self._interior = interior
        if self.order >= 2:
            self._build_ls_tables()

    def _build_ls_tables(self):
        """Per-cell least-squares gradient pseudo-inverse over the
        face-neighbor stencil, padded to the max neighbor count
        (PetscFVLeastSquares, fv.c ComputeGradient)."""
        g = self.geom
        nc = len(g["vol"])
        dim = g["ccent"].shape[1]
        nbrs = [[] for _ in range(nc)]
        for f in range(len(g["cL"])):
            L, R = g["cL"][f], g["cR"][f]
            if R >= 0:
                nbrs[L].append(R)
                nbrs[R].append(L)
        kmax = max(len(x) for x in nbrs)
        nb = np.zeros((nc, kmax), dtype=np.int64)
        mask = np.zeros((nc, kmax))
        for c, lst in enumerate(nbrs):
            nb[c, :len(lst)] = lst
            mask[c, :len(lst)] = 1.0
        dx = (g["ccent"][nb] - g["ccent"][:, None, :]) * mask[..., None]
        # pinv of the (kmax, dim) displacement matrix per cell (batched)
        pinv = np.linalg.pinv(dx)                   # (nc, dim, kmax)
        self._ls = {"nb": jnp.asarray(nb), "mask": jnp.asarray(mask),
                    "pinv": jnp.asarray(pinv)}

    def makeRHS(self):
        g = self.geom
        dim = g["ccent"].shape[1]
        cL = jnp.asarray(g["cL"])
        cRr = jnp.asarray(np.maximum(g["cR"], 0))
        interior = jnp.asarray(self._interior)
        n = jnp.asarray(g["normal"])
        area = jnp.asarray(g["area"])
        vol = jnp.asarray(g["vol"])
        fcent = jnp.asarray(g["fcent"])
        ccent = jnp.asarray(g["ccent"])
        nc = len(g["vol"])
        flux, wavespeed = self.flux, self.wavespeed
        bc = self.bc
        order, limname = self.order, self.limiter_name
        ls = getattr(self, "_ls", None)

        if isinstance(bc, tuple) and bc[0] == "dirichlet":
            gval = bc[1]
            gb = jnp.asarray(gval(np.asarray(fcent))
                             if callable(gval)
                             else np.full(len(g["cL"]), float(gval)))
        else:
            gb = None

        def fn_dot(u):
            F = flux(u)
            s = F[0] * n[:, 0]
            for d in range(1, dim):
                s = s + F[d] * n[:, d]
            return s

        def rhs(t, u):
            npad = u.shape[0]
            u = u[:nc]
            uL0 = u[cL]
            uR0 = jnp.where(interior, u[cRr],
                            uL0 if gb is None else gb)
            if order >= 2 and ls is not None:
                du = (u[ls["nb"]] - u[:, None]) * ls["mask"]
                grad = jnp.einsum("cdk,ck->cd", ls["pinv"], du)
                # Barth-Jespersen: cell slope scaled so every face value
                # stays within the neighbor min/max envelope
                umin = jnp.minimum(u, jnp.min(
                    jnp.where(ls["mask"] > 0, u[ls["nb"]], u[:, None]),
                    axis=1))
                umax = jnp.maximum(u, jnp.max(
                    jnp.where(ls["mask"] > 0, u[ls["nb"]], u[:, None]),
                    axis=1))
                dxf_L = fcent - ccent[cL]
                dxf_R = fcent - ccent[cRr]
                dL = jnp.einsum("fd,fd->f", grad[cL], dxf_L)
                dR = jnp.einsum("fd,fd->f", grad[cRr], dxf_R)
                if limname in ("barth", "minmod", "none"):
                    def alpha(d_, ui, lo, hi):
                        pos = jnp.where(d_ > 1e-300,
                                        (hi - ui) / jnp.where(
                                            d_ > 1e-300, d_, 1.0), 1.0)
                        neg = jnp.where(d_ < -1e-300,
                                        (lo - ui) / jnp.where(
                                            d_ < -1e-300, d_, 1.0), 1.0)
                        a = jnp.where(d_ > 1e-300, pos,
                                      jnp.where(d_ < -1e-300, neg, 1.0))
                        return jnp.clip(a, 0.0, 1.0)
                    # per-cell limiter = min over the cell's faces; do it
                    # face-wise then segment-min via scatter-min
                    aL = alpha(dL, u[cL], umin[cL], umax[cL])
                    aR = alpha(dR, u[cRr], umin[cRr], umax[cRr])
                    lim = jnp.ones((nc,), u.dtype)
                    if limname != "none":
                        lim = lim.at[cL].min(aL)
                        lim = lim.at[cRr].min(
                            jnp.where(interior, aR, 1.0))
                    uL = uL0 + lim[cL] * dL
                    uR = jnp.where(interior, u[cRr] + lim[cRr] * dR,
                                   uR0)
                else:
                    uL, uR = uL0 + dL, jnp.where(interior, u[cRr] + dR,
                                                 uR0)
            else:
                uL, uR = uL0, uR0
            if self.riemann == "upwind":
                s = wavespeed(uL, uR, n)
                fh = jnp.where(s >= 0, fn_dot(uL), fn_dot(uR))
            else:  # rusanov (local Lax-Friedrichs)
                smax = jnp.abs(wavespeed(uL, uR, n))
                fh = 0.5 * (fn_dot(uL) + fn_dot(uR)) \
                    - 0.5 * smax * (uR - uL)
            fa = fh * area
            du = jnp.zeros((nc,), u.dtype)
            du = du.at[cL].add(-fa)
            du = du.at[cRr].add(jnp.where(interior, fa, 0.0))
            out = du / vol
            if npad > nc:
                out = jnp.pad(out, (0, npad - nc))
            return out

        return rhs
